#!/usr/bin/env python
"""IVF tuning contract: recall vs (wv, L) at several batch sizes.

The reference documents the L dial in prose (/root/reference/docs/source/
tips.rst:11-37); this sweep produces the MEASURED equivalent for the TPU
engine: for each candidate budget L, the derived virtual probe width wv
(the w-formula, round(L*nlist_v/N)+3 pow2-bucketed), recall@r in the
reference benchmark's sense (the true f32 NN ranks within the top r —
examples/benchmark conventions), and dispatch-inclusive latency at
Q in {8, 64, 512}. Queries are INDEPENDENT of the database (drawn from the
same distribution, never planted next to a stored point).
Runs on clustered data (SIFT-like structure — the design case) and uniform
data (no cluster structure — the IVF worst case; SWEEP_DATA=uniform).

Prints one JSON line per L to stdout; details to stderr. Results are wired
into docs/tips.md (round-4 VERDICT item 6).
Env: SWEEP_N (default 1M), SWEEP_Q (default 256), SWEEP_DATA
(clustered|uniform), SWEEP_QS (default "8,64,512").
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthesize(n, d, nq, seed=0):
    """Clustered DB + INDEPENDENT queries drawn from the same cluster
    distribution (never planted next to a DB point: planted queries make
    every L score 1.0 and prove nothing about the dial). The true NN is a
    random member of the query's cluster — found iff its posting list is
    probed, so recall tracks the probe budget on structured data."""
    rng = np.random.RandomState(seed)
    ncent = 256
    centers = rng.random((ncent, d)).astype(np.float32) * 10
    which = rng.randint(0, ncent, n)
    X = centers[which] + rng.normal(0, 1.0, (n, d)).astype(np.float32)
    qwhich = rng.randint(0, ncent, nq)
    Q = centers[qwhich] + rng.normal(0, 1.0, (nq, d)).astype(np.float32)
    return X.astype(np.float32), Q.astype(np.float32)


def main():
    if os.environ.get("RII_CPU"):  # sitecustomize overrides JAX_PLATFORMS
        import jax
        jax.config.update("jax_platforms", "cpu")
    N = int(os.environ.get("SWEEP_N", 1_000_000))
    Qn = int(os.environ.get("SWEEP_Q", 256))
    data = os.environ.get("SWEEP_DATA", "clustered")
    lat_qs = [int(x) for x in os.environ.get("SWEEP_QS", "8,64,512").split(",")]
    D, M, Ks = 128, 32, 256
    nlist = 1000 if N >= 500_000 else max(16, int(np.sqrt(N)))
    topk = 10

    if data == "clustered":
        X, queries = synthesize(N, D, Qn)
    else:
        # uniform DB + INDEPENDENT uniform queries: no planted neighbor, the
        # true NN's bucket carries no signal — the IVF worst case
        rng = np.random.RandomState(0)
        X = rng.random((N, D)).astype(np.float32)
        queries = rng.random((Qn, D)).astype(np.float32)

    from rii_tpu import PQ, Rii

    t0 = time.perf_counter()
    pq = PQ(M=M, Ks=Ks).fit(X[:100_000], iter=5)
    e = Rii(pq)
    e.add_configure(X, nlist=nlist, iter=5)
    log(f"build: {time.perf_counter()-t0:.0f}s nlist={e.nlist} L0={e.L0}")

    # exact f32 ground truth (device-computed, blocked)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)
    gt = benchmod.exact_nn_ids(X, queries)
    log("ground truth done")

    ids_lin, _ = e.query_batch(queries, topk=topk, method="linear")
    rl1 = float((ids_lin[:, :1] == gt[:, None]).any(1).mean())
    rl10 = float((ids_lin == gt[:, None]).any(1).mean())
    log(f"linear exact-ADC: recall@1={rl1:.3f} recall@10={rl10:.3f}")
    print(json.dumps({"data": data, "linear_recall@1": round(rl1, 4),
                      "linear_recall@10": round(rl10, 4)}))
    lin_sets = [set(r.tolist()) for r in ids_lin]

    def coverage(ids_rows):
        # the metric L actually tunes: fraction of the exact-ADC linear
        # top-k the probe's candidate set recovered (codec factored out)
        return float(np.mean([len(set(r.tolist()) & s) / topk
                              for r, s in zip(ids_rows, lin_sets)]))

    dc = e._ensure_cache()
    L_default = e._multiple_of_L0_covering_topk(topk=topk)
    # the small-L rows (100, 300) sit BELOW the w-formula's comfortable
    # range — they show where the dial actually starves the probe
    Ls = sorted({L_default, 100, 300, 1000, 2000, 5000, 10000, 20000, 50000})
    for L in Ls:
        if L > N:
            continue
        wv = e._probe_width_virtual(L, None, dc)
        ids, _ = e.query_batch(queries, topk=topk, L=L, method="ivf")
        r1 = float((ids[:, :1] == gt[:, None]).any(1).mean())
        r10 = float((ids == gt[:, None]).any(1).mean())
        # the union scan scores every query against the deduped UNION of the
        # batch's probes, so full-batch recall >= small-batch recall; report
        # the Q=8 figure too (the serving-relevant lower bound)
        ids8 = np.concatenate([
            e.query_batch(queries[i:i + 8], topk=topk, L=L, method="ivf")[0]
            for i in range(0, Qn, 8)])
        r1_8 = float((ids8[:, :1] == gt[:, None]).any(1).mean())
        r10_8 = float((ids8 == gt[:, None]).any(1).mean())
        lat = {}
        for q in lat_qs:
            qs = queries[:q] if q <= Qn else np.tile(
                queries, (-(-q // Qn), 1))[:q]
            e.query_batch(qs, topk=topk, L=L, method="ivf")  # warm
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                e.query_batch(qs, topk=topk, L=L, method="ivf")
                best = min(best, time.perf_counter() - t0)
            lat[f"us_per_q_Q{q}"] = round(best / q * 1e6, 2)
        row = {"data": data, "L": L, "wv": int(wv),
               "default_L": L == L_default,
               "recall@1": round(r1, 4), "recall@10": round(r10, 4),
               "recall@1_Q8": round(r1_8, 4), "recall@10_Q8": round(r10_8, 4),
               "coverage": round(coverage(ids), 4),
               "coverage_Q8": round(coverage(ids8), 4)}
        row.update(lat)
        log(row)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
