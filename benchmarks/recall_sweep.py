#!/usr/bin/env python
"""IVF recall-vs-L sweep on clustered synthetic data (SIFT-like structure).

Uniform-random data has almost no cluster structure, so IVF recall there is a
worst case; this sweep uses a clustered distribution (the run_sift1m.py
synthesizer) to characterize the recall/latency dial the reference documents
(/root/reference/docs/source/tips.rst): raise L for recall, lower it for speed.

Prints one JSON line per L to stdout; details to stderr.
Env: SWEEP_N (default 1M), SWEEP_Q (default 256).
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
    """Clustered DB + queries planted next to random DB points, so each query
    has an unambiguous true NN (recall then measures the INDEX, not the
    degeneracy of the distribution)."""
    rng = np.random.RandomState(seed)
    ncent = 256
    centers = rng.random((ncent, d)).astype(np.float32) * 10
    which = rng.randint(0, ncent, n)
    X = centers[which] + rng.normal(0, 1.0, (n, d)).astype(np.float32)
    qidx = rng.choice(n, nq, replace=False)
    Q = X[qidx] + rng.normal(0, 0.05, (nq, d)).astype(np.float32)
    return X.astype(np.float32), Q.astype(np.float32)


def main():
    N = int(os.environ.get("SWEEP_N", 1_000_000))
    Qn = int(os.environ.get("SWEEP_Q", 256))
    D, M, Ks = 128, 32, 256
    nlist = 1000 if N >= 500_000 else max(16, int(np.sqrt(N)))
    topk = 10

    X, queries = synthesize(N, D, Qn)

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

    for L in (1000, 2000, 5000, 10000, 20000, 50000):
        if L > N:
            continue
        ids, _ = e.query_batch(queries, topk=topk, L=L, method="ivf")
        r1 = float((ids[:, :1] == gt[:, None]).any(1).mean())
        r10 = float((ids == gt[:, None]).any(1).mean())
        e.query_batch(queries[:64], topk=topk, L=L, method="ivf")  # warm
        t0 = time.perf_counter()
        e.query_batch(queries[:64], topk=topk, L=L, method="ivf")
        ms = (time.perf_counter() - t0) / 64 * 1e3
        log(f"L={L}: recall@1={r1:.3f} recall@10={r10:.3f} {ms:.3f} ms/q (incl dispatch)")
        print(json.dumps({"L": L, "recall@1": round(r1, 4),
                          "recall@10": round(r10, 4),
                          "ms_per_query_incl_dispatch": round(ms, 4)}))


if __name__ == "__main__":
    main()
