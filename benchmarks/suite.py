"""Benchmark suite covering the BASELINE.json configs on synthetic data.

Configs (BASELINE.md):
  1. README quickstart: N=10k, D=128, M=32, Ks=256, topk=3
  2. SIFT1M-scale (+ optional OPQ), nlist=sqrt(N)
  3. Subset search with 0.1% / 1% / 10% target_ids masks
  4. Dynamic growth: add N more vectors, QPS before/after reconfigure()

Prints one JSON object per config to stdout. Usage:
  python benchmarks/suite.py [--n 1000000] [--q 1024] [--opq]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rtt(jnp, jax):
    f = jax.jit(lambda a: a + 1.0)
    _ = np.asarray(f(jnp.zeros(8)))
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(f(jnp.zeros(8)))
    return (time.perf_counter() - t0) / 3


def timed_query(e, queries, rtt, reps=3, **kw):
    e.query_batch(queries, **kw)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        ids, dists = e.query_batch(queries, **kw)
    dt = max(1e-9, (time.perf_counter() - t0) / reps - rtt)
    return ids, dt / len(queries)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--q", type=int, default=None)
    ap.add_argument("--opq", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize overrides "
                         "JAX_PLATFORMS, so an env var cannot)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from rii_tpu import PQ, OPQ, Rii

    on_accel = jax.default_backend() != "cpu"
    N = args.n or (1_000_000 if on_accel else 50_000)
    Q = args.q or (1024 if on_accel else 128)
    D, M, Ks = 128, 32, 256
    rng = np.random.RandomState(123)
    rtt = _rtt(jnp, jax)
    print(f"# backend={jax.default_backend()} N={N} Q={Q} rtt={rtt*1e3:.1f}ms",
          file=sys.stderr)

    def report(name, **kv):
        print(json.dumps({"config": name, **kv}), flush=True)

    # ---- config 1: quickstart ----
    Xq = rng.random((10_000, D)).astype(np.float32)
    e1 = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(Xq[:1000]))
    e1.add_configure(Xq)
    queries1 = Xq[:min(Q, 1024)]
    ids, spq = timed_query(e1, queries1, rtt, topk=3, method="linear")
    report("quickstart_n10k", ms_per_query=round(spq * 1e3, 5),
           qps=round(1 / spq, 1),
           self_hit=float((ids[:, 0] == np.arange(len(ids))).mean()))

    # ---- config 2: SIFT1M-scale ----
    X = rng.random((N, D)).astype(np.float32)
    codec_cls = OPQ if args.opq else PQ
    codec = codec_cls(M=M, Ks=Ks).fit(X[:100_000], iter=10)
    e = Rii(fine_quantizer=codec)
    t0 = time.perf_counter()
    e.add_configure(X)
    build_s = time.perf_counter() - t0
    queries = (X[rng.choice(N, Q, replace=False)]
               + rng.normal(0, 0.01, (Q, D))).astype(np.float32)
    # exact f32 ground truth -> recall columns (the OPQ-vs-PQ contract the
    # reference documents: slightly slower, slightly more accurate,
    # /root/reference/docs/source/tutorial.rst:65-68)
    import importlib.util as _ilu
    _spec = _ilu.spec_from_file_location("benchmod", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py"))
    _bm = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_bm)
    gtq = queries[:min(256, len(queries))]
    gt = _bm.exact_nn_ids(X, gtq)

    def _recall(ids_):
        ids_ = np.asarray(ids_)[:len(gtq)]
        return (float((ids_[:, :1] == gt[:, None]).any(1).mean()),
                float((ids_ == gt[:, None]).any(1).mean()))

    ids, spq = timed_query(e, queries, rtt, topk=10, method="linear")
    r1, r10 = _recall(ids)
    report("sift1m_scale_linear", codec=codec_cls.__name__,
           build_s=round(build_s, 1), ms_per_query=round(spq * 1e3, 5),
           qps=round(1 / spq, 1), recall_at_1=round(r1, 4),
           recall_at_10=round(r10, 4))
    ids, spq = timed_query(e, queries, rtt, topk=10, L=5 * e.L0,
                           method="ivf")
    r1, r10 = _recall(ids)
    report("sift1m_scale_ivf_L5L0", codec=codec_cls.__name__,
           ms_per_query=round(spq * 1e3, 5), qps=round(1 / spq, 1),
           recall_at_1=round(r1, 4), recall_at_10=round(r10, 4))

    # ---- config 3: subset masks ----
    for frac in (0.001, 0.01, 0.10):
        s = max(16, int(N * frac))
        tids = np.sort(rng.choice(N, s, replace=False)).astype(np.int64)
        ids, spq = timed_query(e, queries, rtt, topk=10, target_ids=tids,
                               sort_target_ids=False)
        ok = float(np.isin(ids, tids).mean())
        report(f"subset_{frac:g}", subset_size=s,
               ms_per_query=round(spq * 1e3, 5), qps=round(1 / spq, 1),
               results_in_subset=ok)

    # ---- config 4: dynamic growth ----
    X2 = rng.random((N, D)).astype(np.float32)
    t0 = time.perf_counter()
    e.add(X2)  # joins stale posting lists
    add_s = time.perf_counter() - t0
    ids, spq_stale = timed_query(e, queries, rtt, topk=10, L=5 * e.L0,
                                 method="ivf")
    t0 = time.perf_counter()
    e.reconfigure()
    reconf_s = time.perf_counter() - t0
    ids, spq_fresh = timed_query(e, queries, rtt, topk=10, L=5 * e.L0,
                                 method="ivf")
    report("dynamic_growth", n_after=e.N, add_s=round(add_s, 1),
           reconfigure_s=round(reconf_s, 1),
           ivf_ms_per_query_stale=round(spq_stale * 1e3, 5),
           ivf_ms_per_query_reconfigured=round(spq_fresh * 1e3, 5))


if __name__ == "__main__":
    main()
