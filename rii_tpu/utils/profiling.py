"""Profiling / observability helpers.

The reference's only tracing is verbose wall-clock prints inside PQk-means
(SURVEY.md section 5). The TPU equivalents here: jax.profiler traces (viewable
in Perfetto/TensorBoard) and an RTT-corrected QPS/recall harness that accounts
for the dispatch overhead of tunneled dev backends.
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir):
    """Capture a device trace: `with trace('/tmp/trace'): e.query_batch(...)`."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_rtt(reps=5):
    """Dispatch + tiny-D2H round-trip cost of the current backend."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1.0)
    _ = np.asarray(f(jnp.zeros(8)))
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(f(jnp.zeros(8)))
    return (time.perf_counter() - t0) / reps


def benchmark_queries(engine, queries, topk=10, reps=3, gt_ids=None, **query_kw):
    """Steady-state QPS (+ optional recall) for a query batch.

    Returns a dict: {'ms_per_query', 'qps', 'recall@1'?, 'recall@topk'?}.
    """
    rtt = measure_rtt()
    engine.query_batch(queries, topk=topk, **query_kw)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        ids, dists = engine.query_batch(queries, topk=topk, **query_kw)
    dt = max(1e-9, (time.perf_counter() - t0) / reps - rtt)
    out = {
        "ms_per_query": dt / len(queries) * 1e3,
        "qps": len(queries) / dt,
    }
    if gt_ids is not None:
        gt = np.asarray(gt_ids).reshape(-1)[: len(ids)]
        out["recall@1"] = float((ids[:, 0] == gt).mean())
        out[f"recall@{topk}"] = float((ids == gt[:, None]).any(1).mean())
    return out
