#!/usr/bin/env python
"""Big-Q (Q>=512) end-to-end scan breakdown: TN keys kernel vs packed-key
merge vs full replica_scan_topk_t — the VERDICT round-2 item-5 deliverable
(target: Q=1024 end-to-end <= 1.8 ms idle-chip at N=1M; kernel-only best
observed 1.56 ms).

The chip is MULTI-TENANT: identical scans measured 2.0-3.1 ms across hours
(CLAUDE.md). Run this several times and take the MINIMUM as the idle-chip
number. Differenced fori timing (carry fed back so XLA cannot hoist/CSE);
all big arrays are jit ARGUMENTS (closures become HLO constants and blow
the remote-compile HTTP limit).

Measured history (N=1M, Q=1024, topk=10):
  round 2 (no pre-reduce): merge ~0.33 ms standalone, end-to-end 2.4-2.8 ms.
  round 3 (min-8 pre-reduce): merge 0.142 ms standalone, ~0.06 ms marginal
  in-loop; end-to-end == keys + ~0.06 ms, i.e. bound by the TN GEMM kernel
  (1.56 ms idle = 177 TF/s; 2.49 ms observed under tenant load).

Env: BENCH_N (default 1M), BENCH_Q (default 1024), BENCH_K (default 10).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import rii_tpu  # noqa: F401  (persistent compile cache)
    from rii_tpu.ops.pallas_scan import (
        _merge_packed_keys,
        _replica_keys_tn,
        prepare_replica_t,
        replica_scan_topk_t,
    )

    N = int(os.environ.get("BENCH_N", 1 << 20))
    Q = int(os.environ.get("BENCH_Q", 1024))
    K = int(os.environ.get("BENCH_K", 10))
    D = 128
    cap = 1 << int(np.ceil(np.log2(N)))
    log(f"device={jax.devices()[0]} N={N} cap={cap} D={D} Q={Q} topk={K}")

    rng = np.random.RandomState(0)
    dec = jnp.asarray(rng.random((cap, D)).astype(np.float32)).astype(
        jnp.bfloat16)
    norms = jnp.asarray((np.asarray(dec, np.float32) ** 2).sum(1))
    dec_t, norms_rep = prepare_replica_t(dec, norms)
    dec_t = jax.block_until_ready(dec_t)
    norms_rep = jax.block_until_ready(norms_rep)
    q = jnp.asarray(rng.random((Q, D)).astype(np.float32))

    def timed(loop, args, reps1=4, reps2=64, tries=3):
        _ = jax.block_until_ready(loop(jnp.int32(1), q, *args))
        best = None
        for _try in range(tries):
            t0 = time.perf_counter()
            _ = jax.block_until_ready(loop(jnp.int32(reps1), q, *args))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = jax.block_until_ready(loop(jnp.int32(reps2), q, *args))
            t2 = time.perf_counter() - t0
            dt = (t2 - t1) / (reps2 - reps1)
            # a jitter burst on the tunneled backend can make t1 >= t2 and
            # the difference meaningless (observed: negative ms); retry and
            # keep the smallest POSITIVE estimate
            if dt > 0 and (best is None or dt < best):
                best = dt
        return best if best is not None else float("nan")

    @jax.jit
    def loop_keys(reps, qq, dt, nr):
        def body(i, carry):
            out = _replica_keys_tn(carry, dt, nr)
            return carry + 0.0 * out[0, 0]
        return lax.fori_loop(0, reps, body, qq)

    @partial(jax.jit, static_argnames=("rt",))
    def loop_full(reps, qq, dt, nr, rt=0.99):
        def body(i, carry):
            d, _ = replica_scan_topk_t(carry, dt, nr, K, recall_target=rt)
            return carry + 0.0 * d[0, 0]
        return lax.fori_loop(0, reps, body, qq)

    @jax.jit
    def loop_merge(reps, qq, keys):
        def body(i, carry):
            d, _ = _merge_packed_keys(carry, keys + carry[0, 0] * 0.0, K,
                                      0.99)
            return carry + 0.0 * d[0, 0]
        return lax.fori_loop(0, reps, body, qq)

    t_keys = timed(loop_keys, (dec_t, norms_rep))
    t_full = timed(loop_full, (dec_t, norms_rep))
    keys = jax.block_until_ready(_replica_keys_tn(q, dec_t, norms_rep))
    t_merge = timed(loop_merge, (keys,))
    tf = 2 * Q * cap * D / t_keys / 1e12
    log(f"keys only : {t_keys*1e3:8.3f} ms ({tf:5.1f} TF/s)")
    log(f"merge only: {t_merge*1e3:8.3f} ms (min-8 pre-reduce + approx)")
    log(f"end-to-end: {t_full*1e3:8.3f} ms ({t_full/Q*1e6:6.2f} us/q)")
    print(f'{{"q{Q}_e2e_ms": {t_full*1e3:.3f}, "keys_ms": {t_keys*1e3:.3f}, '
          f'"merge_ms": {t_merge*1e3:.3f}}}')


if __name__ == "__main__":
    main()
