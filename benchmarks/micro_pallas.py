"""Microbenchmark: Pallas fused PQ scan vs XLA one-hot scan on the device.

Usage: python benchmarks/micro_pallas.py [N_log2] [Q] [M]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(f, *args, reps=5, rtt=0.0):
    out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0][:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0][:1])
    return max(1e-9, (time.perf_counter() - t0 - rtt) / reps)


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    M = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    N, D, Ks, K = 1 << nlog, 128, 256, 10
    print(f"device={jax.devices()[0]} N={N} D={D} M={M} Q={Q}", flush=True)

    tiny = jax.jit(lambda a: a + 1.0)
    _ = np.asarray(tiny(jnp.zeros(8)))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(tiny(jnp.zeros(8)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"RTT: {rtt*1e3:.2f} ms", flush=True)

    rng = np.random.RandomState(0)
    codes = rng.randint(0, Ks, (N, M)).astype(np.uint8)
    cw = rng.random((M, Ks, D // M)).astype(np.float32)
    norms = rng.random(N).astype(np.float32)
    q = jnp.asarray(rng.random((Q, D)).astype(np.float32))

    from rii_tpu.ops.pallas_scan import (
        pq_scan_topk, prepare_pq_scan_inputs, replica_scan_topk)
    from rii_tpu.ops.decode import build_decoded_cache
    from rii_tpu.ops.scan import linear_scan_topk

    # fused replica kernel
    codes_p, norms_col, _cwp = prepare_pq_scan_inputs(codes, norms, cw, blk=2048)
    decoded = jax.block_until_ready(
        build_decoded_cache(codes_p, jnp.asarray(cw), block=2048))
    for blk in (1024, 2048, 4096):
        try:
            t = timeit(partial(replica_scan_topk, topk=K, blk=blk,
                               recall_target=0.99),
                       q, decoded, norms_col, rtt=rtt)
            print(f"pallas replica_scan blk={blk:>5}: {t*1e3:8.2f} ms "
                  f"({t/Q*1e6:8.2f} us/q, {Q/t:9.0f} qps)", flush=True)
        except Exception as e:
            print(f"pallas replica blk={blk} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    # int8 replica kernel (with exact rescore)
    from rii_tpu.ops.pallas_scan import replica_i8_scan_topk, quantize_replica_i8
    dec_i8, scales = quantize_replica_i8(decoded)
    dec_i8 = jax.block_until_ready(dec_i8)
    del decoded
    codes_j = jnp.asarray(codes)
    cw_j = jnp.asarray(cw)
    try:
        t = timeit(partial(replica_i8_scan_topk, topk=K, blk=1024,
                           recall_target=0.99),
                   q, dec_i8, scales, norms_col, codes_j, cw_j, rtt=rtt)
        print(f"pallas i8 replica_scan blk=1024: {t*1e3:8.2f} ms "
              f"({t/Q*1e6:8.2f} us/q, {Q/t:9.0f} qps)", flush=True)
    except Exception as e:
        print(f"pallas i8 replica FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    del dec_i8

    for blk in (1024,):
        codes_t, norms2d, cwt = prepare_pq_scan_inputs(codes, norms, cw, blk=blk)
        try:
            t = timeit(partial(pq_scan_topk, topk=K, blk=blk),
                       q, codes_t, norms2d, cwt, rtt=rtt)
            print(f"pallas pq_scan blk={blk:>5}: {t*1e3:8.2f} ms "
                  f"({t/Q*1e6:8.2f} us/q, {Q/t:9.0f} qps)", flush=True)
        except Exception as e:
            print(f"pallas blk={blk} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # XLA one-hot path for comparison
    codes_pad = jnp.asarray(np.ascontiguousarray(codes))
    norms_j = jnp.asarray(norms)
    cw_j = jnp.asarray(cw)
    try:
        t = timeit(partial(linear_scan_topk, topk=K, block=8192,
                           recall_target=0.99),
                   q, codes_pad, norms_j, cw_j, rtt=rtt)
        print(f"XLA one-hot scan block=8192 : {t*1e3:8.2f} ms "
              f"({t/Q*1e6:8.2f} us/q, {Q/t:9.0f} qps)", flush=True)
    except Exception as e:
        print(f"XLA one-hot FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
