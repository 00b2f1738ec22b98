#!/usr/bin/env python
"""Isolate the pq-window IVF kernel cost at the SIFT1B config shape.

sift1b_shape.py measured ~58 ms/batch at Q=8 (N=32M, nlist=31623,
nlist_v ~147k, cap_v=256, wv~32) — orders of magnitude above the
~3 us/window floor times the ~256-window union. This micro-run rebuilds
JUST the query-side arrays at that shape with random contents and times
each stage: probe GEMM + approx top-k, union sort, and the pq window
kernel, to find where the fixed cost lives.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import rii_tpu  # noqa: F401 (compile cache)
    from rii_tpu.ops.ivf import ivf_union_scan_topk_pq
    from rii_tpu.ops.pallas_scan import build_padded_codewords

    NLIST_V = int(os.environ.get("DIAG_NLISTV", 147456))  # ~32M/256*1.125
    CAP_V = 256
    M, Ks, D = 8, 256, 128
    Q = int(os.environ.get("DIAG_Q", 8))
    WV = int(os.environ.get("DIAG_WV", 32))
    total = NLIST_V * CAP_V
    log(f"device={jax.devices()[0]} nlist_v={NLIST_V} cap_v={CAP_V} "
        f"total={total} Q={Q} wv={WV}")

    rng = np.random.RandomState(0)
    cw = rng.standard_normal((M, Ks, D // M)).astype(np.float32)
    codes_g = jnp.asarray(
        rng.randint(0, Ks, (total, M)).astype(np.uint8))
    norms_g = jnp.asarray(rng.random(total).astype(np.float32) + 1.0)
    order_g = jnp.asarray(np.arange(total, dtype=np.int32))
    vlen = jnp.asarray(np.full(NLIST_V, CAP_V, np.int32))
    cdec = rng.standard_normal((NLIST_V, D)).astype(np.float32)
    centers_dec = jnp.asarray(cdec.astype(np.float32))
    centers_norms = jnp.asarray((cdec ** 2).sum(1).astype(np.float32))
    cwj = jnp.asarray(cw)
    cwp = build_padded_codewords(cw)
    queries = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))

    def timed(fn, *args, reps=5, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args, **kw)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    # stage 1: probe GEMM + approx_max_k alone
    from jax import lax

    @jax.jit
    def probe_only(q, cd, cn):
        q16 = q.astype(jnp.bfloat16)
        cs = cn[None, :] - 2.0 * jnp.dot(q16, cd.T.astype(jnp.bfloat16),
                                         preferred_element_type=jnp.float32)
        _, p = lax.approx_max_k(-cs, WV, recall_target=0.99)
        return p

    t, _ = timed(probe_only, queries, centers_dec, centers_norms)
    log(f"probe GEMM+approx_max_k over {NLIST_V} centers: {t*1e3:.3f} ms")

    @jax.jit
    def probe_sort(q, cd, cn):
        p = probe_only(q, cd, cn)
        flat = jnp.sort(p.astype(jnp.int32).reshape(-1))
        dup = jnp.concatenate(
            [jnp.zeros((1,), bool), flat[1:] == flat[:-1]])
        return flat, dup

    t, _ = timed(probe_sort, queries, centers_dec, centers_norms)
    log(f"probe + union sort: {t*1e3:.3f} ms")

    # full kernel, pallas on
    kw = dict(w=WV, topk=10, cap_u=CAP_V, nlist_pad=NLIST_V,
              recall_target=0.99, vlen=vlen, cw_padded=cwp,
              use_pallas=True, interpret=False)
    t, (d_, i_) = timed(ivf_union_scan_topk_pq, queries, codes_g, norms_g,
                        order_g, cwj, centers_dec, centers_norms, **kw)
    log(f"ivf_union_scan_topk_pq (pallas): {t*1e3:.3f} ms/batch "
        f"({t/Q*1e6:.1f} us/q)")

    # XLA path for comparison
    kw["use_pallas"] = False
    t, _ = timed(ivf_union_scan_topk_pq, queries, codes_g, norms_g,
                 order_g, cwj, centers_dec, centers_norms, **kw)
    log(f"ivf_union_scan_topk_pq (xla):    {t*1e3:.3f} ms/batch")


if __name__ == "__main__":
    main()
