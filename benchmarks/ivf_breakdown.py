#!/usr/bin/env python
"""Stage breakdown of the fused Pallas IVF window path.

The end-to-end union IVF (ivf_union_scan_topk use_pallas=True) is
29-38 us/query at the BENCH config while the window kernel's DMA floor
suggests ~10; this harness times each stage in isolation so optimization
effort lands on the real pole:

  probe   — coarse GEMM + top_k(w) + sort/dup union
  kernel  — the fused multi-window Pallas scan (vmin/amin only)
  merge   — kernel + cross-tile approx_max_k(topk)
  full    — the complete path incl. exact f32 rescore

Env: BENCH_N (1M), BENCH_QS ("8,64"), BENCH_L (5000).
Timing: runtime-trip-count fori differencing (micro_ivf.timed_loop).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from micro_ivf import timed_loop  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = int(os.environ.get("BENCH_N", 1_000_000))
    QS = [int(x) for x in os.environ.get("BENCH_QS", "8,64").split(",")]
    D, M, Ks = 128, 32, 256
    nlist = 1000 if N >= 500_000 else max(16, int(np.sqrt(N)))
    L = int(os.environ.get("BENCH_L", 5000 if N >= 500_000 else 500))
    topk = 10

    rng = np.random.RandomState(123)
    X = rng.random((N, D)).astype(np.float32)

    from rii_tpu import PQ, Rii
    from rii_tpu.ops.ivf import ivf_union_scan_topk
    from rii_tpu.ops.pallas_scan import ivf_window_tile_minima_multi

    t0 = time.perf_counter()
    pq = PQ(M=M, Ks=Ks).fit(X[:100_000], iter=5)
    e = Rii(pq)
    e.add_configure(X, nlist=nlist, iter=3)
    log(f"build: {time.perf_counter()-t0:.0f}s nlist={e.nlist}")
    dc = e._ensure_cache()
    assert "decoded_g" in dc, "needs the bf16 virtual-window cache"
    cap_v, nlist_pad = dc["cap_v"], dc["nlist_v_pad"]
    rt = e.topk_recall

    for Q in QS:
        queries = (X[rng.choice(N, Q, replace=False)]
                   + rng.normal(0, 0.01, (Q, D))).astype(np.float32)
        qd = jnp.asarray(queries)
        wv = e._probe_width_virtual(L, None, dc)
        u = min(Q * wv, nlist_pad)
        wpb = max(1, min(32, (1 << 22) // max(1, (cap_v // 4) * Q * 8)))
        upad = -(-u // wpb) * wpb
        log(f"--- Q={Q} wv={wv} u={u} (padded {upad}) wpb={wpb} "
            f"cap_v={cap_v} nlist_pad={nlist_pad}")

        def probe_only(acc, qd_, cdec, cnrm):
            q16 = (qd_ + acc * 1e-30).astype(jnp.bfloat16)
            cs = cnrm[None, :] - 2.0 * jnp.dot(
                q16, cdec.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            _, probe = lax.top_k(-cs, wv)
            if Q * wv >= nlist_pad:
                return jnp.float32(probe[0, 0])
            flat = jnp.sort(probe.astype(jnp.int32).reshape(-1))
            return flat[0].astype(jnp.float32)

        dt_p = timed_loop(probe_only, (qd, dc["centers_dec_v"],
                                       dc["centers_norms_v"]))

        # fixed probe set (sorted union as production builds it) so the
        # kernel/merge stages see identical work
        q16 = np.asarray(qd, np.float32)
        cdec = np.asarray(dc["centers_dec_v"], np.float32)
        cnrm = np.asarray(dc["centers_norms_v"], np.float32)
        cs = cnrm[None, :] - 2.0 * q16 @ cdec.T
        if u >= nlist_pad:
            flat_np = np.arange(nlist_pad, dtype=np.int32)
        else:
            pr = np.argsort(cs, axis=1)[:, :wv].astype(np.int32).reshape(-1)
            flat_np = np.sort(pr)
        dup_np = np.zeros_like(flat_np, bool)
        dup_np[1:] = flat_np[1:] == flat_np[:-1]
        pad = -(-len(flat_np) // wpb) * wpb - len(flat_np)
        flat_np = np.pad(flat_np, (0, pad))
        dup_np = np.pad(dup_np, (0, pad), constant_values=True)
        flat_d = jnp.asarray(flat_np, jnp.int32)
        dup_d = jnp.asarray(dup_np.astype(np.int32))

        def kernel_only(acc, qd_, dec_g, fl, dp):
            vmin, _ = ivf_window_tile_minima_multi(
                qd_ + acc * 1e-30, dec_g, fl, dp, cap_v=cap_v, wpb=wpb)
            return vmin[0, 0]

        dt_k = timed_loop(kernel_only, (qd, dc["decoded_g"], flat_d, dup_d))

        def merge_only(acc, qd_, dec_g, fl, dp):
            vmin, amin = ivf_window_tile_minima_multi(
                qd_ + acc * 1e-30, dec_g, fl, dp, cap_v=cap_v, wpb=wpb)
            neg, pos = lax.approx_max_k(-vmin, topk, recall_target=rt)
            return neg[0, 0]

        dt_m = timed_loop(merge_only, (qd, dc["decoded_g"], flat_d, dup_d))

        def full(acc, qd_, dec_g, nrm_g, ord_g, cdec_, cnrm_):
            d_, _ = ivf_union_scan_topk(
                qd_ + acc * 1e-30, dec_g, nrm_g, ord_g, cdec_, cnrm_,
                w=wv, topk=topk, cap_u=cap_v, nlist_pad=nlist_pad,
                recall_target=rt, use_pallas=True)
            return d_[0, 0]

        dt_f = timed_loop(full, (qd, dc["decoded_g"], dc["norms_g"],
                                 dc["order_g"], dc["centers_dec_v"],
                                 dc["centers_norms_v"]))

        vw = vmin_width = upad * 2 * (cap_v // 8)
        log(f"probe:  {dt_p*1e3:7.3f} ms/batch  {dt_p/Q*1e6:7.2f} us/q")
        log(f"kernel: {dt_k*1e3:7.3f} ms/batch  {dt_k/Q*1e6:7.2f} us/q "
            f"({upad/wpb:.0f} steps, {upad*cap_v*D*2/dt_k/1e9:.0f} GB/s fetched)")
        log(f"merge:  {dt_m*1e3:7.3f} ms/batch  {dt_m/Q*1e6:7.2f} us/q "
            f"(approx_max_k over (Q, {vw}))")
        log(f"full:   {dt_f*1e3:7.3f} ms/batch  {dt_f/Q*1e6:7.2f} us/q")


if __name__ == "__main__":
    main()
