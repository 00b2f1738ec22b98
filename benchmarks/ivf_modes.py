#!/usr/bin/env python
"""IVF window-mode crossover: bf16 windows vs int8 windows vs pq(dtable/
decode) windows vs the linear scan, across batch sizes — the round-3 item-2
deliverable. One engine build, device-resident timing (fori differencing).

Env: BENCH_N (default 1M), BENCH_QS (default "8,64,512"), BENCH_L (5000).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from micro_ivf import timed_loop  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    N = int(os.environ.get("BENCH_N", 1_000_000))
    QS = [int(x) for x in os.environ.get("BENCH_QS", "8,64,512").split(",")]
    D, M, Ks = 128, 32, 256
    nlist = 1000 if N >= 500_000 else max(16, int(np.sqrt(N)))
    L = int(os.environ.get("BENCH_L", 5000 if N >= 500_000 else 500))
    topk = 10

    rng = np.random.RandomState(123)
    X = rng.random((N, D)).astype(np.float32)

    from rii_tpu import PQ, Rii
    from rii_tpu.models.ivf import build_virtual_layout, code_norms_np
    from rii_tpu.ops.decode import build_decoded_cache
    from rii_tpu.ops.ivf import (
        ivf_union_scan_topk,
        ivf_union_scan_topk_i8,
        ivf_union_scan_topk_pq,
    )
    from rii_tpu.ops.pallas_scan import (
        build_padded_codewords,
        quantize_replica_i8,
        replica_scan_topk_t,
    )

    t0 = time.perf_counter()
    pq = PQ(M=M, Ks=Ks).fit(X[: min(N, 100_000)], iter=5)
    e = Rii(pq)
    e.add_configure(X, nlist=nlist, iter=3)
    log(f"build: {time.perf_counter()-t0:.0f}s nlist={e.nlist} L0={e.L0}")
    dc = e._ensure_cache()
    rt = e.topk_recall
    on_tpu = jax.default_backend() != "cpu"
    assert "decoded_g" in dc, dc.get("mode")

    # build the OTHER window stores from the same layout
    codes = e.codes
    cw = np.asarray(e.codewords, np.float32)
    norms = code_norms_np(cw, codes)
    ul = build_virtual_layout(codes, norms, e._assignments(), e.nlist,
                              headroom=0.125)
    codes_g = jnp.asarray(ul["codes_grouped"])
    vlen_g = jnp.asarray(ul["vlen"])
    cwp = build_padded_codewords(cw)
    # quantize the PLAIN decode (decoded_g carries 1e15 sentinel padding rows
    # that would blow up the per-column scales; the engine cache also
    # quantizes pre-sentinel — padding rides the penalty stream instead)
    dec_plain = build_decoded_cache(codes_g, dc["codewords"],
                                    block=dc["cap_v"])
    dec_i8, scales_i8 = quantize_replica_i8(dec_plain)
    del dec_plain
    log(f"stores ready: cap_v={dc['cap_v']} nlist_v={dc['nlist_v']}")

    for Q in QS:
        queries = (X[rng.choice(N, Q, replace=False)]
                   + rng.normal(0, 0.01, (Q, D))).astype(np.float32)
        qd = jnp.asarray(queries)
        wv = e._probe_width_virtual(L, None, dc)
        kw = dict(w=wv, topk=topk, cap_u=dc["cap_v"],
                  nlist_pad=dc["nlist_v_pad"], recall_target=rt)
        log(f"Q={Q} wv={wv} "
            f"union={min(Q*wv, dc['nlist_v'])} windows")

        # recall sanity for each mode vs exact linear (engine path)
        il, _ = e.query_batch(queries, topk=topk, method="linear")

        def rec(ids):
            ids = np.asarray(ids)
            return np.mean([len(set(a.tolist()) & set(b.tolist())) / topk
                            for a, b in zip(il, ids)])

        variants = []
        d_, i_ = ivf_union_scan_topk(
            qd, dc["decoded_g"], dc["norms_g"], dc["order_g"],
            dc["centers_dec_v"], dc["centers_norms_v"], use_pallas=on_tpu,
            **kw)
        variants.append(("bf16-win", rec(i_)))

        def bf16_once(acc, qd_, a, b, c, d2, e2):
            dd, _ = ivf_union_scan_topk(qd_ + acc * 1e-30, a, b, c, d2, e2,
                                        use_pallas=on_tpu, **kw)
            return dd[0, 0]

        dt = timed_loop(bf16_once, (qd, dc["decoded_g"], dc["norms_g"],
                                    dc["order_g"], dc["centers_dec_v"],
                                    dc["centers_norms_v"]))
        log(f"  bf16-win: {dt*1e3:.3f} ms/batch {dt/Q*1e6:.2f} us/q "
            f"recall={variants[-1][1]:.3f}")

        d_, i_ = ivf_union_scan_topk_i8(
            qd, dec_i8, scales_i8, dc["norms_g"], dc["order_g"],
            dc["codes_flat"], dc["codewords"], dc["centers_dec_v"],
            dc["centers_norms_v"], vlen=vlen_g, interpret=not on_tpu, **kw)
        r_i8 = rec(i_)

        def i8_once(acc, qd_, a, b, c, d2, e2, f2, g2, h2):
            dd, _ = ivf_union_scan_topk_i8(qd_ + acc * 1e-30, a, b, c, d2,
                                           e2, f2, g2, h2, vlen=vlen_g,
                                           interpret=not on_tpu, **kw)
            return dd[0, 0]

        dt = timed_loop(i8_once, (qd, dec_i8, scales_i8, dc["norms_g"],
                                  dc["order_g"], dc["codes_flat"],
                                  dc["codewords"], dc["centers_dec_v"],
                                  dc["centers_norms_v"]))
        log(f"  i8-win:   {dt*1e3:.3f} ms/batch {dt/Q*1e6:.2f} us/q "
            f"recall={r_i8:.3f}")

        d_, i_ = ivf_union_scan_topk_pq(
            qd, codes_g, dc["norms_g"], dc["order_g"], dc["codewords"],
            dc["centers_dec_v"], dc["centers_norms_v"], vlen=vlen_g,
            cw_padded=cwp, use_pallas=on_tpu, interpret=not on_tpu, **kw)
        r_pq = rec(i_)

        def pq_once(acc, qd_, a, b, c, d2, e2, f2, g2, h2):
            dd, _ = ivf_union_scan_topk_pq(qd_ + acc * 1e-30, a, b, c, d2,
                                           e2, f2, vlen=g2, cw_padded=h2,
                                           use_pallas=on_tpu,
                                           interpret=not on_tpu, **kw)
            return dd[0, 0]

        dt = timed_loop(pq_once, (qd, codes_g, dc["norms_g"], dc["order_g"],
                                  dc["codewords"], dc["centers_dec_v"],
                                  dc["centers_norms_v"], vlen_g, cwp))
        kind = "dtable" if Q < D else "decode"
        log(f"  pq-win({kind}): {dt*1e3:.3f} ms/batch {dt/Q*1e6:.2f} us/q "
            f"recall={r_pq:.3f}")

        if "decoded_t" in dc:
            def lin_once(acc, qd_, dec_t, nr):
                dd, _ = replica_scan_topk_t(qd_ + acc * 1e-30, dec_t, nr,
                                            topk=topk, recall_target=rt)
                return dd[0, 0]

            dt = timed_loop(lin_once, (qd, dc["decoded_t"], dc["norms_rep"]))
            log(f"  linear:   {dt*1e3:.3f} ms/batch {dt/Q*1e6:.2f} us/q")


if __name__ == "__main__":
    main()
