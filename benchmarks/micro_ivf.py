#!/usr/bin/env python
"""IVF-path microbenchmark on the device: old per-query gather probe vs the
union-bucket batched scan, at SIFT1M scale (BENCH_N/BENCH_Q env to shrink).

Timing uses the runtime-trip-count fori_loop differencing from bench.py so the
tunnel's dispatch RTT cancels (see CLAUDE.md timing note).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_loop(fn_once, arrays, reps_small=4, target=0.25):
    """Differenced steady-state seconds per rep of fn_once(acc, *arrays)->scalar.

    `arrays` MUST be passed here (not closed over): closures become HLO
    constants and a multi-100MB constant blows the remote-compile upload
    (CLAUDE.md environment note).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(reps, *arrs):
        return lax.fori_loop(0, reps, lambda i, acc: fn_once(acc, *arrs),
                             jnp.float32(0.0))

    _ = np.asarray(loop(jnp.int32(1), *arrays))

    def t(reps):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(loop(jnp.int32(reps), *arrays))
            best = min(best, time.perf_counter() - t0)
        return best

    r1 = reps_small
    t1 = t(r1)
    r2, t2 = r1, t1
    while t2 < t1 + target and r2 < 1 << 16:
        r2 *= 4
        t2 = t(r2)
    return max(1e-9, (t2 - t1) / max(1, r2 - r1))


def main():
    import jax
    import jax.numpy as jnp

    N = int(os.environ.get("BENCH_N", 1_000_000))
    Q = int(os.environ.get("BENCH_Q", 64))
    D, M, Ks, nlist = 128, 32, 256, 1000 if N >= 500_000 else max(16, int(np.sqrt(N)))
    L = 5000 if N >= 500_000 else None
    topk = 10

    rng = np.random.RandomState(123)
    X = rng.random((N, D)).astype(np.float32)
    queries = (X[rng.choice(N, Q, replace=False)]
               + rng.normal(0, 0.01, (Q, D))).astype(np.float32)

    from rii_tpu import PQ, Rii
    from rii_tpu.ops.ivf import ivf_scan_topk_decoded, ivf_union_scan_topk

    t0 = time.perf_counter()
    pq = PQ(M=M, Ks=Ks).fit(X[: min(N, 100_000)], iter=5)
    e = Rii(pq)
    e.add_configure(X, nlist=nlist, iter=3)
    log(f"build: {time.perf_counter()-t0:.0f}s nlist={e.nlist} L0={e.L0}")

    dc = e._ensure_legacy_grouped(e._ensure_cache())
    if L is None:
        L = e._multiple_of_L0_covering_topk(topk)
    w = e._probe_width(L, None)
    wv = None
    if "nlist_v" in dc:
        wv = e._probe_width_virtual(L, None, dc)
    log(f"L={L} w={w} wv={wv} cap_v={dc.get('cap_v')} "
        f"nlist_v={dc.get('nlist_v')} cap_max={dc['cap_max']} mode={dc['mode']}")
    qd = jnp.asarray(queries)
    rt = e.topk_recall

    # recall vs linear scan (exact ADC ground truth on PQ codes)
    il, dl = e.query_batch(queries, topk=topk, method="linear")
    iu, du = e.query_batch(queries, topk=topk, L=L, method="ivf")
    rec = np.mean([len(set(a) & set(b)) / topk for a, b in zip(il, iu)])
    log(f"ivf recall@{topk} vs exact-ADC linear: {rec:.4f}")

    if "decoded_g" in dc:
        def union_once(acc, qd_, dec_g, nrm_g, ord_g, cdec, cnrm):
            d, _ = ivf_union_scan_topk(
                qd_ + acc * 1e-30, dec_g, nrm_g, ord_g, cdec, cnrm,
                w=wv, topk=topk, cap_u=dc["cap_v"],
                nlist_pad=dc["nlist_v_pad"], recall_target=rt)
            return d[0, 0]

        dt = timed_loop(union_once, (qd, dc["decoded_g"], dc["norms_g"],
                                     dc["order_g"], dc["centers_dec_v"],
                                     dc["centers_norms_v"]))
        log(f"union ivf (xla):    {dt*1e3:.3f} ms/batch, {dt/Q*1e6:.2f} us/query, "
            f"{Q/dt:.0f} QPS")

        if jax.default_backend() != "cpu":
            def union_pallas_once(acc, qd_, dec_g, nrm_g, ord_g, cdec, cnrm):
                d, _ = ivf_union_scan_topk(
                    qd_ + acc * 1e-30, dec_g, nrm_g, ord_g, cdec, cnrm,
                    w=wv, topk=topk, cap_u=dc["cap_v"],
                    nlist_pad=dc["nlist_v_pad"], recall_target=rt,
                    use_pallas=True)
                return d[0, 0]

            dt = timed_loop(union_pallas_once,
                            (qd, dc["decoded_g"], dc["norms_g"], dc["order_g"],
                             dc["centers_dec_v"], dc["centers_norms_v"]))
            log(f"union ivf (pallas): {dt*1e3:.3f} ms/batch, "
                f"{dt/Q*1e6:.2f} us/query, {Q/dt:.0f} QPS")

    if "decoded_flat" in dc and os.environ.get("BENCH_OLD_IVF"):
        def old_once(acc, qd_, dec, cdec, cnrm, bst, nrm_gr, ordr, slc):
            d, _ = ivf_scan_topk_decoded(
                qd_ + acc * 1e-30, dec, cdec, cnrm, bst, nrm_gr, ordr, slc,
                w=w, topk=topk, cap_max=dc["cap_max"], recall_target=rt)
            return d[0, 0]

        dt = timed_loop(old_once, (qd, dc["decoded_flat"], dc["centers_dec"],
                                   dc["centers_norms"], dc["bucket_start"],
                                   dc["norms_grouped"], dc["order"],
                                   dc["slot_cluster"]))
        log(f"gather ivf: {dt*1e3:.3f} ms/batch, {dt/Q*1e6:.2f} us/query, "
            f"{Q/dt:.0f} QPS")

    # public API (includes host<->device transfers + dispatch each call)
    e.query_batch(queries, topk=topk, L=L, method="ivf")
    t0 = time.perf_counter()
    for _ in range(3):
        e.query_batch(queries, topk=topk, L=L, method="ivf")
    dt = (time.perf_counter() - t0) / 3
    log(f"public ivf: {dt*1e3:.2f} ms/batch incl dispatch, {dt/Q*1e3:.4f} ms/query")


if __name__ == "__main__":
    main()
