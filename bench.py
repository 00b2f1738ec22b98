#!/usr/bin/env python
"""Headline benchmark: SIFT1M-scale exact ADC search on one chip.

Config mirrors the reference's SIFT1M setup at BASELINE.json's bit-width
(N=1M, D=128, M=32, Ks=256, nlist=1000). Baseline to beat: the reference's
published 0.21 ms/query at N=1,011,000 / M=32 after reconfigure()
(/root/reference/README.md:140) => 4,762 QPS on CPU.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": speedup}
Auxiliary numbers (build time, recall@1, ivf latency) go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def exact_nn_ids(X, queries, block=131072):
    """Ground-truth nearest neighbor ids (exact f32 L2) computed on device."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n, d = X.shape
    nb = -(-n // block)
    npad = nb * block
    Xp = np.zeros((npad, d), np.float32)
    Xp[:n] = X
    xsq = np.full(npad, np.inf, np.float32)
    xsq[:n] = (X.astype(np.float64) ** 2).sum(1).astype(np.float32)
    q = jnp.asarray(queries)

    @jax.jit
    def run(xb, sb):
        def f(args):
            xblk, sblk, base = args
            s = sblk[None, :] - 2.0 * jnp.dot(q, xblk.T,
                                              precision=lax.Precision.HIGHEST,
                                              preferred_element_type=jnp.float32)
            neg, idx = lax.top_k(-s, 1)
            return neg[:, 0], idx[:, 0] + base

        bases = jnp.arange(nb, dtype=jnp.int32) * block
        negs, idxs = lax.map(f, (xb, sb, bases))  # (nb, Q)
        best = jnp.argmax(negs, axis=0)  # (Q,)
        return jnp.take_along_axis(idxs, best[None, :], axis=0)[0]

    return np.asarray(run(jnp.asarray(Xp.reshape(nb, block, d)),
                          jnp.asarray(xsq.reshape(nb, block))))


def main():
    import jax
    backend = jax.default_backend()
    on_accel = backend != "cpu"

    N = int(os.environ.get("BENCH_N", 1_000_000 if on_accel else 100_000))
    # defaults = the SIFT1M-class config; BENCH_D=96 BENCH_M=12 gives the
    # Deep1B-class config (BASELINE.md config 5)
    D = int(os.environ.get("BENCH_D", 128))
    M = int(os.environ.get("BENCH_M", 32))
    Ks = 256
    nlist = 1000 if N >= 500_000 else max(16, int(np.sqrt(N)))
    Q = int(os.environ.get("BENCH_Q", 1024 if on_accel else 256))
    topk = 10
    log(f"backend={backend} N={N} D={D} M={M} Ks={Ks} nlist={nlist} Q={Q} topk={topk}")

    rng = np.random.RandomState(123)
    X = rng.random((N, D)).astype(np.float32)
    qidx = rng.choice(N, Q, replace=False)
    queries = (X[qidx] + rng.normal(0, 0.01, (Q, D))).astype(np.float32)

    from rii_tpu import PQ, Rii

    t0 = time.perf_counter()
    pq = PQ(M=M, Ks=Ks).fit(X[: min(N, 100_000)], iter=10)
    t_fit = time.perf_counter() - t0
    log(f"PQ fit: {t_fit:.1f}s")

    t0 = time.perf_counter()
    e = Rii(fine_quantizer=pq)
    e.add_configure(X, nlist=nlist, iter=5)
    t_build = time.perf_counter() - t0
    log(f"add_configure: {t_build:.1f}s (nlist={e.nlist}, L0={e.L0})")

    # ---- linear exact-ADC scan throughput (the headline) ----
    import jax
    import jax.numpy as jnp
    from jax import lax

    ids, dists = e.query_batch(queries, topk=topk, method="linear")  # warmup/compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        ids, dists = e.query_batch(queries, topk=topk, method="linear")
    dt_api = (time.perf_counter() - t0) / reps
    log(f"public-API latency (incl. host<->device transfers): "
        f"{dt_api*1e3:.2f} ms/batch, {dt_api/Q*1e3:.4f} ms/query")

    # Steady-state device-resident throughput: R back-to-back scans inside one
    # jit (continuous batching), one tiny D2H at the end. This is the number a
    # serving deployment sees; the tunneled dev backend adds ~20ms RTT per
    # python-level call that production TPUs don't have.
    dc = e._ensure_cache()
    from rii_tpu.ops.scan import linear_scan_topk

    # Dispatch/D2H overhead on the tunneled backend (~20-50ms, noisy) is removed
    # by DIFFERENCING two repetition counts of ONE jitted fori_loop with a
    # RUNTIME trip count (one compile, any R): the per-call constant cancels in
    # (t(R2) - t(R1)) / (R2 - R1), and R2 is auto-scaled until the difference
    # dwarfs tunnel jitter. The loop carry feeds back into the query (x * 1e-30)
    # so XLA can neither hoist the scan out of the loop nor CSE iterations.
    qd_bench = jnp.asarray(queries)

    rt = e.topk_recall
    if "decoded_t" in dc:
        from rii_tpu.ops.pallas_scan import replica_scan_topk_t

        def scan_once(qb, decoded_t, norms_rep):
            d, _ = replica_scan_topk_t(qb, decoded_t, norms_rep,
                                       topk=topk, recall_target=rt)
            return d[0, 0]

        args = (dc["decoded_t"], dc["norms_rep"])
    elif "decoded_flat" in dc:
        from rii_tpu.ops.pallas_scan import replica_scan_topk

        def scan_once(qb, decoded, norms):
            d, _ = replica_scan_topk(qb, decoded, norms[:, None],
                                     topk=topk, blk=min(8192, decoded.shape[0]),
                                     recall_target=rt)
            return d[0, 0]

        args = (dc["decoded_flat"], dc["norms_flat"])
    else:
        def scan_once(qb, codes, norms, codewords):
            d, _ = linear_scan_topk(qb, codes, norms, codewords,
                                    topk=topk, block=dc["block"],
                                    recall_target=rt)
            return d[0, 0]

        args = (dc["codes_flat"], dc["norms_flat"], dc["codewords"])

    @jax.jit
    def loop(reps, qb, *rest):
        def body(i, acc):
            return scan_once(qb + acc * 1e-30, *rest)
        return lax.fori_loop(0, reps, body, jnp.float32(0.0))

    def timed(reps):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(loop(jnp.int32(reps), qd_bench, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    _ = np.asarray(loop(jnp.int32(1), qd_bench, *args))  # compile once
    r1 = 4
    t_r1 = timed(r1)
    r2, t_r2 = r1, t_r1
    while t_r2 < t_r1 + 0.25 and r2 < 1 << 16:  # grow until diff >> jitter
        r2 *= 4
        t_r2 = timed(r2)
    dt = max(1e-9, (t_r2 - t_r1) / max(1, r2 - r1))
    log(f"timing: R1={r1} t1={t_r1*1e3:.1f}ms R2={r2} t2={t_r2*1e3:.1f}ms")
    ms_per_query = dt / Q * 1e3
    qps = Q / dt
    mode = ("bf16-T" if "decoded_t" in dc
            else "bf16" if "decoded_flat" in dc else dc["mode"])
    log(f"device-resident scan: {dt*1e3:.2f} ms/batch, {ms_per_query:.4f} ms/query, "
        f"{qps:.0f} QPS (mode={mode})")

    # ---- recall@1 vs exact f32 ground truth on a query subset ----
    nq_gt = min(Q, 128)
    gt = exact_nn_ids(X, queries[:nq_gt])
    recall1 = float((ids[:nq_gt, :1] == gt[:, None]).any(1).mean())
    recall10 = float((ids[:nq_gt] == gt[:, None]).any(1).mean())
    log(f"recall@1={recall1:.3f} recall@10={recall10:.3f} (PQ M={M}, exact-ADC scan)")

    # ---- ivf path latency + recall (reference-style L) ----
    L = 5000 if N >= 500_000 else e._multiple_of_L0_covering_topk(topk)
    qiv = queries[:64]
    ids_ivf = e.query_batch(qiv, topk=topk, L=L, method="ivf")[0]  # compile
    t0 = time.perf_counter()
    ids_ivf, _ = e.query_batch(qiv, topk=topk, L=L, method="ivf")
    t_ivf = (time.perf_counter() - t0) / len(qiv) * 1e3
    nq_iv = min(len(qiv), nq_gt)
    ivf_r1 = float((ids_ivf[:nq_iv, :1] == gt[:nq_iv, None]).any(1).mean())
    ivf_r10 = float((ids_ivf[:nq_iv] == gt[:nq_iv, None]).any(1).mean())
    log(f"ivf (L={L}): {t_ivf:.4f} ms/query incl dispatch, "
        f"recall@1={ivf_r1:.3f} recall@10={ivf_r10:.3f}")

    if "decoded_g" in dc:
        # device-resident union-bucket ivf (same differenced-loop methodology)
        from rii_tpu.ops.ivf import ivf_union_scan_topk

        wv = e._probe_width_virtual(L, None, dc)
        qiv_d = jnp.asarray(qiv)
        use_pallas_ivf = e._use_pallas_scan()

        @jax.jit
        def ivf_loop(reps, qb, dec_g, nrm_g, ord_g, cdec, cnrm):
            def body(i, acc):
                dd, _ = ivf_union_scan_topk(
                    qb + acc * 1e-30, dec_g, nrm_g, ord_g, cdec, cnrm,
                    w=wv, topk=topk, cap_u=dc["cap_v"],
                    nlist_pad=dc["nlist_v_pad"], recall_target=rt,
                    use_pallas=use_pallas_ivf)
                return dd[0, 0]
            return lax.fori_loop(0, reps, body, jnp.float32(0.0))

        ivf_args = (qiv_d, dc["decoded_g"], dc["norms_g"], dc["order_g"],
                    dc["centers_dec_v"], dc["centers_norms_v"])

        def ivf_timed(reps):
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(ivf_loop(jnp.int32(reps), *ivf_args))
                best = min(best, time.perf_counter() - t0)
            return best

        _ = np.asarray(ivf_loop(jnp.int32(1), *ivf_args))
        ti1 = ivf_timed(4)
        ri2, ti2 = 4, ti1
        while ti2 < ti1 + 0.25 and ri2 < 1 << 14:
            ri2 *= 4
            ti2 = ivf_timed(ri2)
        dt_ivf = max(1e-9, (ti2 - ti1) / max(1, ri2 - 4))
        log(f"ivf device-resident (L={L}, wv={wv}): "
            f"{dt_ivf/len(qiv)*1e6:.2f} us/query, {len(qiv)/dt_ivf:.0f} QPS")

    baseline_qps = 1.0 / 0.21e-3  # 0.21 ms/query, README.md:140
    print(json.dumps({
        "metric": "sift1m_linear_adc_qps_1chip",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / baseline_qps, 2),
    }))


if __name__ == "__main__":
    main()
