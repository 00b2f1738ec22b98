#!/usr/bin/env python
"""Validate + time the dup-skipping multi-window IVF kernel on hardware.

Checks the dup-skip path returns identical top-k scores to a dup-free union
of the same unique windows, then times it on the BENCH-config probe unions
(with their realistic duplicate fraction).

Round-3 measured history (N=1M, wv=64): the ORIGINAL per-window kernel
(dups re-fetched and scored into +inf) ran 21.8/21.5/8.2 us/q at Q=8/64/512;
dup-skip guards cut Q=64 (36% dups) to 15.4 us/q. A batched-epilogue variant
(VMEM score staging + one top-2 pass over all WPB windows) measured
uniformly SLOWER (32.8/29.0/13.4 us/q) despite skipping the same fetches —
the staging + big-array relayouts cost more than the per-op overhead they
save — and was removed.

Checks merged top-k equality (same distances after exact rescore) and times
both variants at Q in BENCH_QS with the BENCH-config probe unions (including
their realistic duplicate fraction).

Env: BENCH_N (1M), BENCH_QS ("8,64,512"), BENCH_L (5000).
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
    QS = [int(x) for x in os.environ.get("BENCH_QS", "8,64,512").split(",")]
    D, M, Ks = 128, 32, 256
    nlist = 1000 if N >= 500_000 else max(16, int(np.sqrt(N)))
    L = int(os.environ.get("BENCH_L", 5000 if N >= 500_000 else 500))
    topk = 10

    rng = np.random.RandomState(123)
    X = rng.random((N, D)).astype(np.float32)

    from rii_tpu import PQ, Rii
    from rii_tpu.ops.pallas_scan import ivf_window_tile_minima_multi

    t0 = time.perf_counter()
    pq = PQ(M=M, Ks=Ks).fit(X[:100_000], iter=5)
    e = Rii(pq)
    e.add_configure(X, nlist=nlist, iter=3)
    log(f"build: {time.perf_counter()-t0:.0f}s nlist={e.nlist}")
    dc = e._ensure_cache()
    assert "decoded_g" in dc
    cap_v, nlist_pad = dc["cap_v"], dc["nlist_v_pad"]

    for Q in QS:
        queries = (X[rng.choice(N, Q, replace=False)]
                   + rng.normal(0, 0.01, (Q, D))).astype(np.float32)
        qd = jnp.asarray(queries)
        wv = e._probe_width_virtual(L, None, dc)
        wpb = max(1, min(32, (1 << 22) // max(1, (cap_v // 4) * Q * 8)))

        # production-identical probe union (sorted, dup-flagged)
        cdec = np.asarray(dc["centers_dec_v"], np.float32)
        cnrm = np.asarray(dc["centers_norms_v"], np.float32)
        cs = cnrm[None, :] - 2.0 * queries @ cdec.T
        if Q * wv >= nlist_pad:
            flat_np = np.arange(nlist_pad, dtype=np.int32)
        else:
            pr = np.argsort(cs, axis=1)[:, :wv].astype(np.int32).reshape(-1)
            flat_np = np.sort(pr)
        dup_np = np.zeros(len(flat_np), np.int32)
        dup_np[1:] = (flat_np[1:] == flat_np[:-1]).astype(np.int32)
        pad = -(-len(flat_np) // wpb) * wpb - len(flat_np)
        flat_np = np.pad(flat_np, (0, pad))
        dup_np = np.pad(dup_np, (0, pad), constant_values=1)
        dup_frac = dup_np.mean()
        u = len(flat_np)
        fl = jnp.asarray(flat_np)
        dp = jnp.asarray(dup_np)
        log(f"--- Q={Q} wv={wv} u={u} dup_frac={dup_frac:.2f} wpb={wpb}")

        # correctness vs a dup-free reference union (same unique windows):
        # the dup-skip path must return the same top-k scores
        uniq = np.unique(flat_np)
        upad2 = -(-len(uniq) // wpb) * wpb
        fl_ref = jnp.asarray(np.pad(uniq, (0, upad2 - len(uniq))))
        dp_ref = jnp.asarray(np.pad(np.zeros(len(uniq), np.int32),
                                    (0, upad2 - len(uniq)),
                                    constant_values=1))

        def run(fl_, dp_):
            vmin, amin = ivf_window_tile_minima_multi(
                qd, dc["decoded_g"], fl_, dp_, cap_v=cap_v, wpb=wpb)
            neg, pos = lax.top_k(-vmin, topk)
            slot = jnp.take_along_axis(amin, pos, axis=1)
            return np.asarray(neg), np.asarray(slot)

        n1, s1 = run(fl, dp)
        n2, s2 = run(fl_ref, dp_ref)
        np.testing.assert_allclose(n1, n2, rtol=1e-6, atol=1e-6,
                                   err_msg=f"Q={Q} top-k scores diverge")
        same = np.mean([len(set(a) & set(b)) / topk for a, b in zip(s1, s2)])
        log(f"topk slot agreement vs dup-free union: {same:.4f}")
        assert same > 0.97, "dup-skip returns different candidates"

        def once(acc, qd_, dec_g, fl_, dp_):
            vmin, _ = ivf_window_tile_minima_multi(
                qd_ + acc * 1e-30, dec_g, fl_, dp_, cap_v=cap_v, wpb=wpb)
            return vmin[0, 0]

        dt = timed_loop(once, (qd, dc["decoded_g"], fl, dp))
        log(f"dup-skip: {dt*1e3:7.3f} ms/batch  {dt/Q*1e6:7.2f} us/q  "
            f"({u*(1-dup_frac)*cap_v*D*2/dt/1e9:.0f} GB/s unique fetch)")


if __name__ == "__main__":
    main()
