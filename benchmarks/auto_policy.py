#!/usr/bin/env python
"""Validate the auto linear-vs-IVF selection policy on hardware.

The reference calibrates its threshold by timing both methods at reconfigure
(/root/reference/rii/rii.py:149-150,403-486); rii-tpu defaults to an analytic
cost model (rii.py::_use_linear + _analytic_threshold) to avoid paying tens of
remote compiles per reconfigure. This harness measures the REAL crossover on
the current device across a (|S|, L) grid and reports, for every cell, the
latency of linear, ivf, and what `auto` picked — the policy passes when
auto <= slack * min(linear, ivf) everywhere.

Writes a markdown table to stdout (redirect into AUTO_POLICY.md to commit).
Env: BENCH_N (default 1M on accelerator), BENCH_Q (batch size, default 64).
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
    if os.environ.get("RII_CPU"):  # sitecustomize overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    on_accel = jax.default_backend() != "cpu"
    N = int(os.environ.get("BENCH_N", 1_000_000 if on_accel else 100_000))
    Q = int(os.environ.get("BENCH_Q", 64))
    SLACK = 1.2
    D, M, Ks = 128, 32, 256
    nlist = int(os.environ.get(
        "BENCH_NLIST", 1000 if N >= 500_000 else max(32, int(np.sqrt(N)))))
    log(f"N={N} Q={Q} nlist={nlist} backend={jax.default_backend()}")

    rng = np.random.RandomState(123)
    X = rng.random((N, D)).astype(np.float32)
    queries = X[rng.choice(N, Q, replace=False)] \
        + 0.01 * rng.normal(0, 1, (Q, D)).astype(np.float32)
    queries = queries.astype(np.float32)

    from rii_tpu import PQ, Rii
    pq = PQ(M=M, Ks=Ks).fit(X[:100_000], iter=8)
    e = Rii(pq)
    e.add_configure(X, nlist=nlist, iter=5)

    def timed(method, L, tids):
        kw = {} if tids is None else {"target_ids": tids}
        e.query_batch(queries, topk=10, L=L, method=method, **kw)  # compile
        best = np.inf
        for _ in range(5):  # best-of-5: tunneled dispatch jitter is tens of ms
            t0 = time.perf_counter()
            e.query_batch(queries, topk=10, L=L, method=method, **kw)
            best = min(best, time.perf_counter() - t0)
        return best / Q * 1e3  # ms/query

    sizes = []
    s = 1 << 12
    while s < N:
        sizes.append(s)
        s *= 4
    sizes.append(N)

    # reference-style TIMED calibration (VERDICT r3 item 9): fit the
    # threshold poly by measuring real crossovers, then compare its
    # decisions against the analytic default on the same grid
    from rii_tpu.rii import estimate_best_threshold_function
    thr_analytic = e.threshold
    t0 = time.perf_counter()
    probes = e.fine_quantizer.decode(e.codes[:100])
    thr_calib = estimate_best_threshold_function(e, probes)
    log(f"calibration sweep: {time.perf_counter()-t0:.0f}s; "
        f"analytic={thr_analytic} calibrated={thr_calib}")

    rows, violations = [], 0
    for L in (1000, 5000):
        if L > N:
            continue
        for S in sizes:
            if S < 10:
                continue
            tids = None if S == N else np.sort(
                rng.choice(N, S, replace=False)).astype(np.int64)
            t_lin = timed("linear", L, tids)
            t_ivf = timed("ivf", L, tids)
            t_auto = timed("auto", L, tids)
            pick = "linear" if e._use_linear(S, L, qn=Q) else "ivf"
            pick_cal = "linear" if S <= thr_calib(L) else "ivf"
            best = min(t_lin, t_ivf)
            # jitter floor: per-dispatch tunnel RTT variance alone reaches
            # ~0.2 ms/query at Q=64 on the dev backend
            ok = t_auto <= SLACK * best + 0.2
            violations += 0 if ok else 1
            row = dict(L=L, S=S, linear=t_lin, ivf=t_ivf, auto=t_auto,
                       pick=pick, pick_cal=pick_cal, ok=ok)
            rows.append(row)
            log(row)

    print("# Auto method-selection policy validation\n")
    print(f"Config: N={N}, D={D}, M={M}, Ks={Ks}, nlist={e.nlist}, batch "
          f"Q={Q}, backend={jax.default_backend()}; pass criterion: "
          f"auto <= {SLACK}x min(linear, ivf) + 0.2 ms/query jitter floor "
          f"(tunneled-dispatch RTT variance). Latencies are ms/query "
          f"including dispatch, best of 5.\n")
    print("| L | \\|S\\| | linear | ivf | auto (picked) | calibrated pick "
          "| measured best | ok |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        meas = "linear" if r["linear"] <= r["ivf"] else "ivf"
        print(f"| {r['L']} | {r['S']} | {r['linear']:.3f} | {r['ivf']:.3f} "
              f"| {r['auto']:.3f} ({r['pick']}) | {r['pick_cal']} | {meas} | "
              f"{'yes' if r['ok'] else 'NO'} |")
    print(f"\nViolations: {violations} / {len(rows)}.")
    agree = sum(r["pick"] == r["pick_cal"] for r in rows)
    print(f"Calibrated-vs-analytic decision agreement: {agree} / {len(rows)} "
          f"grid cells.")
    print(f"Analytic threshold: `{thr_analytic}`; timed-calibration fit: "
          f"`{thr_calib}`.")
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
