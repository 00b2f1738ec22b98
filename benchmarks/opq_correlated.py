#!/usr/bin/env python
"""OPQ-vs-PQ on correlated/anisotropic data — the data shape OPQ exists for.

Round-4 VERDICT item 6: every committed OPQ accuracy case so far was either
trivially easy (uniform data, recall 1.0 by construction) or near-isotropic
(clustered synthetic whose subspaces give the rotation nothing to exploit,
where OPQ lost the full-DB headline 0.319 vs 0.338). The reference's
contract is "slightly more accurate" (/root/reference/docs/source/
tutorial.rst:65-68) — which holds on data with CORRELATED DIMENSIONS
(SIFT/GIST-like). This study builds exactly that and commits the
OPQ > PQ full-DB row for OPQ.md.

Data model: cluster structure in a low-dimensional latent space pushed
through a random ANISOTROPIC linear map (decaying spectrum, dense random
basis): every output coordinate mixes many latents, so dimensions are
strongly correlated ACROSS PQ's fixed subspace boundaries and the variance
PQ sees per subspace is unbalanced in a basis PQ cannot choose. OPQ's
Procrustes alternation learns the rotation that re-balances it.

Reports, for PQ and OPQ at identical (M, Ks, fit budget):
- quantization MSE (the quantity OPQ's alternation minimizes),
- full-DB recall@1/@10 via the engine's exact-ADC linear scan (pure codec
  quality — no IVF probe effects),
- IVF recall@10 at L=5000 (the deployed operating point).

Env: BENCH_N (default 200k CPU / 1M accelerator), BENCH_Q (default 256),
BENCH_LATENT (default 24), BENCH_ALPHA spectrum decay (default 1.0).
Prints a markdown table to stdout; one JSON line per codec to stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_correlated(n, d, latent, alpha, seed=3):
    """Clustered latents -> anisotropic dense mix -> (n, d) f32.

    singular value i of the mixing map ~ (i+1)^-alpha: a few strong
    directions + a long tail, dense random basis (dims correlated across
    any fixed subspace split)."""
    rng = np.random.RandomState(seed)
    ncl = 256
    centers_z = rng.normal(0, 1, (ncl, latent)).astype(np.float32)
    which = rng.randint(0, ncl, n)
    z = centers_z[which] + 0.35 * rng.normal(0, 1, (n, latent)).astype(
        np.float32)
    # anisotropic map: U diag(s) V^T with random orthonormal U (latent x
    # latent) and V (d x latent), s decaying
    u, _ = np.linalg.qr(rng.normal(0, 1, (latent, latent)))
    v, _ = np.linalg.qr(rng.normal(0, 1, (d, latent)))
    s = (np.arange(1, latent + 1, dtype=np.float32)) ** (-alpha)
    amap = (u * s[None, :]) @ v.T  # (latent, d)
    x = z @ amap.astype(np.float32)
    x += 0.01 * rng.normal(0, 1, (n, d)).astype(np.float32)  # full-rank floor
    return x.astype(np.float32)


def main():
    import jax

    if os.environ.get("RII_CPU"):  # sitecustomize overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    on_accel = jax.default_backend() != "cpu"
    N = int(os.environ.get("BENCH_N", 1_000_000 if on_accel else 200_000))
    Q = int(os.environ.get("BENCH_Q", 256))
    latent = int(os.environ.get("BENCH_LATENT", 24))
    alpha = float(os.environ.get("BENCH_ALPHA", 1.0))
    D, M, Ks = 128, 32, 256
    nlist = 1000 if N >= 500_000 else max(32, int(np.sqrt(N)))
    L = 5000 if N >= 500_000 else N // 20
    log(f"N={N} D={D} M={M} Ks={Ks} latent={latent} alpha={alpha} "
        f"nlist={nlist} backend={jax.default_backend()}")

    X = make_correlated(N, D, latent, alpha)
    rng = np.random.RandomState(11)
    qidx = rng.choice(N, Q, replace=False)
    queries = (X[qidx] + 0.02 * rng.normal(0, 1, (Q, D))).astype(np.float32)

    from recall_parity import exact_topk_ids, recall  # same ground truth

    gt10 = exact_topk_ids(X, queries, 10)

    from rii_tpu import OPQ, PQ, Rii

    fit_rows = X[rng.choice(N, min(N, 100_000), replace=False)]
    rows = []
    for name, cls in (("PQ", PQ), ("OPQ", OPQ)):
        t0 = time.perf_counter()
        codec = cls(M=M, Ks=Ks).fit(fit_rows, iter=10)
        t_fit = time.perf_counter() - t0
        # quantization MSE on an independent sample (what OPQ minimizes)
        sample = X[rng.choice(N, 20_000, replace=False)]
        rec = codec.decode(codec.encode(sample))
        if name == "OPQ":
            rec = rec @ codec.rotation_matrix.T  # back to input space
        mse = float(np.mean((sample - rec) ** 2))
        e = Rii(codec)
        e.add_configure(X, nlist=nlist, iter=5)
        ids_lin, _ = e.query_batch(queries, topk=10, method="linear")
        ids_ivf, _ = e.query_batch(queries, topk=10, L=L, method="ivf")
        row = {
            "codec": name, "fit_s": round(t_fit, 1), "mse": round(mse, 6),
            "lin_r1": round(recall(ids_lin, gt10, 1), 4),
            "lin_r10": round(recall(ids_lin, gt10, 10), 4),
            "ivf_r10": round(recall(ids_ivf, gt10, 10), 4),
        }
        rows.append(row)
        log(json.dumps(row))

    print("# OPQ vs PQ on correlated-dimensions data\n")
    print(f"Config: low-rank anisotropic synthetic (latent={latent}, "
          f"spectrum (i+1)^-{alpha}, dense random basis), N={N}, D={D}, "
          f"M={M}, Ks={Ks}, nlist={nlist}, Q={Q}, L={L}, "
          f"backend={jax.default_backend()}. Ground truth: exact f32 top-10. "
          f"Linear = exact-ADC full scan (pure codec quality).\n")
    print("| codec | fit s | quantization MSE | linear recall@1 "
          "| linear recall@10 | IVF recall@10 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['codec']} | {r['fit_s']} | {r['mse']:.6f} | "
              f"{r['lin_r1']:.4f} | {r['lin_r10']:.4f} | "
              f"{r['ivf_r10']:.4f} |")
    pq_r, opq_r = rows[0], rows[1]
    print()
    print(f"OPQ/PQ MSE ratio: {opq_r['mse']/max(pq_r['mse'],1e-12):.3f}; "
          f"full-DB recall@10 delta: {opq_r['lin_r10']-pq_r['lin_r10']:+.4f} "
          f"(linear), {opq_r['ivf_r10']-pq_r['ivf_r10']:+.4f} (IVF).")


if __name__ == "__main__":
    main()
