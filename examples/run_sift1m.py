"""SIFT1M benchmark runner (parity with /root/reference/examples/benchmark/run_sift1m.py).

Reads SIFT1M fvecs/ivecs if present (pass --data ~/sift), otherwise generates a
synthetic clustered dataset of the same shape. Reports recall@1 and ms/query for
the linear and IVF paths at the reference's hyperparameters (nlist=1000, L=5000,
ann_methods.py:19-22) — at BASELINE.json's bit-width M=32, Ks=256.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_or_synthesize(data_dir, n, d, nq):
    from rii_tpu.utils.io import fvecs_read, ivecs_read

    base = os.path.join(data_dir or "", "sift_base.fvecs")
    if data_dir and os.path.exists(base):
        X = fvecs_read(base)
        Q = fvecs_read(os.path.join(data_dir, "sift_query.fvecs"))
        gt = ivecs_read(os.path.join(data_dir, "sift_groundtruth.ivecs"))
        return X, Q, gt[:, 0]
    print(f"(no dataset at {data_dir!r}; synthesizing clustered data)")
    rng = np.random.RandomState(0)
    centers = rng.random((256, d)).astype(np.float32) * 10
    X = (centers[rng.randint(0, 256, n)] + rng.normal(0, 1, (n, d))).astype(np.float32)
    Q = (X[rng.choice(n, nq, replace=False)] + rng.normal(0, 0.5, (nq, d))).astype(np.float32)
    # exact ground truth in blocks
    gt = np.empty(nq, dtype=np.int64)
    for s in range(0, nq, 64):
        qb = Q[s : s + 64]
        best_d = np.full(len(qb), np.inf)
        best_i = np.zeros(len(qb), dtype=np.int64)
        for t in range(0, n, 131072):
            xb = X[t : t + 131072]
            d2 = ((qb[:, None, :] - xb[None, :, :]) ** 2).sum(-1) if False else (
                (qb ** 2).sum(1)[:, None] - 2 * qb @ xb.T + (xb ** 2).sum(1)[None, :])
            j = d2.argmin(1)
            v = d2[np.arange(len(qb)), j]
            upd = v < best_d
            best_d[upd] = v[upd]
            best_i[upd] = t + j[upd]
        gt[s : s + 64] = best_i
    return X, Q, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="dir with sift_base.fvecs etc.")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--M", type=int, default=32)
    ap.add_argument("--Ks", type=int, default=256)
    ap.add_argument("--nlist", type=int, default=1000)
    ap.add_argument("--L", type=int, default=5000)
    ap.add_argument("--opq", action="store_true")
    args = ap.parse_args()

    from rii_tpu import PQ, OPQ, Rii
    from rii_tpu.utils.recall import recall_at_r

    X, Q, gt = load_or_synthesize(args.data, args.n, 128, args.nq)
    print(f"N={len(X)} D={X.shape[1]} nq={len(Q)}")

    codec_cls = OPQ if args.opq else PQ
    t0 = time.perf_counter()
    codec = codec_cls(M=args.M, Ks=args.Ks).fit(X[:100_000], iter=10)
    print(f"{codec_cls.__name__} fit: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    e = Rii(fine_quantizer=codec)
    e.add_configure(X, nlist=args.nlist)
    print(f"build: {time.perf_counter()-t0:.1f}s  nlist={e.nlist} L0={e.L0}")

    for method in ("linear", "ivf"):
        kw = dict(topk=10, method=method)
        if method == "ivf":
            kw["L"] = args.L
        ids, dists = e.query_batch(Q, **kw)  # compile
        t0 = time.perf_counter()
        ids, dists = e.query_batch(Q, **kw)
        dt = time.perf_counter() - t0
        r1 = recall_at_r(ids, gt, 1)
        r10 = recall_at_r(ids, gt, 10)
        print(f"{method:>6}: {dt/len(Q)*1e3:8.4f} ms/query  "
              f"recall@1={r1:.4f} recall@10={r10:.4f}")


if __name__ == "__main__":
    main()
