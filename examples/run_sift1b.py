"""SIFT1B benchmark runner (parity with /root/reference/examples/benchmark/run_sift1b.py).

Streams bvecs in batches (default 10M), caches the trained codec and the built
engine as checkpoints, then sweeps L = w * L0 reporting msec/query and
Recall@1. Reference config: M=8, 10M training vectors, nlist=sqrt(N).

Usage:
  python run_sift1b.py --data ~/sift1b [--n 1000000000] [--batch 10000000]
Expects bigann_base.bvecs, bigann_learn.bvecs, bigann_query.bvecs, gnd/idx_1000M.ivecs.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--n", type=int, default=10 ** 9)
    ap.add_argument("--nt", type=int, default=10 ** 7, help="training vectors")
    ap.add_argument("--batch", type=int, default=10 ** 7)
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--topk", type=int, default=1)
    ap.add_argument("--cache", default="./sift1b_cache")
    args = ap.parse_args()

    from rii_tpu import PQ, Rii
    from rii_tpu.utils.io import bvecs_read_batches, ivecs_read
    from rii_tpu.utils.recall import recall_at_r
    from rii_tpu.utils.serialization import save_index, load_index

    os.makedirs(args.cache, exist_ok=True)
    engine_path = os.path.join(args.cache, f"engine_M{args.M}_N{args.n}")

    if os.path.exists(os.path.join(engine_path, "manifest.json")):
        print("loading cached engine...")
        e = load_index(engine_path)
    else:
        # train codec on the learn set
        learn_iter = bvecs_read_batches(
            os.path.join(args.data, "bigann_learn.bvecs"), args.nt, count=args.nt)
        learn = next(learn_iter).astype(np.float32)
        print(f"training PQ(M={args.M}) on {len(learn)} vectors")
        codec = PQ(M=args.M, Ks=256).fit(learn, iter=10)
        e = Rii(fine_quantizer=codec)

        # stream the base set in batches; defer posting lists to one reconfigure
        t0 = time.perf_counter()
        for i, batch in enumerate(bvecs_read_batches(
                os.path.join(args.data, "bigann_base.bvecs"),
                args.batch, count=args.n)):
            e.add(batch.astype(np.float32), update_posting_lists=False)
            print(f"  ingested {e.N}/{args.n} ({time.perf_counter()-t0:.0f}s)")
        print("reconfigure (nlist=sqrt(N))...")
        e.reconfigure()
        save_index(e, engine_path)

    queries = next(bvecs_read_batches(
        os.path.join(args.data, "bigann_query.bvecs"), 10 ** 4)).astype(np.float32)
    gt = ivecs_read(os.path.join(args.data, "gnd", f"idx_{args.n//10**6}M.ivecs"))

    print(f"N={e.N} nlist={e.nlist} L0={e.L0}")
    for w in (1, 2, 4, 8):
        L = w * e.L0
        e.query_batch(queries[:32], topk=args.topk, L=L, method="ivf")  # compile
        t0 = time.perf_counter()
        ids, dists = e.query_batch(queries, topk=args.topk, L=L, method="ivf")
        dt = (time.perf_counter() - t0) / len(queries)
        r1 = recall_at_r(ids, gt[:, 0], 1)
        print(f"L={L} ({w}*L0): {dt*1e3:.3f} msec/query, Recall@1={r1:.4f}")


if __name__ == "__main__":
    main()
