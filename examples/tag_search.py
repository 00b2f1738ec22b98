"""Subset (tag) search example — the canonical target_ids workload
(parity with /root/reference/examples/tag_search/simple_tag_search.ipynb).

Items carry tags; a tag filter produces target_ids; the ANN query runs only
over that subset, efficient at any subset size via the auto linear/ivf policy.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rii_tpu import PQ, Rii  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    N, D = 100_000, 128
    tags = ["cat", "dog", "bird", "fish", "lizard"]

    X = rng.random((N, D)).astype(np.float32)
    item_tags = rng.randint(0, len(tags), N)

    e = Rii(fine_quantizer=PQ(M=32, Ks=256).fit(X[:20_000]))
    e.add_configure(vecs=X)
    print(f"indexed N={e.N}, nlist={e.nlist}")

    q = X[42]
    for tag_id, tag in enumerate(tags[:3]):
        target_ids = np.where(item_tags == tag_id)[0].astype(np.int64)
        ids, dists = e.query(q=q, topk=5, target_ids=target_ids)
        ok = np.isin(ids, target_ids).all()
        print(f"tag={tag:>6} |S|={len(target_ids):>6}: top-5 ids {ids} "
              f"(all tagged: {ok})")

    # tiny subsets work too (the reference's headline feature: efficient at ANY size)
    tiny = rng.choice(N, 20, replace=False).astype(np.int64)
    ids, dists = e.query(q=q, topk=3, target_ids=tiny)
    print(f"|S|=20: {ids} (subset of targets: {np.isin(ids, tiny).all()})")


if __name__ == "__main__":
    main()
