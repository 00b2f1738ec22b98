"""End-to-end exhausted-probe contract through the PUBLIC query API.

The reference may return FEWER than topk results when the candidate walk
exhausts (/root/reference/src/rii.h:324-325). rii-tpu's documented superset
divergence (PARITY.md): when probing finds fewer than topk eligible
candidates it widens to full coverage, and only a genuine shortage of
eligible candidates (fewer than topk DISTINCT eligible ids) produces the
padded contract — ids == -1, dists == +inf, trailing.
"""

import numpy as np
import pytest

from rii_tpu import PQ, Rii


@pytest.fixture(scope="module")
def engine():
    rng = np.random.RandomState(77)
    d = 32
    # 30 well-separated clusters; queries will sit in cluster 0
    centers = 8 * rng.normal(0, 1, (30, d)).astype(np.float32)
    assign = rng.randint(0, 30, 6000)
    X = centers[assign] + 0.1 * rng.normal(0, 1, (6000, d)).astype(np.float32)
    X = np.ascontiguousarray(X, np.float32)
    pq = PQ(M=4, Ks=64).fit(X[rng.choice(6000, 2000, replace=False)], iter=4)
    e = Rii(pq)
    e.add_configure(X, nlist=30, iter=4)
    far = np.argsort(((centers - centers[0]) ** 2).sum(1))[-1]
    return e, X, assign, int(far)


def test_widen_to_full_finds_far_subset(engine):
    """A tiny subset living entirely in the FARTHEST cluster: narrow probing
    finds none of it, so the engine widens to full coverage and still returns
    topk valid members (the reference would return an empty/short result)."""
    e, X, assign, far = engine
    far_ids = np.nonzero(assign == far)[0][:40].astype(np.int64)
    q = X[np.nonzero(assign == 0)[0][0]]  # query in cluster 0
    ids, dists = e.query(q, topk=10, L=e.L0, target_ids=far_ids,
                         method="ivf")
    assert ids.shape == (10,)
    assert (ids >= 0).all(), "widen-to-full must fill all topk"
    assert set(ids.tolist()) <= set(far_ids.tolist())
    assert np.isfinite(dists).all()
    assert (np.diff(dists) >= -1e-9).all()


def test_padded_contract_when_eligible_distinct_lt_topk(engine):
    """Fewer DISTINCT eligible ids than topk: the result is padded with
    ids == -1 / dists == +inf in the trailing positions — the rii-tpu
    re-expression of the reference's may-return-fewer contract
    (src/rii.h:324-325), pinned end-to-end through query()/query_batch().

    Subsets small enough for the gather path keep the reference's duplicate
    semantics instead (see test below); the padded contract applies on the
    MASK paths, entered when len(target_ids) exceeds the gather threshold —
    here a degenerate subset of 6 distinct ids tiled to 6000 entries."""
    e, X, assign, far = engine
    base = np.nonzero(assign == far)[0][:6].astype(np.int64)
    tids = np.tile(base, 1000)  # len 6000 >> 4096: mask path; 6 distinct
    for method in ("linear", "ivf"):
        ids, dists = e.query(X[0], topk=10, L=e.L0, target_ids=tids,
                             method=method)
        assert ids.shape == (10,)
        valid = ids >= 0
        assert valid.sum() == 6, method
        assert valid[:6].all() and not valid[6:].any(), \
            f"padding must trail ({method})"
        assert np.isinf(dists[6:]).all()
        assert set(ids[:6].tolist()) == set(base.tolist())

    # batched entry: same contract per row (the ivf request exhausts its
    # probes, widens to full, and STILL finds only 6 eligible -> -1 pad)
    ids_b, dists_b = e.query_batch(X[:3], topk=10, L=e.L0, target_ids=tids,
                                   method="ivf")
    assert ids_b.shape == (3, 10)
    assert (ids_b[:, 6:] == -1).all()
    assert np.isinf(dists_b[:, 6:]).all()
    for row in ids_b:
        assert set(row[row >= 0].tolist()) == set(base.tolist())


def test_linear_subset_duplicates_reference_parity(engine):
    """The LINEAR subset path keeps the reference's duplicate semantics
    (duplicate target_ids can yield duplicate rows — documented parity)."""
    e, X, assign, far = engine
    base = np.nonzero(assign == far)[0][:6].astype(np.int64)
    tids = np.concatenate([base, base])
    ids, dists = e.query(X[0], topk=10, target_ids=tids, method="linear")
    assert ids.shape == (10,)
    # every returned id is eligible; duplicates allowed on this path
    assert set(ids[ids >= 0].tolist()) <= set(base.tolist())
