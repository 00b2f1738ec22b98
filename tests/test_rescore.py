"""Exact-f32 rescore epilogue on the default bf16 tiers (round-5 VERDICT
item 4: the int8 tiers' overfetch + exact re-rank, ported to bf16 linear
and union IVF behind ``Rii.exact_rescore``).

The contract under test: with the rescore on, every RETURNED distance
equals the exact ADC distance of the returned id — ADC(q, c) ==
||q - decode(c)||^2 computed in f64 from the codes — at f32 tolerance,
even though candidate SELECTION ran in bf16. Without it, returned
distances carry the documented bf16 cross-term class (~0.4%)."""

import numpy as np
import pytest

from rii_tpu import PQ, Rii
from rii_tpu.utils.oracle import adc_np, dtable_np


@pytest.fixture(scope="module")
def engine():
    rng = np.random.RandomState(5)
    N, D = 6000, 64
    X = rng.random((N, D)).astype(np.float32)
    pq = PQ(M=8, Ks=64, verbose=False).fit(X[:2000], iter=3)
    e = Rii(pq)
    e.scan_mode = "bf16"  # the default-tier path under test
    e.add_configure(X, nlist=40, iter=3)
    q = (X[:12] + 0.01 * rng.normal(0, 1, (12, D))).astype(np.float32)
    return e, q


def _oracle_dists(e, q, ids):
    dt = dtable_np(q, e.codewords)
    codes = e.codes
    return np.array([adc_np(dt, codes[i:i + 1])[0] if i >= 0 else np.inf
                     for i in ids])


@pytest.mark.parametrize("method,kw", [("linear", {}), ("ivf", {"L": 600})])
def test_rescored_distances_are_exact_adc(engine, method, kw):
    e, q = engine
    e.exact_rescore = True
    try:
        ids, dists = e.query_batch(q, topk=8, method=method, **kw)
    finally:
        e.exact_rescore = "auto"
    for i in range(len(q)):
        ref = _oracle_dists(e, q[i], ids[i])
        valid = ids[i] >= 0
        np.testing.assert_allclose(dists[i][valid], ref[valid],
                                   rtol=2e-5, atol=1e-5)


def test_rescore_auto_matches_forced_at_small_q(engine):
    """auto == on below the big-Q crossover: same ids AND same (exact)
    distances as forced True for a small batch."""
    e, q = engine
    e.exact_rescore = "auto"
    ids_a, d_a = e.query_batch(q, topk=8, method="linear")
    e.exact_rescore = True
    try:
        ids_t, d_t = e.query_batch(q, topk=8, method="linear")
    finally:
        e.exact_rescore = "auto"
    np.testing.assert_array_equal(ids_a, ids_t)
    np.testing.assert_allclose(d_a, d_t, rtol=1e-6)


def test_rescore_off_keeps_bf16_class(engine):
    """False disables the epilogue: distances may deviate from exact ADC at
    the bf16 class but never beyond it, and top-1 is stable."""
    e, q = engine
    e.exact_rescore = False
    try:
        ids, dists = e.query_batch(q, topk=8, method="linear")
    finally:
        e.exact_rescore = "auto"
    for i in range(len(q)):
        ref = _oracle_dists(e, q[i], ids[i])
        valid = ids[i] >= 0
        # bf16 inputs round at ~2^-8 per element; the accumulated cross-term
        # deviation on these shapes measures up to ~0.8% relative
        np.testing.assert_allclose(dists[i][valid], ref[valid],
                                   rtol=2e-2, atol=2e-3)


def test_rescore_subset_excludes_and_is_exact(engine):
    """The rescore reads the masked norms stream, so subset exclusion
    survives the re-rank; distances stay exact ADC."""
    e, q = engine
    rng = np.random.RandomState(7)
    tids = np.sort(rng.choice(e.N, 5000, replace=False)).astype(np.int64)
    tset = set(tids.tolist())
    e.exact_rescore = True
    try:
        ids, dists = e.query_batch(q, topk=8, method="linear",
                                   target_ids=tids)
    finally:
        e.exact_rescore = "auto"
    for i in range(len(q)):
        valid = ids[i] >= 0
        assert set(ids[i][valid].tolist()) <= tset
        ref = _oracle_dists(e, q[i], ids[i])
        np.testing.assert_allclose(dists[i][valid], ref[valid],
                                   rtol=2e-5, atol=1e-5)


def test_rescore_improves_or_matches_recall(engine):
    """The overfetch + exact re-rank can only improve top-k agreement with
    the exact f32 ground truth (selection pool is a superset of the
    returned set either way)."""
    e, q = engine
    # exact ground truth via the oracle on all N
    gt = []
    codes = e.codes
    for i in range(len(q)):
        d = adc_np(dtable_np(q[i], e.codewords), codes)
        gt.append(np.argsort(d, kind="stable")[:8])
    e.exact_rescore = False
    ids_off, _ = e.query_batch(q, topk=8, method="linear")
    e.exact_rescore = True
    try:
        ids_on, _ = e.query_batch(q, topk=8, method="linear")
    finally:
        e.exact_rescore = "auto"

    def overlap(a, b):
        return np.mean([len(set(x.tolist()) & set(y.tolist())) / 8
                        for x, y in zip(a, b)])

    assert overlap(ids_on, gt) >= overlap(ids_off, gt) - 1e-9
