"""QueryServer: continuous batching must return exactly what direct
query_batch returns, under concurrent submission."""

import threading

import numpy as np
import pytest

from rii_tpu import PQ, Rii
from rii_tpu.serving import QueryServer


@pytest.fixture(scope="module")
def engine():
    rng = np.random.RandomState(0)
    N, D = 4000, 32
    X = rng.random((N, D)).astype(np.float32)
    pq = PQ(M=4, Ks=32, verbose=False).fit(X[:1000], iter=3)
    e = Rii(pq)
    e.add_configure(X, nlist=60, iter=3)
    return e, X


def test_single_request_matches_direct(engine):
    e, X = engine
    with QueryServer(e) as srv:
        fut = srv.submit(X[3], topk=5)
        ids, dists = fut.result(timeout=60)
    ids_d, dists_d = e.query_batch(X[3:4], topk=5)
    np.testing.assert_array_equal(ids, ids_d)
    np.testing.assert_allclose(dists, dists_d, rtol=1e-6)


def test_concurrent_submissions_batch_and_match(engine):
    e, X = engine
    rng = np.random.RandomState(1)
    picks = rng.choice(e.N, 32, replace=False)
    direct_ids, _ = e.query_batch(np.ascontiguousarray(X[picks]), topk=5)

    results = {}
    with QueryServer(e, max_batch=64, max_wait_ms=20) as srv:
        futs = {}

        def submit(i):
            futs[i] = srv.submit(X[picks[i]], topk=5)

        threads = [threading.Thread(target=submit, args=(i,)) for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, f in futs.items():
            results[i] = f.result(timeout=60)

    for i in range(32):
        ids, dists = results[i]
        np.testing.assert_array_equal(ids[0], direct_ids[i])

    stats = srv.stats()
    assert stats["served"] == 32
    assert stats["p50_s"] is not None


def test_mixed_topk_groups(engine):
    e, X = engine
    with QueryServer(e, max_wait_ms=5) as srv:
        f1 = srv.submit(X[1], topk=3)
        f2 = srv.submit(X[2], topk=7)  # incompatible topk: separate dispatch
        i1, d1 = f1.result(timeout=60)
        i2, d2 = f2.result(timeout=60)
    assert i1.shape == (1, 3) and i2.shape == (1, 7)
    d1_ref, _ = e.query_batch(X[1:2], topk=3)
    d2_ref, _ = e.query_batch(X[2:3], topk=7)
    np.testing.assert_array_equal(i1, d1_ref)
    np.testing.assert_array_equal(i2, d2_ref)


def test_target_ids_request(engine):
    e, X = engine
    tids = np.arange(0, 2000, dtype=np.int64)
    with QueryServer(e) as srv:
        fut = srv.submit(X[5], topk=5, target_ids=tids)
        ids, _ = fut.result(timeout=60)
    assert set(ids[0].tolist()) <= set(tids.tolist())


def test_error_propagates(engine):
    e, X = engine
    with QueryServer(e) as srv:
        fut = srv.submit(X[0], topk=e.N + 1)  # invalid topk -> AssertionError
        with pytest.raises(AssertionError):
            fut.result(timeout=60)
