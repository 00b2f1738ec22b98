"""Queries racing mutations must be safe.

The incremental add path (Rii._apply_add_to_cache) scatters into the live
device cache with DONATED buffers; without the engine's reader-writer lock a
concurrent query_batch could dereference a deleted array or observe a
half-updated cache. The reference engine is not thread-safe at all
(/root/reference/src/rii.h mutates postings in place), so this is a
documented superset: readers are concurrent, mutations exclusive.
"""

import threading

import numpy as np
import pytest

from rii_tpu import PQ, Rii


@pytest.fixture(scope="module")
def base():
    rng = np.random.RandomState(7)
    N, D = 3000, 32
    X = rng.random((N + 2000, D)).astype(np.float32)
    pq = PQ(M=4, Ks=32, verbose=False).fit(X[:1000], iter=3)
    return pq, X, N


def test_queries_race_incremental_adds(base):
    pq, X, N = base
    e = Rii(pq)
    e.add_configure(X[:N], nlist=50, iter=3)
    # warm the device cache + jit entries once, single-threaded
    e.query_batch(X[:8], topk=5)

    errors = []
    stop = threading.Event()

    def reader():
        rng = np.random.RandomState(threading.get_ident() % 2**31)
        try:
            while not stop.is_set():
                q = np.ascontiguousarray(X[rng.randint(0, N, size=4)])
                ids, dists = e.query_batch(q, topk=5)
                # ids must always index live rows; dists finite ascending
                assert ids.shape == (4, 5)
                assert (ids >= 0).all() and (ids < e.N).all()
                assert np.isfinite(dists).all()
                assert (np.diff(dists, axis=1) >= -1e-5).all()
        except Exception as exc:  # noqa: BLE001 - surfaced to main thread
            errors.append(exc)

    readers = [threading.Thread(target=reader) for _ in range(4)]
    for t in readers:
        t.start()
    try:
        # 8 incremental adds of 250 rows each, racing the readers
        for i in range(8):
            lo = N + 250 * i
            e.add(X[lo:lo + 250])
    finally:
        stop.set()
        for t in readers:
            t.join(timeout=60)
    assert not errors, errors
    assert e.N == N + 2000

    # post-race state must be identical to a clean rebuild
    ref = Rii(pq)
    ref.add(X[:N], update_posting_lists=False)
    ref.reconfigure(nlist=50, iter=3)
    ref.add(X[N:N + 2000])
    q = np.ascontiguousarray(X[100:116])
    ids_a, dists_a = e.query_batch(q, topk=10)
    ids_b, dists_b = ref.query_batch(q, topk=10)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(dists_a, dists_b, rtol=1e-6)


def test_reconfigure_excludes_readers(base):
    pq, X, N = base
    e = Rii(pq)
    e.add_configure(X[:N], nlist=50, iter=3)
    e.query_batch(X[:8], topk=5)

    errors = []
    done = threading.Event()

    def reader():
        try:
            while not done.is_set():
                ids, dists = e.query_batch(
                    np.ascontiguousarray(X[:4]), topk=3)
                assert (ids >= 0).all() and np.isfinite(dists).all()
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        e.reconfigure(nlist=64, iter=2)
        e.clear()
        e.add(X[:N], update_posting_lists=False)
        e.reconfigure(nlist=50, iter=3)
    finally:
        done.set()
        for t in threads:
            t.join(timeout=60)
    # readers may observe the transient N==0 state as an assertion error
    # ("No codes to be searched") — that is the documented contract; what
    # must never happen is a crash from a deleted/donated device buffer.
    for exc in errors:
        assert isinstance(exc, AssertionError), exc


def test_sharded_queries_race_delta_adds(base):
    """ShardedRii: concurrent query_batch against O(batch) delta adds (the
    donated sharded scatters) must stay valid and end bit-identical to a
    fresh wrapper over the same host state."""
    from rii_tpu.parallel import ShardedRii

    pq, X, N = base
    e = Rii(pq)
    e.add_configure(X[:N], nlist=50, iter=3)
    sr = ShardedRii(e)
    sr.query_batch(np.ascontiguousarray(X[:8]), topk=5)  # warm

    errors = []
    stop = threading.Event()

    def reader():
        rng = np.random.RandomState(threading.get_ident() % 2**31)
        try:
            while not stop.is_set():
                q = np.ascontiguousarray(X[rng.randint(0, N, size=4)])
                ids, dists = sr.query_batch(q, topk=5)
                assert (ids >= 0).all() and (ids < e.N).all()
                assert np.isfinite(dists).all()
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    readers = [threading.Thread(target=reader) for _ in range(3)]
    for t in readers:
        t.start()
    try:
        for i in range(6):
            lo = N + 250 * i
            sr.add(X[lo:lo + 250])
    finally:
        stop.set()
        for t in readers:
            t.join(timeout=60)
    assert not errors, errors
    assert sr._n_dev == N + 1500

    ref = ShardedRii(e)  # fresh wrapper over the SAME mutated engine
    q = np.ascontiguousarray(X[50:66])
    ids_a, d_a = sr.query_batch(q, topk=10)
    ids_b, d_b = ref.query_batch(q, topk=10)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6)


def test_sharded_stale_view_self_heals(base):
    """Mutating the wrapped engine directly leaves the sharded view stale;
    the next wrapper add must detect it (n0 != _n_dev) and refresh rather
    than scatter past the hole."""
    from rii_tpu.parallel import ShardedRii

    pq, X, N = base
    e = Rii(pq)
    e.add_configure(X[:N], nlist=50, iter=3)
    sr = ShardedRii(e)
    e.add(X[N:N + 300])          # direct engine mutation: sr now stale
    sr.add(X[N + 300:N + 500])   # wrapper add must repair via refresh
    assert sr._n_dev == e.N == N + 500
    qn = np.ascontiguousarray(X[N:N + 4])
    ids, _ = sr.query_batch(qn, topk=1)
    assert (ids[:, 0] >= N).all()  # the direct-add rows are searchable
