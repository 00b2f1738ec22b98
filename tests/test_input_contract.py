"""Strict input-dtype contract (reference parity: the pybind binding's
``.noconvert()`` REJECTS wrong-dtype arrays instead of casting,
/root/reference/src/main.cpp:18-26). A silent f64->f32 cast would change
results for a user porting reference code, so every public query/ingest
entry point — Rii, ShardedRii, QueryServer — raises TypeError on a
wrong-dtype array:

- queries must be float32
- target_ids must be int64 (and an ndarray)
- add_codes codes must be uint8
- add vecs must be float32 (AssertionError: the reference checks this at
  the PYTHON layer, /root/reference/rii/rii.py add/fit asserts)
"""

import numpy as np
import pytest

from rii_tpu import PQ, Rii
from rii_tpu.parallel import ShardedRii
from rii_tpu.serving import QueryServer


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(7)
    X = rng.random((1500, 32)).astype(np.float32)
    e = Rii(fine_quantizer=PQ(M=4, Ks=32).fit(X[:500], iter=3))
    e.add_configure(X, nlist=24, iter=3)
    return e, X


def test_rii_query_rejects_f64(built):
    e, X = built
    with pytest.raises(TypeError, match="float32"):
        e.query(X[0].astype(np.float64), topk=3)
    with pytest.raises(TypeError, match="float32"):
        e.query_batch(X[:4].astype(np.float64), topk=3)
    # a plain Python list is f64 after asarray: rejected too (the reference
    # binding accepts only ready-made f32 arrays)
    with pytest.raises(TypeError, match="float32"):
        e.query(X[0].tolist(), topk=3)


def test_rii_low_level_entries_reject_f64(built):
    e, X = built
    with pytest.raises(TypeError, match="float32"):
        e.query_linear(X[0].astype(np.float64), topk=3)
    with pytest.raises(TypeError, match="float32"):
        e.query_ivf(X[0].astype(np.float64), topk=3,
                    target_ids=None, L=500)


def test_rii_target_ids_reject_non_int64(built):
    e, X = built
    with pytest.raises(TypeError, match="int64"):
        e.query(X[0], topk=3, target_ids=np.arange(100, dtype=np.int32))
    with pytest.raises(AssertionError):
        e.query(X[0], topk=3, target_ids=list(range(100)))  # not an ndarray
    with pytest.raises(TypeError, match="int64"):
        e.query_linear(X[0], topk=3,
                       target_ids=np.arange(100, dtype=np.uint32))


def test_rii_ingest_contracts(built):
    e, X = built
    with pytest.raises(AssertionError):
        e.add(X[:4].astype(np.float64))
    with pytest.raises(TypeError, match="uint8"):
        e.add_codes(np.zeros((4, e.M), dtype=np.int32))


def test_sharded_contracts(built):
    e, X = built
    sr = ShardedRii(e)
    with pytest.raises(TypeError, match="float32"):
        sr.query_batch(X[:4].astype(np.float64), topk=3)
    with pytest.raises(TypeError, match="int64"):
        sr.query_batch(X[:4], topk=3,
                       target_ids=np.arange(100, dtype=np.int32))
    with pytest.raises(AssertionError):
        sr.add(X[:4].astype(np.float64))


def test_server_contracts(built):
    e, X = built
    with QueryServer(e, max_wait_ms=1) as srv:
        with pytest.raises(TypeError, match="float32"):
            srv.submit(X[0].astype(np.float64), topk=3)
        with pytest.raises(TypeError, match="int64"):
            srv.submit(X[0], topk=3,
                       target_ids=np.arange(100, dtype=np.int32))
        # valid dtypes still served
        ids, _ = srv.submit(X[0], topk=3).result(timeout=30)
        assert ids.shape == (3,)
