"""ShardedRii end-to-end tests on the virtual 8-device mesh."""

import numpy as np

from rii_tpu import PQ, OPQ, Rii
from rii_tpu.parallel import ShardedRii, make_mesh


def _engine(n=3000, d=32, codec_cls=PQ):
    X = np.random.RandomState(9).random((n, d)).astype(np.float32)
    kw = {"rotation_iter": 2} if codec_cls is OPQ else {}
    e = Rii(fine_quantizer=codec_cls(M=4, Ks=32).fit(X, **kw))
    e.add_configure(X, nlist=30)
    return e, X


def test_sharded_rii_matches_engine():
    e, X = _engine()
    s = ShardedRii(e)
    q = X[:16]
    ids_s, d_s = s.query_batch(q, topk=7)
    ids_e, d_e = e.query_batch(q, topk=7, method="linear")
    np.testing.assert_allclose(d_s, d_e, rtol=1e-3, atol=1e-3)
    assert (ids_s == ids_e).mean() > 0.97  # ties only


def test_sharded_rii_opq():
    e, X = _engine(codec_cls=OPQ)
    s = ShardedRii(e)
    ids_s, _ = s.query_batch(X[:4], topk=5)
    ids_e, _ = e.query_batch(X[:4], topk=5, method="linear")
    assert (ids_s == ids_e).mean() > 0.9


def test_sharded_rii_decoded_replica():
    e, X = _engine()
    s = ShardedRii(e, use_decoded=True)
    assert s.decoded is not None
    ids_s, d_s = s.query_batch(X[:8], topk=5)
    ids_e, d_e = e.query_batch(X[:8], topk=5, method="linear")
    # bf16 replica: distances close, ids mostly identical
    np.testing.assert_allclose(d_s, d_e, rtol=5e-2, atol=5e-2)
    assert (ids_s == ids_e).mean() > 0.8


def test_sharded_rii_deep1b_shape():
    """BASELINE config 5 shape (Deep1B: D=96), scaled down, on the 8-dev mesh."""
    X = np.random.RandomState(13).random((4096, 96)).astype(np.float32)
    e = Rii(fine_quantizer=PQ(M=24, Ks=64).fit(X[:2000]))
    e.add_configure(X, nlist=64)
    s = ShardedRii(e)
    ids_s, d_s = s.query_batch(X[:8], topk=10)
    ids_e, d_e = e.query_batch(X[:8], topk=10, method="linear")
    np.testing.assert_allclose(d_s, d_e, rtol=1e-3, atol=1e-3)
    assert (ids_s == ids_e).mean() > 0.95
    assert ids_s[0, 0] == 0


def test_sharded_rii_small_mesh():
    e, X = _engine(n=500)
    s = ShardedRii(e, mesh=make_mesh(2))
    ids_s, _ = s.query_batch(X[:4], topk=3)
    ids_e, _ = e.query_batch(X[:4], topk=3, method="linear")
    assert (ids_s == ids_e).mean() > 0.9
