"""Directory checkpoint save/load round-trip tests."""

import numpy as np

from rii_tpu import PQ, OPQ, Rii
from rii_tpu.utils.serialization import save_index, load_index


def _data(n=1000, d=40, seed=123):
    return np.random.RandomState(seed).random((n, d)).astype(np.float32)


def test_save_load_roundtrip(tmp_path):
    X = _data()
    e1 = Rii(fine_quantizer=PQ(M=4, Ks=20).fit(X))
    e1.add_configure(vecs=X, nlist=20)
    save_index(e1, str(tmp_path / "idx"))
    e2 = load_index(str(tmp_path / "idx"))
    assert (e1.M, e1.Ks, e1.N, e1.nlist) == (e2.M, e2.Ks, e2.N, e2.nlist)
    np.testing.assert_array_equal(e1.codes, e2.codes)
    np.testing.assert_array_equal(e1.coarse_centers, e2.coarse_centers)
    assert e1.posting_lists == e2.posting_lists
    np.testing.assert_array_equal(np.poly1d(e1.threshold).coeffs,
                                  np.poly1d(e2.threshold).coeffs)
    ids1, d1 = e1.query(X[0], topk=5)
    ids2, d2 = e2.query(X[0], topk=5)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(d1, d2)
    # restored engine stays mutable
    e2.add(X)
    assert e2.N == 2 * e1.N


def test_save_load_opq(tmp_path):
    X = _data()
    e1 = Rii(fine_quantizer=OPQ(M=4, Ks=20).fit(X, rotation_iter=2))
    e1.add_configure(vecs=X, nlist=10)
    save_index(e1, str(tmp_path / "idx"))
    e2 = load_index(str(tmp_path / "idx"))
    np.testing.assert_array_equal(e1.fine_quantizer.rotation_matrix,
                                  e2.fine_quantizer.rotation_matrix)
    ids1, _ = e1.query(X[3], topk=5)
    ids2, _ = e2.query(X[3], topk=5)
    np.testing.assert_array_equal(ids1, ids2)


def test_save_load_unbuilt(tmp_path):
    X = _data()
    e1 = Rii(fine_quantizer=PQ(M=4, Ks=20).fit(X))
    save_index(e1, str(tmp_path / "empty"))
    e2 = load_index(str(tmp_path / "empty"))
    assert e2.N == 0 and e2.nlist == 0 and e2.threshold is None
    e2.add_configure(X, nlist=10)
    assert e2.N == 1000
