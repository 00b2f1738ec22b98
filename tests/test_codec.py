"""PQ/OPQ codec tests: shapes, dtypes, determinism, numpy-oracle parity."""

import numpy as np
import pytest

from rii_tpu import PQ, OPQ


def _data(n=500, d=40, seed=123):
    rng = np.random.RandomState(seed)
    return rng.random((n, d)).astype(np.float32)


def _encode_oracle(codewords, vecs):
    """Pure-numpy argmin encoder (the behavioral oracle for PQ.encode)."""
    m, ks, ds = codewords.shape
    n = vecs.shape[0]
    sub = vecs.reshape(n, m, ds)
    out = np.empty((n, m), dtype=np.uint8)
    for mm in range(m):
        d2 = ((sub[:, mm, None, :] - codewords[mm][None, :, :]) ** 2).sum(-1)
        out[:, mm] = np.argmin(d2, axis=1)
    return out


def test_pq_fit_shapes_dtypes():
    x = _data()
    pq = PQ(M=4, Ks=20).fit(x)
    assert pq.codewords.shape == (4, 20, 10)
    assert pq.codewords.dtype == np.float32
    assert pq.code_dtype == np.uint8
    codes = pq.encode(x)
    assert codes.shape == (500, 4) and codes.dtype == np.uint8
    rec = pq.decode(codes)
    assert rec.shape == x.shape and rec.dtype == np.float32


def test_pq_encode_matches_numpy_oracle():
    x = _data()
    pq = PQ(M=4, Ks=20).fit(x)
    codes = pq.encode(x)
    oracle = _encode_oracle(pq.codewords, x)
    # identical up to fp ties; require distance-equivalence
    m, ks, ds = pq.codewords.shape
    sub = x.reshape(-1, m, ds)
    for mm in range(m):
        d_ours = ((sub[:, mm] - pq.codewords[mm][codes[:, mm]]) ** 2).sum(-1)
        d_oracle = ((sub[:, mm] - pq.codewords[mm][oracle[:, mm]]) ** 2).sum(-1)
        np.testing.assert_allclose(d_ours, d_oracle, rtol=1e-4, atol=1e-5)


def test_pq_decode_is_codeword_lookup():
    x = _data()
    pq = PQ(M=4, Ks=20).fit(x)
    codes = pq.encode(x[:50])
    rec = pq.decode(codes)
    m, ks, ds = pq.codewords.shape
    expect = pq.codewords[np.arange(m)[None, :], codes.astype(int)].reshape(50, -1)
    np.testing.assert_allclose(rec, expect, rtol=1e-6)


def test_pq_deterministic():
    x = _data()
    a = PQ(M=4, Ks=20, seed=7).fit(x)
    b = PQ(M=4, Ks=20, seed=7).fit(x)
    np.testing.assert_array_equal(a.codewords, b.codewords)
    assert a == b


def test_pq_reconstruction_improves_with_ks():
    x = _data(n=1000)
    errs = []
    for ks in (4, 16, 64):
        pq = PQ(M=4, Ks=ks).fit(x)
        rec = pq.decode(pq.encode(x))
        errs.append(((x - rec) ** 2).sum(-1).mean())
    assert errs[0] > errs[1] > errs[2]


def test_pq_requires_fit():
    pq = PQ(M=4, Ks=20)
    with pytest.raises(AssertionError):
        pq.encode(_data())


def test_opq_rotation_orthonormal():
    x = _data()
    opq = OPQ(M=4, Ks=20).fit(x, rotation_iter=3)
    r = opq.rotation_matrix
    np.testing.assert_allclose(r @ r.T, np.eye(r.shape[0]), atol=1e-4)


def test_opq_rotate_and_encode():
    x = _data()
    opq = OPQ(M=4, Ks=20).fit(x, rotation_iter=3)
    q = x[0]
    rq = opq.rotate(q)
    assert rq.shape == q.shape
    np.testing.assert_allclose(np.linalg.norm(rq), np.linalg.norm(q), rtol=1e-4)
    codes = opq.encode(x[:10])
    assert codes.shape == (10, 4) and codes.dtype == np.uint8
    # decode returns rotated-space vectors close to rotate(x)
    rec = opq.decode(codes)
    rx = opq.rotate(x[:10])
    assert ((rec - rx) ** 2).sum(-1).mean() < ((rx - rx.mean(0)) ** 2).sum(-1).mean()


def test_codec_equality():
    x = _data()
    a = PQ(M=4, Ks=20).fit(x)
    b = PQ(M=4, Ks=20).fit(x)
    c = PQ(M=4, Ks=20).fit(_data(seed=9))
    assert a == b
    assert a != c
    assert a != OPQ(M=4, Ks=20)


def test_opq_beats_pq_on_correlated_data():
    """OPQ's learned rotation must reduce quantization error vs plain PQ on
    anisotropic/correlated data (the reference's 'slightly more accurate'
    claim, /root/reference/docs/source/tutorial.rst:65-68)."""
    rng = np.random.RandomState(0)
    n, d = 4000, 32
    # correlated data: random low-rank mixing of independent factors
    mix = rng.normal(0, 1, (d, d)).astype(np.float32)
    mix[:, d // 2:] *= 0.1  # anisotropic spectrum
    X = (rng.normal(0, 1, (n, d)).astype(np.float32) @ mix).astype(np.float32)

    pq = PQ(M=8, Ks=32, verbose=False).fit(X, iter=5)
    opq = OPQ(M=8, Ks=32, verbose=False).fit(X, iter=5, rotation_iter=5)

    err_pq = np.mean((pq.decode(pq.encode(X)) - X) ** 2)
    Xr = opq.rotate(X)
    err_opq = np.mean((opq.decode(opq.encode(X)) - Xr) ** 2)
    assert err_opq < err_pq, (err_opq, err_pq)


def test_pq_from_codewords_migration():
    """from_codewords imports an externally trained codebook (nanopq-style
    migration): encode/decode/distances identical to the source codec, and
    a pre-encoded code database ingests via Rii.add_codes without
    re-encoding."""
    rng = np.random.RandomState(41)
    X = rng.random((3000, 32)).astype(np.float32)
    src = PQ(M=4, Ks=32).fit(X[:1000], iter=5)  # stands in for nanopq.PQ

    pq = PQ.from_codewords(src.codewords)
    assert (pq.M, pq.Ks, pq.Ds) == (src.M, src.Ks, src.Ds)
    assert pq == src  # codec equality is codeword equality
    codes_src = src.encode(X)
    np.testing.assert_array_equal(pq.encode(X), codes_src)
    np.testing.assert_allclose(pq.decode(codes_src), src.decode(codes_src))

    # ingest the existing code database, no re-encoding
    from rii_tpu import Rii
    e = Rii(pq)
    e.add_codes(codes_src, update_posting_lists=False)
    e.reconfigure(nlist=30, iter=3)
    ids, _ = e.query(X[7], topk=1)
    e2 = Rii(src).add_configure(X, nlist=30, iter=3)
    ids2, _ = e2.query(X[7], topk=1)
    assert ids[0] == ids2[0]


def test_opq_from_codewords_migration():
    rng = np.random.RandomState(43)
    X = rng.random((2000, 32)).astype(np.float32)
    src = OPQ(M=4, Ks=32).fit(X, iter=4, rotation_iter=3)
    opq = OPQ.from_codewords(src.codewords, src.rotation_matrix)
    np.testing.assert_array_equal(opq.encode(X), src.encode(X))
    np.testing.assert_allclose(opq.rotate(X[:8]), src.rotate(X[:8]))
    # wrong rotation shape rejected
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        OPQ.from_codewords(src.codewords, np.eye(16, dtype=np.float32))
