"""Rii engine tests: port of the reference's behavioral test strategy
(/root/reference/tests/test_rii.py; oracles catalogued in SURVEY.md section 4).
"""

import pickle

import numpy as np
import pytest

import rii_tpu
from rii_tpu import PQ, OPQ, Rii


def _data(n=1000, d=40, seed=123):
    rng = np.random.RandomState(seed)
    return rng.random((n, d)).astype(np.float32)


# --------------------------------------------------------------------- #
# construction / add / reconfigure
# --------------------------------------------------------------------- #

def test_construct():
    M, Ks, N, D = 4, 20, 1000, 40
    X = _data(N, D)
    e = Rii(fine_quantizer=PQ(M=M, Ks=Ks, verbose=True).fit(vecs=X))
    assert e.fine_quantizer.codewords.shape == (M, Ks, D // M)
    assert (e.M, e.Ks) == (M, Ks)
    assert e.verbose is True
    e.verbose = False
    assert e.verbose is False


@pytest.mark.parametrize("codec_cls", [PQ, OPQ])
def test_add(codec_cls):
    M, Ks, N, D = 4, 20, 1000, 40
    X = _data(N, D)
    e = Rii(fine_quantizer=codec_cls(M=M, Ks=Ks).fit(vecs=X))
    assert e.N == 0
    assert e.codes is None
    e.add(vecs=X, update_posting_lists=False)
    assert e.N == N
    # codes stored == codec.encode(X) exactly
    np.testing.assert_array_equal(e.codes, e.fine_quantizer.encode(X))
    e.add(vecs=X, update_posting_lists=False)
    assert e.N == 2 * N


@pytest.mark.parametrize("codec_cls", [PQ, OPQ])
def test_reconfigure(codec_cls):
    M, Ks, N, D = 4, 20, 1000, 40
    X = _data(N, D)
    e = Rii(fine_quantizer=codec_cls(M=M, Ks=Ks).fit(vecs=X))
    e.add(vecs=X, update_posting_lists=False)
    for nlist in (5, 100):
        e.reconfigure(nlist=nlist)
        assert e.nlist == nlist
        assert e.coarse_centers.shape == (nlist, M)
        assert len(e.posting_lists) == nlist
        assert sum(len(pl) for pl in e.posting_lists) == N


def test_add_update_before_reconfigure_raises():
    X = _data()
    e = Rii(fine_quantizer=PQ(M=4, Ks=20).fit(vecs=X))
    with pytest.raises(RuntimeError):
        e.add(vecs=X, update_posting_lists=True)


def test_simple_add_configure():
    M, Ks, N1, N2, D = 4, 20, 300, 700, 40
    X1, X2 = _data(N1, D), _data(N2, D, seed=45)
    e = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(vecs=X1))
    e.add(vecs=X1)
    assert e.N == N1
    e.add(vecs=X2)
    assert e.N == N1 + N2
    for nlist in (5, 100):
        e.reconfigure(nlist=nlist)
        assert e.nlist == nlist
        assert e.coarse_centers.shape == (nlist, M)
        assert len(e.posting_lists) == nlist
        assert sum(len(pl) for pl in e.posting_lists) == N1 + N2


def test_add_configure_equivalences():
    """add_configure == add(update=False)+reconfigure == chained call."""
    M, Ks, N, D = 4, 20, 1000, 40
    X = _data(N, D)
    e1 = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(vecs=X))
    e1.add_configure(vecs=X, nlist=20)
    e2 = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(vecs=X))
    e2.add(vecs=X, update_posting_lists=False)
    e2.reconfigure(nlist=20)
    np.testing.assert_array_equal(e1.codes, e2.codes)
    assert e1.posting_lists == e2.posting_lists
    e3 = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(vecs=X)).add_configure(vecs=X, nlist=20)
    np.testing.assert_array_equal(e1.codes, e3.codes)
    assert e1.posting_lists == e3.posting_lists


def test_add_one_by_one_equals_batch():
    import copy
    M, Ks, N, D = 4, 20, 1000, 40
    X = _data(N, D)
    e1 = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(vecs=X))
    e2 = copy.deepcopy(e1)
    e3 = copy.deepcopy(e1)
    for x in X[:10]:
        e1.add_configure(vecs=x.reshape(1, -1))
    assert e1.N == 10
    e2.add_configure(vecs=X[:10])
    np.testing.assert_array_equal(e1.codes, e2.codes)
    assert e1.posting_lists == e2.posting_lists
    for x in X[:10]:
        e3.add(x.reshape(1, -1))
    e3.reconfigure()
    np.testing.assert_array_equal(e1.codes, e3.codes)
    assert e1.posting_lists == e3.posting_lists


# --------------------------------------------------------------------- #
# query: linear
# --------------------------------------------------------------------- #

def test_query_linear():
    M, Ks, N, D = 4, 20, 1000, 40
    X = _data(N, D)
    e = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(vecs=X))
    e.add_configure(vecs=X, nlist=20)
    for n, q in enumerate(X[:10]):
        topk = 10
        ids1, dists1 = e.query_linear(q, topk)
        assert ids1.dtype == np.int64 and dists1.dtype == np.float64
        assert len(ids1) == topk == len(dists1)
        assert np.all(0 <= np.diff(dists1))  # ascending
        assert n in ids1  # true NN in top-10 with high prob

        # full-target subset == no target
        ids2, dists2 = e.query_linear(q, topk, np.arange(N, dtype=np.int64))
        np.testing.assert_array_equal(ids1, ids2)
        np.testing.assert_allclose(dists1, dists2, rtol=1e-5)

        S = np.array([2, 24, 43, 55, 102, 139, 221, 542, 667, 873, 874, 899],
                     dtype=np.int64)
        ids3, _ = e.query_linear(q, topk, S)
        assert all(i in S for i in ids3)


def test_query_linear_matches_numpy_oracle():
    """Distances equal the brute-force ADC oracle (dtable formulation)."""
    M, Ks, N, D = 8, 32, 512, 32
    X = _data(N, D)
    pq = PQ(M=M, Ks=Ks).fit(X)
    e = Rii(fine_quantizer=pq)
    e.add_configure(vecs=X, nlist=10)
    codes = e.codes
    cw = pq.codewords  # (M, Ks, Ds)
    ds = D // M
    for q in X[:5]:
        # numpy dtable oracle: ADC(q, code) = sum_m dtable[m, code_m]
        dtable = ((q.reshape(M, 1, ds) - cw) ** 2).sum(-1)  # (M, Ks)
        adc = dtable[np.arange(M)[None, :], codes.astype(int)].sum(1)  # (N,)
        ids, dists = e.query_linear(q, 20)
        np.testing.assert_allclose(dists, np.sort(adc)[:20], rtol=1e-3, atol=1e-4)
        oracle_ids = set(np.argsort(adc)[:20].tolist())
        # allow tie reordering: distance sets must match
        assert len(set(ids.tolist()) - oracle_ids) <= 2


# --------------------------------------------------------------------- #
# query: ivf
# --------------------------------------------------------------------- #

def test_query_ivf():
    M, Ks, N, D = 20, 256, 1000, 40
    X = _data(N, D)
    e = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(vecs=X))
    e.add_configure(vecs=X, nlist=20)
    for n, q in enumerate(X[:10]):
        L, topk = 200, 10
        ids1, dists1 = e.query_ivf(q, topk, None, L)
        assert len(ids1) == topk == len(dists1)
        assert np.all(0 <= np.diff(dists1))
        assert n in ids1

        ids2, dists2 = e.query_ivf(q, topk, np.arange(N, dtype=np.int64), L)
        np.testing.assert_array_equal(ids1, ids2)
        np.testing.assert_allclose(dists1, dists2, rtol=1e-5)

        S = np.array([2, 24, 43, 55, 102, 139, 221, 542, 667, 873, 874, 899],
                     dtype=np.int64)
        ids3, _ = e.query_ivf(q, topk, S, L)
        assert all(i in S for i in ids3)

        # ivf with L=N over all targets == linear scan
        ids4, dists4 = e.query_ivf(q, topk, np.arange(N, dtype=np.int64), N)
        ids5, dists5 = e.query_linear(q, topk)
        np.testing.assert_array_equal(ids4, ids5)
        np.testing.assert_allclose(dists4, dists5, rtol=1e-5)

        # small subset + large L: ivf == linear
        ids6, dists6 = e.query_ivf(q, topk, S, L)
        ids7, dists7 = e.query_linear(q, topk, S)
        np.testing.assert_array_equal(ids6, ids7)
        np.testing.assert_allclose(dists6, dists7, rtol=1e-5)


# --------------------------------------------------------------------- #
# query: top-level policy
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("codec_cls", [PQ, OPQ])
def test_query(codec_cls):
    M, Ks, N, D = 20, 256, 1000, 40
    X = _data(N, D)
    e = Rii(fine_quantizer=codec_cls(M=M, Ks=Ks).fit(vecs=X))
    e.add_configure(vecs=X, nlist=20)
    for n, q in enumerate(X[:10]):
        topk = 50
        ids1, dists1 = e.query(q=q, topk=topk)
        assert isinstance(ids1, np.ndarray) and ids1.dtype == np.int64
        assert isinstance(dists1, np.ndarray) and dists1.dtype == np.float64
        assert len(ids1) == topk == len(dists1)
        assert np.all(0 <= np.diff(dists1))
        assert n in ids1

        ids2, dists2 = e.query(q=q, topk=topk, target_ids=np.arange(N, dtype=np.int64))
        np.testing.assert_allclose(ids1, ids2)
        np.testing.assert_allclose(dists1, dists2)

        S = np.array([2, 24, 43, 55, 102, 139, 221, 542, 667, 873, 874, 899],
                     dtype=np.int64)
        ids3, _ = e.query(q=q, topk=5, target_ids=S)
        assert all(i in S for i in ids3)


def test_query_batch_matches_single():
    M, Ks, N, D = 8, 64, 1000, 40
    X = _data(N, D)
    e = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(vecs=X))
    e.add_configure(vecs=X, nlist=20)
    Q = X[:7]
    ids_b, dists_b = e.query_batch(Q, topk=5, method="linear")
    assert ids_b.shape == (7, 5) and dists_b.shape == (7, 5)
    for i, q in enumerate(Q):
        ids_s, dists_s = e.query(q=q, topk=5, method="linear")
        np.testing.assert_array_equal(ids_b[i], ids_s)
        # different batch shapes accumulate in different order -> tiny fp drift
        np.testing.assert_allclose(dists_b[i], dists_s, rtol=1e-4, atol=1e-4)


def test_query_validation():
    X = _data()
    e = Rii(fine_quantizer=PQ(M=4, Ks=20).fit(vecs=X))
    with pytest.raises(AssertionError):
        e.query(X[0])  # no codes yet
    e.add(vecs=X, update_posting_lists=False)
    with pytest.raises(AssertionError):
        e.query(X[0])  # no posting lists yet
    e.reconfigure(nlist=20)
    with pytest.raises(AssertionError):
        e.query(X[0], topk=0)
    with pytest.raises(AssertionError):
        e.query(X[0], topk=10, L=5)  # L < topk
    with pytest.raises(AssertionError):
        e.query(X[0], topk=5, target_ids=np.arange(3, dtype=np.int64))  # |S| < topk
    with pytest.raises(AssertionError):
        e.query(X[0], method="bogus")


def test_query_topk_none_returns_all():
    N = 300
    X = _data(N)
    e = Rii(fine_quantizer=PQ(M=4, Ks=20).fit(vecs=X))
    e.add_configure(vecs=X, nlist=10)
    ids, dists = e.query(X[0], topk=None, method="linear")
    assert len(ids) == N
    assert sorted(ids.tolist()) == list(range(N))


# --------------------------------------------------------------------- #
# serialization / clear / merge
# --------------------------------------------------------------------- #

def test_pickle():
    M, Ks, N, D = 10, 256, 1000, 40
    X = _data(N, D)
    e1 = Rii(fine_quantizer=PQ(M=M, Ks=Ks).fit(vecs=X))
    e1.add_configure(vecs=X, nlist=20)
    e2 = pickle.loads(pickle.dumps(e1))
    assert (e1.M, e1.Ks) == (e2.M, e2.Ks)
    np.testing.assert_array_equal(e1.threshold.coeffs, e2.threshold.coeffs)
    np.testing.assert_array_equal(e1.coarse_centers, e2.coarse_centers)
    np.testing.assert_array_equal(e1.codes, e2.codes)
    assert e1.posting_lists == e2.posting_lists
    # the restored engine answers queries identically
    ids1, d1 = e1.query(X[0], topk=5)
    ids2, d2 = e2.query(X[0], topk=5)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(d1, d2)


def test_clear():
    X = _data()
    e = Rii(fine_quantizer=PQ(M=4, Ks=20).fit(vecs=X))
    e.add_configure(vecs=X, nlist=20)
    e.clear()
    assert e.threshold is None
    assert e.N == 0
    assert e.nlist == 0
    assert e.coarse_centers is None
    assert e.codes is None
    assert len(e.posting_lists) == 0
    # reusable after clear
    e.add_configure(vecs=X, nlist=10)
    assert e.N == 1000


def test_merge():
    from itertools import chain
    M, Ks, N1, N2, D = 4, 20, 1000, 500, 40
    X1, X2 = _data(N1, D), _data(N2, D, seed=42)
    codec = PQ(M=M, Ks=Ks).fit(vecs=X1)
    e1, e2 = Rii(fine_quantizer=codec), Rii(fine_quantizer=codec)

    e1.merge(e2)  # both empty
    assert (e1.N, e2.N) == (0, 0)

    e1.add_configure(vecs=X1)
    e1.merge(e2)  # e2 empty
    assert e1.N == N1
    assert e1.nlist == int(np.sqrt(N1))
    e1.clear()

    e2.add_configure(vecs=X2)
    e1.merge(e2)  # e1 has no posting lists
    assert e1.N == N2
    assert e1.nlist == 0
    e1.clear()
    e2.clear()

    e1.add_configure(vecs=X1)
    e2.add_configure(vecs=X2)
    e1.merge(e2)
    assert e1.N == N1 + N2
    assert e1.nlist == int(np.sqrt(N1))
    np.testing.assert_array_equal(e1.codes, codec.encode(np.vstack((X1, X2))))
    assert sorted(chain(*e1.posting_lists)) == list(range(N1 + N2))


def test_merge_rejects_mismatched_quantizer():
    X = _data()
    e1 = Rii(fine_quantizer=PQ(M=4, Ks=20).fit(vecs=X))
    e2 = Rii(fine_quantizer=PQ(M=4, Ks=20).fit(vecs=_data(seed=3)))
    with pytest.raises(AssertionError):
        e1.merge(e2)


def test_print_params_smoke(capsys):
    X = _data()
    e = Rii(fine_quantizer=PQ(M=4, Ks=20).fit(vecs=X))
    e.add_configure(vecs=X, nlist=20)
    e.print_params()
    out = capsys.readouterr().out
    assert "nlist: 20" in out
