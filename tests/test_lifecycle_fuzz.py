"""Randomized lifecycle consistency: interleave add / merge / reconfigure /
query / clear and check the engine stays consistent with a freshly-built
engine over the same accumulated data (the reference's metamorphic oracles,
SURVEY.md section 4, applied to random operation sequences)."""

import numpy as np
import pytest

from rii_tpu import PQ, Rii

D, M, KS = 32, 4, 32


@pytest.fixture(scope="module")
def codec():
    rng = np.random.RandomState(0)
    X = rng.random((2000, D)).astype(np.float32)
    return PQ(M=M, Ks=KS, verbose=False).fit(X, iter=3), X


def _fresh(codec_and_train, data, nlist):
    pq, _ = codec_and_train
    e = Rii(pq)
    e.add(np.concatenate(data), update_posting_lists=False)
    e.reconfigure(nlist=nlist, iter=3)
    return e


def test_random_lifecycle_matches_fresh_build(codec):
    pq, X0 = codec
    rng = np.random.RandomState(7)

    e = Rii(pq)
    data = []
    nlist = 30
    batch = rng.random((1500, D)).astype(np.float32)
    data.append(batch)
    e.add_configure(batch, nlist=nlist, iter=3)

    for step in range(6):
        op = rng.randint(0, 3)
        if op == 0:  # add with posting-list updates
            b = rng.random((rng.randint(50, 400), D)).astype(np.float32)
            data.append(b)
            e.add(b, update_posting_lists=True)
        elif op == 1:  # merge another engine built on the same codec
            b = rng.random((rng.randint(50, 300), D)).astype(np.float32)
            other = Rii(pq)
            other.add(b, update_posting_lists=False)
            data.append(other.fine_quantizer.decode(other.codes))
            # merged codes must equal the other engine's codes verbatim, so
            # track the codes themselves for the fresh rebuild comparison
            data[-1] = b
            e.merge(other, update_posting_lists=True)
        else:  # reconfigure with a new nlist
            nlist = int(rng.choice([20, 30, 45]))
            e.reconfigure(nlist=nlist, iter=3)

        # invariants after every step
        n_expected = sum(len(b) for b in data)
        assert e.N == n_expected
        assert sum(len(p) for p in e.posting_lists) == e.N
        codes_fresh = pq.encode(np.concatenate(data))
        np.testing.assert_array_equal(e.codes, codes_fresh)

        # full-coverage query equals the fresh engine's (exact distances)
        q = np.concatenate(data)[0]
        ids_a, d_a = e.query(q, topk=5, L=e.N, method="ivf")
        f = _fresh(codec, data, nlist=min(nlist, e.N))
        ids_b, d_b = f.query(q, topk=5, L=f.N, method="ivf")
        np.testing.assert_allclose(np.sort(d_a), np.sort(d_b), rtol=1e-4)

    # clear drops everything but the codec
    e.clear()
    assert e.N == 0 and e.nlist == 0 and e.threshold is None
    e.add_configure(np.concatenate(data), nlist=25, iter=3)
    assert e.N == sum(len(b) for b in data)


def test_add_without_update_then_reconfigure_includes_all(codec):
    pq, _ = codec
    rng = np.random.RandomState(3)
    e = Rii(pq)
    a = rng.random((800, D)).astype(np.float32)
    b = rng.random((400, D)).astype(np.float32)
    e.add_configure(a, nlist=25, iter=3)
    e.add(b, update_posting_lists=False)
    # codes present but not yet in postings
    assert e.N == 1200
    assert sum(len(p) for p in e.posting_lists) == 800
    e.reconfigure(nlist=25, iter=3)
    assert sum(len(p) for p in e.posting_lists) == 1200
    # the late-added vector is now findable via ivf
    ids, _ = e.query(b[7], topk=5, L=e.N, method="ivf")
    assert 800 + 7 in ids.tolist()


def test_sharded_random_lifecycle_matches_engine(codec):
    """The same interleaving applied through ShardedRii (mesh mutations:
    add / merge / distributed reconfigure) must track a single-chip engine
    fed the identical operations."""
    from rii_tpu.parallel import ShardedRii

    pq, X0 = codec
    rng = np.random.RandomState(17)
    nlist = 24

    b0 = rng.random((1200, D)).astype(np.float32)
    e = Rii(pq)
    e.add_configure(b0, nlist=nlist, iter=3)
    s = ShardedRii(e)

    shadow = Rii(pq)  # single-chip engine fed the same ops
    shadow.add_configure(b0, nlist=nlist, iter=3)

    for step in range(5):
        op = rng.randint(0, 3)
        if op == 0:  # add
            b = rng.random((rng.randint(100, 400), D)).astype(np.float32)
            s.add(b, update_posting_lists=True)
            shadow.add(b, update_posting_lists=True)
        elif op == 1:  # merge another engine
            b = rng.random((rng.randint(50, 200), D)).astype(np.float32)
            other = Rii(pq)
            other.add(b, update_posting_lists=False)
            s.merge(other)
            shadow.merge(other)
        else:  # distributed reconfigure vs single-chip reconfigure
            s.reconfigure(nlist=nlist, iter=3)
            shadow.reconfigure(nlist=nlist, iter=3)
            # bit-identity contract on the 8-dev mesh
            assert s.engine.posting_lists == shadow.posting_lists

        assert s.engine.N == shadow.N
        q = rng.random((4, D)).astype(np.float32)
        ids_s, d_s = s.query_batch(q, topk=3)
        ids_e, d_e = shadow.query_batch(q, topk=3, method="linear")
        np.testing.assert_allclose(d_s, d_e, rtol=1e-3, atol=1e-3)
        assert (ids_s == ids_e).mean() > 0.85  # ties only
