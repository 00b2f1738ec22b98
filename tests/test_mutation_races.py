"""Regression tests for mutation-interleaving hazards (round-3 ADVICE):

1. An EXTERNAL engine.reconfigure() between a ShardedRii sync and its next
   delta-add must not scatter new rows into the stale grouped layout —
   N is unchanged so the n0 guard alone cannot see it; the engine-version
   continuity check must force a full refresh.
2. Rii.add_codes must reject code values >= Ks (device gathers clip
   silently, returning plausible-but-wrong distances).
3. A clear() racing _add_codes between the unlocked predict and the write
   lock must surface the guarded 'reconfigure() must be called'
   RuntimeError, not an internal failure deep inside pqkmeans_predict.
"""

import numpy as np
import pytest

import rii_tpu.rii as rii_mod
from rii_tpu import PQ, Rii
from rii_tpu.parallel import ShardedRii


def _engine(n=2048, d=32, nlist=32, seed=33):
    rng = np.random.RandomState(seed)
    X = rng.random((n, d)).astype(np.float32)
    e = Rii(fine_quantizer=PQ(M=4, Ks=32).fit(X[:512], iter=3))
    e.add_configure(X, nlist=nlist, iter=3)
    return e, X


def test_external_reconfigure_then_sharded_add_self_heals():
    e, X = _engine()
    rng = np.random.RandomState(34)
    X2 = rng.random((128, 32)).astype(np.float32)

    sr = ShardedRii(e)
    # external mutation the wrapper does not see: same N, new coarse
    # centers => new assignments => the sharded grouped layout is stale
    e.reconfigure(nlist=48, iter=3)
    sr.add(X2, update_posting_lists=True)  # must refresh, not scatter

    # oracle: an identical engine built through the same external ops,
    # wrapped AFTER the mutations (fresh layout by construction)
    e2, _ = _engine()
    e2.reconfigure(nlist=48, iter=3)
    e2.add(X2, update_posting_lists=True)
    sr2 = ShardedRii(e2)

    q = X2[:8]
    ids_a, d_a = sr.query_batch(q, topk=10, L=e.N)
    ids_b, d_b = sr2.query_batch(q, topk=10, L=e2.N)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-3, atol=1e-3)
    assert (ids_a == ids_b).mean() > 0.9  # ties only


def test_sharded_add_after_own_reconfigure_stays_delta():
    # mutations THROUGH the wrapper keep the version counter in sync: the
    # next add must take the O(batch) path (engine version advances by
    # exactly one per wrapper add)
    e, X = _engine()
    sr = ShardedRii(e)
    sr.reconfigure(nlist=48, iter=3)
    v0 = e._version
    rng = np.random.RandomState(35)
    sr.add(rng.random((64, 32)).astype(np.float32),
           update_posting_lists=True)
    assert e._version == v0 + 1
    assert sr._engine_version == e._version  # delta path taken and synced
    ids, _ = sr.query_batch(X[:4], topk=5, L=e.N)
    assert (ids >= 0).all()


def test_add_codes_rejects_out_of_range_codes():
    e, _ = _engine()
    bad = np.full((4, e.M), e.Ks, dtype=np.uint8)  # == Ks: out of range
    with pytest.raises(AssertionError, match="must be < Ks"):
        e.add_codes(bad)
    ok = np.zeros((4, e.M), dtype=np.uint8)
    e.add_codes(ok)  # in-range still accepted
    assert e.N == 2052


def test_clear_racing_add_raises_guarded_error(monkeypatch):
    e, X = _engine()
    codes = e.fine_quantizer.encode(X[:16])

    real_predict = rii_mod.pqkmeans_predict
    state = {"fired": False}

    def racing_predict(codewords, centers, cs):
        out = real_predict(codewords, centers, cs)
        if not state["fired"]:
            state["fired"] = True
            e.clear()  # the race: clear() lands before _add_codes locks
        return out

    monkeypatch.setattr(rii_mod, "pqkmeans_predict", racing_predict)
    with pytest.raises(RuntimeError, match="reconfigure\\(\\) must be called"):
        e._add_codes(codes, True)
