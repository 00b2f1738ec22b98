"""Auto method-selection policy tests: analytic threshold + timed calibration
(the reference's threshold estimator, /root/reference/rii/rii.py:403-486)."""

import numpy as np

from rii_tpu import PQ, Rii
from rii_tpu.rii import estimate_best_threshold_function


def _engine(n=600, d=32):
    X = np.random.RandomState(5).random((n, d)).astype(np.float32)
    e = Rii(fine_quantizer=PQ(M=4, Ks=16).fit(X))
    e.add_configure(X, nlist=16)
    return e, X


def test_analytic_threshold_present_after_reconfigure():
    e, X = _engine()
    assert e.threshold is not None
    assert isinstance(e.threshold, np.poly1d)
    # threshold grows with L (more candidates -> linear viable for larger |S|)
    assert e.threshold(1000) >= e.threshold(10)


def test_auto_routing_uses_threshold():
    e, X = _engine()
    # tiny subset -> linear always
    assert e._use_linear(5, e.L0)
    # both routes answer correctly either way
    q = X[0]
    ids, _ = e.query(q, topk=3, target_ids=np.arange(10, dtype=np.int64))
    assert set(ids) <= set(range(10))
    ids, _ = e.query(q, topk=3)
    assert ids[0] == 0


def test_auto_routing_prefers_ivf_when_candidate_work_is_small():
    # large enough index that w*cap_max*8 << N: full-database auto -> ivf
    X = np.random.RandomState(6).random((20000, 32)).astype(np.float32)
    e = Rii(fine_quantizer=PQ(M=4, Ks=16).fit(X[:4000]))
    e.add_configure(X, nlist=100)
    e._ensure_cache()
    assert not e._use_linear(e.N, e.L0)  # ivf for full search, small L
    # but a mid-size subset (w explodes as 1/|S|) falls back to linear
    assert e._use_linear(300, e.L0) or e._probe_width(e.L0, 300) * 8 >= 100


def test_timed_calibration_runs_and_fits():
    e, X = _engine(n=300)
    probes = e.fine_quantizer.decode(e.codes[:20])
    p = estimate_best_threshold_function(e, probes)
    assert isinstance(p, np.poly1d)
    # threshold values stay within [0, N] at the Ls it was fit on
    val = float(p(e.L0))
    assert -e.N <= val <= 2 * e.N


def test_timed_calibration_opq_rotates_probes():
    # regression: calibration must work for BOTH codecs — plain PQ (no
    # .rotate) and OPQ (probes must be rotated into codec space)
    from rii_tpu import OPQ
    X = np.random.RandomState(7).random((300, 32)).astype(np.float32)
    e = Rii(fine_quantizer=OPQ(M=4, Ks=16).fit(X))
    e.add_configure(X, nlist=8)
    probes = e.fine_quantizer.decode(e.codes[:10])
    p = estimate_best_threshold_function(e, probes)
    assert isinstance(p, np.poly1d)


def test_reconfigure_calibrate_flag():
    e, X = _engine(n=300)
    e.reconfigure(nlist=10, calibrate=True)
    assert isinstance(e.threshold, np.poly1d)


def test_auto_policy_batch_aware_union_cost_model():
    """method='auto' with the virtual-bucket cache: a single query with small L
    should pick IVF (tiny candidate volume); a full-batch query at the same L
    should pick linear once the union of probes approaches a full scan."""
    import numpy as np
    from rii_tpu import PQ, Rii

    rng = np.random.RandomState(0)
    N, D = 8000, 32
    X = rng.random((N, D)).astype(np.float32)
    pq = PQ(M=4, Ks=32, verbose=False).fit(X[:1000], iter=3)
    e = Rii(pq)
    e.scan_mode = "bf16"
    e.add_configure(X, nlist=90, iter=3)
    e._ensure_cache()
    L = e.L0  # smallest candidate budget

    # single query: IVF candidate volume ~ wv*cap_v << N
    assert not e._use_linear(N, L, qn=1)
    # huge batch: the probe union covers nearly every virtual bucket ->
    # a single linear stream is cheaper
    assert e._use_linear(N, L, qn=4096)
