"""Query-batched IVF over the decoded replica must match the pq-path IVF."""

import numpy as np
import jax.numpy as jnp

from rii_tpu import PQ, Rii
from rii_tpu.ops.ivf import ivf_scan_topk, ivf_scan_topk_decoded
from rii_tpu.ops.decode import build_decoded_cache


def _engine(n=2000, d=32):
    X = np.random.RandomState(21).random((n, d)).astype(np.float32)
    e = Rii(fine_quantizer=PQ(M=4, Ks=32).fit(X))
    e.add_configure(X, nlist=25)
    return e, X


def _run_both(e, X, queries, topk, w, tids=None):
    dc = e._ensure_legacy_grouped(e._ensure_cache())
    decoded = build_decoded_cache(dc["codes_flat"], dc["codewords"], block=1024)
    kw = {}
    if tids is not None:
        s = len(tids)
        s_pad = 16
        tp = np.full(s_pad, np.iinfo(np.int32).max, np.int32)
        tp[:s] = tids
        kw = dict(target_ids=jnp.asarray(tp), n_targets=jnp.int32(s))
    d1, i1 = ivf_scan_topk(
        jnp.asarray(queries), dc["codewords"], dc["centers_dec"],
        dc["centers_norms"], dc["bucket_start"], dc["codes_grouped"],
        dc["norms_grouped"], dc["order"], dc["slot_cluster"],
        w=w, topk=topk, cap_max=dc["cap_max"], **kw)
    d2, i2 = ivf_scan_topk_decoded(
        jnp.asarray(queries), decoded, dc["centers_dec"], dc["centers_norms"],
        dc["bucket_start"], dc["norms_grouped"], dc["order"],
        dc["slot_cluster"], w=w, topk=topk, cap_max=dc["cap_max"], **kw)
    return map(np.asarray, (d1, i1, d2, i2))


def test_decoded_ivf_matches_pq_ivf():
    e, X = _engine()
    d1, i1, d2, i2 = _run_both(e, X, X[:6], topk=8, w=8)
    # bf16 replica vs f32 one-hot: ids nearly identical, dists close
    assert (i1 == i2).mean() > 0.9, (i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=5e-2, atol=5e-2)


def test_decoded_ivf_subset():
    e, X = _engine()
    tids = np.sort(np.random.RandomState(0).choice(2000, 12, replace=False)).astype(np.int32)
    d1, i1, d2, i2 = _run_both(e, X, X[:4], topk=3, w=25, tids=tids)
    assert set(i2[np.isfinite(d2[:, :3])].ravel().tolist()) <= set(tids.tolist()) | {-1}
    assert (i1 == i2).mean() > 0.9


def test_engine_routes_to_decoded_ivf():
    e, X = _engine()
    e.scan_mode = "bf16"  # force replica even on CPU
    # full-coverage ivf (L=N -> w=nlist) must equal the linear scan
    ids, dists = e.query_batch(X[:4], topk=5, L=e.N, method="ivf")
    ids2, dists2 = e.query_batch(X[:4], topk=5, method="linear")
    assert (ids == ids2).mean() > 0.9
    np.testing.assert_allclose(dists, dists2, rtol=5e-2, atol=5e-2)
