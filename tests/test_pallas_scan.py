"""Pallas PQ-scan kernel tests (interpret mode on CPU).

The kernel contract is per-128-slot-tile (min, argmin) of exact-ADC scores;
that is tested EXACTLY against a numpy oracle. The end-to-end top-k wrapper is
exact unless two true top-k fall in one tile, so it is tested at a realistic
tiles-per-k ratio.
"""

import numpy as np
import jax.numpy as jnp

from rii_tpu import PQ
from rii_tpu.models.ivf import code_norms_np
from rii_tpu.ops.pallas_scan import (
    pq_scan_topk,
    pq_scan_tile_minima,
    prepare_pq_scan_inputs,
    build_padded_codewords,
)


def _index(n=2000, d=64, m=8, ks=32):
    rng = np.random.RandomState(3)
    x = rng.random((n, d)).astype(np.float32)
    pq = PQ(M=m, Ks=ks).fit(x)
    codes = pq.encode(x)
    norms = code_norms_np(pq.codewords, codes)
    return x, pq, codes, norms


def _oracle_scores(q, codes, norms, codewords):
    """Exact per-code scores WITHOUT ||q||^2, matching the kernel's bf16 table:
    norms - 2 * q . decode_bf16(code)."""
    m, ks, ds = codewords.shape
    cw16 = codewords.astype(np.float32)  # oracle in f32; tolerance covers bf16
    dec = cw16[np.arange(m)[None, :], codes.astype(int)].reshape(len(codes), -1)
    return norms - 2.0 * dec @ q


def test_tile_minima_match_oracle():
    x, pq, codes, norms = _index()
    n = len(codes)
    queries = jnp.asarray(x[:4])
    codes_t, norms2d, cwt = prepare_pq_scan_inputs(codes, norms, pq.codewords,
                                                   blk=1024)
    vmin, amin = pq_scan_tile_minima(queries, codes_t, norms2d, cwt, blk=1024,
                                     interpret=True)
    vmin, amin = np.asarray(vmin), np.asarray(amin)
    cap = codes_t.shape[0]
    nt = cap // 128
    for qi in range(4):
        s = np.full(cap, np.inf, np.float32)
        s[:n] = _oracle_scores(x[qi], codes, norms, pq.codewords)
        st = s.reshape(nt, 128)
        ref_min = st.min(1)
        ref_arg = st.argmin(1) + np.arange(nt) * 128
        finite = np.isfinite(ref_min)
        np.testing.assert_allclose(vmin[qi][finite], ref_min[finite],
                                   rtol=2e-2, atol=2e-2)
        # argmins must point at slots whose oracle score is within bf16 noise
        # of the tile min (bf16 rounding can swap near-ties)
        picked = s[np.minimum(amin[qi][finite], cap - 1)]
        np.testing.assert_allclose(picked, ref_min[finite], rtol=2e-2, atol=2e-2)
        assert (~finite | (amin[qi] < n) | (vmin[qi] == np.inf)).all()


def test_pq_scan_topk_end_to_end():
    # realistic ratio: topk=2 over 16 tiles -> collisions rare; top-1 exact
    x, pq, codes, norms = _index()
    queries = jnp.asarray(x[:8])
    codes_t, norms2d, cwt = prepare_pq_scan_inputs(codes, norms, pq.codewords,
                                                   blk=1024)
    d_p, i_p = pq_scan_topk(queries, codes_t, norms2d, cwt, topk=2, blk=1024,
                            interpret=True)
    d_p, i_p = np.asarray(d_p), np.asarray(i_p)
    for qi in range(8):
        s = _oracle_scores(x[qi], codes, norms, pq.codewords) + (x[qi] ** 2).sum()
        assert i_p[qi, 0] == int(np.argmin(s)), (qi, i_p[qi], np.argmin(s))
        np.testing.assert_allclose(d_p[qi, 0], s.min(), rtol=2e-2, atol=2e-2)
    assert np.all(np.diff(d_p, axis=1) >= -1e-3)


def test_pq_scan_padding_excluded():
    x, pq, codes, norms = _index(n=300)
    queries = jnp.asarray(x[:2])
    codes_t, norms2d, cwt = prepare_pq_scan_inputs(codes, norms, pq.codewords,
                                                   blk=1024)
    d_p, i_p = pq_scan_topk(queries, codes_t, norms2d, cwt, topk=2, blk=1024,
                            interpret=True)
    i_p = np.asarray(i_p)
    assert (i_p < 300).all() and (i_p >= 0).all()


def test_replica_scan_matches_pq_scan():
    from rii_tpu.ops.pallas_scan import replica_scan_topk
    from rii_tpu.ops.decode import build_decoded_cache
    x, pq, codes, norms = _index()
    queries = jnp.asarray(x[:4])
    codes_p, norms_col, cwp = prepare_pq_scan_inputs(codes, norms, pq.codewords,
                                                     blk=2048)
    decoded = build_decoded_cache(codes_p, jnp.asarray(pq.codewords), block=2048)
    d_r, i_r = replica_scan_topk(queries, decoded, norms_col, topk=2, blk=2048,
                                 interpret=True, recall_target=None)
    d_p, i_p = pq_scan_topk(queries, codes_p, norms_col, cwp, topk=2, blk=1024,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(i_r), np.asarray(i_p))
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_p), rtol=2e-2,
                               atol=2e-2)


def test_transposed_replica_scan_matches_row_replica():
    """The (D, cap) transposed kernel (the small-Q roofline path) must agree
    with the row-major replica kernel: same argmins, distances within the
    packed-key 2^-16 class."""
    from rii_tpu.ops.pallas_scan import (
        prepare_replica_t, replica_scan_topk, replica_scan_topk_t)
    from rii_tpu.ops.decode import build_decoded_cache
    x, pq, codes, norms = _index()
    queries = jnp.asarray(x[:16])
    codes_p, norms_col, _ = prepare_pq_scan_inputs(codes, norms, pq.codewords,
                                                   blk=2048)
    decoded = build_decoded_cache(codes_p, jnp.asarray(pq.codewords), block=2048)
    dec_t, norms_rep = prepare_replica_t(decoded, norms_col[:, 0])
    d_t, i_t = replica_scan_topk_t(queries, dec_t, norms_rep, topk=3,
                                   blk=2048, interpret=True,
                                   recall_target=None)
    d_r, i_r = replica_scan_topk(queries, decoded, norms_col, topk=3, blk=2048,
                                 interpret=True, recall_target=None,
                                 packed=False)
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_r), rtol=1e-4,
                               atol=1e-4)
    assert (np.asarray(i_t) == np.asarray(i_r)).mean() > 0.95  # ties only


def test_tn_tile_minima_matches_nn():
    """The large-Q TN kernel must produce the same tile minima as the NN
    kernel (identical math, different MXU orientation)."""
    from rii_tpu.ops.pallas_scan import (
        prepare_replica_t,
        replica_scan_tile_minima_t,
        replica_scan_tile_minima_tn,
    )
    from rii_tpu.ops.decode import build_decoded_cache
    x, pq, codes, norms = _index()
    queries = jnp.asarray(x[:16])
    codes_p, norms_col, _ = prepare_pq_scan_inputs(codes, norms, pq.codewords,
                                                   blk=2048)
    decoded = build_decoded_cache(codes_p, jnp.asarray(pq.codewords), block=2048)
    dec_t, norms_rep = prepare_replica_t(decoded, norms_col[:, 0])
    v_nn, a_nn = replica_scan_tile_minima_t(queries, dec_t, norms_rep,
                                            blk=2048, interpret=True)
    v_tn, a_tn = replica_scan_tile_minima_tn(queries, dec_t, norms_rep,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(v_tn), np.asarray(v_nn),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a_tn), np.asarray(a_nn))


def test_transposed_replica_padding_and_masking():
    from rii_tpu.ops.pallas_scan import prepare_replica_t, replica_scan_topk_t
    from rii_tpu.ops.decode import build_decoded_cache
    x, pq, codes, norms = _index(n=300)
    queries = jnp.asarray(x[:8])
    codes_p, norms_col, _ = prepare_pq_scan_inputs(codes, norms, pq.codewords,
                                                   blk=1024)
    decoded = build_decoded_cache(codes_p, jnp.asarray(pq.codewords), block=1024)
    dec_t, norms_rep = prepare_replica_t(decoded, norms_col[:, 0])
    _, i_t = replica_scan_topk_t(queries, dec_t, norms_rep, topk=2, blk=1024,
                                 interpret=True)
    i_t = np.asarray(i_t)
    assert (i_t < 300).all() and (i_t >= 0).all()  # padding never selected
    # subset mask folded into the norms stream
    norms_m = np.asarray(norms_col[:, 0]).copy()
    norms_m[:150] = np.inf  # exclude the first 150 ids
    nr_m = jnp.asarray(norms_m)[None, :]
    _, i_m = replica_scan_topk_t(queries, dec_t, jnp.asarray(nr_m), topk=2,
                                 blk=1024, interpret=True)
    i_m = np.asarray(i_m)
    assert ((i_m >= 150) & (i_m < 300)).all()


def test_i8_replica_scan_rescored_matches_exact():
    from rii_tpu.ops.pallas_scan import (
        replica_i8_scan_topk, quantize_replica_i8)
    from rii_tpu.ops.decode import build_decoded_cache
    x, pq, codes, norms = _index()
    queries = jnp.asarray(x[:4])
    codes_p, norms_col, cwp = prepare_pq_scan_inputs(codes, norms, pq.codewords,
                                                     blk=1024)
    decoded = build_decoded_cache(codes_p, jnp.asarray(pq.codewords), block=1024)
    dec_i8, scales = quantize_replica_i8(decoded)
    d_i, i_i = replica_i8_scan_topk(queries, dec_i8, scales, norms_col,
                                    codes_p, jnp.asarray(pq.codewords),
                                    topk=2, blk=1024, interpret=True,
                                    recall_target=None, overfetch=4)
    d_i, i_i = np.asarray(d_i), np.asarray(i_i)
    # rescored top-1 must equal the exact-ADC oracle's
    for qi in range(4):
        s = _oracle_scores(x[qi], codes, norms, pq.codewords) + (x[qi] ** 2).sum()
        assert i_i[qi, 0] == int(np.argmin(s)), (qi, i_i[qi], np.argmin(s))
        np.testing.assert_allclose(d_i[qi, 0], s.min(), rtol=2e-2, atol=2e-2)
    assert np.all(np.diff(d_i, axis=1) >= -1e-3)


def test_i8_transposed_scan_rescored_matches_exact():
    from rii_tpu.ops.pallas_scan import (
        prepare_replica_t, quantize_replica_i8, replica_i8_scan_topk_t)
    from rii_tpu.ops.decode import build_decoded_cache
    x, pq, codes, norms = _index()
    queries = jnp.asarray(x[:8])
    codes_p, norms_col, _ = prepare_pq_scan_inputs(codes, norms, pq.codewords,
                                                   blk=1024)
    decoded = build_decoded_cache(codes_p, jnp.asarray(pq.codewords), block=1024)
    dec_i8, scales = quantize_replica_i8(decoded)
    dec_i8_t = jnp.transpose(dec_i8)
    _, norms_rep = prepare_replica_t(decoded, norms_col[:, 0])
    d_i, i_i = replica_i8_scan_topk_t(queries, dec_i8_t, scales, norms_rep,
                                      codes_p, jnp.asarray(pq.codewords),
                                      topk=2, interpret=True,
                                      recall_target=None, overfetch=4)
    d_i, i_i = np.asarray(d_i), np.asarray(i_i)
    for qi in range(8):
        s = _oracle_scores(x[qi], codes, norms, pq.codewords) + (x[qi] ** 2).sum()
        assert i_i[qi, 0] == int(np.argmin(s)), (qi, i_i[qi], np.argmin(s))
        np.testing.assert_allclose(d_i[qi, 0], s.min(), rtol=2e-2, atol=2e-2)
    assert np.all(np.diff(d_i, axis=1) >= -1e-3)
    assert (i_i >= 0).all() and (i_i < len(codes)).all()


def test_padded_codewords_decode_identity():
    _, pq, codes, _ = _index(n=128)
    cwp = np.asarray(build_padded_codewords(pq.codewords), dtype=np.float32)
    m, ks, ds = pq.codewords.shape
    dec = np.zeros(m * ds, np.float32)
    for mm in range(m):
        dec += cwp[mm, codes[0, mm]]
    expect = pq.codewords[np.arange(m), codes[0].astype(int)].reshape(-1)
    np.testing.assert_allclose(dec, expect, rtol=1e-2, atol=1e-2)  # bf16 table


def test_merge_packed_keys_min8_prereduce_big_q():
    """Big-Q merge: the min-8 pre-reduce (3 extra index bits) must return the
    exact top-k when the true top-k occupy distinct 1024-slot groups, and the
    packed id reconstruction (group, column, lane) must be exact."""
    import jax.numpy as jnp
    from jax import lax
    from rii_tpu.ops.pallas_scan import _merge_packed_keys, _TILE

    rng = np.random.RandomState(3)
    qn, nt, topk = 512, 4096, 10  # nt>=4096 + qn>=512 triggers the pre-reduce
    d = 4
    queries = np.zeros((qn, d), np.float32)  # qsq = 0: dists == scores
    scores = rng.uniform(1.0, 2.0, (qn, nt)).astype(np.float32)
    lanes = rng.randint(0, _TILE, (qn, nt)).astype(np.int32)
    # plant topk winners in DISTINCT groups of 8 tiles per query
    want_ids, want_vals = [], []
    for q in range(qn):
        groups = rng.choice(nt // 8, topk, replace=False)
        tiles = groups * 8 + rng.randint(0, 8, topk)
        vals = np.sort(rng.uniform(0.0, 0.5, topk)).astype(np.float32)
        scores[q, tiles] = vals
        want_ids.append(tiles * _TILE + lanes[q, tiles])
        want_vals.append(vals)
    bits = scores.view(np.int32)
    keys = ((bits & ~0x7F) | lanes).view(np.float32)
    dists, ids = _merge_packed_keys(jnp.asarray(queries), jnp.asarray(keys),
                                    topk, recall_target=0.99)
    dists, ids = np.asarray(dists), np.asarray(ids)
    for q in range(qn):
        assert set(ids[q].tolist()) == set(np.asarray(want_ids[q]).tolist()), q
        np.testing.assert_allclose(dists[q], want_vals[q], rtol=2e-4)
