"""Multi-device tests on the 8-way virtual CPU mesh: sharded scan and
distributed PQk-means must match their single-device counterparts."""

import numpy as np
import jax
import jax.numpy as jnp

from rii_tpu import PQ, Rii
from rii_tpu.models.ivf import code_norms_np
from rii_tpu.ops.scan import linear_scan_topk
from rii_tpu.parallel import (
    make_mesh,
    shard_database,
    make_sharded_linear_scan,
    make_sharded_pqkmeans_step,
)


def _index(n=2048, d=32, m=4, ks=16):
    rng = np.random.RandomState(7)
    x = rng.random((n, d)).astype(np.float32)
    pq = PQ(M=m, Ks=ks).fit(x)
    codes = pq.encode(x)
    norms = code_norms_np(pq.codewords, codes)
    return x, pq, codes, norms


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_linear_scan_matches_single_device():
    x, pq, codes, norms = _index()
    cw = jnp.asarray(pq.codewords)
    queries = jnp.asarray(x[:16])
    topk = 10

    d_ref, i_ref = linear_scan_topk(queries, jnp.asarray(codes),
                                    jnp.asarray(norms), cw, topk=topk, block=512)

    mesh = make_mesh()
    codes_sh, norms_sh = shard_database(mesh, codes, norms)
    fn = make_sharded_linear_scan(mesh, topk=topk, block=256)
    d_sh, i_sh = fn(queries, codes_sh, norms_sh, cw)

    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), rtol=1e-4)
    # ids may differ on exact ties only; require distance-set equality and
    # near-total id agreement
    assert (np.asarray(i_sh) == np.asarray(i_ref)).mean() > 0.99


def test_sharded_pqkmeans_step_matches_reference_impl():
    x, pq, codes, norms = _index()
    k = 16
    codes_i = codes.astype(np.int32)
    weights = np.ones(len(codes), np.float32)

    mesh = make_mesh()
    step = make_sharded_pqkmeans_step(mesh, k=k)
    centers0 = codes_i[np.random.RandomState(0).permutation(len(codes))[:k]]
    cw = jnp.asarray(pq.codewords)
    new_centers, assign = step(jnp.asarray(codes_i), jnp.asarray(weights),
                               jnp.asarray(centers0), cw)

    # single-device oracle: one full Lloyd step in decoded domain
    from rii_tpu.models.pqkmeans import _assign_blocks, _update_centers
    cb = jnp.asarray(codes_i.reshape(-1, 512, codes.shape[1]))
    wb = jnp.asarray(weights.reshape(-1, 512))
    a_ref, _, sums, counts = _assign_blocks(cw, cb, wb, jnp.asarray(centers0), True)
    c_ref = _update_centers(cw, jnp.asarray(centers0), sums, counts)

    assert (np.asarray(assign) == np.asarray(a_ref).reshape(-1)).mean() > 0.99
    assert (np.asarray(new_centers) == np.asarray(c_ref)).mean() > 0.95


def test_rii_results_consistent_with_sharded_scan():
    """End-to-end: Rii.query(linear) agrees with the mesh-sharded scan."""
    x, pq, codes, norms = _index()
    e = Rii(fine_quantizer=pq)
    e.add_configure(vecs=x, nlist=16)
    q = x[:4]
    ids_e, dists_e = e.query_batch(q, topk=5, method="linear")

    mesh = make_mesh()
    dc = e._ensure_cache()
    cap = dc["cap"]
    codes_pad = np.zeros((cap, codes.shape[1]), np.uint8)
    codes_pad[: len(codes)] = codes
    norms_pad = np.full(cap, np.inf, np.float32)
    norms_pad[: len(codes)] = norms
    codes_sh, norms_sh = shard_database(mesh, codes_pad, norms_pad)
    fn = make_sharded_linear_scan(mesh, topk=5, block=256)
    d_sh, i_sh = fn(jnp.asarray(q), codes_sh, norms_sh, jnp.asarray(pq.codewords))
    np.testing.assert_allclose(np.asarray(d_sh), dists_e, rtol=1e-4)
    assert (np.asarray(i_sh) == ids_e).mean() > 0.99


def test_sharded_ivf_matches_linear_at_full_coverage():
    rng = np.random.RandomState(11)
    n, d = 4096, 32
    x = rng.random((n, d)).astype(np.float32)
    pq = PQ(M=4, Ks=16).fit(x[:1024], iter=3)
    e = Rii(pq)
    e.scan_mode = "bf16"
    e.add_configure(x, nlist=48, iter=3)

    from rii_tpu.parallel import ShardedRii
    sr = ShardedRii(e, use_decoded=True)
    assert sr.ivf is not None
    queries = x[rng.choice(n, 8, replace=False)]

    # full coverage (L=N) must reproduce the exact linear top-k id set
    ids_l, d_l = sr.query_batch(queries, topk=10)
    ids_i, d_i = sr.query_ivf_batch(queries, topk=10, L=n)
    for a, b in zip(ids_l, ids_i):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.sort(d_i, 1), np.sort(d_l, 1), rtol=1e-4)


def test_sharded_ivf_default_L_contracts():
    rng = np.random.RandomState(13)
    n, d = 4096, 32
    x = rng.random((n, d)).astype(np.float32)
    pq = PQ(M=4, Ks=16).fit(x[:1024], iter=3)
    e = Rii(pq)
    e.scan_mode = "bf16"
    e.add_configure(x, nlist=48, iter=3)

    from rii_tpu.parallel import ShardedRii
    sr = ShardedRii(e, use_decoded=True)
    queries = x[rng.choice(n, 4, replace=False)]
    ids, dists = sr.query_ivf_batch(queries, topk=5)
    assert ids.shape == (4, 5)
    assert (np.diff(dists, axis=1) >= 0).all()
    # at these sizes local probing covers every shard window, so the result
    # must match the exact sharded linear scan
    ids_l, d_l = sr.query_batch(queries, topk=5)
    assert (ids == ids_l).mean() > 0.9  # ties may swap ids only
    np.testing.assert_allclose(dists, d_l, rtol=1e-4)
    for row in ids:
        row = row[row >= 0]
        assert len(set(row.tolist())) == len(row)


def test_sharded_rescore_distances_are_exact_adc():
    """Round-5: the per-shard exact-f32 rescore epilogue (auto-on at small Q)
    makes ShardedRii's returned distances equal the exact ADC oracle —
    bit-comparable across shards, so the cross-shard merge stays correct."""
    from rii_tpu.parallel import ShardedRii
    from rii_tpu.utils.oracle import adc_np, dtable_np

    x, pq, codes, norms = _index()
    e = Rii(fine_quantizer=pq)
    e.scan_mode = "bf16"
    e.add_configure(vecs=x, nlist=16)
    sr = ShardedRii(e, use_decoded=True)
    q = x[:6]
    ids, dists = sr.query_batch(q, topk=5)
    for i in range(len(q)):
        dt = dtable_np(q[i], pq.codewords)
        valid = ids[i] >= 0
        ref = np.array([adc_np(dt, codes[j:j + 1])[0]
                        for j in ids[i][valid]])
        np.testing.assert_allclose(dists[i][valid], ref, rtol=2e-5, atol=1e-5)
