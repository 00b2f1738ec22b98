"""Distributed index build: PQk-means fit + posting assignment on a mesh.

The reference parallelizes exactly two build loops with OpenMP — the
clustering assignment (/root/reference/src/pqkmeans.cpp:88) and the
posting-list assignment (/root/reference/src/rii.h:350). Here both run SPMD
over a device mesh: codes are row-sharded, each shard computes assignments and
per-group center statistics locally, and the group partials are all-gathered
and combined with the SAME sequential reduce as the single-device fit
(models/pqkmeans._combine_group_stats).

Bit-identity contract: when the mesh size divides the canonical group count
(models/pqkmeans._CANON_GROUPS = 8 — so 1/2/4/8-device meshes), the mesh fit
performs the identical f32 operations in the identical order as the
single-device fit, so `reconfigure_on_mesh` produces bit-identical coarse
centers and posting lists to `Rii.reconfigure`. Larger meshes use
groups = n_devices: deterministic per topology, same algorithm, but f32
reduction order differs from the single-device path.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from rii_tpu.models.pqkmeans import (
    _CANON_GROUPS,
    _assign_blocks,
    _combine_group_stats,
    _group_stats,
    _pad_blocks,
    _pow2_at_least,
    _update_centers,
    fit_layout,
)
from rii_tpu.parallel.mesh import DATA_AXIS, put_sharded

_RECONFIGURE_SAMPLE_SEED = 123  # mirrors src/rii.h:122 (same as rii.py)
_PQKMEANS_SEED = 0


def _sharded_to_host(arr):
    """Fetch a mesh-sharded array to host numpy; under multi-host the shards
    span non-addressable devices, so gather them across processes first."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(arr)


def mesh_groups(ndev):
    """Reduction-group count for an ndev mesh (see module docstring)."""
    if ndev <= _CANON_GROUPS and _CANON_GROUPS % ndev == 0:
        return _CANON_GROUPS
    return ndev


def _resolve_axes(mesh, axis_name):
    """(axes tuple, ndev) for 1-D or multi-axis meshes. axis_name=None means
    ALL mesh axes — the 2-D hosts x chips mesh shards the fit/predict rows
    over both axes (device order is row-major = process-major, so the
    gathered group order matches the P(axes) sharding order and the
    bit-identity contract carries over unchanged)."""
    if axis_name is None:
        axes = tuple(mesh.axis_names)
    elif isinstance(axis_name, str):
        axes = (axis_name,)
    else:
        axes = tuple(axis_name)
    ndev = int(np.prod([mesh.shape[a] for a in axes]))
    return axes, ndev


def make_sharded_pqkmeans_fit(mesh, k, iters, groups, axis_name=DATA_AXIS):
    """Jitted mesh PQk-means fit over group-sharded blocks.

    fn(codes_gb (G, nb_l, B, M) int32 sharded on G, weights_gb (G, nb_l, B),
       centers0 (k, M) int32 replicated, codewords replicated)
    -> (centers (k, M) int32 replicated, assigns (G, nb_l, B) sharded on G).

    Each device owns G/ndev contiguous groups; per-iteration group partials
    are all-gathered (small: G x k x D) and combined replicated with the
    single-device combine, then the sparse-voting update runs replicated.
    """
    axes, ndev = _resolve_axes(mesh, axis_name)
    assert groups % ndev == 0, (groups, ndev)
    axis_name = axes if len(axes) > 1 else axes[0]

    def _local(codes_gb_l, weights_gb_l, centers0, codewords):
        centers = centers0
        for _ in range(iters - 1):
            sums_g_l, counts_g_l = _group_stats(
                codewords, codes_gb_l, weights_gb_l, centers)
            sums_g = lax.all_gather(sums_g_l, axis_name).reshape(
                groups, *sums_g_l.shape[1:])
            counts_g = lax.all_gather(counts_g_l, axis_name).reshape(
                groups, *counts_g_l.shape[1:])
            sums, counts = _combine_group_stats(sums_g, counts_g)
            centers = _update_centers(codewords, centers, sums, counts)

        def g_assign(_, args):
            cb, wb = args
            a, _, _, _ = _assign_blocks(codewords, cb, wb, centers,
                                        collect=False)
            return 0, a

        _, assigns = lax.scan(g_assign, 0, (codes_gb_l, weights_gb_l))
        return centers, assigns

    fn = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis_name, None, None, None), P(axis_name, None, None),
                  P(), P()),
        out_specs=(P(), P(axis_name, None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_predict(mesh, axis_name=DATA_AXIS):
    """Jitted mesh posting assignment: per-shard blocked argmin, no reduce.

    fn(codes_blocks (nb, B, M) sharded, weights (nb, B) sharded,
       centers (k, M) replicated, codewords) -> assigns (nb, B) sharded.
    """
    axes, _ = _resolve_axes(mesh, axis_name)
    axis_name = axes if len(axes) > 1 else axes[0]

    def _local(codes_b_l, weights_b_l, centers, codewords):
        a, _, _, _ = _assign_blocks(codewords, codes_b_l, weights_b_l,
                                    centers, collect=False)
        return a

    fn = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis_name, None, None), P(axis_name, None), P(), P()),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    return jax.jit(fn)


def fit_on_mesh(mesh, codewords, codes, k, iters=5, seed=_PQKMEANS_SEED,
                axis_name=None):
    """Mesh PQk-means: same sampling/init/layout as models.pqkmeans_fit.

    Returns (centers (k, M) uint8 numpy, assignments (N,) int32 numpy).
    """
    codes = np.asarray(codes)
    n = codes.shape[0]
    assert 1 <= k <= n, (k, n)
    axis_name, ndev = _resolve_axes(mesh, axis_name)
    axis_name = axis_name if len(axis_name) > 1 else axis_name[0]
    g = mesh_groups(ndev)
    blk, nb = fit_layout(n, groups=g)
    codes_blocks, weights_blocks = _pad_blocks(codes, blk, n_blocks=nb)
    m = codes.shape[1]
    codes_gb = np.asarray(codes_blocks).reshape(g, nb // g, blk, m)
    weights_gb = np.asarray(weights_blocks).reshape(g, nb // g, blk)
    codes_gb = put_sharded(mesh, codes_gb, P(axis_name, None, None, None))
    weights_gb = put_sharded(mesh, weights_gb, P(axis_name, None, None))
    pick = np.random.RandomState(seed).permutation(n)[:k]
    centers0 = jnp.asarray(codes[pick].astype(np.int32))
    cw = jnp.asarray(np.asarray(codewords), dtype=jnp.float32)
    fit = make_sharded_pqkmeans_fit(mesh, k=k, iters=max(1, int(iters)),
                                    groups=g, axis_name=axis_name)
    centers, assigns = fit(codes_gb, weights_gb, centers0, cw)
    return (np.asarray(centers, dtype=np.uint8),
            _sharded_to_host(assigns).reshape(-1)[:n].astype(np.int32))


def predict_on_mesh(mesh, codewords, centers, codes, block=4096,
                    axis_name=None):
    """Mesh posting assignment over all codes (same blocking as
    models.pqkmeans_predict, nb padded to the mesh size)."""
    codes = np.asarray(codes)
    n = codes.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int32)
    axis_name, ndev = _resolve_axes(mesh, axis_name)
    axis_name = axis_name if len(axis_name) > 1 else axis_name[0]
    blk = min(block, _pow2_at_least(n, 256))
    nb_raw = -(-n // blk)
    nb = -(-nb_raw // ndev) * ndev
    codes_blocks, weights_blocks = _pad_blocks(codes, blk, n_blocks=nb)
    codes_blocks = put_sharded(mesh, np.asarray(codes_blocks),
                               P(axis_name, None, None))
    weights_blocks = put_sharded(mesh, np.asarray(weights_blocks),
                                 P(axis_name, None))
    cw = jnp.asarray(np.asarray(codewords), dtype=jnp.float32)
    centers_j = jnp.asarray(np.asarray(centers).astype(np.int32))
    fn = make_sharded_predict(mesh, axis_name=axis_name)
    assigns = fn(codes_blocks, weights_blocks, centers_j, cw)
    return _sharded_to_host(assigns).reshape(-1)[:n].astype(np.int32)


def reconfigure_on_mesh(engine, mesh, nlist=None, iter=5,
                        axis_name=None, on_swap=None):
    """Distributed Rii.reconfigure: the clustering fit and the all-N posting
    assignment run SPMD on the mesh; everything else (sampling rule, seeds,
    threshold refresh) matches Rii.reconfigure exactly
    (/root/reference/src/rii.h:108-156 semantics).

    Mutates and returns `engine`. Bit-identical to engine.reconfigure() for
    mesh sizes dividing the canonical group count (see module docstring).
    `on_swap`, if given, runs inside the same write-lock acquisition as the
    state swap — ShardedRii uses it to rebuild its shards atomically with
    the engine mutation, so no query can observe new engine metadata
    (nlist/threshold) against old sharded arrays.
    """
    n = engine.N
    if nlist is None:
        nlist = int(np.sqrt(n))
    assert 0 < nlist, "nlist must be positive"
    assert nlist <= n, "nlist must be <= N"
    codes = engine._consolidated_codes()
    n_train = min(n, nlist * 100)
    pick = np.random.RandomState(_RECONFIGURE_SAMPLE_SEED).permutation(n)[:n_train]
    if engine.verbose:
        print(f"Training coarse centers on {n_train} codes (nlist={nlist}, "
              f"mesh={dict(mesh.shape)})")
    centers, _ = fit_on_mesh(mesh, engine.codewords, codes[pick], k=nlist,
                             iters=max(1, int(iter)), axis_name=axis_name)
    assign = predict_on_mesh(mesh, engine.codewords, centers, codes,
                             axis_name=axis_name)
    # the long SPMD fit/predict ran on a consistent snapshot; only the state
    # swap needs the exclusive side (queries keep the old state meanwhile)
    with engine._state_lock.write():
        engine._centers = centers
        engine._assign_chunks = [assign.astype(np.int32)]
        engine._bump()
        engine.threshold = engine._analytic_threshold()
        if on_swap is not None:
            on_swap()
    return engine
