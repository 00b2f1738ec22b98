"""Pallas TPU kernel: fused uint8 PQ-code scan (decode + score + tile-reduce).

This is the memory-lean flagship path (codes stay N*M uint8 in HBM — no decoded
replica). The XLA one-hot formulation must materialize (B, Ks)-sized one-hot
tensors in HBM (matmul operands can't live inside fusions), costing ~16-32GB of
traffic per 1M-code scan (~55 us/query measured); this kernel builds each
one-hot **in VMEM** and feeds the MXU directly:

  per 256-code sub-block, for each subspace m:
    oh_m (SUB, Ks) = (codes[:, m] == iota)            [VPU, VMEM-resident]
    dec (SUB, D)  += oh_m @ CW_m (Ks, D)              [MXU; CW_m is the m-th
                                                       codebook zero-padded to
                                                       full width D]
  cross (SUB, Q) = dec_bf16 @ qT (D, Q)               [MXU]
  scores_T (SUB, Q) = norms_col - 2*cross             [VPU]
  per 128-row tile: (min, argmin) over sublanes  -> out (BLK/128, Q)

Everything stays in natural orientation — no in-kernel transposes or
lane-merging reshapes (which the Mosaic lowering rejects). Queries are passed
pre-transposed (D, Q); outputs are (ntiles, Q), transposed once in XLA.

The final merge (top-k over (Q, N/128) tile minima) is exact; a tile reports
one candidate, so results match exact top-k unless two of the true top-k land
in the same 128-slot tile (~k^2/(2*(N/128)) of queries — same accuracy class
as lax.approx_max_k(recall_target~=0.99)).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 256   # codes decoded per inner step (bounds VMEM one-hot: SUB x Ks bf16)
_TILE = 128  # slots per reported (min, argmin)


def build_padded_codewords(codewords):
    """(M, Ks, Ds) f32 -> (M, Ks, D) bf16 with each m's slab zero-padded to D.

    Row m is the m-th codebook placed at columns [m*Ds, (m+1)*Ds); accumulating
    oh_m @ CW_m over m reconstructs the full decoded vector.
    """
    m, ks, ds = codewords.shape
    d = m * ds
    out = np.zeros((m, ks, d), dtype=np.float32)
    cw = np.asarray(codewords)
    for mm in range(m):
        out[mm, :, mm * ds:(mm + 1) * ds] = cw[mm]
    return jnp.asarray(out, dtype=jnp.bfloat16)


def _scan_kernel(codes_ref, norms_ref, qt_ref, cw_ref, min_ref, arg_ref,
                 *, ks, blk, packed=True):
    """One grid step: scores for BLK codes -> per-tile (min, argmin), (nt, Q).

    All inner loops are unrolled with static indices: the Mosaic build in this
    environment has no dynamic_slice lowering for TC kernels.
    """
    m = cw_ref.shape[0]
    qn = qt_ref.shape[1]
    n_sub = blk // _SUB
    tiles_per_sub = _SUB // _TILE
    base = pl.program_id(0) * blk

    for s in range(n_sub):  # static unroll
        codes = codes_ref[s * _SUB:(s + 1) * _SUB, :]  # (SUB, M) uint8
        k_iota = lax.broadcasted_iota(jnp.int32, (_SUB, ks), 1)

        dec = None
        for mm in range(m):  # static unroll: one MXU matmul per subspace
            col = codes[:, mm].astype(jnp.int32)  # (SUB,)
            oh = (col[:, None] == k_iota).astype(jnp.bfloat16)  # (SUB, Ks)
            part = jnp.dot(oh, cw_ref[mm], preferred_element_type=jnp.float32)
            dec = part if dec is None else dec + part  # (SUB, D)

        cross = jnp.dot(dec.astype(jnp.bfloat16), qt_ref[...],
                        preferred_element_type=jnp.float32)  # (SUB, Q)
        scores = norms_ref[s * _SUB:(s + 1) * _SUB, :] - 2.0 * cross
        _tile_reduce_and_store(scores, base, s, qn, min_ref, arg_ref,
                               packed=packed)


_PACK_CLAMP = 3.0e38   # +inf clamped finite so packing can't produce NaN
_PACK_RESTORE = 2.9e38  # restored to +inf after unpacking (padding mask)


def _tile_reduce_and_store(scores, base, s, qn, min_ref, arg_ref,
                           packed=True):
    """Shared epilogue: (SUB, Q) scores -> per-128-row (min, argmin) stores.

    packed=True (default): ONE order-preserving reduce over f32 keys whose
    low 7 mantissa bits are replaced by the in-tile slot index — min(key)
    simultaneously yields the min score (at ~2^-16 relative precision, well
    inside the documented bf16-cross accuracy class) and its slot. Halves the
    VPU reduce work vs the two-pass (min, compare+where+min) formulation.
    Bit-clearing the mantissa is monotone on each sign half and the 127-ulp
    index never crosses a 128-ulp bucket, so key order == score order.
    packed=False keeps the exact two-pass epilogue (bit-exact vmin).
    """
    tiles_per_sub = _SUB // _TILE
    st = scores.reshape(tiles_per_sub, _TILE, qn)
    row = lax.broadcasted_iota(jnp.int32, (tiles_per_sub, _TILE, qn), 1)
    if packed:
        st = jnp.minimum(st, jnp.float32(_PACK_CLAMP))
        bits = lax.bitcast_convert_type(st, jnp.int32)
        key = (bits & jnp.int32(~0x7F)) | row
        kmin = jnp.min(lax.bitcast_convert_type(key, jnp.float32), axis=1)
        kbits = lax.bitcast_convert_type(kmin, jnp.int32)
        amin = kbits & jnp.int32(0x7F)
        vmin = lax.bitcast_convert_type(kbits & jnp.int32(~0x7F), jnp.float32)
        vmin = jnp.where(vmin >= jnp.float32(_PACK_RESTORE), jnp.inf, vmin)
    else:
        vmin = jnp.min(st, axis=1)  # (tps, Q)
        amin = jnp.min(jnp.where(st == vmin[:, None, :], row, _TILE), axis=1)
        amin = jnp.minimum(amin, _TILE - 1)
    tile_base = base + s * _SUB + lax.broadcasted_iota(
        jnp.int32, (tiles_per_sub, qn), 0) * _TILE
    out_row = s * tiles_per_sub
    min_ref[out_row:out_row + tiles_per_sub, :] = vmin
    arg_ref[out_row:out_row + tiles_per_sub, :] = tile_base + amin


def _replica_scan_kernel(dec_ref, norms_ref, qt_ref, min_ref, arg_ref, *, blk,
                         packed=True):
    """Replica-mode grid step: one MXU GEMM per sub-block + tile reduce."""
    qn = qt_ref.shape[1]
    base = pl.program_id(0) * blk
    for s in range(blk // _SUB):  # static unroll
        dec = dec_ref[s * _SUB:(s + 1) * _SUB, :]  # (SUB, D) bf16
        cross = jnp.dot(dec, qt_ref[...], preferred_element_type=jnp.float32)
        scores = norms_ref[s * _SUB:(s + 1) * _SUB, :] - 2.0 * cross
        _tile_reduce_and_store(scores, base, s, qn, min_ref, arg_ref,
                               packed=packed)


@partial(jax.jit, static_argnames=("blk", "interpret", "packed"))
def replica_scan_tile_minima(queries, decoded, norms_col, blk=1024,
                             interpret=False, packed=True):
    """Per-tile (min, argmin) over the bf16 decoded replica.

    decoded: (cap, D) bf16; norms_col: (cap, 1) f32 (+inf padding).
    Returns (vmin (Q, cap/128) WITHOUT ||q||^2, amin (Q, cap/128) int32).
    """
    cap, d = decoded.shape
    qn = queries.shape[0]
    assert cap % blk == 0 and blk % _SUB == 0 and blk // _TILE >= 8, (cap, blk)
    nt = cap // _TILE
    qt = queries.astype(jnp.bfloat16).T  # (D, Q)
    kernel = partial(_replica_scan_kernel, blk=blk, packed=packed)
    vmin_t, amin_t = pl.pallas_call(
        kernel,
        grid=(cap // blk,),
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, qn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk // _TILE, qn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk // _TILE, qn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, qn), jnp.float32),
            jax.ShapeDtypeStruct((nt, qn), jnp.int32),
        ],
        interpret=interpret,
    )(decoded, norms_col, qt)
    return vmin_t.T, amin_t.T


def _merge_tile_minima(queries, vmin, amin, topk, recall_target):
    """Exact/approx top-k over tile minima + ||q||^2 restore (shared)."""
    qn = queries.shape[0]
    nt = vmin.shape[1]
    qsq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)
    k_eff = min(topk, nt)
    if recall_target is None:
        neg, pos = lax.top_k(-vmin, k_eff)
    else:
        neg, pos = lax.approx_max_k(-vmin, k_eff, recall_target=recall_target)
    ids = jnp.take_along_axis(amin, pos, axis=1)
    dists = -neg + qsq[:, None]
    if k_eff < topk:
        pad = topk - k_eff
        dists = jnp.concatenate([dists, jnp.full((qn, pad), jnp.inf)], axis=1)
        ids = jnp.concatenate([ids, jnp.full((qn, pad), -1, ids.dtype)], axis=1)
    ids = jnp.where(jnp.isfinite(dists), ids, -1)
    return dists, ids


@partial(jax.jit, static_argnames=("topk", "blk", "interpret", "recall_target",
                                   "packed", "overfetch"))
def replica_scan_topk(queries, decoded, norms_col, topk, codes=None,
                      codewords=None, blk=1024, interpret=False,
                      recall_target=0.99, packed=None, overfetch=2):
    """Fused replica scan (GEMM + tile reduce in one kernel). Same accuracy
    class as pq_scan_topk. packed=None follows the contract: bit-exact reduce
    for recall_target=None, packed-key otherwise. With `codes`/`codewords`,
    the final top-k is overfetched and re-ranked in exact f32 ADC (see
    replica_scan_topk_t)."""
    if packed is None:
        packed = recall_target is not None
    vmin, amin = replica_scan_tile_minima(queries, decoded, norms_col, blk=blk,
                                          interpret=interpret, packed=packed)
    if codes is None:
        return _merge_tile_minima(queries, vmin, amin, topk, recall_target)
    k_fetch = min(max(topk * overfetch, topk + 8), vmin.shape[1])
    _, ids_a = _merge_tile_minima(queries, vmin, amin, k_fetch, recall_target)
    return _exact_rescore_codes(queries, ids_a, codes, codewords,
                                norms_col[:, 0], topk)


# --------------------------------------------------------------------------- #
# transposed replica scan: the small-Q roofline path.
#
# The row-major kernel's (BLK, D) x (D, Q) GEMM has Q output columns; the
# TPU's MXUs split matmul work by OUTPUT COLUMNS, so at Q <= 128 only one of
# the four engages (measured 1.07 ms/1M rows = one MXU's 31 TF/s, while the
# HBM pipe alone delivers 753 GB/s = 0.36 ms). Storing the replica TRANSPOSED
# (D, cap) makes database rows the output columns: (Q, D) x (D, BLK) has BLK
# columns, all MXUs engage at any Q, and the scan is DMA-bound again
# (measured 0.43 ms/1M rows = 620 GB/s = 82% of the v5e roofline at Q=128).
#
# The epilogue uses the packed-key single reduce over LANES: the low 7
# mantissa bits of each f32 score carry the in-tile lane index, so one min
# yields both the tile minimum (at 2^-16 relative precision, inside the
# documented bf16-cross class) and its slot. Norms ride as a (1, cap) f32
# stream (+1.6% traffic; Mosaic requires the block sublane dim to divide 8
# or equal the array dim, so the ARRAY must be one row, not a row slice of a
# replicated (8, cap) array) so distances keep exact f32 norms.
# --------------------------------------------------------------------------- #

_TBLK = 16384   # database columns per grid step (scores transient: qc x TBLK)
_QCHUNK = 256   # query rows scored per inner step (bounds VMEM to ~16 MB)


def _replica_t_kernel(decT_ref, nr_ref, q_ref, key_ref, *, blk, qn):
    nt = blk // _TILE
    for c in range(-(-qn // _QCHUNK)):  # static unroll over query chunks
        lo = c * _QCHUNK
        hi = min(qn, lo + _QCHUNK)
        qc = hi - lo
        qs = q_ref[lo:hi, :]  # (qc, D) bf16
        cross = jnp.dot(qs, decT_ref[...],
                        preferred_element_type=jnp.float32)  # (qc, BLK)
        scores = nr_ref[0:1, :] - 2.0 * cross
        st = jnp.minimum(scores, jnp.float32(_PACK_CLAMP)).reshape(
            qc, nt, _TILE)
        lane = lax.broadcasted_iota(jnp.int32, (qc, nt, _TILE), 2)
        bits = lax.bitcast_convert_type(st, jnp.int32)
        key = (bits & jnp.int32(~0x7F)) | lane
        key_ref[lo:hi, :] = jnp.min(
            lax.bitcast_convert_type(key, jnp.float32), axis=2)


def _nn_blk(cap, blk):
    """NN out-block constraint: (qn, blk/128) last dim must be 128-divisible
    (blk % 16384 == 0) or equal to the whole array (blk == cap).

    Honors the caller's blk when it satisfies the constraint and divides cap;
    otherwise falls back to _TBLK (when it divides cap) or a single block
    (small caps only — the (_QCHUNK, blk) f32 score transient must fit the
    100 MB vmem budget, so single-block caps are limited to 1<<16)."""
    if blk != _TBLK and blk % _TBLK == 0 and cap % blk == 0:
        return blk
    if cap % _TBLK == 0:
        return _TBLK
    assert cap <= 1 << 16, (
        f"cap={cap}: transposed NN scan needs cap % {_TBLK} == 0 or a "
        f"single-block-capable cap <= {1 << 16}; pad capacity to a multiple "
        f"of {_TBLK}")
    return cap


def _replica_keys_nn(queries, decoded_t, norms_rep, blk=_TBLK,
                     interpret=False):
    """Packed per-128-slot min keys (Q, cap/128) via the NN kernel."""
    d, cap = decoded_t.shape
    qn = queries.shape[0]
    blk = _nn_blk(cap, blk)
    assert cap % blk == 0 and blk % _TILE == 0, (cap, blk)
    nt_total = cap // _TILE
    qb = queries.astype(jnp.bfloat16)  # (Q, D)
    kernel = partial(_replica_t_kernel, blk=blk, qn=qn)
    return pl.pallas_call(
        kernel,
        grid=(cap // blk,),
        in_specs=[
            pl.BlockSpec((d, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            # one-sublane norms stream: blk*4 bytes per block instead of the
            # 8x sublane-replicated stream (+12.5% -> +1.6% of data traffic)
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qn, blk // _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qn, nt_total), jnp.float32),
        # the (QCHUNK, BLK) f32 score transient exceeds the default 16 MB
        # scoped-vmem budget at larger Q; the v5e has 128 MB of VMEM
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(decoded_t, norms_rep, qb)


def _unpack_keys(keys):
    """(Q, nt) packed keys -> (vmin, amin) with global slot ids."""
    nt_total = keys.shape[1]
    bits = lax.bitcast_convert_type(keys, jnp.int32)
    lane = bits & jnp.int32(0x7F)
    vmin = lax.bitcast_convert_type(bits & jnp.int32(~0x7F), jnp.float32)
    vmin = jnp.where(vmin >= jnp.float32(_PACK_RESTORE), jnp.inf, vmin)
    amin = jnp.arange(nt_total, dtype=jnp.int32)[None, :] * _TILE + lane
    return vmin, amin


@partial(jax.jit, static_argnames=("blk", "interpret"))
def replica_scan_tile_minima_t(queries, decoded_t, norms_rep, blk=_TBLK,
                               interpret=False):
    """Per-128-slot (min, argmin) over the TRANSPOSED bf16 replica.

    Args:
        queries: (Q, D) f32.
        decoded_t: (D, cap) bf16 — the replica stored column-major so rows
            are MXU output columns (see block comment above).
        norms_rep: (1, cap) f32 — ||decode||^2 (+inf on padded columns).

    Returns (vmin (Q, cap/128) f32 WITHOUT ||q||^2 at packed-key precision,
    amin (Q, cap/128) int32 global slot ids).
    """
    return _unpack_keys(_replica_keys_nn(queries, decoded_t, norms_rep,
                                         blk=blk, interpret=interpret))


def _replica_tn_kernel(decT_ref, nc_ref, q_ref, key_ref, *, blk):
    """Large-Q grid step from the SAME (D, cap) layout: a TN contraction
    (decT^T against q^T) puts the Q queries in the output columns — plenty of
    column tiles at Q >= 512, so all MXUs engage (measured 177 TF/s at
    Q=1024) — and the reduce runs over SUBLANE row groups (cheap), avoiding
    the NN path's per-vreg lane tree whose cost grows with Q*N."""
    qn = q_ref.shape[0]
    ntiles = blk // _TILE
    cross = lax.dot_general(decT_ref[...], q_ref[...],
                            (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BLK, Q)
    scores = nc_ref[...] - 2.0 * cross
    st = jnp.minimum(scores, jnp.float32(_PACK_CLAMP)).reshape(
        ntiles, _TILE, qn)
    row = lax.broadcasted_iota(jnp.int32, (ntiles, _TILE, qn), 1)
    bits = lax.bitcast_convert_type(st, jnp.int32)
    key = (bits & jnp.int32(~0x7F)) | row
    key_ref[...] = jnp.min(lax.bitcast_convert_type(key, jnp.float32), axis=1)


def _replica_keys_tn(queries, decoded_t, norms_rep, interpret=False):
    """Packed per-128-slot min keys (Q, cap/128) via the TN kernel."""
    import math
    d, cap = decoded_t.shape
    qn = queries.shape[0]
    # bound the (BLK, Q) f32 score transient to ~32 MB
    blk = min(_TBLK, cap, max(1024, ((1 << 23) // qn) // 1024 * 1024))
    blk = math.gcd(blk, cap)  # sharded caps are k*1024, not pow2
    assert cap % blk == 0 and blk % _TILE == 0, (cap, blk, qn)
    nt_total = cap // _TILE
    qb = queries.astype(jnp.bfloat16)  # (Q, D)
    norms_col = norms_rep[0].reshape(cap, 1)
    kernel = partial(_replica_tn_kernel, blk=blk)
    keys_t = pl.pallas_call(
        kernel,
        grid=(cap // blk,),
        in_specs=[
            pl.BlockSpec((d, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk // _TILE, qn), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt_total, qn), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(decoded_t, norms_col, qb)
    return keys_t.T  # (Q, nt_total)


@partial(jax.jit, static_argnames=("interpret",))
def replica_scan_tile_minima_tn(queries, decoded_t, norms_rep,
                                interpret=False):
    """Large-Q per-128-slot (min, argmin) from the transposed replica (see
    _replica_tn_kernel). Same return contract as replica_scan_tile_minima_t."""
    return _unpack_keys(_replica_keys_tn(queries, decoded_t, norms_rep,
                                         interpret=interpret))


_TN_MIN_Q = 512  # NN lane-reduce below (DMA-bound), TN sublane-reduce from
                 # here up (MXU-bound; lane-tree cost would scale with Q*N)


def _merge_packed_keys(queries, keys, topk, recall_target):
    """Top-k directly over PACKED keys (order-preserving, so selecting min
    keys == selecting min scores), unpacking only the topk winners — skips
    materializing full-width (Q, nt) vmin/amin arrays.

    keys: (Q, nt) f32 packed (low 7 mantissa bits = in-tile lane).

    Big-Q approx mode adds a MIN-8 PRE-REDUCE: 3 more mantissa bits (7..9)
    carry the in-group column, one vectorized min folds 8 tile keys into
    one group key, and approx_max_k runs over nt/8 columns — at Q=1024,
    N=1M the cross-tile merge was ~40% of the end-to-end scan (ROADMAP 1b).
    Candidate granularity coarsens to one per 1024 slots (~2^-13-relative
    key precision) — inside the recall_target accuracy class, and disabled
    in exact mode (recall_target=None).
    """
    qn, nt = keys.shape
    qsq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)
    pre8 = (recall_target is not None and qn >= _TN_MIN_Q
            and nt >= 4096 and nt % 8 == 0 and topk <= nt // 8)
    if pre8:
        b = lax.bitcast_convert_type(keys, jnp.int32).reshape(qn, nt // 8, 8)
        col = lax.broadcasted_iota(jnp.int32, (qn, nt // 8, 8), 2)
        key2 = (b & jnp.int32(~0x3FF)) | (col << 7) | (b & jnp.int32(0x7F))
        keys = jnp.min(lax.bitcast_convert_type(key2, jnp.float32), axis=2)
        nt = nt // 8
    k_eff = min(topk, nt)
    if recall_target is None:
        neg, pos = lax.top_k(-keys, k_eff)
    else:
        neg, pos = lax.approx_max_k(-keys, k_eff, recall_target=recall_target)
    bits = lax.bitcast_convert_type(-neg, jnp.int32)  # (Q, k_eff) packed
    lane = bits & jnp.int32(0x7F)
    if pre8:
        colw = (bits >> 7) & jnp.int32(0x7)
        vmin = lax.bitcast_convert_type(bits & jnp.int32(~0x3FF), jnp.float32)
        ids = (pos * 8 + colw) * _TILE + lane
    else:
        vmin = lax.bitcast_convert_type(bits & jnp.int32(~0x7F), jnp.float32)
        ids = pos * _TILE + lane
    vmin = jnp.where(vmin >= jnp.float32(_PACK_RESTORE), jnp.inf, vmin)
    dists = vmin + qsq[:, None]
    if k_eff < topk:
        pad = topk - k_eff
        dists = jnp.concatenate([dists, jnp.full((qn, pad), jnp.inf)], axis=1)
        ids = jnp.concatenate([ids, jnp.full((qn, pad), -1, ids.dtype)], axis=1)
    ids = jnp.where(jnp.isfinite(dists), ids, -1)
    return dists, ids


def _exact_rescore_codes(queries, ids_a, codes, codewords, norms_vec, topk):
    """Exact-ADC f32 re-rank of overfetched candidates (the shared epilogue).

    ids_a: (Q, k_fetch) int32 candidate ids, -1 = invalid. The candidates'
    exact decoded rows are reconstructed from the uint8 codes via
    onehot_decode_exact (one-hot over just Q*k_fetch rows — measured faster
    than an XLA gather-decode on TPU, whose gather lowering is slow; the
    one-hot stays bf16 with 0/1 entries contracted against f32 codewords, so
    the decode is exact) and re-scored in f32: returned distances are exact
    ADC (reference semantics, /root/reference/src/rii.h:375-394), and
    selection noise from a lower-precision scoring pass is repaired within
    the overfetched pool. norms_vec: (cap,) f32 ||decode||^2 lookup (+inf on
    padded/masked slots — invalid candidates stay excluded).
    """
    from rii_tpu.ops.decode import onehot_decode_exact
    qn, k_fetch = ids_a.shape
    safe = jnp.maximum(ids_a, 0)
    cand_codes = jnp.take(codes, safe, axis=0)  # (Q, k_fetch, M)
    dec = onehot_decode_exact(cand_codes.reshape(qn * k_fetch, -1),
                              codewords).reshape(qn, k_fetch, -1)
    q = queries.astype(jnp.float32)
    cross = jnp.einsum("qkd,qd->qk", dec, q,
                       precision=lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    norms_c = jnp.take(norms_vec, safe)
    qsq = jnp.sum(q * q, axis=1)
    exact = jnp.where(ids_a >= 0, norms_c - 2.0 * cross + qsq[:, None], jnp.inf)
    k_out = min(topk, exact.shape[1])
    neg, pos = lax.top_k(-exact, k_out)
    ids = jnp.take_along_axis(ids_a, pos, axis=1)
    dists = -neg
    if k_out < topk:  # tiny caps: fewer tiles than topk
        pad = topk - k_out
        dists = jnp.concatenate([dists, jnp.full((qn, pad), jnp.inf)], axis=1)
        ids = jnp.concatenate([ids, jnp.full((qn, pad), -1, ids.dtype)], axis=1)
    ids = jnp.where(jnp.isfinite(dists), ids, -1)
    return dists, ids


@partial(jax.jit, static_argnames=("topk", "blk", "interpret", "recall_target",
                                   "overfetch"))
def replica_scan_topk_t(queries, decoded_t, norms_rep, topk, codes=None,
                        codewords=None, blk=_TBLK, interpret=False,
                        recall_target=0.99, overfetch=2):
    """Fused transposed-replica scan — the fastest full-scan path at any Q
    (measured on v5e at N=1M: 0.52 ms @ Q=128 = DMA-bound ~620 GB/s; 1.56 ms
    @ Q=1024 = 177 TF/s MXU-bound). Same accuracy class as replica_scan_topk.

    When `codes`/`codewords` are given, the bf16 selection overfetches
    `overfetch * topk` candidates and the final top-k is re-ranked in exact
    f32 ADC (see _exact_rescore_codes) — the same epilogue the int8 tiers
    ship; gathers only topk*overfetch*Q code rows. Engine policy:
    Rii.exact_rescore (default "auto" = on below the big-Q TN crossover,
    where the measured gather cost is ~0; at Q=1024 a 20k-row codes gather
    costs ~0.9 ms — the known XLA row-gather degradation — so big-Q batches
    keep the documented bf16 accuracy class unless forced).
    """
    if queries.shape[0] >= _TN_MIN_Q:
        keys = _replica_keys_tn(queries, decoded_t, norms_rep,
                                interpret=interpret)
    else:
        keys = _replica_keys_nn(queries, decoded_t, norms_rep, blk=blk,
                                interpret=interpret)
    if codes is None:
        return _merge_packed_keys(queries, keys, topk, recall_target)
    k_fetch = min(max(topk * overfetch, topk + 8), keys.shape[1])
    _, ids_a = _merge_packed_keys(queries, keys, k_fetch, recall_target)
    return _exact_rescore_codes(queries, ids_a, codes, codewords,
                                norms_rep[0], topk)


def prepare_replica_t(decoded, norms_flat):
    """(cap, D) bf16 replica + (cap,) f32 norms -> (decoded_t (D, cap),
    norms_rep (1, cap)) device arrays for the transposed scan."""
    decoded_t = jnp.transpose(decoded)
    return decoded_t, jnp.asarray(norms_flat[None, :])


# --------------------------------------------------------------------------- #
# transposed int8 replica: half the HBM traffic of bf16-T — the fastest
# small-Q selection pass — with the same exact top-k rescore as the row int8.
# --------------------------------------------------------------------------- #

def _replica_i8t_kernel(decT_ref, nr_ref, q_ref, alpha_ref, key_ref, *,
                        blk, qn):
    nt = blk // _TILE
    for c in range(-(-qn // _QCHUNK)):  # static unroll over query chunks
        lo = c * _QCHUNK
        hi = min(qn, lo + _QCHUNK)
        qc = hi - lo
        qs = q_ref[lo:hi, :]  # (qc, D) int8
        cross = jnp.dot(qs, decT_ref[...],
                        preferred_element_type=jnp.int32)  # (qc, BLK)
        scores = (nr_ref[0:1, :]
                  - 2.0 * cross.astype(jnp.float32) * alpha_ref[lo:hi, :])
        st = jnp.minimum(scores, jnp.float32(_PACK_CLAMP)).reshape(
            qc, nt, _TILE)
        lane = lax.broadcasted_iota(jnp.int32, (qc, nt, _TILE), 2)
        bits = lax.bitcast_convert_type(st, jnp.int32)
        key = (bits & jnp.int32(~0x7F)) | lane
        key_ref[lo:hi, :] = jnp.min(
            lax.bitcast_convert_type(key, jnp.float32), axis=2)


def _replica_i8tn_kernel(decT_ref, nc_ref, q_ref, alpha_ref, key_ref, *, blk):
    qn = q_ref.shape[0]
    ntiles = blk // _TILE
    cross = lax.dot_general(decT_ref[...], q_ref[...],
                            (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)  # (BLK, Q)
    scores = nc_ref[...] - 2.0 * cross.astype(jnp.float32) * alpha_ref[...]
    st = jnp.minimum(scores, jnp.float32(_PACK_CLAMP)).reshape(
        ntiles, _TILE, qn)
    row = lax.broadcasted_iota(jnp.int32, (ntiles, _TILE, qn), 1)
    bits = lax.bitcast_convert_type(st, jnp.int32)
    key = (bits & jnp.int32(~0x7F)) | row
    key_ref[...] = jnp.min(lax.bitcast_convert_type(key, jnp.float32), axis=1)


def _quantize_queries_i8(queries, col_scales):
    """Fold per-column scales into the queries and quantize per query."""
    q = queries.astype(jnp.float32)
    qs = q * col_scales[None, :]  # (Q, D)
    qmax = jnp.maximum(jnp.max(jnp.abs(qs), axis=1), 1e-30)  # (Q,)
    qscale = qmax / 127.0
    q_i8 = jnp.clip(jnp.round(qs / qscale[:, None]), -127, 127).astype(jnp.int8)
    return q_i8, qscale


def _replica_keys_i8t(queries, decoded_i8_t, col_scales, norms_rep,
                      interpret=False):
    """Packed per-128-slot min keys over the transposed int8 replica."""
    import math
    d, cap = decoded_i8_t.shape
    qn = queries.shape[0]
    nt_total = cap // _TILE
    q_i8, qscale = _quantize_queries_i8(queries, col_scales)
    big_q = qn >= _TN_MIN_Q
    vmem = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)
    if big_q:
        blk = min(_TBLK, cap, max(1024, ((1 << 23) // qn) // 1024 * 1024))
        blk = math.gcd(blk, cap)
        norms_col = norms_rep[0].reshape(cap, 1)
        alpha = qscale[None, :]  # (1, Q)
        keys_t = pl.pallas_call(
            partial(_replica_i8tn_kernel, blk=blk),
            grid=(cap // blk,),
            in_specs=[
                pl.BlockSpec((d, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((qn, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qn), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk // _TILE, qn), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt_total, qn), jnp.float32),
            compiler_params=vmem,
            interpret=interpret,
        )(decoded_i8_t, norms_col, q_i8, alpha)
        return keys_t.T
    blk = _nn_blk(cap, _TBLK)
    alpha = qscale[:, None]  # (Q, 1)
    return pl.pallas_call(
        partial(_replica_i8t_kernel, blk=blk, qn=qn),
        grid=(cap // blk,),
        in_specs=[
            pl.BlockSpec((d, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            # sublane row 0 only (see _replica_keys_nn): for int8 data the
            # full (8, blk) f32 stream would be +25% of the data traffic
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qn, blk // _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qn, nt_total), jnp.float32),
        compiler_params=vmem,
        interpret=interpret,
    )(decoded_i8_t, norms_rep, q_i8, alpha)


@partial(jax.jit, static_argnames=("topk", "interpret", "recall_target",
                                   "overfetch"))
def replica_i8_scan_topk_t(queries, decoded_i8_t, col_scales, norms_rep,
                           codes, codewords, topk, interpret=False,
                           recall_target=0.99, overfetch=2):
    """Transposed int8 replica scan with exact bf16-class top-k rescoring.

    Same contract as :func:`replica_i8_scan_topk`, but the int8 replica is
    stored (D, cap) so the selection pass is DMA-bound at HALF the bf16-T
    traffic (see the transposed-replica block comment). The int8 pass selects
    `overfetch * topk` candidates; their exact decoded rows are reconstructed
    from the uint8 codes and re-scored in f32 (onehot_decode_exact: returned
    distances are exact ADC, same as every other tier — round-4 fix; the
    earlier bf16 rescore inflated near-neighbor distances by up to ~1%,
    RECALL_PARITY.md probe study).
    """
    keys = _replica_keys_i8t(queries, decoded_i8_t, col_scales, norms_rep,
                             interpret=interpret)
    k_fetch = min(max(topk * overfetch, topk + 8), keys.shape[1])
    _, ids_a = _merge_packed_keys(queries, keys, k_fetch, recall_target)
    return _exact_rescore_codes(queries, ids_a, codes, codewords,
                                norms_rep[0], topk)


# --------------------------------------------------------------------------- #
# int8 replica: half the memory of bf16, ~2x MXU throughput (394 TOPS on v5e)
# --------------------------------------------------------------------------- #

def _replica_i8_kernel(dec_ref, norms_ref, qt_ref, alpha_ref, min_ref, arg_ref,
                       *, blk):
    """int8 grid step: int8 MXU GEMM, per-query dequant, tile reduce."""
    qn = qt_ref.shape[1]
    base = pl.program_id(0) * blk
    for s in range(blk // _SUB):  # static unroll
        dec = dec_ref[s * _SUB:(s + 1) * _SUB, :]  # (SUB, D) int8
        cross = jnp.dot(dec, qt_ref[...], preferred_element_type=jnp.int32)
        scores = (norms_ref[s * _SUB:(s + 1) * _SUB, :]
                  - 2.0 * cross.astype(jnp.float32) * alpha_ref[...])
        _tile_reduce_and_store(scores, base, s, qn, min_ref, arg_ref)


@partial(jax.jit, static_argnames=("blk", "interpret"))
def replica_i8_scan_tile_minima(queries, decoded_i8, col_scales, norms_col,
                                blk=1024, interpret=False):
    """Per-tile (min, argmin) over the int8 replica.

    decoded_i8: (cap, D) int8 where row = round(decode(code)_d / col_scales_d).
    The column scales are folded into the query (qs = q * col_scales), which is
    then quantized per-query to int8 so the MXU runs a pure int8x int8 -> int32
    GEMM; the per-query dequant factor alpha restores the cross term.
    """
    cap, d = decoded_i8.shape
    qn = queries.shape[0]
    assert cap % blk == 0 and blk % _SUB == 0 and blk // _TILE >= 8, (cap, blk)
    nt = cap // _TILE

    q_i8, qscale = _quantize_queries_i8(queries, col_scales)
    alpha = qscale[None, :]  # (1, Q): cross_f32 = cross_i32 * alpha

    kernel = partial(_replica_i8_kernel, blk=blk)
    vmin_t, amin_t = pl.pallas_call(
        kernel,
        grid=(cap // blk,),
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, qn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk // _TILE, qn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk // _TILE, qn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, qn), jnp.float32),
            jax.ShapeDtypeStruct((nt, qn), jnp.int32),
        ],
        interpret=interpret,
    )(decoded_i8, norms_col, q_i8.T, alpha)
    return vmin_t.T, amin_t.T


@partial(jax.jit, static_argnames=("topk", "blk", "interpret", "recall_target",
                                   "overfetch"))
def replica_i8_scan_topk(queries, decoded_i8, col_scales, norms_col,
                         codes, codewords, topk, blk=1024, interpret=False,
                         recall_target=0.99, overfetch=2):
    """int8 replica scan with exact bf16-class rescoring of the final top-k.

    The int8 pass selects `overfetch * topk` candidates per query; the
    candidates' exact decoded rows are reconstructed from the uint8 codes
    (one-hot over just Q*k rows — negligible) and re-scored in f32, so returned
    distances match the exact-ADC paths up to bf16-table rounding.
    """
    vmin, amin = replica_i8_scan_tile_minima(queries, decoded_i8, col_scales,
                                             norms_col, blk=blk,
                                             interpret=interpret)
    k_fetch = min(max(topk * overfetch, topk + 8), vmin.shape[1])
    _, ids_a = _merge_tile_minima(queries, vmin, amin, k_fetch, recall_target)
    return _exact_rescore_codes(queries, ids_a, codes, codewords,
                                norms_col[:, 0], topk)


def quantize_replica_i8(decoded, eps=1e-30):
    """(cap, D) f32/bf16 replica -> (decoded_i8 (cap, D) int8, col_scales (D,) f32).

    Per-column symmetric quantization; padded rows should be zero-filled by the
    caller (their +inf norms keep them out of every top-k).
    """
    dec = decoded.astype(jnp.float32)
    col_scales = jnp.maximum(jnp.max(jnp.abs(dec), axis=0), eps) / 127.0
    q = jnp.clip(jnp.round(dec / col_scales[None, :]), -127, 127)
    return q.astype(jnp.int8), col_scales


@partial(jax.jit, static_argnames=("blk", "interpret", "packed"))
def pq_scan_tile_minima(queries, codes, norms_col, cw_padded, blk=1024,
                        interpret=False, packed=False):
    """Kernel contract: per-query (min, arg-id) over each 128-slot tile.

    Args:
        queries: (Q, D) f32.
        codes: (cap, M) uint8, cap % blk == 0.
        norms_col: (cap, 1) f32, +inf on padded slots.
        cw_padded: (M, Ks, D) bf16 from :func:`build_padded_codewords`.

    Returns (vmin (Q, cap/128) f32 WITHOUT the ||q||^2 term,
             amin (Q, cap/128) int32 global slot ids).
    """
    cap, m = codes.shape
    ks = cw_padded.shape[1]
    d = cw_padded.shape[2]
    qn = queries.shape[0]
    assert cap % blk == 0, (cap, blk)
    assert blk % _SUB == 0 and blk // _TILE >= 8, blk
    nt = cap // _TILE
    grid = (cap // blk,)

    qt = queries.astype(jnp.bfloat16).T  # (D, Q)
    kernel = partial(_scan_kernel, ks=ks, blk=blk, packed=packed)
    vmin_t, amin_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, qn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, ks, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk // _TILE, qn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk // _TILE, qn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, qn), jnp.float32),
            jax.ShapeDtypeStruct((nt, qn), jnp.int32),
        ],
        interpret=interpret,
    )(codes, norms_col, qt, cw_padded)
    return vmin_t.T, amin_t.T


@partial(jax.jit, static_argnames=("topk", "blk", "interpret", "recall_target"))
def pq_scan_topk(queries, codes, norms_col, cw_padded, topk, blk=1024,
                 interpret=False, recall_target=None):
    """Fused PQ scan over uint8 codes. See :func:`pq_scan_tile_minima` for args.

    Returns (dists (Q, topk) f32 ascending, ids (Q, topk) int32, -1 padded).
    Accuracy: exact except when two of the true top-k fall in one 128-slot
    tile (negligible when N/128 >> topk^2; use the XLA paths otherwise).
    With a recall_target the faster packed-key epilogue is used (2^-16
    relative rounding); recall_target=None keeps the bit-exact reduce.
    """
    vmin, amin = pq_scan_tile_minima(queries, codes, norms_col, cw_padded,
                                     blk=blk, interpret=interpret,
                                     packed=recall_target is not None)
    return _merge_tile_minima(queries, vmin, amin, topk, recall_target)


# --------------------------------------------------------------------------- #
# TRANSPOSED pq scan — the round-4 rework of the memory-lean tier.
#
# The row-major pq kernel above has two scale problems the SIFT1B-shape run
# exposed at N=32M:
#   (a) its (cap, M) codes and (cap, 1) norms operands are lane-padded by the
#       custom call's tiled layout (u8 (N, 8) -> 16x, f32 (N, 1) -> 128x: a
#       16 GB HLO temp at 32M rows — compile OOM);
#   (b) its decode and cross GEMMs have <= 128 output columns (D and Q), so
#       at most ONE of the four MXUs engages (the transposed-replica lesson,
#       see the block comment above _TBLK).
# Storing codes TRANSPOSED (M, cap) u8 and norms as a padding-free
# (cap/blk, blk) f32 grid fixes (a); building the one-hot transposed
# (Ks, SUBT) via a sublane iota against the (1, SUBT) code row — no relayout
# — makes database slots the output columns of BOTH GEMMs, fixing (b):
# (D, Ks) x (Ks, SUBT) decode and (Q, D) x (D, SUBT) cross, SUBT = 2048
# columns -> all four MXUs at any Q.
# --------------------------------------------------------------------------- #

_PQT_BLK = 16384  # slots per grid step (out-block last dim must be % 128)
_PQT_SUB = 2048   # slots decoded per inner step (bounds the one-hot to 1 MB)


def _pqt_split(blk):
    """(nsub, sub): equal _TILE-aligned sub-groups of <= _PQT_SUB slots."""
    nsub = -(-blk // _PQT_SUB)
    while blk % nsub or (blk // nsub) % _TILE:
        nsub += 1
    return nsub, blk // nsub


def _pq_t_kernel(codes_ref, nr_ref, q_ref, cwt_ref, key_ref, *, blk, ks):
    """One grid step: decode+score SUBT-slot column groups, packed-key tiles.

    codes_ref: (M, blk) u8 — code row m on lanes. nr_ref: (1, nsub, sub) f32
    (norms reshaped so sub-group s is ROW s — a full-row slice; a (1, blk)
    block of a multi-row array violates Mosaic's sublane-block rule).
    q_ref: (Q, D) bf16. cwt_ref: (M, D, Ks) bf16 (transposed block-diagonal
    codewords). key_ref out: (Q, blk/128) f32 packed keys.
    """
    m = cwt_ref.shape[0]
    qn = q_ref.shape[0]
    nsub, sub = _pqt_split(blk)
    k_iota = lax.broadcasted_iota(jnp.int32, (ks, sub), 0)
    for s in range(nsub):  # static unroll
        dec_t = None
        for mm in range(m):  # static unroll: one MXU matmul per subspace
            row = codes_ref[mm:mm + 1, s * sub:(s + 1) * sub]  # (1, sub) u8
            oh_t = (k_iota == row.astype(jnp.int32)).astype(
                jnp.bfloat16)  # (Ks, sub)
            part = jnp.dot(cwt_ref[mm], oh_t,
                           preferred_element_type=jnp.float32)  # (D, sub)
            dec_t = part if dec_t is None else dec_t + part
        cross = jnp.dot(q_ref[...], dec_t.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)  # (Q, sub)
        scores = nr_ref[0, s:s + 1, :] - 2.0 * cross
        nt = sub // _TILE
        st = jnp.minimum(scores, jnp.float32(_PACK_CLAMP)).reshape(
            qn, nt, _TILE)
        lane = lax.broadcasted_iota(jnp.int32, (qn, nt, _TILE), 2)
        bits = lax.bitcast_convert_type(st, jnp.int32)
        key = (bits & jnp.int32(~0x7F)) | lane
        key_ref[:, s * nt:(s + 1) * nt] = jnp.min(
            lax.bitcast_convert_type(key, jnp.float32), axis=2)


def _pqt_blk(cap):
    """Grid block for the transposed pq scan (same out-block constraint as
    the NN replica kernel: last dim % 128 == 0 via blk % 16384 == 0, or a
    single block covering the whole array — VMEM-bounded to 64k slots)."""
    if cap % _PQT_BLK == 0:
        return _PQT_BLK
    assert cap <= 4 * _PQT_BLK and cap % _TILE == 0, (
        f"cap={cap}: transposed pq scan needs cap % {_PQT_BLK} == 0 or a "
        f"single-block cap <= {4 * _PQT_BLK} (multiple of {_TILE})")
    return cap


@partial(jax.jit, static_argnames=("topk", "interpret", "recall_target"))
def pq_scan_topk_t(queries, codes_t, norms2, cwt, topk, interpret=False,
                   recall_target=None):
    """Fused TRANSPOSED pq scan over uint8 codes (the big-N linear tier).

    Args:
        queries: (Q, D) f32.
        codes_t: (M, cap) u8 (prepare_pq_scan_inputs_t).
        norms2: (cap/blk, nsub, sub) f32, +inf on padded slots
            (blk = _pqt_blk(cap), (nsub, sub) = _pqt_split(blk)).
        cwt: (M, D, Ks) bf16 transposed block-diagonal codewords.

    Returns (dists (Q, topk) f32 ascending, ids (Q, topk) int32, -1 padded).
    Same accuracy class as pq_scan_topk (bf16 cross, exact f32 norms,
    packed-key 2^-16 selection).
    """
    m, cap = codes_t.shape
    ks = cwt.shape[2]
    qn = queries.shape[0]
    blk = _pqt_blk(cap)
    nsub, sub = _pqt_split(blk)
    assert norms2.shape == (cap // blk, nsub, sub), (norms2.shape, cap, blk)
    nt_total = cap // _TILE
    qb = queries.astype(jnp.bfloat16)
    kernel = partial(_pq_t_kernel, blk=blk, ks=ks)
    keys = pl.pallas_call(
        kernel,
        grid=(cap // blk,),
        in_specs=[
            pl.BlockSpec((m, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsub, sub), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, queries.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cwt.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qn, blk // _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qn, nt_total), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(codes_t, norms2, qb, cwt)
    return _merge_packed_keys(queries, keys, topk, recall_target)


def build_padded_codewords_t(codewords):
    """(M, Ks, Ds) f32 -> (M, D, Ks) bf16: build_padded_codewords transposed
    (host-side, so no device relayout)."""
    m, ks, ds = codewords.shape
    d = m * ds
    out = np.zeros((m, d, ks), dtype=np.float32)
    cw = np.asarray(codewords)
    for mm in range(m):
        out[mm, mm * ds:(mm + 1) * ds, :] = cw[mm].T
    return jnp.asarray(out, dtype=jnp.bfloat16)


def prepare_pq_scan_inputs_t(codes, norms, codewords, cap=None):
    """Host-side packing for pq_scan_topk_t.

    Returns (codes_t (M, cap) u8 jnp, norms2 (cap/blk, nsub, sub) f32 jnp,
    cwt (M, D, Ks) bf16 jnp). Padded slots carry +inf norms (architecture
    invariant: masking by +inf, never by gather).
    """
    n, m = codes.shape
    if cap is None:
        cap = -(-max(n, _TILE) // _TILE) * _TILE
        if cap > 4 * _PQT_BLK:
            cap = -(-cap // _PQT_BLK) * _PQT_BLK
    assert cap >= n
    blk = _pqt_blk(cap)
    nsub, sub = _pqt_split(blk)
    ct = np.zeros((m, cap), dtype=np.uint8)
    ct[:, :n] = np.asarray(codes).T
    nm = np.full(cap, np.inf, dtype=np.float32)
    nm[:n] = norms
    return (jnp.asarray(ct), jnp.asarray(nm.reshape(cap // blk, nsub, sub)),
            build_padded_codewords_t(codewords))


# --------------------------------------------------------------------------- #
# fused IVF window scan: probed virtual-bucket windows streamed IN PLACE from
# the grouped replica via scalar-prefetch block indexing — no gather copy, and
# consecutive duplicate window ids skip the re-DMA entirely.
# --------------------------------------------------------------------------- #

_IVF_TILE = 8  # slots per reported (min, argmin): finer than the full-scan
               # kernels' 128 because IVF candidates concentrate in few windows


def _unpack_ivf_key(k):
    """Packed 8-slot key -> (score f32 with +inf restored, in-tile lane)."""
    b = lax.bitcast_convert_type(k, jnp.int32)
    lane = b & jnp.int32(0x7)
    v = lax.bitcast_convert_type(b & jnp.int32(~0x7), jnp.float32)
    v = jnp.where(v >= jnp.float32(_PACK_RESTORE), jnp.inf, v)
    return v, lane


def _ivf_tile_top2(scores, win, cap_v, qn, min_ref, arg_ref, out_row=0):
    """Shared IVF epilogue: (cap_v, Q) scores -> per-8-slot TOP-2 stores.

    Packed-key formulation: the low 3 mantissa bits carry the in-tile row, so
    the top-2 needs two plain min reduces with one mask between them (the
    two-pass compare/where/min x2 costs ~1.4x more VPU passes). Keys are
    UNIQUE within a tile (row bits differ), so masking `== k1` removes
    exactly one element — score ties keep their duplicate, as before.
    +inf scores (dup-window penalty / padding) are clamped for packing and
    restored on unpack, so the callers' isfinite masking still works.
    Precision: 2^-20 relative — callers exactly rescore anyway.
    """
    ntiles = cap_v // _IVF_TILE
    st = jnp.minimum(scores, jnp.float32(_PACK_CLAMP)).reshape(
        ntiles, _IVF_TILE, qn)
    row = lax.broadcasted_iota(jnp.int32, (ntiles, _IVF_TILE, qn), 1)
    bits = lax.bitcast_convert_type(st, jnp.int32)
    keyf = lax.bitcast_convert_type((bits & jnp.int32(~0x7)) | row,
                                    jnp.float32)
    k1 = jnp.min(keyf, axis=1)  # (ntiles, Q)
    masked = jnp.where(keyf == k1[:, None, :], jnp.inf, keyf)
    k2 = jnp.min(masked, axis=1)

    v1, l1 = _unpack_ivf_key(k1)
    v2, l2 = _unpack_ivf_key(k2)
    base = win * cap_v + lax.broadcasted_iota(
        jnp.int32, (ntiles, qn), 0) * _IVF_TILE
    min_ref[out_row:out_row + ntiles, :] = v1
    min_ref[out_row + ntiles:out_row + 2 * ntiles, :] = v2
    arg_ref[out_row:out_row + ntiles, :] = base + l1
    arg_ref[out_row + ntiles:out_row + 2 * ntiles, :] = base + l2


def _ivf_window_kernel(flat_ref, dup_ref, *refs, cap_v, masked=False):
    """One grid step: ADC scores for one probed window -> per-8-slot TOP-2.

    dec_ref blocks are selected by the scalar-prefetched window id (see index
    maps in ivf_window_tile_minima); dup windows are masked +inf. Norms are
    derived in kernel from the decoded rows (callers exactly rescore the
    final top-k with f32 norms). Reporting two candidates per tile means a
    true top-k entry is lost only when THREE of them share one 8-slot tile —
    negligible at any k<=100.

    masked=True adds a per-slot f32 penalty stream (0 = keep, +inf =
    excluded) selected by the same window id — the subset (target_ids)
    filter riding the fast path (the TPU re-design of the reference's per-id
    binary_search, /root/reference/src/rii.h:291-295). A streamed-norms
    variant was measured SLOWER end-to-end: the probe-order norm gather for
    the multi-window kernel costs far more than the in-kernel square+reduce
    (XLA row gathers degrade badly at thousands of rows), so the penalty
    stream is gathered only when a subset mask is actually present.
    """
    if masked:
        dec_ref, pen_ref, qt_ref, min_ref, arg_ref = refs
    else:
        dec_ref, qt_ref, min_ref, arg_ref = refs
        pen_ref = None
    u = pl.program_id(0)
    qn = qt_ref.shape[1]
    win = flat_ref[u]
    pen = lax.select(dup_ref[u] != 0, jnp.float32(jnp.inf), jnp.float32(0.0))

    dec = dec_ref[...]  # (cap_v, D) bf16
    decf = dec.astype(jnp.float32)
    nrm = jnp.sum(decf * decf, axis=1, keepdims=True)  # (cap_v, 1)
    cross = jnp.dot(dec, qt_ref[...], preferred_element_type=jnp.float32)
    scores = nrm - 2.0 * cross + pen  # (cap_v, Q)
    if pen_ref is not None:
        scores = scores + pen_ref[...]  # (cap_v, 1) broadcast over Q
    _ivf_tile_top2(scores, win, cap_v, qn, min_ref, arg_ref)


def _ivf_window_multi_kernel(flat_ref, dup_ref, *refs, cap_v, wpb,
                             masked=False):
    """Multi-window grid step: WPB probed windows per step, fetched with
    manual async DMAs from HBM.

    The one-window-per-step variant (_ivf_window_kernel) spends ~1us of grid
    sequencing per 64KB window and lands far below the HBM roofline; batching
    WPB windows per step amortizes that overhead. All WPB copies are issued
    up front (they fit VMEM easily), then each window is waited on and scored.

    Norms are computed IN KERNEL from the decoded rows (a 1-lane norms DMA is
    not tileable on TPU, and the alternative — pre-gathering a norms stream
    into probe order — measured 2x SLOWER end-to-end at U=4096: XLA row
    gathers degrade badly at thousands of rows): selection runs at bf16-norm
    precision and the caller exactly rescores the final top-k with the f32
    norms. Padding rows carry a large sentinel value (models/ivf docstring)
    so their in-kernel norm dominates any real score.

    masked=True adds an AUTO-PIPELINED per-slot penalty stream (wpb*cap_v, 1)
    f32, pre-gathered into probe order by the caller — the subset filter on
    the fast path; the gather is paid only when a subset mask is present.
    """
    if masked:
        dec_hbm, pen_ref, qt_ref, min_ref, arg_ref, dec_buf, sems = refs
    else:
        dec_hbm, qt_ref, min_ref, arg_ref, dec_buf, sems = refs
        pen_ref = None
    g = pl.program_id(0)
    qn = qt_ref.shape[1]
    ntiles = cap_v // _IVF_TILE

    def dec_copy(j):
        win = flat_ref[g * wpb + j]
        return pltpu.make_async_copy(
            dec_hbm.at[pl.ds(win * cap_v, cap_v), :], dec_buf.at[j],
            sems.at[j])

    for j in range(wpb):  # static unroll: fetch only first-occurrence windows
        @pl.when(dup_ref[g * wpb + j] == 0)
        def _start(j=j):
            dec_copy(j).start()

    for j in range(wpb):  # static unroll: wait + score in arrival order
        @pl.when(dup_ref[g * wpb + j] == 0)
        def _score(j=j):
            dec_copy(j).wait()
            win = flat_ref[g * wpb + j]
            dec = dec_buf[j]  # (cap_v, D) bf16
            decf = dec.astype(jnp.float32)
            nrm = jnp.sum(decf * decf, axis=1, keepdims=True)  # (cap_v, 1)
            cross = jnp.dot(dec, qt_ref[...],
                            preferred_element_type=jnp.float32)
            scores = nrm - 2.0 * cross  # (cap_v, Q)
            if pen_ref is not None:
                scores = scores + pen_ref[j * cap_v:(j + 1) * cap_v, :]
            _ivf_tile_top2(scores, win, cap_v, qn, min_ref, arg_ref,
                           out_row=j * 2 * ntiles)

        @pl.when(dup_ref[g * wpb + j] != 0)
        def _dup(j=j):
            # duplicate union entry: nothing fetched or scored — at Q=64 on
            # the BENCH config ~1/3 of the sorted union are duplicates, which
            # the unguarded kernel re-fetched and scored into +inf
            min_ref[j * 2 * ntiles:(j + 1) * 2 * ntiles, :] = jnp.full(
                (2 * ntiles, qn), jnp.inf, jnp.float32)
            arg_ref[j * 2 * ntiles:(j + 1) * 2 * ntiles, :] = jnp.zeros(
                (2 * ntiles, qn), jnp.int32)


@partial(jax.jit, static_argnames=("cap_v", "wpb"))
def ivf_window_tile_minima_multi(queries, decoded_g, flat, dup,
                                 cap_v, wpb=16, pen=None):
    """TPU fast path: per-8-slot top-2 over probed windows, WPB windows per
    grid step via manual async DMA. flat/dup must be padded to a multiple of
    wpb (pad windows with dup=1). Norms are derived in kernel (bf16-class) —
    callers must exactly rescore the returned candidates.

    Duplicate union entries (dup=1) SKIP the fetch and the score — their
    output rows are stored +inf directly. At Q=64/wv=64 on the BENCH config
    ~1/3 of the sorted union are duplicates (birthday collisions of Q*wv
    draws on ~4.6k windows): measured 21.5 -> 15.4 us/query. A batched-
    epilogue variant (VMEM score staging + one top-2 pass over all WPB
    windows) measured uniformly SLOWER (benchmarks/ivf_kernel_ab.py) and
    was removed.

    pen: optional (U*cap_v, 1) f32 penalty stream in PROBE order (slot j of
    window flat[i] at row i*cap_v+j; 0 = keep, +inf = excluded) — the subset
    filter (see _ivf_window_multi_kernel)."""
    total, d = decoded_g.shape
    qn = queries.shape[0]
    u = flat.shape[0]
    assert u % wpb == 0, (u, wpb)
    ntiles = cap_v // _IVF_TILE
    qt = queries.astype(jnp.bfloat16).T  # (D, Q)

    masked = pen is not None
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]  # decoded_g stays in HBM
    if masked:
        in_specs.append(pl.BlockSpec((wpb * cap_v, 1),
                                     lambda i, flat_, dup_: (i, 0)))
    in_specs.append(pl.BlockSpec((d, qn), lambda i, flat_, dup_: (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(u // wpb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wpb * 2 * ntiles, qn), lambda i, flat_, dup_: (i, 0)),
            pl.BlockSpec((wpb * 2 * ntiles, qn), lambda i, flat_, dup_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((wpb, cap_v, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((wpb,)),
        ],
    )
    kernel = partial(_ivf_window_multi_kernel, cap_v=cap_v, wpb=wpb,
                     masked=masked)
    args = (flat, dup, decoded_g) + ((pen,) if masked else ()) + (qt,)
    vmin_t, amin_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.float32),
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.int32),
        ],
    )(*args)
    return vmin_t.T, amin_t.T


@partial(jax.jit, static_argnames=("cap_v", "interpret"))
def ivf_window_tile_minima(queries, decoded_g, flat, dup, cap_v,
                           interpret=False, pen=None):
    """Per-8-slot top-2 over the probed windows, read in place.

    Args:
        queries: (Q, D) f32, Q a multiple of 8.
        decoded_g: (nlist_v_pad * cap_v, D) bf16 uniform grouped replica;
            padding rows must carry the large sentinel (see Rii cache build)
            so their in-kernel norms dominate.
        flat: (U,) int32 SORTED window ids (duplicates adjacent — the Pallas
            pipeline skips the DMA when the block index repeats).
        dup: (U,) int32, 1 marks duplicate entries to mask out.
        pen: optional (total, 1) f32 per-slot penalty in GROUPED-slot order
            (0 = keep, +inf = excluded) — the subset (target_ids) filter,
            streamed per window by the same scalar-prefetched id.

    Returns (vmin (Q, U * 2*cap_v/8) f32 WITHOUT ||q||^2 at bf16-norm
    precision, amin (Q, U * 2*cap_v/8) int32 GLOBAL grouped-slot ids) —
    two candidates per 8-slot tile. Callers must exactly rescore.
    """
    total, d = decoded_g.shape
    qn = queries.shape[0]
    u = flat.shape[0]
    ntiles = cap_v // _IVF_TILE
    assert cap_v % _IVF_TILE == 0 and total % cap_v == 0
    qt = queries.astype(jnp.bfloat16).T  # (D, Q)

    masked = pen is not None
    in_specs = [pl.BlockSpec((cap_v, d), lambda i, flat_, dup_: (flat_[i], 0))]
    if masked:
        in_specs.append(pl.BlockSpec((cap_v, 1),
                                     lambda i, flat_, dup_: (flat_[i], 0)))
    in_specs.append(pl.BlockSpec((d, qn), lambda i, flat_, dup_: (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(u,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((2 * ntiles, qn), lambda i, flat_, dup_: (i, 0)),
            pl.BlockSpec((2 * ntiles, qn), lambda i, flat_, dup_: (i, 0)),
        ],
    )
    kernel = partial(_ivf_window_kernel, cap_v=cap_v, masked=masked)
    args = (flat, dup, decoded_g) + ((pen,) if masked else ()) + (qt,)
    vmin_t, amin_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.float32),
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return vmin_t.T, amin_t.T


def _ivf_pq_window_kernel(flat_ref, dup_ref, vlen_ref, *refs, ks, cap_v,
                          masked=False):
    """pq-mode window step: one-hot decode the window's uint8 codes IN VMEM
    (the XLA lowering materializes the one-hot in HBM — ~34 KB of traffic per
    candidate; here it never leaves the chip), score, per-8-slot top-2.

    Padding is masked by row index >= the scalar-prefetched member count
    (vlen), so no norms stream is needed; the caller exactly rescores the
    final top-k from the codes. masked=True adds the per-slot penalty stream
    (see _ivf_window_kernel) — the subset filter on the fast path.
    """
    if masked:
        codes_ref, pen_ref, qt_ref, cw_ref, min_ref, arg_ref = refs
    else:
        codes_ref, qt_ref, cw_ref, min_ref, arg_ref = refs
        pen_ref = None
    u = pl.program_id(0)
    qn = qt_ref.shape[1]
    m = cw_ref.shape[0]
    win = flat_ref[u]
    pen = lax.select(dup_ref[u] != 0, jnp.float32(jnp.inf), jnp.float32(0.0))
    vl = vlen_ref[u]

    codes = codes_ref[...]  # (cap_v, M) uint8
    k_iota = lax.broadcasted_iota(jnp.int32, (cap_v, ks), 1)
    dec = None
    for mm in range(m):  # static unroll: one MXU matmul per subspace
        col = codes[:, mm].astype(jnp.int32)
        oh = (col[:, None] == k_iota).astype(jnp.bfloat16)  # (cap_v, Ks)
        part = jnp.dot(oh, cw_ref[mm], preferred_element_type=jnp.float32)
        dec = part if dec is None else dec + part  # (cap_v, D) f32

    nrm = jnp.sum(dec * dec, axis=1, keepdims=True)  # (cap_v, 1)
    cross = jnp.dot(dec.astype(jnp.bfloat16), qt_ref[...],
                    preferred_element_type=jnp.float32)  # (cap_v, Q)
    row_id = lax.broadcasted_iota(jnp.int32, (cap_v, 1), 0)
    pad_pen = jnp.where(row_id < vl, 0.0, jnp.inf).astype(jnp.float32)
    scores = nrm - 2.0 * cross + pen + pad_pen  # (cap_v, Q)
    if pen_ref is not None:
        scores = scores + pen_ref[...]  # (cap_v, 1) broadcast over Q
    _ivf_tile_top2(scores, win, cap_v, qn, min_ref, arg_ref)


@partial(jax.jit, static_argnames=("cap_v", "interpret"))
def ivf_pq_window_tile_minima(queries, codes_g, cw_padded, flat, dup, vlen,
                              cap_v, interpret=False, pen=None):
    """Memory-lean IVF window scan: per-8-slot top-2 over probed uint8 code
    windows, decoded in VMEM. Same output contract as ivf_window_tile_minima
    (callers exactly rescore). cw_padded from :func:`build_padded_codewords`.
    pen: optional (total, 1) f32 grouped-slot subset penalty (0/+inf).
    """
    total, m = codes_g.shape
    ks = cw_padded.shape[1]
    d = cw_padded.shape[2]
    qn = queries.shape[0]
    u = flat.shape[0]
    ntiles = cap_v // _IVF_TILE
    assert cap_v % _IVF_TILE == 0 and total % cap_v == 0
    qt = queries.astype(jnp.bfloat16).T  # (D, Q)

    masked = pen is not None
    in_specs = [pl.BlockSpec((cap_v, m), lambda i, f_, d_, v_: (f_[i], 0))]
    if masked:
        in_specs.append(pl.BlockSpec((cap_v, 1),
                                     lambda i, f_, d_, v_: (f_[i], 0)))
    in_specs += [
        pl.BlockSpec((d, qn), lambda i, f_, d_, v_: (0, 0)),
        pl.BlockSpec((m, ks, d), lambda i, f_, d_, v_: (0, 0, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(u,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((2 * ntiles, qn), lambda i, f_, d_, v_: (i, 0)),
            pl.BlockSpec((2 * ntiles, qn), lambda i, f_, d_, v_: (i, 0)),
        ],
    )
    kernel = partial(_ivf_pq_window_kernel, ks=ks, cap_v=cap_v, masked=masked)
    args = (flat, dup, vlen, codes_g) + ((pen,) if masked else ()) + (
        qt, cw_padded)
    vmin_t, amin_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.float32),
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return vmin_t.T, amin_t.T


def _ivf_i8_window_kernel(flat_ref, dup_ref, vlen_ref, *refs, cap_v,
                          masked=False):
    """int8-window grid step: like _ivf_window_kernel but the grouped replica
    is per-column-quantized int8 — HALF the bf16 window traffic. The column
    scales are folded into the queries (quantized per query, alpha restores
    the cross term); norms are derived in kernel from the dequantized rows
    (int8-class selection — callers exactly rescore from the uint8 codes).
    Padding is masked GATHER-FREE by row index >= the scalar-prefetched
    member count (vlen, same mechanism as the pq kernel); a subset mask
    rides the optional pen stream.
    """
    if masked:
        dec_ref, pen_ref, scl_ref, q_ref, alpha_ref, min_ref, arg_ref = refs
    else:
        dec_ref, scl_ref, q_ref, alpha_ref, min_ref, arg_ref = refs
        pen_ref = None
    u = pl.program_id(0)
    qn = q_ref.shape[1]
    win = flat_ref[u]
    pen = lax.select(dup_ref[u] != 0, jnp.float32(jnp.inf), jnp.float32(0.0))
    vl = vlen_ref[u]

    dec = dec_ref[...]  # (cap_v, D) int8
    decf = dec.astype(jnp.float32) * scl_ref[...]  # (cap_v, D) dequantized
    nrm = jnp.sum(decf * decf, axis=1, keepdims=True)  # (cap_v, 1)
    row_id = lax.broadcasted_iota(jnp.int32, (cap_v, 1), 0)
    pad_pen = jnp.where(row_id < vl, 0.0, jnp.inf).astype(jnp.float32)
    cross = jnp.dot(dec, q_ref[...], preferred_element_type=jnp.int32)
    scores = (nrm - 2.0 * cross.astype(jnp.float32) * alpha_ref[...]
              + pen + pad_pen)
    if pen_ref is not None:
        scores = scores + pen_ref[...]
    _ivf_tile_top2(scores, win, cap_v, qn, min_ref, arg_ref)


def _ivf_i8_window_multi_kernel(flat_ref, dup_ref, vlen_ref, *refs, cap_v,
                                wpb, masked=False):
    """Multi-window int8 variant: WPB windows per grid step via manual async
    DMA (half the bf16 fetch bytes). See _ivf_window_multi_kernel for the
    DMA scheme and _ivf_i8_window_kernel for the int8 math + gather-free
    vlen padding mask."""
    if masked:
        (dec_hbm, pen_ref, scl_ref, q_ref, alpha_ref, min_ref, arg_ref,
         dec_buf, sems) = refs
    else:
        (dec_hbm, scl_ref, q_ref, alpha_ref, min_ref, arg_ref,
         dec_buf, sems) = refs
        pen_ref = None
    g = pl.program_id(0)
    qn = q_ref.shape[1]
    ntiles = cap_v // _IVF_TILE

    def dec_copy(j):
        win = flat_ref[g * wpb + j]
        return pltpu.make_async_copy(
            dec_hbm.at[pl.ds(win * cap_v, cap_v), :], dec_buf.at[j],
            sems.at[j])

    for j in range(wpb):  # static unroll: fetch only first-occurrence windows
        @pl.when(dup_ref[g * wpb + j] == 0)
        def _start(j=j):
            dec_copy(j).start()

    for j in range(wpb):  # static unroll: wait + score in arrival order
        @pl.when(dup_ref[g * wpb + j] == 0)
        def _score(j=j):
            dec_copy(j).wait()
            win = flat_ref[g * wpb + j]
            vl = vlen_ref[g * wpb + j]
            dec = dec_buf[j]  # (cap_v, D) int8
            decf = dec.astype(jnp.float32) * scl_ref[...]
            nrm = jnp.sum(decf * decf, axis=1, keepdims=True)
            row_id = lax.broadcasted_iota(jnp.int32, (cap_v, 1), 0)
            pad_pen = jnp.where(row_id < vl, 0.0, jnp.inf).astype(jnp.float32)
            cross = jnp.dot(dec, q_ref[...], preferred_element_type=jnp.int32)
            scores = (nrm - 2.0 * cross.astype(jnp.float32) * alpha_ref[...]
                      + pad_pen)
            if pen_ref is not None:
                scores = scores + pen_ref[j * cap_v:(j + 1) * cap_v, :]
            _ivf_tile_top2(scores, win, cap_v, qn, min_ref, arg_ref,
                           out_row=j * 2 * ntiles)

        @pl.when(dup_ref[g * wpb + j] != 0)
        def _dup(j=j):
            # duplicate union entry: skip the fetch and the score entirely
            # (measured 21.5 -> 15.4 us/q on the bf16 kernel at Q=64)
            min_ref[j * 2 * ntiles:(j + 1) * 2 * ntiles, :] = jnp.full(
                (2 * ntiles, qn), jnp.inf, jnp.float32)
            arg_ref[j * 2 * ntiles:(j + 1) * 2 * ntiles, :] = jnp.zeros(
                (2 * ntiles, qn), jnp.int32)


@partial(jax.jit, static_argnames=("cap_v", "interpret"))
def ivf_i8_window_tile_minima(queries, decoded_g_i8, col_scales, flat, dup,
                              vlen, cap_v, interpret=False, pen=None):
    """Single-window int8 scan (auto-pipelined; the interpret/test path).
    vlen: (U,) int32 member count per PROBED window (padding masked by row
    index — gather-free). pen: optional (total, 1) f32 grouped-slot subset
    penalty. Same output contract as ivf_window_tile_minima (int8-class
    selection — callers must exactly rescore)."""
    total, d = decoded_g_i8.shape
    qn = queries.shape[0]
    u = flat.shape[0]
    ntiles = cap_v // _IVF_TILE
    assert cap_v % _IVF_TILE == 0 and total % cap_v == 0
    q_i8, qscale = _quantize_queries_i8(queries, col_scales)
    qt = q_i8.T  # (D, Q)
    alpha = qscale[None, :]  # (1, Q)
    scales_row = col_scales[None, :].astype(jnp.float32)  # (1, D)

    masked = pen is not None
    in_specs = [pl.BlockSpec((cap_v, d),
                             lambda i, f_, d_, v_: (f_[i], 0))]
    if masked:
        in_specs.append(pl.BlockSpec((cap_v, 1),
                                     lambda i, f_, d_, v_: (f_[i], 0)))
    in_specs += [
        pl.BlockSpec((1, d), lambda i, f_, d_, v_: (0, 0)),
        pl.BlockSpec((d, qn), lambda i, f_, d_, v_: (0, 0)),
        pl.BlockSpec((1, qn), lambda i, f_, d_, v_: (0, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(u,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((2 * ntiles, qn), lambda i, f_, d_, v_: (i, 0)),
            pl.BlockSpec((2 * ntiles, qn), lambda i, f_, d_, v_: (i, 0)),
        ],
    )
    kernel = partial(_ivf_i8_window_kernel, cap_v=cap_v, masked=masked)
    args = (flat, dup, vlen, decoded_g_i8) + ((pen,) if masked else ()) + (
        scales_row, qt, alpha)
    vmin_t, amin_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.float32),
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return vmin_t.T, amin_t.T


@partial(jax.jit, static_argnames=("cap_v", "wpb"))
def ivf_i8_window_tile_minima_multi(queries, decoded_g_i8, col_scales, flat,
                                    dup, vlen, cap_v, wpb=16, pen=None):
    """Hardware int8-window fast path: WPB windows per grid step via manual
    async DMA at HALF the bf16 fetch traffic. flat/dup/vlen padded to a wpb
    multiple (pad with dup=1); vlen masks padding gather-free; pen optional
    (U*cap_v, 1) probe-order subset penalty."""
    total, d = decoded_g_i8.shape
    qn = queries.shape[0]
    u = flat.shape[0]
    assert u % wpb == 0, (u, wpb)
    ntiles = cap_v // _IVF_TILE
    q_i8, qscale = _quantize_queries_i8(queries, col_scales)
    qt = q_i8.T  # (D, Q)
    alpha = qscale[None, :]  # (1, Q)
    scales_row = col_scales[None, :].astype(jnp.float32)  # (1, D)

    masked = pen is not None
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]  # int8 windows in HBM
    if masked:
        in_specs.append(pl.BlockSpec((wpb * cap_v, 1),
                                     lambda i, f_, d_, v_: (i, 0)))
    in_specs += [
        pl.BlockSpec((1, d), lambda i, f_, d_, v_: (0, 0)),
        pl.BlockSpec((d, qn), lambda i, f_, d_, v_: (0, 0)),
        pl.BlockSpec((1, qn), lambda i, f_, d_, v_: (0, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(u // wpb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wpb * 2 * ntiles, qn),
                         lambda i, f_, d_, v_: (i, 0)),
            pl.BlockSpec((wpb * 2 * ntiles, qn),
                         lambda i, f_, d_, v_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((wpb, cap_v, d), jnp.int8),
            pltpu.SemaphoreType.DMA((wpb,)),
        ],
    )
    kernel = partial(_ivf_i8_window_multi_kernel, cap_v=cap_v, wpb=wpb,
                     masked=masked)
    args = (flat, dup, vlen, decoded_g_i8) + ((pen,) if masked else ()) + (
        scales_row, qt, alpha)
    vmin_t, amin_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.float32),
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.int32),
        ],
    )(*args)
    return vmin_t.T, amin_t.T


def _ivf_dt_window_kernel(flat_ref, dup_ref, vlen_ref, *refs, ks, cap_v,
                          masked=False):
    """pq-mode window step, DTABLE formulation (the small-Q fast path).

    Scores are accumulated directly as sum_m onehot_m @ dtable_m where
    dtable[m, k, :] = ||q_m - codeword_{m,k}||^2 — the in-VMEM re-expression
    of the reference's ADC table walk (/root/reference/src/rii.h:361-394)
    as MXU matmuls. Per window this costs M*cap_v*Ks*Q MACs vs the decode
    kernel's M*cap_v*Ks*D + cap_v*D*Q: a ~D/Q-fold FLOP cut when Q < D.
    The produced scores are FULL squared distances (the dtable carries the
    ||q_m||^2 terms); per-query constants don't affect per-query selection,
    and callers exactly rescore the final top-k from the codes as before.
    """
    if masked:
        codes_ref, pen_ref, dt_ref, min_ref, arg_ref = refs
    else:
        codes_ref, dt_ref, min_ref, arg_ref = refs
        pen_ref = None
    u = pl.program_id(0)
    qn = dt_ref.shape[2]
    m = dt_ref.shape[0]
    win = flat_ref[u]
    pen = lax.select(dup_ref[u] != 0, jnp.float32(jnp.inf), jnp.float32(0.0))
    vl = vlen_ref[u]

    codes = codes_ref[...]  # (cap_v, M) uint8
    k_iota = lax.broadcasted_iota(jnp.int32, (cap_v, ks), 1)
    acc = None
    for mm in range(m):  # static unroll: one MXU matmul per subspace
        col = codes[:, mm].astype(jnp.int32)
        oh = (col[:, None] == k_iota).astype(jnp.bfloat16)  # (cap_v, Ks)
        part = jnp.dot(oh, dt_ref[mm], preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part  # (cap_v, Q)

    row_id = lax.broadcasted_iota(jnp.int32, (cap_v, 1), 0)
    pad_pen = jnp.where(row_id < vl, 0.0, jnp.inf).astype(jnp.float32)
    scores = acc + pen + pad_pen  # (cap_v, Q) full squared distances
    if pen_ref is not None:
        scores = scores + pen_ref[...]  # (cap_v, 1) broadcast over Q
    _ivf_tile_top2(scores, win, cap_v, qn, min_ref, arg_ref)


def build_dtable(queries, codewords, dtype=jnp.bfloat16):
    """(Q, D) queries -> (M, Ks, Q) ADC table ||q_m - cw[m,k]||^2.

    The decoded-domain identity makes this exact; stored bf16 for MXU feeds
    (2^-8-relative selection class — callers exactly rescore)."""
    cw = codewords.astype(jnp.float32)  # (M, Ks, Ds)
    m, ks, ds = cw.shape
    q = queries.astype(jnp.float32).reshape(-1, m, ds)  # (Q, M, Ds)
    qs = jnp.transpose(q, (1, 0, 2))  # (M, Q, Ds)
    cross = jnp.einsum("mkd,mqd->mkq", cw, qs,
                       preferred_element_type=jnp.float32)
    cn = jnp.sum(cw * cw, axis=2)  # (M, Ks)
    qn2 = jnp.sum(qs * qs, axis=2)  # (M, Q)
    return (cn[:, :, None] - 2.0 * cross + qn2[:, None, :]).astype(dtype)


@partial(jax.jit, static_argnames=("cap_v", "interpret"))
def ivf_dt_window_tile_minima(queries, codes_g, codewords, flat, dup, vlen,
                              cap_v, interpret=False, pen=None):
    """Memory-lean IVF window scan, dtable formulation (see
    _ivf_dt_window_kernel). Same output contract as ivf_pq_window_tile_minima
    except vmin INCLUDES ||q||^2 (callers rescore the top-k exactly anyway).
    codewords: (M, Ks, Ds) f32 (NOT the padded form — the dtable replaces it).
    pen: optional (total, 1) f32 grouped-slot subset penalty (0/+inf).
    """
    total, m = codes_g.shape
    ks = codewords.shape[1]
    qn = queries.shape[0]
    u = flat.shape[0]
    ntiles = cap_v // _IVF_TILE
    assert cap_v % _IVF_TILE == 0 and total % cap_v == 0
    dt = build_dtable(queries, codewords)  # (M, Ks, Q) bf16

    masked = pen is not None
    in_specs = [pl.BlockSpec((cap_v, m), lambda i, f_, d_, v_: (f_[i], 0))]
    if masked:
        in_specs.append(pl.BlockSpec((cap_v, 1),
                                     lambda i, f_, d_, v_: (f_[i], 0)))
    in_specs.append(pl.BlockSpec((m, ks, qn), lambda i, f_, d_, v_: (0, 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(u,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((2 * ntiles, qn), lambda i, f_, d_, v_: (i, 0)),
            pl.BlockSpec((2 * ntiles, qn), lambda i, f_, d_, v_: (i, 0)),
        ],
    )
    kernel = partial(_ivf_dt_window_kernel, ks=ks, cap_v=cap_v, masked=masked)
    args = (flat, dup, vlen, codes_g) + ((pen,) if masked else ()) + (dt,)
    vmin_t, amin_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.float32),
            jax.ShapeDtypeStruct((u * 2 * ntiles, qn), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return vmin_t.T, amin_t.T


def prepare_pq_scan_inputs(codes, norms, codewords, cap=None, blk=1024):
    """Host-side packing for pq_scan_topk: pad codes/norms to cap.

    Returns (codes (cap, M) u8 jnp, norms_col (cap, 1) f32 jnp,
    cw_padded (M, Ks, D) bf16 jnp).
    """
    n, m = codes.shape
    if cap is None:
        cap = ((n + blk - 1) // blk) * blk
    assert cap % blk == 0 and cap >= n
    cp = np.zeros((cap, m), dtype=np.uint8)
    cp[:n] = np.asarray(codes)
    nm = np.full((cap, 1), np.inf, dtype=np.float32)
    nm[:n, 0] = norms
    return (jnp.asarray(cp), jnp.asarray(nm),
            build_padded_codewords(codewords))
