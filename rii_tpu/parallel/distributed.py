"""ShardedRii: a Rii engine whose database is row-sharded over a device mesh.

The reference scales within one process via OpenMP threads (SURVEY.md 2.5); the
TPU equivalent is data-parallel shards over ICI/DCN. For multi-host pods call
:func:`init_distributed` first (jax.distributed), build the same Rii state on
every host, then wrap it — `jax.make_array_from_process_local_data` and the
mesh place each host's shard.

Semantics: identical results to the single-device engine (same exact-ADC math,
per-shard top-k + all-gather exact merge), verified in tests/test_sharded.py.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from rii_tpu.ops.decode import build_decoded_cache
from rii_tpu.ops.ivf import ivf_union_scan_topk
from rii_tpu.ops.scan import linear_scan_topk, linear_scan_topk_decoded
from rii_tpu.parallel.mesh import make_mesh, DATA_AXIS


def _pow2(n):
    v = 1
    while v < n:
        v *= 2
    return v


def init_distributed(**kwargs):
    """Bring up the multi-host runtime (no-op if already initialized)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized
    return jax.process_index(), jax.process_count()


class ShardedRii:
    """Read-oriented sharded view of a built Rii engine.

    Args:
        engine: a built rii_tpu.Rii (N > 0). Mutations on the engine require
            constructing a new ShardedRii (cheap: one device_put per array).
        mesh: 1-D mesh; defaults to all local devices.
        use_decoded: keep a sharded bf16 decoded replica (None = follow the
            engine's scan-mode policy).
    """

    def __init__(self, engine, mesh=None, use_decoded=None):
        self.engine = engine
        self.mesh = mesh or make_mesh()
        self.ndev = self.mesh.shape[DATA_AXIS]
        self.topk_recall = getattr(engine, "topk_recall", None)

        codes = engine._consolidated_codes()
        from rii_tpu.models.ivf import code_norms_np
        cw = np.asarray(engine.codewords, dtype=np.float32)
        norms = code_norms_np(cw, codes)

        n = len(codes)
        block = 1024
        cap = -(-max(n, 1) // (self.ndev * block)) * (self.ndev * block)
        codes_pad = np.zeros((cap, codes.shape[1]), np.uint8)
        codes_pad[:n] = codes
        norms_pad = np.full(cap, np.inf, np.float32)
        norms_pad[:n] = norms

        sh = NamedSharding(self.mesh, P(DATA_AXIS, None))
        sh1 = NamedSharding(self.mesh, P(DATA_AXIS))
        rep = NamedSharding(self.mesh, P())
        self.cap = cap
        self.block = min(block, cap // self.ndev)
        self.codes = jax.device_put(codes_pad, sh)
        self.norms = jax.device_put(norms_pad, sh1)
        self.codewords = jax.device_put(cw, rep)

        if use_decoded is None:
            use_decoded = engine._use_decoded_cache(cap)
        self.decoded = None
        if use_decoded:
            # decode under jit: sharding propagates row-wise, each device
            # decodes only its shard
            self.decoded = jax.jit(
                build_decoded_cache, static_argnames=("block",),
                out_shardings=sh)(self.codes, self.codewords, block=self.block)
        self._scan_cache = {}

        # sharded IVF over the balanced virtual-bucket layout: each shard owns
        # a contiguous range of virtual windows + their (replicated-center
        # derived) coarse rows; probing is per-shard local (see query_ivf_batch)
        self.ivf = None
        if use_decoded and engine.nlist > 0:
            from rii_tpu.models.ivf import build_virtual_layout
            ul = build_virtual_layout(codes, norms, engine._assignments(),
                                      engine.nlist, pad_to=8 * self.ndev)
            centers_dec = np.asarray(
                engine._ensure_cache()["centers_dec"], np.float32)
            cn = (centers_dec ** 2).sum(axis=1)
            vreal = ul["vreal"]
            cdv = centers_dec[np.clip(vreal, 0, centers_dec.shape[0] - 1)]
            cnv = np.where(vreal >= 0,
                           cn[np.clip(vreal, 0, cn.shape[0] - 1)],
                           np.inf).astype(np.float32)
            codes_g = jax.device_put(ul["codes_grouped"], sh)
            order_g = jax.device_put(ul["order"], sh1)

            # padding rows get the large sentinel the Pallas window kernel
            # needs (its norms are derived in kernel; see ops/pallas_scan)
            def _dec_sentinel(cg, cw, og):
                dec = build_decoded_cache(cg, cw, block=ul["cap_v"])
                return jnp.where((og < 0)[:, None], jnp.bfloat16(1e15), dec)

            self.ivf = {
                "cap_v": ul["cap_v"],
                "nlist_v": ul["nlist_v"],
                "nlist_v_pad": ul["nlist_v_pad"],
                "order_g": order_g,
                "norms_g": jax.device_put(ul["norms_grouped"], sh1),
                "centers_dec_v": jax.device_put(cdv, sh),
                "centers_norms_v": jax.device_put(cnv, sh1),
                "decoded_g": jax.jit(_dec_sentinel, out_shardings=sh)(
                    codes_g, self.codewords, order_g),
            }

    def _scan_fn(self, topk):
        key = (topk, self.decoded is not None)
        if key in self._scan_cache:
            return self._scan_cache[key]
        shard_cap = self.cap // self.ndev
        blk = min(self.block, shard_cap)
        rt = self.topk_recall
        use_dec = self.decoded is not None

        def _local(queries, codes_l, norms_l, codewords, dec_l):
            if use_dec:
                d_l, i_l = linear_scan_topk_decoded(
                    queries, dec_l, norms_l, topk=topk, block=blk,
                    recall_target=rt)
            else:
                d_l, i_l = linear_scan_topk(
                    queries, codes_l, norms_l, codewords, topk=topk, block=blk,
                    recall_target=rt)
            my = lax.axis_index(DATA_AXIS)
            gids = jnp.where(i_l >= 0, i_l + my * shard_cap, -1)
            d_all = lax.all_gather(d_l, DATA_AXIS)  # (ndev, Q, k)
            g_all = lax.all_gather(gids, DATA_AXIS)
            qn = queries.shape[0]
            d_flat = jnp.swapaxes(d_all, 0, 1).reshape(qn, self.ndev * topk)
            g_flat = jnp.swapaxes(g_all, 0, 1).reshape(qn, self.ndev * topk)
            neg, pos = lax.top_k(-d_flat, topk)
            return -neg, jnp.take_along_axis(g_flat, pos, axis=1)

        fn = jax.jit(shard_map(
            _local,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS), P(),
                      P(DATA_AXIS, None)),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        self._scan_cache[key] = fn
        return fn

    def _ivf_fn(self, topk, wv_local):
        key = ("ivf", topk, wv_local)
        if key in self._scan_cache:
            return self._scan_cache[key]
        iv = self.ivf
        nv_l = iv["nlist_v_pad"] // self.ndev
        cap_v = iv["cap_v"]
        rt = self.topk_recall

        # the fused window kernel needs accelerator Mosaic lowering; the CPU
        # (virtual-mesh) path keeps the XLA union scan
        use_pallas = jax.default_backend() != "cpu" and rt is not None

        def _local(queries, dec_l, norms_l, order_l, cdec_l, cnorm_l):
            # per-shard local probing + union scan over the shard's windows;
            # order_l already holds ORIGINAL (global) ids, so no offset needed
            d_l, i_l = ivf_union_scan_topk(
                queries, dec_l, norms_l, order_l, cdec_l, cnorm_l,
                w=min(wv_local, nv_l), topk=topk, cap_u=cap_v,
                nlist_pad=nv_l, recall_target=rt,
                use_pallas=use_pallas)
            d_all = lax.all_gather(d_l, DATA_AXIS)  # (ndev, Q, k)
            g_all = lax.all_gather(i_l, DATA_AXIS)
            qn = queries.shape[0]
            d_flat = jnp.swapaxes(d_all, 0, 1).reshape(qn, self.ndev * topk)
            g_flat = jnp.swapaxes(g_all, 0, 1).reshape(qn, self.ndev * topk)
            neg, pos = lax.top_k(-d_flat, topk)
            ids = jnp.take_along_axis(g_flat, pos, axis=1)
            ids = jnp.where(jnp.isfinite(-neg), ids, -1)
            return -neg, ids

        fn = jax.jit(shard_map(
            _local,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS, None), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        self._scan_cache[key] = fn
        return fn

    def query_ivf_batch(self, queries, topk=1, L=None):
        """Sharded IVF probe: each shard probes its own wv/ndev nearest local
        windows (2x slack for probe-ownership imbalance), then exact merge.

        The global candidate set is the union of per-shard local tops — with
        balanced virtual windows this covers the global top-wv with high
        probability; distances are exact, the merge is exact.
        """
        assert self.ivf is not None, \
            "IVF requires use_decoded=True and a reconfigured engine"
        queries = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        from rii_tpu.models.opq import OPQ
        if isinstance(self.engine.fine_quantizer, OPQ):
            queries = self.engine.fine_quantizer.rotate(queries)
        e = self.engine
        iv = self.ivf
        if L is None:
            L = e._multiple_of_L0_covering_topk(topk=topk)
        slack = 3 * max(1, -(-iv["nlist_v"] // max(1, e.nlist)))
        wv = int(np.round(float(L) * iv["nlist_v"] / max(1, e.N))) + slack
        nv_l = iv["nlist_v_pad"] // self.ndev
        wv_local = min(nv_l, max(1, _pow2(-(-wv // self.ndev) * 2)))
        qn = queries.shape[0]
        qpad = _pow2(max(8, qn))  # >=8 for the fused window kernel
        if qpad != qn:
            queries = np.concatenate(
                [queries, np.broadcast_to(queries[:1], (qpad - qn,
                                                        queries.shape[1]))])
        d, i = self._ivf_fn(topk, wv_local)(
            jnp.asarray(queries), iv["decoded_g"], iv["norms_g"],
            iv["order_g"], iv["centers_dec_v"], iv["centers_norms_v"])
        return (np.asarray(i)[:qn].astype(np.int64),
                np.asarray(d)[:qn].astype(np.float64))

    def query_batch(self, queries, topk=1):
        """Exact ADC scan over all shards; returns (ids int64, dists float64)."""
        queries = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        from rii_tpu.models.opq import OPQ
        if isinstance(self.engine.fine_quantizer, OPQ):
            queries = self.engine.fine_quantizer.rotate(queries)
        dec = self.decoded
        if dec is None:
            # pass a tiny placeholder with the right sharding
            dec = self.norms[:, None]
        d, i = self._scan_fn(topk)(jnp.asarray(queries), self.codes, self.norms,
                                   self.codewords, dec)
        return (np.asarray(i).astype(np.int64),
                np.asarray(d).astype(np.float64))
