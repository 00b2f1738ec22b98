"""Product Quantization codec, trained and executed as batched JAX programs.

Drop-in replacement for the ``nanopq.PQ`` contract the reference depends on
(SURVEY.md section 2.4; usage at /root/reference/rii/rii.py:33-37,150,185):

- ``PQ(M, Ks=256, verbose=False)``; ``fit(vecs)`` trains codewords, returns self.
- ``codewords``: float32 (M, Ks, Ds) ndarray.
- ``encode(vecs) -> (N, M) uint8``; ``decode(codes) -> (N, D) float32``.
- ``code_dtype``, ``verbose``, ``__eq__`` (needed by ``Rii.merge``).

TPU-first: all M sub-space codebooks train in one vmapped k-means program
(``kmeans_fit_batched``); encoding is a blocked argmin over (B, M, Ks) distance
tensors computed by MXU matmuls.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

from rii_tpu.models.kmeans import kmeans_fit_batched

_PREC = lax.Precision.HIGHEST

# Encode/decode process the database in fixed-size blocks so the jit cache stays
# small and the transient (B, M, Ks) distance tensor stays on-chip friendly.
_ENCODE_BLOCK = 16384


@partial(jax.jit, static_argnames=())
def _encode_block(vecs_sub, codewords):
    """vecs_sub: (B, M, Ds), codewords: (M, Ks, Ds) -> (B, M) int32 code ids."""
    # dists[b, m, k] = ||vecs_sub[b, m] - codewords[m, k]||^2, batched over M on the MXU.
    vsq = jnp.sum(vecs_sub * vecs_sub, axis=-1)  # (B, M)
    csq = jnp.sum(codewords * codewords, axis=-1)  # (M, Ks)
    cross = jnp.einsum("bmd,mkd->bmk", vecs_sub, codewords, precision=_PREC)
    dists = vsq[:, :, None] - 2.0 * cross + csq[None, :, :]
    return jnp.argmin(dists, axis=-1).astype(jnp.int32)


@jax.jit
def _decode_block(codes, codewords):
    """codes: (B, M) int -> (B, D) f32 reconstruction."""
    # Gather decode; fine off the hot path (the hot scan decodes in-kernel).
    sub = jnp.take_along_axis(
        codewords[None], codes[:, :, None, None].astype(jnp.int32), axis=2
    )[:, :, 0, :]  # (B, M, Ds)
    return sub.reshape(codes.shape[0], -1)


def _as_blocks(n, block):
    """Yield (start, length) covering [0, n) in chunks of `block`."""
    for s in range(0, n, block):
        yield s, min(block, n - s)


class PQ:
    """Product quantizer with Ks codewords per each of M sub-spaces.

    Args:
        M: number of sub-spaces; D must be divisible by M.
        Ks: codewords per sub-space; must be <= 256 so codes fit in uint8
            (same constraint as /root/reference/rii/rii.py:35).
        verbose: print training info.
        seed: PRNG seed for deterministic training.
    """

    def __init__(self, M, Ks=256, verbose=False, seed=123):
        assert 0 < Ks <= 256, "Ks must be <= 256 so that each code fits in uint8"
        self.M = int(M)
        self.Ks = int(Ks)
        self.verbose = bool(verbose)
        self.seed = int(seed)
        self.code_dtype = np.uint8
        self.codewords = None  # (M, Ks, Ds) float32, set by fit()
        self.Ds = None

    # -- training ---------------------------------------------------------

    def fit(self, vecs, iter=20, seed=None):
        """Train codewords on vecs (N, D) float32. Returns self (chainable)."""
        vecs = np.asarray(vecs)
        assert vecs.ndim == 2
        assert vecs.dtype == np.float32
        N, D = vecs.shape
        assert D % self.M == 0, "D must be divisible by M"
        assert self.Ks <= N, "N must be >= Ks"
        self.Ds = D // self.M
        if seed is not None:
            self.seed = int(seed)
        if self.verbose:
            print(f"PQ training: M={self.M}, Ks={self.Ks}, D={D}, N={N}, iter={iter}")

        # (N, D) -> (M, N, Ds): one k-means problem per subspace, all fit at once.
        sub = jnp.asarray(vecs.reshape(N, self.M, self.Ds).transpose(1, 0, 2))
        key = jax.random.PRNGKey(self.seed)
        centers, _ = kmeans_fit_batched(key, sub, k=self.Ks, iters=int(iter))
        self.codewords = np.asarray(centers, dtype=np.float32)  # (M, Ks, Ds)
        return self

    # -- transform --------------------------------------------------------

    def _check_fitted(self):
        assert self.codewords is not None, "Please fit the PQ instance first"

    def encode(self, vecs):
        """vecs (N, D) float32 -> PQ codes (N, M) uint8."""
        self._check_fitted()
        vecs = np.asarray(vecs)
        assert vecs.ndim == 2
        assert vecs.dtype == np.float32
        N, D = vecs.shape
        assert D == self.M * self.Ds
        cw = jnp.asarray(self.codewords)
        out = np.empty((N, self.M), dtype=np.uint8)
        for s, ln in _as_blocks(N, _ENCODE_BLOCK):
            block = jnp.asarray(vecs[s : s + ln].reshape(ln, self.M, self.Ds))
            out[s : s + ln] = np.asarray(_encode_block(block, cw), dtype=np.uint8)
        return out

    def decode(self, codes):
        """codes (N, M) uint8 -> reconstructed vecs (N, D) float32."""
        self._check_fitted()
        codes = np.asarray(codes)
        assert codes.ndim == 2 and codes.shape[1] == self.M
        assert codes.dtype == self.code_dtype
        cw = jnp.asarray(self.codewords)
        N = codes.shape[0]
        out = np.empty((N, self.M * self.Ds), dtype=np.float32)
        for s, ln in _as_blocks(N, _ENCODE_BLOCK):
            out[s : s + ln] = np.asarray(_decode_block(jnp.asarray(codes[s : s + ln]), cw))
        return out

    # -- misc --------------------------------------------------------------

    @property
    def D(self):
        return None if self.Ds is None else self.M * self.Ds

    def __eq__(self, other):
        if type(other) is not type(self):
            return False
        if (self.M, self.Ks) != (other.M, other.Ks):
            return False
        if (self.codewords is None) != (other.codewords is None):
            return False
        if self.codewords is None:
            return True
        return np.array_equal(self.codewords, other.codewords)

    def __repr__(self):
        return f"{type(self).__name__}(M={self.M}, Ks={self.Ks}, fitted={self.codewords is not None})"
