"""Optimized Product Quantization: PQ plus a learned orthonormal rotation.

Matches the ``nanopq.OPQ`` contract exercised by the reference
(SURVEY.md section 2.4; rotation applied to queries at /root/reference/rii/rii.py:305-308):
``fit``, ``encode``, ``decode``, ``rotate``, ``codewords``, ``__eq__``.

Training is the non-parametric OPQ alternation (Ge et al., CVPR'13): alternate
between fitting the PQ codebooks on rotated data and solving the orthogonal
Procrustes problem ``min_R ||X R - X_hat||_F`` via SVD — both steps are single
XLA programs (matmuls + SVD) on device.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from rii_tpu.models.pq import PQ

_PREC = lax.Precision.HIGHEST


@jax.jit
def _procrustes(x, x_hat):
    """Solve min_R ||x @ R - x_hat|| over orthonormal R: R = U @ Vt of svd(x^T x_hat)."""
    m = jnp.dot(x.T, x_hat, precision=_PREC)
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    return jnp.dot(u, vt, precision=_PREC)


class OPQ(PQ):
    """OPQ codec: learned rotation R followed by PQ in the rotated space.

    ``encode`` rotates inputs internally; ``decode`` returns vectors in the
    *rotated* space (same convention as nanopq), so queries must be rotated via
    :meth:`rotate` before distance evaluation — the ``Rii`` policy layer does this.
    """

    def __init__(self, M, Ks=256, verbose=False, seed=123):
        super().__init__(M=M, Ks=Ks, verbose=verbose, seed=seed)
        self.rotation_matrix = None  # (D, D) float32

    @classmethod
    def from_codewords(cls, codewords, rotation_matrix, verbose=False):
        """Fitted OPQ from existing (M, Ks, Ds) codewords + (D, D) rotation —
        the migration path for nanopq.OPQ state (pass ``opq.codewords`` and
        ``opq.R``); codes from the source quantizer decode identically."""
        opq = super().from_codewords(codewords, verbose=verbose)
        rot = np.ascontiguousarray(rotation_matrix, dtype=np.float32)
        d = opq.M * opq.Ds
        assert rot.shape == (d, d), f"rotation must be ({d}, {d})"
        opq.rotation_matrix = rot
        return opq

    def fit(self, vecs, iter=20, rotation_iter=10, seed=None,
            rotation_sample=1 << 18):
        """Alternate rotation / codebook updates, then a final full PQ fit.

        The alternation stage runs on a deterministic subsample of at most
        ``rotation_sample`` rows (rotation estimation converges on far fewer
        points than codebook training needs), so device memory during the
        alternations is bounded regardless of N — the SIFT1B training config
        uses 10M vectors (/root/reference/examples/benchmark/run_sift1b.py:61),
        which would otherwise hold 3 full (N, D) f32 transients on device.
        The FINAL codebook fit still uses every training row.
        """
        vecs = np.asarray(vecs)
        assert vecs.ndim == 2 and vecs.dtype == np.float32
        N, D = vecs.shape
        assert D % self.M == 0
        if seed is not None:
            self.seed = int(seed)

        if N > rotation_sample:
            pick = np.random.RandomState(self.seed).permutation(N)[:rotation_sample]
            sample = np.ascontiguousarray(vecs[pick])
        else:
            sample = vecs
        x = jnp.asarray(sample)
        R = jnp.eye(D, dtype=jnp.float32)
        # A few inner k-means iterations per alternation are enough; the final
        # fit below runs the full budget.
        inner_iter = max(2, int(iter) // 4)
        for it in range(int(rotation_iter)):
            xr = np.asarray(jnp.dot(x, R, precision=_PREC), dtype=np.float32)
            super().fit(xr, iter=inner_iter)
            x_hat = jnp.asarray(super().decode(super().encode(xr)))
            R = _procrustes(x, x_hat)
            if self.verbose:
                err = float(jnp.mean(jnp.sum((jnp.dot(x, R, precision=_PREC) - x_hat) ** 2, -1)))
                print(f"OPQ alternation {it}: recon error {err:.6f}")

        self.rotation_matrix = np.asarray(R, dtype=np.float32)
        super().fit(self.rotate(vecs), iter=int(iter))
        return self

    def rotate(self, vecs, chunk=1 << 20):
        """Rotate vecs (D,) or (N, D) into the PQ space (chunked: bounds the
        device transient to `chunk` rows at SIFT1B-scale inputs)."""
        assert self.rotation_matrix is not None, "Please fit the OPQ instance first"
        vecs = np.asarray(vecs)
        single = vecs.ndim == 1
        v2 = np.atleast_2d(vecs).astype(np.float32, copy=False)
        r = jnp.asarray(self.rotation_matrix)
        if v2.shape[0] <= chunk:
            out = np.asarray(jnp.dot(jnp.asarray(v2), r, precision=_PREC),
                             dtype=np.float32)
        else:
            out = np.empty_like(v2)
            for lo in range(0, v2.shape[0], chunk):
                hi = min(v2.shape[0], lo + chunk)
                out[lo:hi] = np.asarray(
                    jnp.dot(jnp.asarray(v2[lo:hi]), r, precision=_PREC))
        return out[0] if single else out

    def encode(self, vecs):
        """Rotate then PQ-encode."""
        return super().encode(self.rotate(np.atleast_2d(vecs)))

    def __eq__(self, other):
        if not super().__eq__(other):
            return False
        a, b = self.rotation_matrix, other.rotation_matrix
        if (a is None) != (b is None):
            return False
        return a is None or np.array_equal(a, b)
