"""rii-tpu: a TPU-native reconfigurable inverted index (IVFADC / PQ) search framework.

Built from scratch for TPU (JAX / XLA / Pallas / pjit). Capability parity target is
matsui528/rii (reference: /root/reference/rii/rii.py, /root/reference/src/rii.h), but the
architecture is TPU-first:

- PQ/OPQ codebook training, encoding and PQk-means clustering are batched JAX programs
  that run on the MXU (see ``rii_tpu.models``).
- The ADC query path exploits the identity ``ADC(q, code) == ||q - decode(code)||^2``:
  uint8 PQ codes are the *storage* format, while all distance kernels operate in the
  decoded domain as large matmuls (see ``rii_tpu.ops``). The hot scan is a Pallas kernel
  that streams codes from HBM, decodes blocks in VMEM via one-hot matmuls, and keeps a
  running per-query top-k.
- Multi-chip scaling shards codes/postings row-wise over a ``jax.sharding.Mesh`` and
  merges per-shard top-k with all-gather collectives (see ``rii_tpu.parallel``).
"""

import os as _os


def _enable_persistent_compile_cache():
    """Persist compiled executables across processes (index builds are
    compile-bound on remote-compile backends: ~14s -> ~1s per kernel).

    Respects an existing user setting; disable with RII_TPU_NO_COMPILE_CACHE=1.

    Scoped to accelerator backends: when the process has already pinned JAX to
    CPU (e.g. the test suite's conftest), the cache is left off — CPU compiles
    are local and fast, and reloading CPU AOT executables emits a noisy
    machine-feature warning per kernel.
    """
    if _os.environ.get("RII_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return  # user already configured one
        platforms = getattr(jax.config, "jax_platforms", None)
        if platforms and all(
                p.strip() == "cpu" for p in platforms.split(",") if p.strip()):
            return  # CPU-only process: skip the persistent cache
        cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "rii_tpu",
                          "jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # never block import on cache setup


_enable_persistent_compile_cache()

from rii_tpu.models.pq import PQ  # noqa: E402
from rii_tpu.models.opq import OPQ  # noqa: E402
from rii_tpu.rii import Rii  # noqa: E402
from rii_tpu.serving import QueryServer  # noqa: E402

__version__ = "0.3.0"

__all__ = ["PQ", "OPQ", "Rii", "QueryServer", "__version__"]
