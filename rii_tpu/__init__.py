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

from rii_tpu.models.pq import PQ
from rii_tpu.models.opq import OPQ
from rii_tpu.rii import Rii

__version__ = "0.1.0"

__all__ = ["PQ", "OPQ", "Rii", "__version__"]
