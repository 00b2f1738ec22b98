"""Index model families: PQ / OPQ codecs, PQk-means, and the IVF index state."""

from rii_tpu.models.pq import PQ
from rii_tpu.models.opq import OPQ
from rii_tpu.models.pqkmeans import pqkmeans_fit, pqkmeans_predict

__all__ = ["PQ", "OPQ", "pqkmeans_fit", "pqkmeans_predict"]
