"""Deep1B-style config (D=96) on the virtual 8-device mesh (BASELINE.md
config: Deep1B-scale sharded across hosts — mechanism validated here on the
CPU mesh; real multi-host needs jax.distributed on a pod)."""

import numpy as np
import pytest

from rii_tpu import PQ, Rii
from rii_tpu.parallel import ShardedRii


@pytest.fixture(scope="module")
def deep_engine():
    rng = np.random.RandomState(0)
    N, D, M = 16384, 96, 12  # Deep1B dims; Ds=8 per subspace
    X = rng.random((N, D)).astype(np.float32)
    pq = PQ(M=M, Ks=256, verbose=False).fit(X[:4096], iter=3)
    e = Rii(pq)
    e.scan_mode = "bf16"
    e.add_configure(X, nlist=128, iter=3)
    return e, X


def test_deep1b_config_sharded_linear_and_ivf(deep_engine):
    e, X = deep_engine
    sr = ShardedRii(e, use_decoded=True)
    assert sr.ivf is not None
    qs = X[:8]
    ids_l, d_l = sr.query_batch(qs, topk=10)
    assert (ids_l[:, 0] == np.arange(8)).all()  # self-hit at rank 0
    ids_i, d_i = sr.query_ivf_batch(qs, topk=10, L=e.N)
    for a, b in zip(ids_l, ids_i):
        assert set(a.tolist()) == set(b.tolist())


def test_deep1b_config_single_device_matches_sharded(deep_engine):
    e, X = deep_engine
    sr = ShardedRii(e, use_decoded=True)
    qs = X[100:108]
    ids_s, d_s = sr.query_batch(qs, topk=5)
    ids_1, d_1 = e.query_batch(qs, topk=5, method="linear")
    np.testing.assert_allclose(d_s, d_1, rtol=1e-3)
    assert (ids_s == ids_1).mean() > 0.95  # ties only
