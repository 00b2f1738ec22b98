"""ops.decode: dtable parity, decode identity, ADC oracle equivalence."""

import numpy as np
import jax.numpy as jnp

from rii_tpu import PQ
from rii_tpu.models.ivf import code_norms_np
from rii_tpu.ops.decode import dtable, adc_oracle, onehot_decode, decode_norms


def _fixture(n=300, d=32, m=4, ks=16):
    x = np.random.RandomState(2).random((n, d)).astype(np.float32)
    pq = PQ(M=m, Ks=ks).fit(x)
    return x, pq, pq.encode(x)


def test_dtable_matches_numpy():
    x, pq, codes = _fixture()
    q = x[0]
    dt = np.asarray(dtable(jnp.asarray(q), jnp.asarray(pq.codewords)))
    m, ks, ds = pq.codewords.shape
    ref = ((q.reshape(m, 1, ds) - pq.codewords) ** 2).sum(-1)
    np.testing.assert_allclose(dt, ref, rtol=1e-5, atol=1e-6)


def test_adc_equals_decoded_l2():
    """THE identity: dtable-sum ADC == ||q - decode(code)||^2."""
    x, pq, codes = _fixture()
    q = x[1]
    adc = np.asarray(adc_oracle(jnp.asarray(q), jnp.asarray(codes),
                                jnp.asarray(pq.codewords)))
    dec = np.asarray(onehot_decode(jnp.asarray(codes), jnp.asarray(pq.codewords)))
    l2 = ((q[None, :] - dec) ** 2).sum(-1)
    np.testing.assert_allclose(adc, l2, rtol=1e-4, atol=1e-4)


def test_decode_norms_matches_host():
    x, pq, codes = _fixture()
    dn = np.asarray(decode_norms(jnp.asarray(codes), jnp.asarray(pq.codewords)))
    hn = code_norms_np(pq.codewords, codes)
    np.testing.assert_allclose(dn, hn, rtol=1e-5, atol=1e-5)


def test_scan_mode_resolution():
    from rii_tpu import Rii
    x, pq, codes = _fixture()
    e = Rii(fine_quantizer=pq)
    e.add_configure(x, nlist=10)
    # CPU: auto -> pq; explicit bf16 honored; int8 falls back (no pallas on cpu)
    assert e._resolve_scan_mode(1024) == "pq"
    e.scan_mode = "bf16"
    assert e._resolve_scan_mode(1024) == "bf16"
    e.scan_mode = "int8"
    assert e._resolve_scan_mode(1024) in ("bf16", "int8")
    e.scan_mode = "bf16"
    e.decoded_cache_budget = 16  # nothing fits
    assert e._resolve_scan_mode(1024) == "pq"
