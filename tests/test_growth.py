"""Dynamic-growth behavior (BASELINE config 4, scaled down): add a large batch
post-build, query the stale index, reconfigure, query again."""

import numpy as np

from rii_tpu import PQ, Rii


def test_growth_then_reconfigure():
    rng = np.random.RandomState(11)
    D = 32
    X1 = rng.random((2000, D)).astype(np.float32)
    X2 = rng.random((4000, D)).astype(np.float32)
    e = Rii(fine_quantizer=PQ(M=4, Ks=32).fit(X1))
    e.add_configure(X1)
    nlist_before = e.nlist

    # stale-index phase: new codes join existing posting lists
    e.add(X2)  # auto -> update_posting_lists=True
    assert e.N == 6000
    assert e.nlist == nlist_before
    assert sum(len(pl) for pl in e.posting_lists) == 6000

    # new ids findable pre-reconfigure (ivf over stale lists)
    q = X2[123]
    ids, dists = e.query(q, topk=5, L=2000)
    assert 2000 + 123 in ids

    # reconfigure rebalances: nlist moves to sqrt(N)
    e.reconfigure()
    assert e.nlist == int(np.sqrt(6000))
    assert sum(len(pl) for pl in e.posting_lists) == 6000
    # at this coarse quantization (M=4) other codes may decode closer, so
    # check membership under an exact scan rather than rank-0 under ivf
    ids, dists = e.query(q, topk=5, method="linear")
    assert 2000 + 123 in ids


def test_add_without_update_is_invisible_to_ivf_until_reconfigure():
    rng = np.random.RandomState(12)
    X1 = rng.random((1000, 32)).astype(np.float32)
    X2 = rng.random((500, 32)).astype(np.float32)
    e = Rii(fine_quantizer=PQ(M=4, Ks=32).fit(X1))
    e.add_configure(X1, nlist=20)
    e.add(X2, update_posting_lists=False)
    assert e.N == 1500
    # posting lists still cover only the first 1000 (reference semantics)
    assert sum(len(pl) for pl in e.posting_lists) == 1000
    # linear scan sees everything
    ids, _ = e.query(X2[7], topk=3, method="linear")
    assert 1007 in ids
    # after reconfigure, ivf sees everything
    e.reconfigure(nlist=20)
    assert sum(len(pl) for pl in e.posting_lists) == 1500
    ids, _ = e.query(X2[7], topk=3, L=1500, method="ivf")
    assert 1007 in ids


def test_memory_breakdown_accounts_device_cache():
    rng = np.random.RandomState(15)
    X = rng.random((2000, 32)).astype(np.float32)
    e = Rii(fine_quantizer=PQ(M=4, Ks=32).fit(X[:512], iter=3))
    e.add_configure(X, nlist=20, iter=3)
    mb = e.memory_breakdown()
    assert mb["host_codes"] == 2000 * 4
    assert mb["host_assignments"] == 2000 * 4
    assert mb["device:codes_flat"] >= 2000 * 4  # padded capacity
    assert mb["device_total"] == sum(
        v for k, v in mb.items() if k.startswith("device:"))
    # mutation invalidates and rebuilds
    e.add(X[:100], update_posting_lists=True)
    mb2 = e.memory_breakdown()
    assert mb2["host_codes"] == 2100 * 4
