#!/usr/bin/env python
"""A/B: can the int8 transposed replica beat the bf16-T headline at Q=1024?

The Q>=512 linear scan is MXU-bound in bf16 (1.56 ms/1M idle = 90% of the
~197 TF/s bf16 peak). The v5e's int8 MXU runs at 2x that rate and the i8-T
replica moves HALF the HBM bytes, so the i8 selection pass could approach
~0.8 ms — with the exact f32 code rescore of the final top-k preserving
recall (and, since round 4, exact ADC distances). This measures, at the
BENCH config (N=1M, D=128, M=32, Ks=256):

  - bf16-T keys kernel (the current headline path)
  - i8-T END-TO-END (keys + merge + exact rescore)
  - recall@1/@10 of both vs exact f32 ground truth

Differenced fori timing (dispatch cancels). Env: BENCH_N, BENCH_Q.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import rii_tpu  # noqa: F401
    from micro_ivf import timed_loop
    from rii_tpu import PQ, Rii
    from rii_tpu.ops.pallas_scan import (
        _replica_keys_tn,
        quantize_replica_i8,
        replica_i8_scan_topk_t,
        replica_scan_topk_t,
    )

    N = int(os.environ.get("BENCH_N", 1 << 20))
    Q = int(os.environ.get("BENCH_Q", 1024))
    D, M, Ks, topk = 128, 32, 256, 10
    log(f"device={jax.devices()[0]} N={N} D={D} M={M} Q={Q}")

    rng = np.random.RandomState(123)
    X = rng.random((N, D)).astype(np.float32)
    queries = (X[rng.choice(N, Q, replace=False)]
               + rng.normal(0, 0.01, (Q, D))).astype(np.float32)

    pq = PQ(M=M, Ks=Ks).fit(X[:100_000], iter=10)
    e = Rii(pq)
    e.add(X, update_posting_lists=False)
    e.scan_mode = "bf16"
    dc = e._ensure_cache()
    assert "decoded_t" in dc
    rt = e.topk_recall
    qd = jnp.asarray(queries)

    # ground truth
    import importlib.util as ilu
    spec = ilu.spec_from_file_location("benchmod", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py"))
    bm = ilu.module_from_spec(spec)
    spec.loader.exec_module(bm)
    gt = bm.exact_nn_ids(X, queries[:128])

    def rec(ids):
        ids = np.asarray(ids)[:128]
        return (float((ids[:, :1] == gt[:, None]).any(1).mean()),
                float((ids == gt[:, None]).any(1).mean()))

    # ---- bf16-T end-to-end + keys-only ----
    ids_bf, _ = replica_scan_topk_t(qd, dc["decoded_t"], dc["norms_rep"],
                                    topk=topk, recall_target=rt)
    r1, r10 = rec(ids_bf)

    def bf_once(acc, qb, a, b):
        d, _ = replica_scan_topk_t(qb + acc * 1e-30, a, b, topk=topk,
                                   recall_target=rt)
        return d[0, 0]

    dt = timed_loop(bf_once, (qd, dc["decoded_t"], dc["norms_rep"]))
    log(f"bf16-T e2e:  {dt*1e3:.3f} ms/batch ({Q/dt:.0f} QPS) "
        f"recall@1={r1:.3f} @10={r10:.3f}")

    def bfk_once(acc, qb, a, b):
        k = _replica_keys_tn(qb + acc * 1e-30, a, b)
        return k[0, 0]

    dtk = timed_loop(bfk_once, (qd, dc["decoded_t"], dc["norms_rep"]))
    log(f"bf16-T keys: {dtk*1e3:.3f} ms/batch")

    # ---- i8-T end-to-end (keys + merge + exact rescore) ----
    dec_i8, scales = quantize_replica_i8(
        jnp.transpose(dc["decoded_t"]))
    dec_i8_t = jnp.transpose(dec_i8)
    ids_i8, d_i8 = replica_i8_scan_topk_t(
        qd, dec_i8_t, scales, dc["norms_rep"], dc["codes_flat"],
        dc["codewords"], topk=topk, recall_target=rt)
    r1i, r10i = rec(ids_i8)

    def i8_once(acc, qb, a, b, c, d2, e2):
        d, _ = replica_i8_scan_topk_t(qb + acc * 1e-30, a, b, c, d2, e2,
                                      topk=topk, recall_target=rt)
        return d[0, 0]

    dti = timed_loop(i8_once, (qd, dec_i8_t, scales, dc["norms_rep"],
                               dc["codes_flat"], dc["codewords"]))
    log(f"i8-T e2e:    {dti*1e3:.3f} ms/batch ({Q/dti:.0f} QPS) "
        f"recall@1={r1i:.3f} @10={r10i:.3f}")
    log(f"i8/bf16 e2e ratio: {dti/dt:.3f}")

    import json
    print(json.dumps({"N": N, "Q": Q,
                      "bf16_e2e_ms": dt * 1e3, "bf16_keys_ms": dtk * 1e3,
                      "i8_e2e_ms": dti * 1e3,
                      "bf16_recall1": r1, "bf16_recall10": r10,
                      "i8_recall1": r1i, "i8_recall10": r10i}))


if __name__ == "__main__":
    main()
