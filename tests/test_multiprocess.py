"""REAL multi-process distributed runtime test: 2 jax.distributed processes
(Gloo collectives — the DCN-analog transport) x 4 virtual CPU devices each,
exercising ShardedRii queries (linear / IVF / subset), per-host ingestion
(put_sharded -> make_array_from_process_local_data) and the distributed
reconfigure, whose posting lists must be bit-identical to single-device.

The reference has no multi-process capability at all (SURVEY.md section 2.5);
this is the jax.distributed bring-up path that multi-host pods use.
"""

import os
import socket
import subprocess
import sys



_WORKER = r'''
import os, sys
import numpy as np
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=nproc, process_id=pid)
sys.path.insert(0, sys.argv[4])

from rii_tpu import PQ, Rii
from rii_tpu.parallel import ShardedRii
from jax.sharding import Mesh

rng = np.random.RandomState(5)
n, d = 4096, 32
X = rng.random((n, d)).astype(np.float32)     # same data on every host
pq = PQ(M=4, Ks=32).fit(X[:1024], iter=3)
e = Rii(pq); e.add_configure(X, nlist=48, iter=3)

mesh = Mesh(np.asarray(jax.devices()), ("data",))
sr = ShardedRii(e, mesh=mesh)
q = X[:8]
ids_s, d_s = sr.query_batch(q, topk=5)
ids_e, d_e = e.query_batch(q, topk=5, method="linear")
assert (ids_s == ids_e).mean() > 0.95
iv, dv = sr.query_ivf_batch(q, topk=5, L=n)
assert all(set(a.tolist()) == set(b.tolist()) for a, b in zip(iv, ids_s))
tids = np.sort(rng.choice(n, 500, replace=False)).astype(np.int64)
it, _ = sr.query_batch(q, topk=5, target_ids=tids)
assert all(set(r.tolist()) <= set(tids.tolist()) for r in it)

# O(batch) delta-add across processes: replicated updates scatter into the
# sharded state (per-host local placement), no rebuild, new rows searchable
n_dev0 = sr._n_dev
cache0 = sr._scan_cache
X2 = rng.random((128, d)).astype(np.float32)  # same rows on every host
sr.add(X2, update_posting_lists=True)
assert sr._n_dev == n_dev0 + 128
assert sr._scan_cache is cache0, "delta add must not rebuild"
ids_n, _ = sr.query_batch(X2[:4], topk=1)
assert (ids_n[:, 0] >= n).all()

sr.reconfigure(nlist=48, iter=3)
e2 = Rii(pq); e2.add(X, update_posting_lists=False)
e2.add(X2, update_posting_lists=False)  # mirror the delta-added rows
e2.reconfigure(nlist=48, iter=3)
assert sr.engine.posting_lists == e2.posting_lists, "not bit-identical"
print(f"[p{pid}] MULTIPROCESS OK", flush=True)
'''


def test_two_process_distributed_runtime(tmp_path):
    worker = tmp_path / "mh_worker.py"
    worker.write_text(_WORKER)
    # free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = str(s.getsockname()[1])
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", port, repo],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=str(tmp_path)) for i in range(2)]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:  # never leak workers on timeout/failure
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert f"[p{i}] MULTIPROCESS OK" in out
