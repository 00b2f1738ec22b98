#!/usr/bin/env python
"""Idle-window watcher: certify the two idle-chip perf targets when (and only
when) the multi-tenant dev chip is actually idle — round-4 VERDICT item 1.

The dev v5e is shared: identical scans measure 2.0-3.1 ms across hours under
a co-tenant vs the 1.56 ms idle record (ROADMAP 1c), so a certification run
is only meaningful in an idle window. This watcher:

1. every PROBE_INTERVAL seconds, times the N=1M Q=1024 TN keys kernel
   (device-resident fori differencing — the exact kernel behind the
   1.56 ms idle / 2.28-2.53 ms tenant-loaded history) and appends a DATED
   record to IDLE_PROBES.jsonl: {ts, iso, status, keys_ms, tf_s};
2. when a probe lands at keys_ms <= IDLE_KEYS_MS (default 1.75 — within
   ~12% of the idle record; tenant-loaded probes sit >=2.2), runs the
   certification suite as subprocesses (bench.py, benchmarks/bigq_e2e.py,
   benchmarks/ivf_modes.py), re-probes to confirm the window HELD, and
   writes IDLE_CERT.json;
3. survives tunnel outages: a probe that hangs >PROBE_TIMEOUT s (the
   backend transport can die entirely — observed this round) is recorded
   as status="unreachable" and the loop re-enters with a fresh process.

Probes run in a SUBPROCESS so a wedged TPU client can always be killed by
exact PID (never by pattern) and the watcher itself never blocks.

Usage: python benchmarks/idle_watch.py [--once] [--max-hours H]
Artifacts: IDLE_PROBES.jsonl (every probe, dated), IDLE_CERT.json (on
success). Both are committed evidence either way: a full log of
tenant-loaded/unreachable probes documents that no idle window existed.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_LOG = os.path.join(ROOT, "IDLE_PROBES.jsonl")
CERT_PATH = os.path.join(ROOT, "IDLE_CERT.json")

IDLE_KEYS_MS = float(os.environ.get("IDLE_KEYS_MS", 1.75))
PROBE_TIMEOUT = int(os.environ.get("PROBE_TIMEOUT", 600))
PROBE_INTERVAL = int(os.environ.get("PROBE_INTERVAL", 300))

# the probe body: N=1M Q=1024 TN keys kernel, fori-differenced (dispatch
# constants cancel; the carry feeds back so XLA cannot hoist the body)
_PROBE_SRC = r"""
import time, sys, json
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
sys.path.insert(0, %(root)r)
import rii_tpu  # persistent compile cache
from rii_tpu.ops.pallas_scan import _replica_keys_tn, prepare_replica_t

N, D, Q = 1 << 20, 128, 1024
rng = np.random.RandomState(0)
dec = jnp.asarray(rng.random((N, D)).astype(np.float32)).astype(jnp.bfloat16)
norms = jnp.asarray((np.asarray(dec, np.float32) ** 2).sum(1))
dec_t, norms_rep = prepare_replica_t(dec, norms)
dec_t = jax.block_until_ready(dec_t)
norms_rep = jax.block_until_ready(norms_rep)
q = jnp.asarray(rng.random((Q, D)).astype(np.float32))

@jax.jit
def loop(reps, qq, dt, nr):
    def body(i, carry):
        out = _replica_keys_tn(carry, dt, nr)
        return carry + 0.0 * out[0, 0]
    return lax.fori_loop(0, reps, body, qq)

_ = jax.block_until_ready(loop(jnp.int32(1), q, dec_t, norms_rep))
best = None
for _ in range(3):
    t0 = time.perf_counter()
    _ = jax.block_until_ready(loop(jnp.int32(4), q, dec_t, norms_rep))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = jax.block_until_ready(loop(jnp.int32(20), q, dec_t, norms_rep))
    t2 = time.perf_counter() - t0
    dt = (t2 - t1) / 16
    if dt > 0 and (best is None or dt < best):
        best = dt
print(json.dumps({"keys_ms": None if best is None else best * 1e3}))
"""


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def record(rec):
    rec = dict(rec, ts=time.time(),
               iso=time.strftime("%Y-%m-%dT%H:%M:%S%z"))
    with open(PROBE_LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log("probe:", rec)
    return rec


def probe():
    """One timed keys-kernel probe in a subprocess. Returns the record."""
    src = _PROBE_SRC % {"root": ROOT}
    try:
        out = subprocess.run([sys.executable, "-c", src], cwd=ROOT,
                             capture_output=True, text=True,
                             timeout=PROBE_TIMEOUT)
    except subprocess.TimeoutExpired:
        return record({"status": "unreachable",
                       "detail": f"probe hung > {PROBE_TIMEOUT}s"})
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        keys_ms = json.loads(line)["keys_ms"]
    except (ValueError, KeyError):
        return record({"status": "error",
                       "detail": (out.stderr or "")[-400:]})
    if keys_ms is None:
        return record({"status": "jitter", "detail": "no positive diff"})
    tf = 2 * 1024 * (1 << 20) * 128 / (keys_ms / 1e3) / 1e12
    status = "idle" if keys_ms <= IDLE_KEYS_MS else "tenant-loaded"
    return record({"status": status, "keys_ms": round(keys_ms, 4),
                   "tf_s": round(tf, 1)})


def run_cert():
    """The certification suite, sequential (never two TPU jobs at once).

    The two TARGET benchmarks run FIRST (idle windows have closed in under
    16 minutes; the first attempt burned its window on bench.py's 3-minute
    index build before either target ran) and every job is followed by a
    re-probe so each result carries the window state it was measured under.
    """
    results = {}
    jobs = [
        ("bigq_e2e", [sys.executable, "benchmarks/bigq_e2e.py"]),
        ("ivf_modes", [sys.executable, "benchmarks/ivf_modes.py"]),
        ("bench", [sys.executable, "bench.py"]),
    ]
    for name, cmd in jobs:
        log(f"cert: running {name} ...")
        try:
            out = subprocess.run(cmd, cwd=ROOT, capture_output=True,
                                 text=True, timeout=3600)
        except subprocess.TimeoutExpired:
            results[name] = {"status": "timeout"}
            continue
        lines = [ln for ln in out.stdout.strip().splitlines()
                 if ln.startswith("{")]
        results[name] = {
            "status": "ok" if out.returncode == 0 else f"rc={out.returncode}",
            "json_lines": [json.loads(ln) for ln in lines
                           if _is_json(ln)],
            "stderr_tail": (out.stderr or "")[-2000:],
        }
        results[name]["post_probe"] = probe()
    return results


def _is_json(ln):
    try:
        json.loads(ln)
        return True
    except ValueError:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--once", action="store_true",
                    help="one probe, no cert, exit")
    ap.add_argument("--max-hours", type=float, default=10.0)
    ap.add_argument("--force-cert", action="store_true",
                    help="run the cert suite regardless of the probe")
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    while time.time() < deadline:
        rec = probe()
        if args.once:
            return
        if rec["status"] == "idle" or args.force_cert:
            pre = rec
            results = run_cert()
            post = probe()  # did the window hold through the runs?
            cert = {
                "pre_probe": pre, "post_probe": post,
                "window_held": post.get("status") == "idle",
                "idle_keys_ms_threshold": IDLE_KEYS_MS,
                "results": results,
            }
            # never clobber a better cert: a held window wins, then the
            # one whose TARGET jobs (the first two) ran under idle probes
            def _score(c):
                held = sum(1 for n in ("bigq_e2e", "ivf_modes")
                           if c.get("results", {}).get(n, {})
                           .get("post_probe", {}).get("status") == "idle")
                return (bool(c.get("window_held")), held)
            prev = None
            if os.path.exists(CERT_PATH):
                try:
                    with open(CERT_PATH) as f:
                        prev = json.load(f)
                except ValueError:
                    prev = None
            if prev is None or _score(cert) >= _score(prev):
                with open(CERT_PATH, "w") as f:
                    json.dump(cert, f, indent=1)
            log(f"cert written to {CERT_PATH} (window_held="
                f"{cert['window_held']})")
            if cert["window_held"]:
                return
            log("window did not hold; resuming watch")
        time.sleep(PROBE_INTERVAL)
    log("max watch time reached without a certified idle window; "
        "IDLE_PROBES.jsonl documents every dated probe")


if __name__ == "__main__":
    main()
