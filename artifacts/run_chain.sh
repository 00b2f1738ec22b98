#!/bin/bash
# Resilient TPU artifact chain: probe the tunneled backend first, then run
# each job with a timeout and one retry (the backend wedges for 15-60 min
# stretches — IDLE_PROBES.jsonl documents the outages).
cd /root/repo

probe() {
  timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
import rii_tpu  # compile cache
x = jnp.ones((256, 256), jnp.bfloat16)
(x @ x).block_until_ready()
EOF
}

wait_backend() {
  for i in $(seq 1 40); do
    if probe; then echo "backend reachable (attempt $i)"; return 0; fi
    echo "backend unreachable (attempt $i); sleeping 180s"
    sleep 180
  done
  return 1
}

run_job() {  # name, timeout, outfile, errfile, cmd...
  local name=$1 tmo=$2 out=$3 err=$4; shift 4
  for try in 1 2; do
    wait_backend || { echo "$name: backend never returned"; return 1; }
    echo "$name: try $try"
    timeout "$tmo" "$@" > "$out" 2> "$err"
    local rc=$?
    if [ $rc -eq 0 ] && [ -s "$out" ]; then echo "$name: ok"; return 0; fi
    echo "$name: rc=$rc (retrying once)"
  done
  return 1
}

run_job sweep_clustered 2400 artifacts/recall_sweep_clustered.jsonl artifacts/recall_sweep_clustered.log \
  python benchmarks/recall_sweep.py
SWEEP_DATA=uniform run_job sweep_uniform 2400 artifacts/recall_sweep_uniform.jsonl artifacts/recall_sweep_uniform.log \
  env SWEEP_DATA=uniform python benchmarks/recall_sweep.py
run_job auto_policy 3600 artifacts/AUTO_POLICY.new.md artifacts/auto_policy.log \
  python benchmarks/auto_policy.py
run_job recall_parity 5400 artifacts/RECALL_PARITY.new.md artifacts/recall_parity.log \
  python benchmarks/recall_parity.py
echo "chain complete"
