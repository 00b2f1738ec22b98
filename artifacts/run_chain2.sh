#!/bin/bash
# TPU batch 2: OPQ parity re-run (rescore epilogue applies to OPQ too),
# clustered sweep with the coverage metric, small-config bench surface
# check, SIFT1B-shape run with the checkpoint-v2 restore leg.
cd /root/repo

probe() {
  timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
import rii_tpu
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
run_job bench_surface 1800 artifacts/bench_small.json artifacts/bench_small.log \
  env BENCH_N=50000 BENCH_Q=128 python bench.py
run_job parity_opq 5400 artifacts/RECALL_PARITY.opq.md artifacts/recall_parity_opq.log \
  env BENCH_CODEC=opq python benchmarks/recall_parity.py
run_job sift1b_ckpt 5400 artifacts/sift1b_shape.json artifacts/sift1b_shape.log \
  env SHAPE_CKPT=1 python benchmarks/sift1b_shape.py
echo "chain2 complete"
