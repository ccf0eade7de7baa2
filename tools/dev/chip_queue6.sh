#!/bin/bash
# Round-5 session-3 chip queue (run AFTER chip_queue5.sh completes):
#   1. vision-block component A/B at HEAD (packed-form RoPE landed at
#      9.1 ms/block in the depth-48 scan) — locates the remaining gap
#      between 9.1 ms measured and the ~3.7 ms GEMM+attention ideal
#      (candidates: f32 rope elementwise, LN passes, scan carry traffic)
#   2. 1.3B 720p step refresh at HEAD (r4 key predates the bf16-residual
#      default; 480p primary already measured 3.751 s this round)
# Same gate protocol as chip_queue5.sh.
#
#   nohup bash tools/dev/chip_queue6.sh > /tmp/chipq6.log 2>&1 &
set -u
cd "$(dirname "$0")/../.."
mkdir -p /tmp/chipq
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$(pwd)/.jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
START=${1:-1}
GATE_BUDGET=${GATE_BUDGET:-2700}

gate() {
  local t0=$(date +%s) n=0
  while true; do
    n=$((n + 1))
    local log=/tmp/chipq/probe6.$$.$n.log
    rm -f "$log"
    nohup python -c 'import jax, jax.numpy as jnp; x = jnp.ones((256, 256), jnp.bfloat16); print("PROBE_OK", float(jnp.sum((x @ x).astype(jnp.float32))), flush=True)' > "$log" 2>&1 &
    local pid=$!
    while true; do
      grep -q PROBE_OK "$log" 2>/dev/null && return 0
      if ! kill -0 "$pid" 2>/dev/null; then
        echo "[gate] probe $n exited unhealthy:" | tee -a /tmp/chipq/gate.log
        tail -2 "$log" | tee -a /tmp/chipq/gate.log
        break
      fi
      if [ $(( $(date +%s) - t0 )) -ge "$GATE_BUDGET" ]; then
        echo "[gate] budget ${GATE_BUDGET}s exhausted; ABANDONING probe $pid (never kill)" | tee -a /tmp/chipq/gate.log
        return 1
      fi
      sleep 15
    done
    [ $(( $(date +%s) - t0 )) -ge "$GATE_BUDGET" ] && return 1
    sleep 180
  done
}

step() {  # step <n> <timeout> <log> <cmd...>
  local n=$1 t=$2 log=$3; shift 3
  [ "$n" -lt "$START" ] && return 0
  if [ -f /tmp/ROUND_DEADLINE ]; then
    local dl=$(cat /tmp/ROUND_DEADLINE)
    if [ $(( $(date +%s) + t )) -ge "$dl" ]; then
      echo "[step $n] skipped: would overrun ROUND_DEADLINE" | tee -a /tmp/chipq/gate.log
      return 0
    fi
  fi
  echo "=== step $n: $* (timeout ${t}s) ==="
  gate || { echo "[step $n] tunnel dead; aborting queue"; exit 1; }
  timeout "$t" "$@" 2>&1 | tee "/tmp/chipq/$log"
  local rc=${PIPESTATUS[0]}
  echo "=== step $n done rc=$rc ==="
}
merge() { python tools/dev/merge_phase_cache.py /tmp/chipq/r5b_*.log 2>/dev/null; }

step 1 1200 r5b_vision_ab.log python tools/dev/bench_vision_ab.py --reps 24
merge
step 2 900 r5b_primary720.log python bench.py --phase 720p
merge
echo "queue6 complete"
