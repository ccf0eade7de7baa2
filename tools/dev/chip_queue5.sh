#!/bin/bash
# Round-5 session-2 chip queue (fresh VM, 2026-08-19 late):
#   1-2. A14B full-depth 480p/720p steps at HEAD — first measurement with the
#        bf16 residual default (r4 numbers 21.88 s / 78.94 s were f32
#        residual; 720p was 0.887 MXU and may cross 0.9)
#   3.   MoE grouped-GEMM A/B: megablox Pallas kernel vs the tuned-default
#        jax.lax.ragged_dot on the real 30B text layer (prefill 4k)
#   4.   vision tower depth-48 scanned re-measure (dispatch floor amortized
#        to ~0.6 ms/block) — only needed if the standalone run failed
# Same gate protocol as chip_queue.sh (never kill an in-flight probe).
#
#   nohup bash tools/dev/chip_queue5.sh > /tmp/chipq5.log 2>&1 &
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
    local log=/tmp/chipq/probe.$$.$n.log
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
merge() { python tools/dev/merge_phase_cache.py /tmp/chipq/r5_*.log 2>/dev/null; }

step 1 1500 r5_a14b_stream.log env BENCH_STREAM_BUDGET_S=1000 python bench.py --phase a14b_stream
merge
step 2 1000 r5_a14b_stream720.log python bench.py --phase a14b_stream720
merge
step 3 1200 r5_moe_mb.log python tools/dev/tpu_qwen_layer_bench.py --moe_impl megablox --key_suffix _mb
merge
if ! grep -q qwen30b_vision_block_ms /tmp/chipq/r5_vision48.log 2>/dev/null; then
  step 4 1200 r5_vision48b.log python tools/dev/tpu_qwen_layer_bench.py --vision_only
  merge
fi
echo "queue5 complete"
