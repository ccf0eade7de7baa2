#!/bin/bash
# Round-4 FOLLOW-UP chip queue: re-measure everything the first queue ran
# before the fixes landed (qk_prep TPU lowering, 720p kv-tile picker, fused
# adaln VMEM cap, packed transfers) and with an IDLE host (the first
# re-measures ran against a background CPU job and inflated 10%).
# Same gate protocol as chip_queue.sh (never kill a probe).
set -u
cd "$(dirname "$0")/../.."
mkdir -p /tmp/chipq
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$(cd "$(dirname "$0")/../.." && pwd)/.jax_cache}
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
  if [ -f /tmp/ROUND_DEADLINE ] && \
     [ $(( $(date +%s) + t )) -ge "$(cat /tmp/ROUND_DEADLINE)" ]; then
    echo "[step $n] skipped post-gate: would overrun ROUND_DEADLINE" | tee -a /tmp/chipq/gate.log
    return 0
  fi
  timeout "$t" "$@" 2>&1 | tee "/tmp/chipq/$log"
  local rc=${PIPESTATUS[0]}
  echo "=== step $n done rc=$rc ==="
}

merge() { python tools/dev/merge_phase_cache.py /tmp/chipq/ph_*.log /tmp/chipq/stream_train.log /tmp/chipq/stream_lora.log; }

step 1 500  kernel_check.log  python tools/dev/tpu_kernel_check.py
step 2 700  ph_a14b_block.log python bench.py --phase a14b_block; merge
step 3 900  ph_primary.log    python bench.py --phase primary; merge
step 4 1500 ph_a14b_stream.log env BENCH_STREAM_BUDGET_S=1300 BENCH_STREAM_720P=1 python bench.py --phase a14b_stream; merge
step 5 1500 a14b_ab.log       python tools/dev/bench_a14b_ab.py --tag 480p --write-tuned
if grep -q TUNED_UPDATED /tmp/chipq/a14b_ab.log 2>/dev/null; then
  step 6 700 ph_a14b_block.log python bench.py --phase a14b_block; merge
fi
step 7 1200 stream_train.log  python tools/dev/bench_stream_train.py; merge
step 8 900  stream_lora.log   python tools/dev/bench_stream_train.py --lora 16; merge
echo "queue2 complete"
