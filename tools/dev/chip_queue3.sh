#!/bin/bash
# Round-4 FINAL chip queue: refresh the measurements whose code changed
# after the 04:28 backend failure killed the last queue (grouped stream
# dispatches, int8 streamed leg), then fresh primary/e2e so the driver's
# round-end bench starts from a warm, current cache. Same gate protocol as
# chip_queue.sh (never kill an in-flight probe); honors /tmp/ROUND_DEADLINE.
#
#   nohup bash tools/dev/chip_queue3.sh > /tmp/chipq3.log 2>&1 &
set -u
cd "$(dirname "$0")/../.."
mkdir -p /tmp/chipq
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$(pwd)/.jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
START=${1:-1}
GATE_BUDGET=${GATE_BUDGET:-2700}

# if a prior session left a probe in flight, wait for it to resolve first —
# two concurrent client inits contend for the single-client tunnel
if [ -f /tmp/probe3.pid ] && kill -0 "$(cat /tmp/probe3.pid)" 2>/dev/null; then
  echo "[queue3] waiting for pre-existing probe $(cat /tmp/probe3.pid)"
  while kill -0 "$(cat /tmp/probe3.pid)" 2>/dev/null; do sleep 20; done
  echo "[queue3] pre-existing probe resolved: $(tail -1 /tmp/probe3.log | head -c 120)"
fi

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
merge() { python tools/dev/merge_phase_cache.py /tmp/chipq/ph_*.log /tmp/chipq/stream_lora.log 2>/dev/null; }

# 1. streamed A14B with grouped dispatches (group=4) + int8 leg + measured
#    720p on-device step — the code these measure changed after the last run
step 1 1500 ph_a14b_stream.log env BENCH_STREAM_BUDGET_S=1300 python bench.py --phase a14b_stream
merge
step 11 800 ph_a14b_stream720.log python bench.py --phase a14b_stream720
merge
# 2. fresh primary (headline 1.3B step + MXU) at HEAD
step 2 1500 ph_primary.log python bench.py --phase primary
merge
# 3. streamed-LoRA trainer measurement (built late round 4, never measured)
step 3 900 stream_lora.log python tools/dev/bench_stream_train.py --lora 16
merge
# 4. e2e 480p refresh (first post-uint8-fetch measurement in the cache)
step 4 1500 ph_e2e.log python bench.py --phase e2e
merge
echo "queue3 complete"
