#!/bin/bash
# Round-4 chip measurement queue. Run when the tunnel is healthy:
#     bash tools/dev/chip_queue.sh [start_step]
# Each step runs in its own subprocess behind a probe gate (a failed op
# wedges the tunnel 10-40 min — CLAUDE.md); logs land in /tmp/chipq/.
# Steps are ordered safest/most-valuable first so a mid-queue wedge still
# leaves the decisive numbers on disk.
#
# GATE PROTOCOL (round-3 lesson, memory/axon-tunnel-behavior.md): NEVER
# timeout-kill a probe — the kill of an in-flight op RE-wedges the tunnel
# (the probe-kill death spiral). The gate launches ONE unbounded probe and
# POLLS its log; a hung probe completes on its own when the wedge clears
# (observed ~7 min). Only a probe that EXITS nonzero (real error, not hang)
# is relaunched, after a quiet pause.
set -u
cd "$(dirname "$0")/../.."
mkdir -p /tmp/chipq
START=${1:-1}
GATE_BUDGET=${GATE_BUDGET:-2700}   # max seconds to wait for a healthy tunnel

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
      if ! kill -0 "$pid" 2>/dev/null; then        # probe exited without OK
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
    # real probe error (not a hang): quiet pause, then one more probe
    [ $(( $(date +%s) - t0 )) -ge "$GATE_BUDGET" ] && return 1
    sleep 180
  done
}

step() {  # step <n> <timeout> <log> <cmd...>
  local n=$1 t=$2 log=$3; shift 3
  [ "$n" -lt "$START" ] && return 0
  echo "=== step $n: $* (timeout ${t}s) ==="
  gate || { echo "[step $n] tunnel dead; aborting queue"; exit 1; }
  timeout "$t" "$@" 2>&1 | tee "/tmp/chipq/$log"
  echo "=== step $n done rc=$? ==="
}

step 1 420  kernel_check.log  python tools/dev/tpu_kernel_check.py
step 2 900  xattn_cross.log   python tools/dev/bench_xattn_sweep.py --cross
step 3 1500 a14b_ab.log       python tools/dev/bench_a14b_ab.py --tag 480p
step 4 1200 qk_ab.log         python tools/dev/bench_qk_ab.py
step 5 1200 split_a14b.log    python tools/dev/bench_split.py --a14b
step 6 900  xattn_self.log    python tools/dev/bench_xattn_sweep.py --self
# official bench phases (merge into the cache for the driver run)
step 7 700  ph_a14b_block.log python bench.py --phase a14b_block
step 8 1500 ph_a14b_stream.log env BENCH_STREAM_BUDGET_S=1300 BENCH_STREAM_720P=1 python bench.py --phase a14b_stream
step 9 900  qwen_layer.log    python tools/dev/tpu_qwen_layer_bench.py
step 10 1500 ph_primary.log   python bench.py --phase primary
step 11 1200 stream_train.log python tools/dev/bench_stream_train.py
# flagship artifact: REAL A14B 480p 81-frame video on one 16 GB chip
step 12 1500 a14b_e2e.log     python tools/generate.py --task t2v-A14B --size 832*480 --frame_num 81 --sample_steps 4 --input samples/t2v_example.jsonl --output_dir /tmp/a14b_e2e --random_weights --layer_stream --vae_dtype bfloat16
python tools/dev/merge_phase_cache.py /tmp/chipq/ph_*.log /tmp/chipq/qwen_layer.log /tmp/chipq/stream_train.log
echo "queue complete; merged phase logs into BENCH_LOCAL.json"

# Reduced queue for a late-returning tunnel (outage mode): only the decisive
# driver-facing numbers, skipping the exploratory sweeps. Usage:
#     REDUCED=1 bash tools/dev/chip_queue.sh   (START is ignored)
# (the reduced list lives in comments here; drive it manually:
#  steps 7, 8, 10, 9, 11 in that order)
