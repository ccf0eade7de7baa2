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
# shared persistent XLA compile cache: each step is its own subprocess, so
# without this every step repays the 20-40 s TPU compiles of shared programs
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$(cd "$(dirname "$0")/../.." && pwd)/.jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
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
  # Round-end guard: /tmp/ROUND_DEADLINE (epoch secs) marks when the driver
  # may run bench.py — a queue step still holding the chip then would make
  # the driver's own run hang. Skip any step that couldn't finish in time.
  if [ -f /tmp/ROUND_DEADLINE ]; then
    local dl=$(cat /tmp/ROUND_DEADLINE)
    if [ $(( $(date +%s) + t )) -ge "$dl" ]; then
      echo "[step $n] skipped: would overrun ROUND_DEADLINE ($(date -u -d "@$dl" +%H:%M:%S))" | tee -a /tmp/chipq/gate.log
      return 0
    fi
  fi
  echo "=== step $n: $* (timeout ${t}s) ==="
  gate || { echo "[step $n] tunnel dead; aborting queue"; exit 1; }
  # the gate can wait tens of minutes — re-check the deadline after it
  if [ -f /tmp/ROUND_DEADLINE ] && \
     [ $(( $(date +%s) + t )) -ge "$(cat /tmp/ROUND_DEADLINE)" ]; then
    echo "[step $n] skipped post-gate: would overrun ROUND_DEADLINE" | tee -a /tmp/chipq/gate.log
    return 0
  fi
  timeout "$t" "$@" 2>&1 | tee "/tmp/chipq/$log"
  local rc=${PIPESTATUS[0]}   # the command's rc, not tee's (124 = timeout kill)
  echo "=== step $n done rc=$rc ==="
}

# Step catalog. Two orders:
#  - default: exploratory sweeps first (plenty of chip time available)
#  - REDUCED=1: outage mode — decisive driver-facing numbers FIRST so a
#    late-returning tunnel still yields a fresh BENCH + the key round-4
#    measurements before anything exploratory runs.
s_kernel()  { step "$1" 420  kernel_check.log  python tools/dev/tpu_kernel_check.py; }
s_xcross()  { step "$1" 900  xattn_cross.log   python tools/dev/bench_xattn_sweep.py --cross; }
s_a14b_ab() { step "$1" 1500 a14b_ab.log       python tools/dev/bench_a14b_ab.py --tag 480p --write-tuned; }
s_qk_ab()   { step "$1" 1200 qk_ab.log         python tools/dev/bench_qk_ab.py --write-tuned; }
s_split()   { step "$1" 1200 split_a14b.log    python tools/dev/bench_split.py --a14b; }
s_xself()   { step "$1" 900  xattn_self.log    python tools/dev/bench_xattn_sweep.py --self; }
s_block()   { step "$1" 700  ph_a14b_block.log python bench.py --phase a14b_block; }
s_stream()  { step "$1" 1500 ph_a14b_stream.log env BENCH_STREAM_BUDGET_S=1300 python bench.py --phase a14b_stream; }
s_stream7() { step "$1" 800  ph_a14b_stream720.log python bench.py --phase a14b_stream720; }
s_qwen()    { step "$1" 900  qwen_layer.log    python tools/dev/tpu_qwen_layer_bench.py; }
s_primary() { step "$1" 1500 ph_primary.log    python bench.py --phase primary; }
s_strain()  { step "$1" 1200 stream_train.log  python tools/dev/bench_stream_train.py; }
s_slora()   { step "$1" 900  stream_lora.log   python tools/dev/bench_stream_train.py --lora 16; }
# flagship artifact: REAL A14B 480p 81-frame video on one 16 GB chip
s_e2e()     { step "$1" 1500 a14b_e2e.log      python tools/generate.py --task t2v-A14B --size 832*480 --frame_num 81 --sample_steps 4 --input samples/t2v_example.jsonl --output_dir /tmp/a14b_e2e --random_weights --layer_stream --vae_dtype bfloat16; }
merge() { python tools/dev/merge_phase_cache.py /tmp/chipq/ph_*.log /tmp/chipq/qwen_layer.log /tmp/chipq/stream_train.log /tmp/chipq/stream_lora.log; }

if [ "${REDUCED:-0}" = "1" ]; then
  # decisive first; merge after EVERY phase so a mid-queue wedge still
  # leaves everything measured so far in BENCH_LOCAL.json
  s_kernel 1
  s_primary 2;  merge
  s_block 3;    merge
  s_stream 4;   merge
  s_stream7 41;  merge
  s_qwen 5;     merge
  s_strain 6;   merge
  s_slora 7;    merge
  s_qk_ab 8
  s_a14b_ab 9
  # if an A/B flipped a tuned default (ops/tuning.py table), re-measure the
  # phases that resolve "auto" so the cache reflects the new winner
  if grep -q TUNED_UPDATED /tmp/chipq/qk_ab.log /tmp/chipq/a14b_ab.log 2>/dev/null; then
    s_block 10;   merge
    s_primary 11; merge
  fi
  s_e2e 12
else
  s_kernel 1; s_xcross 2; s_a14b_ab 3; s_qk_ab 4; s_split 5; s_xself 6
  s_block 7; s_stream 8; s_stream7 81; s_qwen 9; s_primary 10; s_strain 11; s_slora 12
  s_e2e 13
  merge
fi
echo "queue complete; merged phase logs into BENCH_LOCAL.json"
