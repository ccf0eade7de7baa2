#!/bin/bash
# Round-4 chip measurement queue. Run when the tunnel is healthy:
#     bash tools/dev/chip_queue.sh [start_step]
# Each step runs in its own subprocess behind a probe gate (a failed op
# wedges the tunnel 10-40 min — CLAUDE.md); logs land in /tmp/chipq/.
# Steps are ordered safest/most-valuable first so a mid-queue wedge still
# leaves the decisive numbers on disk.
set -u
cd "$(dirname "$0")/../.."
mkdir -p /tmp/chipq
START=${1:-1}

probe() {
  timeout 150 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
v = float(jnp.sum((x @ x).astype(jnp.float32)))
print("probe ok", v)
EOF
}

gate() {  # wait for a healthy tunnel: probe, then back off 10 min, x6
  for i in 1 2 3 4 5 6; do
    probe && return 0
    echo "[gate] probe failed (attempt $i); sleeping 600s" | tee -a /tmp/chipq/gate.log
    sleep 600
  done
  return 1
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
step 8 1000 ph_a14b_stream.log env BENCH_STREAM_BUDGET_S=800 python bench.py --phase a14b_stream
step 9 900  qwen_layer.log    python tools/dev/tpu_qwen_layer_bench.py
step 10 1500 ph_primary.log   python bench.py --phase primary
python tools/dev/merge_phase_cache.py /tmp/chipq/ph_*.log /tmp/chipq/qwen_layer.log
echo "queue complete; merged phase logs into BENCH_LOCAL.json"
