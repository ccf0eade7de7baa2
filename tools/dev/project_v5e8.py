#!/usr/bin/env python
"""Quantified v5e-8 north-star projection (VERDICT r4 item 5).

BASELINE.json's north star is "5s-720p faster than the reference on 8xA100,
on v5e-8". Multi-chip hardware does not exist in this environment, so the
claim is assembled from pieces that DO exist:

  1. the MEASURED single-chip A14B 720p step (bench.py --phase a14b_stream720:
     78.94 s CFG step at 0.887 MXU — BENCH_LOCAL.json a14b_step_measured_720p_s);
  2. per-collective comm volume extracted from the COMPILED HLO of the
     sequence-parallel (ulysses, seq=8) A14B forward at the real 720p shapes,
     compiled over a virtual 8-device mesh (the same path
     __graft_entry__.dryrun_multichip proves numerically correct);
  3. a stated ICI bandwidth model for a v5e-8 slice (2x4 torus, 4 links/chip,
     45 GB/s one-way per link — jax-ml.github.io/scaling-book numbers).

Projection arithmetic (all terms printed):
    step_8chip   = step_1chip / 8  +  comm_bytes_per_step / ici_bw
    sec_per_video = t5_encode + 50 * step_8chip + vae_decode_720p
Compute scales 1/8 under ulysses: the sequence axis is split 8-way and
full-seq attention runs per-head after the all-to-all, so per-chip FLOPs are
exactly 1/8 of the single-chip step at identical shapes/kernels (MXU
efficiency held constant; the per-chip 9,450-token q tiles are still >> the
kernel's 1024-row blocks). No compute/comm overlap is assumed (conservative:
XLA overlaps a2a with the adjacent GEMMs when it can).

Reference envelope it must beat (same arithmetic, their hardware): the
reference runs this model with torch FSDP + ulysses on NVIDIA
(/root/reference/omnivideo/distributed/ulysses.py:8-56, README.md:327);
8xA100 bf16 dense peak = 8 x 312 = 2496 TFLOP/s. The step costs
step_flops = step_1chip * 0.887 * 197e12 FLOPs, so the reference needs
end-to-end MFU > (our projected step FLOP rate / 2496e12) to tie.

Run on CPU (forces 8 virtual devices). Writes PHASE_JSON for
tools/dev/merge_phase_cache.py; bench.py runs this as the `v5e8` phase.
"""
import json
import os
import re
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# v5e ICI model (scaling-book): 4 links/chip x 45 GB/s one-way; a 1-axis
# collective over the 8-chip (2x4) slice rides a bidirectional ring -> 2
# active links per chip per direction pair.
ICI_LINK_GBPS = 45e9
ICI_EFF_BW = 2 * ICI_LINK_GBPS          # base case: bidirectional ring
ICI_BOUNDS = (ICI_LINK_GBPS, 4 * ICI_LINK_GBPS)  # pessimistic..optimistic
V5E_PEAK = 197e12
A100_8X_PEAK = 8 * 312e12

_COLL_RE = re.compile(
    r"^\s*%?\S+\s*=\s*(\([^)]*\)|\S+)\s+"
    r"(all-to-all|all-gather|all-reduce|reduce-scatter|collective-permute)"
    r"(?:-start)?\(([^)]*)\)", re.M)
_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]")
_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1}


def _shape_bytes(shapes: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shapes):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def _wire_bytes(op: str, nbytes: int, n: int = 8) -> float:
    """Per-chip bytes on the wire for one execution (ring algorithms)."""
    if op == "all-to-all":
        return nbytes * (n - 1) / n
    if op in ("all-gather", "reduce-scatter"):
        # HLO shape is the LARGE side (ag output / rs input) post-partitioning
        return nbytes * (n - 1) / n
    if op == "all-reduce":
        return 2 * nbytes * (n - 1) / n
    if op == "collective-permute":
        return nbytes
    return 0.0


def _computation_blocks(hlo: str):
    """Yield (name, body_text) for each HLO computation."""
    blocks = re.split(r"^(?=[%\w].*\{\s*(?:/\*.*\*/)?\s*$)", hlo, flags=re.M)
    for b in blocks:
        m = re.match(r"^\s*%?([\w\.\-]+)", b)
        if m:
            yield m.group(1), b


def collect_collectives(hlo: str, loop_trips: int):
    """Sum per-chip wire bytes across the module; collectives inside while
    bodies (the layer scan) are multiplied by loop_trips."""
    while_bodies = set(re.findall(r"body=%?([\w\.\-]+)", hlo))
    per_op, total = {}, 0.0
    for name, body in _computation_blocks(hlo):
        mult = loop_trips if name in while_bodies else 1
        for m in _COLL_RE.finditer(body):
            shapes, op, args = m.group(1), m.group(2), m.group(3)
            nbytes = _shape_bytes(shapes)
            # CPU-backend artifact: XLA:CPU upcasts bf16 collectives to f32
            # behind `%convert_convert_fusion` (bf16 round-trip) operands;
            # on TPU the same program keeps the collective bf16. Count those
            # at their true half-precision wire width.
            ops_list = [a.split("*/")[-1].strip()  # drop /*index=N*/ comments
                        for a in args.split(",") if a.strip()]
            if ops_list and all(a.startswith("%convert_convert")
                                for a in ops_list):
                nbytes //= 2
            wire = _wire_bytes(op, nbytes) * mult
            per_op[op] = per_op.get(op, 0.0) + wire
            total += wire
    return per_op, total


def lower_a14b_720p_sp8():
    from omnivideo_tpu.configs.base import T2V_A14B
    from omnivideo_tpu.models.wan_dit import SPConfig, init_wan_dit, wan_dit_apply
    from omnivideo_tpu.parallel.mesh import create_mesh

    cfg = T2V_A14B.dit
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    sp = SPConfig(mesh=mesh, mode="ulysses")

    p_struct = jax.eval_shape(
        lambda k: init_wan_dit(k, cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0))
    # 720p 81f: latents [1, 16, 21, 90, 160] -> L = 21*45*80 = 75,600 (div 8)
    x = jax.ShapeDtypeStruct((1, 16, 21, 90, 160), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    # context embedded to model dim (pipelines/x2x.py embeds once per video)
    ctx = jax.ShapeDtypeStruct((1, T2V_A14B.max_context_len, cfg.dim),
                               jnp.bfloat16)

    def fwd(params, x, t, ctx):
        return wan_dit_apply(params, cfg, x, t, ctx, context_embedded=True,
                             attn_impl="xla", sp=sp)

    t0 = time.time()
    with mesh:
        lowered = jax.jit(fwd).lower(p_struct, x, t, ctx)
        compiled = lowered.compile()
    return cfg, compiled, time.time() - t0


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    cfg, compiled, compile_s = lower_a14b_720p_sp8()
    hlo = compiled.as_text()
    per_op, fwd_wire_bytes = collect_collectives(hlo, loop_trips=cfg.num_layers)
    print(f"# compiled in {compile_s:.1f}s; HLO {len(hlo)/1e6:.1f} MB",
          file=sys.stderr)
    for op, b in sorted(per_op.items()):
        print(f"#   {op:>20}: {b/1e6:9.1f} MB/forward per chip", file=sys.stderr)

    cache = {}
    cache_path = os.path.join(os.path.dirname(__file__), "..", "..",
                              "BENCH_LOCAL.json")
    try:
        cache = json.load(open(cache_path)).get("detail", {})
    except OSError:
        pass
    step_1chip = cache.get("a14b_step_measured_720p_s", 78.94)
    step_mxu = cache.get("a14b_step_mxu_720p", 0.887)
    t5_s = cache.get("t5_xxl_encode_s", 0.13)
    vae_s = cache.get("vae_decode_720p_s", 13.65)

    step_wire = 2 * fwd_wire_bytes          # CFG = two forwards per step
    comm_s = step_wire / ICI_EFF_BW
    comm_lo = step_wire / ICI_BOUNDS[1]     # optimistic (4 links busy)
    comm_hi = step_wire / ICI_BOUNDS[0]     # pessimistic (1 link)
    step_8 = step_1chip / 8 + comm_s
    sec_video = t5_s + args.steps * step_8 + vae_s

    step_flops = step_1chip * step_mxu * V5E_PEAK
    # MFU the 8xA100 reference would need to TIE our projected video time
    ref_step_budget = (sec_video - t5_s - vae_s) / args.steps
    mfu_to_tie = step_flops / (ref_step_budget * A100_8X_PEAK)

    out = {
        "v5e8_hlo_wire_mb_per_fwd": round(fwd_wire_bytes / 1e6, 1),
        "v5e8_comm_s_per_step": round(comm_s, 4),
        "v5e8_comm_s_per_step_bounds": [round(comm_lo, 4), round(comm_hi, 4)],
        "v5e8_step_720p_projected_s": round(step_8, 3),
        "sec_per_video_720p_v5e8_projected": round(sec_video, 1),
        "v5e8_ref_8xa100_mfu_to_tie": round(mfu_to_tie, 3),
        "v5e8_sp8_compile_s": round(compile_s, 1),
    }
    print("PHASE_JSON:" + json.dumps(out), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
