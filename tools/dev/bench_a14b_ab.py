#!/usr/bin/env python
"""A/B the A14B DiT block on chip: cross-attn dispatch mode x ew_impl.

VERDICT r3 item 1 targets >=0.88 MXU on the A14B block. The two candidate
levers beyond the 1.3B-tuned defaults:
  - FLASH_XATTN_MODE single vs multi (divisor bk=896, wide bq) for the
    6,272-token cross-attention;
  - ew_impl xla vs pallas (the fused-AdaLN kernel measured NEGATIVE at dim
    1536 but its recompute-vs-traffic balance flips at larger dim —
    docs/PERFORMANCE.md).

    python tools/dev/bench_a14b_ab.py [--tag 480p|720p] [--reps 2]

Mirrors bench.py::bench_a14b_block's 4-rep scan methodology so numbers are
directly comparable to a14b_block_mxu_*.
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="480p", choices=["480p", "720p"])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--combos",
        default="single:xla:xla,multi:xla:xla,single:pallas:xla,"
                "single:xla:pallas,multi:xla:pallas",
        help="comma list of xattn_mode:ew_impl:qk_impl triples "
             "(qk_impl=pallas = fused norm+rope+bound prologue)")
    ap.add_argument(
        "--write-tuned", action="store_true",
        help="persist the winning combo into ops/tuning.py's table (so "
             "'auto' callers — bench phases, CLI, pipelines — pick it up) "
             "when it beats the current default by >1%%")
    args = ap.parse_args()

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.models.wan_dit import (
        WanAuxInputs, init_wan_block, wan_block_apply)
    from omnivideo_tpu.ops.rope import rope_3d_tables

    full = WAN_CONFIGS["t2v-A14B"]
    cfg = full.dit
    d, f, Lc = cfg.dim, cfg.ffn_dim, full.max_context_len
    params = init_wan_block(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    grid, batch = ((21, 30, 52), 2) if args.tag == "480p" else ((21, 45, 80), 1)
    L = grid[0] * grid[1] * grid[2]
    cos, sin = rope_3d_tables(grid, cfg.head_dim, cfg.rope_max_seq_len,
                              cfg.rope_theta)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, Lc, d), jnp.bfloat16)
    e0 = jax.random.normal(jax.random.PRNGKey(3), (batch, 1, 6, d),
                           jnp.float32) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, L, d), jnp.float32)
    aux = WanAuxInputs(e0=e0, context=ctx, rope_cos=cos, rope_sin=sin,
                       kv_lens=None, sp=None)
    flops = batch * (2 * L * d * d * 4 + 4 * L * L * d + 2 * L * d * d * 2
                     + 2 * Lc * d * d * 2 + 4 * L * Lc * d + 2 * L * d * f * 2)
    peak = 197e12
    reps = 4
    results = []

    for combo in args.combos.split(","):
        mode, ew, qk = combo.strip().split(":")
        os.environ["FLASH_XATTN_MODE"] = mode
        fwd = jax.jit(lambda p, xx, aux: jnp.sum(
            jax.lax.scan(lambda c, _: (wan_block_apply(
                p, c, aux, cfg, attn_impl="auto", ew_impl=ew, qk_impl=qk),
                None),
                xx, None, length=reps)[0].astype(jnp.float32)))
        label = f"xattn={mode} ew={ew} qk={qk}"
        try:
            float(fwd(params, x, aux))  # compile + warm
        except Exception as err:  # compile-time reject (e.g. VMEM) — a
            # broken VARIANT must not abort the whole A/B (it did: the
            # dim-5120 fused-adaln scoped-vmem overflow killed step 9)
            print(f"{label:36s} FAILED: {type(err).__name__}: "
                  f"{str(err)[:160]}", flush=True)
            jax.clear_caches()
            continue
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(fwd(params, x, aux))
        t = (time.perf_counter() - t0) / args.reps / reps
        mxu = flops / t / peak
        print(f"{label:36s} {t*1e3:8.1f} ms/block  {mxu:5.1%} MXU",
              flush=True)
        results.append((mxu, label, t, (mode, ew, qk)))
        jax.clear_caches()
    os.environ.pop("FLASH_XATTN_MODE", None)
    if not results:
        print("no variant completed", flush=True)
        return

    results.sort(reverse=True)
    best = results[0]
    print(f"\nbest: {best[1]}  {best[2]*1e3:.1f} ms  {best[0]:.1%} MXU "
          f"(derived step {cfg.num_layers * best[2] * (2 // batch):.2f} s)")

    if args.write_tuned:
        from omnivideo_tpu.ops import tuning

        lk_r = (Lc + 127) // 128 * 128
        written = tuning.persist_winner(
            {combo: t for _, _, t, combo in results}, d, cfg.num_heads, lk_r,
            source=f"bench_a14b_ab --tag {args.tag}")
        for sec, key, val in written:
            print(f"TUNED_UPDATED {sec}[{key}] = {val}", flush=True)
        if not written:
            print("tuned table unchanged (winner == default or within "
                  "noise margin)", flush=True)


if __name__ == "__main__":
    main()
