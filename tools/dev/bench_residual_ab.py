#!/usr/bin/env python
"""On-chip A/B: f32 residual stream (reference parity) vs residual_dtype=bf16.

The trace (tools/dev/trace_ops.py on /tmp/traces/dit) shows the in-block
norm/residual fusions re-reading the f32 [B,L,dim] stream; storing it bf16
halves that traffic while every add still computes in f32.

Usage:  python tools/dev/bench_residual_ab.py [--a14b] [--iters 3]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a14b", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply

    full = WAN_CONFIGS["t2v-A14B" if args.a14b else "t2v-1.3B"]
    cfg = full.dit.replace(text_len=full.max_context_len)
    B, frames, lh, lw = (1, 21, 60, 104) if args.a14b else (2, 21, 60, 104)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 16, frames, lh, lw),
                          jnp.float32)
    t = jnp.full((B,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (B, full.max_context_len, cfg.text_dim),
                            jnp.float32)

    def timed(fn, n):
        float(fn(params, x, t, ctx))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n):
            float(fn(params, x, t, ctx))
        return (time.perf_counter() - t0) / n

    results = {}
    outs = {}
    for name, rdt in (("f32", None), ("bf16", jnp.bfloat16)):
        fwd = jax.jit(lambda p, x, t, c, rdt=rdt: jnp.sum(jnp.abs(
            wan_dit_apply(p, cfg, x, t, c, attn_impl="auto", qk_impl="auto",
                          residual_dtype=rdt))))
        results[name] = timed(fwd, args.iters)
        outs[name] = float(fwd(params, x, t, ctx))
        print(f"residual={name}: {results[name]:.3f} s/step "
              f"(sum|y|={outs[name]:.4g})", flush=True)
    rel = abs(outs["bf16"] - outs["f32"]) / (abs(outs["f32"]) + 1e-9)
    speedup = results["f32"] / results["bf16"]
    print(f"AB_RESULT speedup={speedup:.4f} out_rel_drift={rel:.2e}")


if __name__ == "__main__":
    main()
