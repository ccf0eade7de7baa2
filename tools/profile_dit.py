#!/usr/bin/env python
"""Capture a jax.profiler trace of the DiT denoise step on the TPU.

Writes an xplane trace under --logdir (view with TensorBoard's profile
plugin / xprof) — per-op MXU utilization evidence for kernel work.

Usage:  python tools/profile_dit.py --logdir traces/dit
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="traces/dit")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply
    from omnivideo_tpu.utils.observability import annotate, profile_trace

    cfg = T2V_1_3B
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    frames, lh, lw = (3, 16, 16) if args.tiny else (21, 60, 104)
    params = init_wan_dit(jax.random.PRNGKey(0), dit_cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, frames, lh, lw), jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.max_context_len, dit_cfg.text_dim), jnp.bfloat16)

    fwd = jax.jit(lambda p, x, t, c: jnp.sum(
        wan_dit_apply(p, dit_cfg, x, t, c).astype(jnp.float32)))
    float(fwd(params, x, t, ctx))  # compile + warm

    with profile_trace(args.logdir):
        for i in range(args.iters):
            with annotate(f"dit_step_{i}"):
                v = float(fwd(params, x, t, ctx))
    print("trace written to", args.logdir, "last value", v)


if __name__ == "__main__":
    main()
