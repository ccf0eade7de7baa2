#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): DiT step latency / end-to-end sec/video for
the flagship model on the available hardware. On a single TPU chip we measure
the 1.3B DiT denoising step (CFG batch-2, 480p-class latent) — the hot loop
that dominates end-to-end time — plus VAE decode throughput, and derive
sec/video for the default 40-step schedule.

vs_baseline: the reference publishes no numbers (BASELINE.md); we report the
ratio against a model-FLOPs roofline on this chip (v5e ≈ 197 TFLOP/s bf16):
vs_baseline = roofline_time / measured_time = achieved MXU utilization.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def _dit_flops(cfg, seq_len, ctx_len, batch):
    """FLOPs per DiT forward (matmuls only, 2·M·N·K)."""
    d, f, L, Lc, nl = cfg.dim, cfg.ffn_dim, seq_len, ctx_len, cfg.num_layers
    per_block = (
        2 * L * d * d * 4          # self-attn qkvo
        + 2 * 2 * L * L * d        # attention scores + values
        + 2 * L * d * d * 2        # cross-attn q,o
        + 2 * Lc * d * d * 2       # cross-attn k,v
        + 2 * 2 * L * Lc * d       # cross attention
        + 2 * L * d * f * 2        # ffn
    )
    embed = 2 * L * 64 * d + 2 * Lc * cfg.text_dim * d + 2 * Lc * d * d
    return batch * (nl * per_block + embed)


def main():
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply
    from omnivideo_tpu.models.vae2_1 import init_vae, vae_decode

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    cfg = T2V_1_3B
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    if not on_tpu:  # CPU sanity fallback: shrink
        dit_cfg = dit_cfg.replace(dim=128, ffn_dim=256, num_heads=4, num_layers=2,
                                  freq_dim=32, text_dim=64)

    # 480x832, 21 latent frames (81 pixel frames) → seq = 21*60*104/4 = 32,760
    frames_lat, lh, lw = (21, 60, 104) if on_tpu else (3, 16, 16)
    steps = 40
    params = init_wan_dit(jax.random.PRNGKey(0), dit_cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, frames_lat, lh, lw), jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2), (2, cfg.max_context_len, dit_cfg.text_dim), jnp.bfloat16
    )

    # NOTE: under the axon TPU platform block_until_ready() is a no-op; force
    # execution by fetching a scalar reduction of the output.
    fwd = jax.jit(
        lambda p, x, t, c: jnp.sum(
            wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="auto").astype(jnp.float32)
        )
    )
    float(fwd(params, x, t, ctx))  # compile + warmup

    n_iter = 3 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(n_iter):
        v = float(fwd(params, x, t, ctx))
    dit_step_s = (time.perf_counter() - t0) / n_iter

    # VAE decode throughput (BASELINE.json: "VAE decode fps on v5e-8")
    vae_fps = None
    if on_tpu:
        try:
            vae_params = init_vae(jax.random.PRNGKey(3), cfg.vae)
            z = jax.random.normal(jax.random.PRNGKey(4), (1, 16, frames_lat, lh, lw), jnp.float32)
            fd = jax.jit(
                lambda p, z: jnp.sum(vae_decode(p, cfg.vae, z, dtype=jnp.float32))
            )
            float(fd(vae_params, z))  # compile
            t0 = time.perf_counter()
            float(fd(vae_params, z))
            n_frames = (frames_lat - 1) * 4 + 1
            vae_fps = n_frames / (time.perf_counter() - t0)
        except Exception as e:  # pragma: no cover
            print(f"# vae bench failed: {e}", file=sys.stderr)

    pt, ph, pw = dit_cfg.patch_size
    seq_len = frames_lat * (lh // ph) * (lw // pw)
    flops = _dit_flops(dit_cfg, seq_len, cfg.max_context_len, 2)
    peak = 197e12 if on_tpu else 1e11
    mxu_util = flops / dit_step_s / peak

    sec_video_dit = dit_step_s * steps

    result = {
        "metric": "1.3B DiT denoise step (CFG batch-2, 480p 81f), single chip",
        "value": round(dit_step_s, 4),
        "unit": "s/step",
        "vs_baseline": round(mxu_util, 4),
        "detail": {
            "backend": backend,
            "seq_len": seq_len,
            "dit_tflops_per_step": round(flops / 1e12, 2),
            "mxu_utilization": round(mxu_util, 4),
            "sec_per_video_dit_40steps": round(sec_video_dit, 2),
            "vae_decode_fps_480p": round(vae_fps, 1) if vae_fps else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
