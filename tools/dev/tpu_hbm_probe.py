#!/usr/bin/env python
"""Diagnose the A14B layer-stream e2e decode OOM: replicate the denoise,
then bisect how much HBM is actually allocatable before VAE decode.

    python tools/dev/tpu_hbm_probe.py [--steps 1]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def free_hbm_gb():
    """Largest single allocation that succeeds (GB, powers of two)."""
    got = 0.0
    for gb in (8.0, 6.0, 4.0, 3.0, 2.0, 1.5, 1.0, 0.75, 0.5, 0.25, 0.125):
        try:
            n = int(gb * 1e9 / 2)
            x = jnp.ones((n,), jnp.bfloat16)
            float(jnp.sum(x[:8].astype(jnp.float32)))
            del x
            got = gb
            break
        except Exception:
            continue
    return got


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1)
    args = ap.parse_args()

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    print(f"# free HBM at start: {free_hbm_gb()} GB", flush=True)
    cfg = WAN_CONFIGS["t2v-A14B"]
    t0 = time.time()
    pipe = OmniVideoX2XUnified.random_init(cfg, with_vae=True,
                                           layer_stream=True)
    print(f"# pipeline init {time.time()-t0:.0f}s; free: {free_hbm_gb()} GB",
          flush=True)
    ctx = jnp.zeros((5, cfg.dit.text_dim), jnp.float32)
    t0 = time.time()
    lat = pipe.generate(precomputed_context=ctx,
                        precomputed_context_null=jnp.zeros_like(ctx),
                        size=(832, 480), frame_num=81,
                        sampling_steps=args.steps, guide_scale=4.0, seed=1,
                        decode=False)
    print(f"# denoise {time.time()-t0:.0f}s; free: {free_hbm_gb()} GB",
          flush=True)
    for _, ex in pipe._stream.values():
        ex.release()
    jax.clear_caches()
    print(f"# after release+clear: free: {free_hbm_gb()} GB", flush=True)
    t0 = time.time()
    video = pipe.vae.decode(lat, dtype=jnp.bfloat16)
    print(f"# decode {time.time()-t0:.0f}s ok: {video.shape} "
          f"finite={bool(jnp.isfinite(video).all())}; "
          f"free: {free_hbm_gb()} GB", flush=True)


if __name__ == "__main__":
    main()
