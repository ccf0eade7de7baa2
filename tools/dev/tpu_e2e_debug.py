"""Binary-search the on-chip e2e bench failure (UNAVAILABLE during
bench_e2e_480p). Run stages in order; each prints OK or dies.

  python tools/dev/tpu_e2e_debug.py --stage flash_small_kv
  python tools/dev/tpu_e2e_debug.py --stage pipe_tiny
  python tools/dev/tpu_e2e_debug.py --stage pipe_480p_2steps
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def stage_flash_small_kv():
    """Packed-path flash with Lk smaller than one 128 block (cross-attn with
    tight mixed context) at the real 480p self-attn Lq."""
    from omnivideo_tpu.ops import attention_xla
    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    for (B, Lq, Lk, N, D) in [
        (2, 1024, 26, 12, 128),
        (2, 32760, 26, 12, 128),
        (2, 32760, 512, 12, 128),
    ]:
        q = jnp.asarray(rng.standard_normal((B, Lq, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, Lk, N, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Lk, N, D)), jnp.bfloat16)
        out = flash_attention(q, k, v, None)
        ref = attention_xla(q, k, v, None)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"flash B{B} Lq{Lq} Lk{Lk} N{N} D{D}: max_err={err:.4f}", flush=True)
        assert err < 0.08
    print("OK", flush=True)


def _run_pipe(size, frames, steps):
    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = T2V_1_3B
    pipe = OmniVideoX2XUnified.random_init(cfg, with_vae=True, attn_impl="auto")
    ctx = jax.random.normal(jax.random.PRNGKey(1), (24, cfg.dit.text_dim), jnp.float32)
    t0 = time.perf_counter()
    video = pipe.generate(
        precomputed_context=ctx,
        precomputed_context_null=jnp.zeros_like(ctx),
        size=size, frame_num=frames, sampling_steps=steps,
        guide_scale=3.0, seed=7, decode=True,
    )
    print(f"pipe {size} f{frames} s{steps}: {time.perf_counter()-t0:.1f}s "
          f"finite={np.isfinite(video).all()}", flush=True)
    print("OK", flush=True)


def stage_pipe_tiny():
    _run_pipe((256, 192), 17, 2)


def stage_pipe_480p_2steps():
    _run_pipe((832, 480), 81, 2)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True)
    args = ap.parse_args()
    globals()[f"stage_{args.stage}"]()
