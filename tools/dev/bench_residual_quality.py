#!/usr/bin/env python
"""bf16-residual end-to-end quality A/B (VERDICT r4 item 1a / weak-5).

The bandwidth win of storing the DiT residual stream at bf16 was measured in
round 4 (3.83 -> 3.76 s/step at 1.3B) but could not be defaulted without a
quality check. This runs the REAL artifact path twice — identical seed,
context, solver, 832x480 x 81f UniPC — once with the reference-parity f32
residual stream and once with residual_dtype=bf16, decodes both through the
same VAE, and reports:

  - residual_bf16_psnr_db / residual_bf16_ssim: divergence of the bf16-
    residual video from the f32-residual video (the repo's own oracle —
    VERDICT: "even vs the repo's own f32-residual output");
  - e2e_480p_flicker / e2e_480p_motion: per-artifact temporal metrics
    (utils/metrics.py), persisted so kernel/dtype changes get an automatic
    quality regression gate (VERDICT r4 item 9).

Acceptance bar (printed): PSNR >= 35 dB between the two full videos means
the dtype change is far below visible-artifact territory (uint8 quantization
alone is ~44 dB); the gate in chip queues asserts it.

Usage: python tools/dev/bench_residual_quality.py [--steps 10] [--frames 81]
Runs on the chip (or CPU with --tiny for CI plumbing checks).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (plumbing check)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.models.vae2_1 import init_vae, vae_decode
    from omnivideo_tpu.pipelines.x2x import (OmniVideoX2XUnified,
                                             video_to_uint8_frames)
    from omnivideo_tpu.utils.metrics import evaluate_single, psnr, ssim

    cfg = T2V_1_3B
    size, frames, msc = (832, 480), args.frames, 10
    if args.tiny:
        from omnivideo_tpu.configs.base import (PipelineConfig, VAEConfig,
                                                WanDiTConfig)
        cfg = PipelineConfig(
            name="tiny", dit=WanDiTConfig(
                patch_size=(1, 2, 2), in_dim=16, out_dim=16, dim=64,
                ffn_dim=128, freq_dim=32, text_dim=48, num_heads=4,
                num_layers=2),
            vae=VAEConfig(dim=8, z_dim=16), max_context_len=24)
        size, frames, msc = (64, 32), 9, None

    pipe = OmniVideoX2XUnified.random_init(cfg, with_vae=False,
                                           attn_impl="auto")
    # the reference zero-inits the output head (model.py:551-573), which
    # makes a random-weight DiT predict v=0 — both variants would then be
    # trivially identical. Give the head real weights so the residual
    # stream actually feeds the output.
    for ep in {id(pipe.low_noise): pipe.low_noise,
               id(pipe.high_noise): pipe.high_noise}.values():
        hk = ep.wan["head"]["head"]["kernel"]
        ep.wan["head"]["head"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(9), hk.shape, jnp.float32)
            * 0.05).astype(hk.dtype)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (24, cfg.dit.text_dim),
                            jnp.float32)
    kwargs = dict(
        precomputed_context=ctx,
        precomputed_context_null=jnp.zeros_like(ctx),
        size=size, frame_num=frames, sampling_steps=args.steps,
        guide_scale=3.0, seed=7, decode=False, max_steps_per_call=msc,
    )

    lat = {}
    for name, rdt in (("f32", None), ("bf16", jnp.bfloat16)):
        pipe.residual_dtype = rdt
        t0 = time.perf_counter()
        lat[name] = jnp.asarray(pipe.generate(**kwargs))
        print(f"# {name} residual denoise ({args.steps} steps): "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    del pipe

    vae_params = init_vae(jax.random.PRNGKey(3), cfg.vae)

    @jax.jit
    def dec(p, z):
        # params as ARGUMENTS: a closure inlines them as constants into the
        # program body (remote-compile HTTP 413 on the tunnel)
        if z.ndim == 4:
            z = z[None]
        vid = vae_decode(p, cfg.vae, z, dtype=jnp.float32)
        return video_to_uint8_frames(vid[0])

    lat_delta = float(jnp.max(jnp.abs(lat["f32"] - lat["bf16"])))
    lat_scale = float(jnp.max(jnp.abs(lat["f32"])))
    print(f"# latent max|f32-bf16| = {lat_delta:.3e} (scale {lat_scale:.3e})",
          file=sys.stderr, flush=True)
    frames_u8 = {k: np.asarray(dec(vae_params, v)) for k, v in lat.items()}
    a, b = frames_u8["f32"].astype(np.float64), frames_u8["bf16"].astype(np.float64)
    q = evaluate_single(frames_u8["f32"])
    out = {
        # cap: identical-after-uint8 videos give inf PSNR (invalid JSON)
        "residual_bf16_psnr_db": round(min(psnr(a, b), 99.0), 2),
        "residual_bf16_latent_rel_delta": round(
            lat_delta / max(lat_scale, 1e-9), 6),
        "residual_bf16_ssim": round(ssim(a, b), 4),
        "e2e_480p_flicker": round(float(q["temporal_consistency"]), 4),
        "e2e_480p_motion": round(float(q["motion_magnitude"]), 4),
    }
    ok = out["residual_bf16_psnr_db"] >= 35.0
    out["residual_bf16_default_ok"] = bool(ok)
    print("PHASE_JSON:" + json.dumps(out), flush=True)
    print(json.dumps(out, indent=1))
    if not ok:
        print("!! bf16 residual diverges visibly — do NOT default it",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
