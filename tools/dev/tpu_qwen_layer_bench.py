#!/usr/bin/env python
"""Measure ONE real-dims Qwen3-VL-30B-A3B layer on the chip (VERDICT r3
item 6: turn the 30B story from "compiles on a virtual mesh" into "the hot
layer is measured").

- text layer: hidden 2048, 32 q / 4 kv heads, 128-expert top-8 MoE with
  moe_intermediate 768 (the exact serving config the reference forwards
  through vLLM, vllm_model.py:381-386) at a prefill shape (B=1, L=4096 —
  video-VQA scale) and a cached single-token decode step;
- vision block: hidden 1152, 16 heads, ffn 4304 at a 16-frame 640x640
  video grid (t=8 temporal groups after temporal_patch_size=2).

Params are initialized ON DEVICE inside jit (no multi-hundred-MB host
literals through the remote-compile tunnel — tpu_moe_check's --full hit
HTTP 413 exactly that way). ~1.2 GB of expert weights fit HBM easily.

    python tools/dev/tpu_qwen_layer_bench.py [--reps 8]

Emits PHASE_JSON lines (mergeable via tools/dev/merge_phase_cache.py).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def emit(d):
    print("PHASE_JSON:" + json.dumps(d), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--moe_impl", default="ragged",
                    choices=["ragged", "megablox", "dense"],
                    help="grouped-GEMM backend A/B (text_model._moe)")
    ap.add_argument("--attn_impl", default="auto",
                    choices=["auto", "flash", "flash_interpret", "dense"])
    ap.add_argument("--key_suffix", default="",
                    help="suffix for PHASE_JSON keys (A/B runs that must "
                         "not overwrite the tuned-default keys)")
    ap.add_argument("--vision_only", action="store_true",
                    help="skip the text-layer phases (vision re-measures)")
    ap.add_argument("--vis_depth", type=int, default=48,
                    help="blocks in the scanned vision tower (48 = the real "
                         "tower; amortizes the per-dispatch tunnel floor)")
    ap.add_argument("--vis_reps", type=int, default=2)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: tiny dims, forces the cpu platform")
    args = ap.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from omnivideo_tpu.models.qwen3vl.text_model import (
        Qwen3TextConfig, _layer)
    from omnivideo_tpu.models.qwen3vl.vision_model import (
        Qwen3VLVisionConfig, vision_forward)

    if args.tiny:
        cfg = Qwen3TextConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
            moe_impl=args.moe_impl, attn_impl=args.attn_impl,
        )
        args.seq = min(args.seq, 64)
    else:
        cfg = Qwen3TextConfig(
            hidden_size=2048, intermediate_size=6144, num_hidden_layers=48,
            num_attention_heads=32, num_key_value_heads=4, head_dim=128,
            num_experts=128, num_experts_per_tok=8, moe_intermediate_size=768,
            moe_impl=args.moe_impl, attn_impl=args.attn_impl,
        )
    D, N, K, hd = (cfg.hidden_size, cfg.num_attention_heads,
                   cfg.num_key_value_heads, cfg.head_dim)
    E, M = cfg.num_experts, cfg.moe_intermediate_size
    L = args.seq
    peak = 197e12

    @jax.jit
    def init_layer(key):
        ks = jax.random.split(key, 8)
        r = lambda k, *s: (jax.random.normal(k, s, jnp.bfloat16)
                           * float(0.5 / np.sqrt(s[-2] if len(s) > 1 else 1)))
        return {
            "ln1": jnp.ones((D,), jnp.bfloat16),
            "ln2": jnp.ones((D,), jnp.bfloat16),
            "attn": {
                "q": r(ks[0], D, N * hd), "k": r(ks[1], D, K * hd),
                "v": r(ks[2], D, K * hd), "o": r(ks[3], N * hd, D),
                "q_norm": jnp.ones((hd,), jnp.bfloat16),
                "k_norm": jnp.ones((hd,), jnp.bfloat16),
            },
            "mlp": {
                "gate": r(ks[4], D, E),
                "experts": {"gate": r(ks[5], E, D, M), "up": r(ks[6], E, D, M),
                            "down": r(ks[7], E, M, D)},
            },
        }

    out = {}
    sfx = args.key_suffix
    if args.vision_only:
        lp = x = kc = vc = None
    else:
        lp = init_layer(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, L, D), jnp.bfloat16)
    if not args.vision_only:
        pos = jnp.arange(L)[None]
        float(jnp.sum(x.astype(jnp.float32)))  # force init/inputs

        reps = args.reps

        @jax.jit
        def prefill_reps(lp, x):
            def body(c, _):
                # mask_bias=None → pure causal: the flash path (attn_impl auto)
                # — no [1, 32, L, L] f32 logits (2.1 GB at L=4096)
                y, _kv = _layer(lp, c, pos, cfg, None)
                return y, None
            y, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        t0 = time.perf_counter()
        float(prefill_reps(lp, x))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(prefill_reps(lp, x))
        t_layer = (time.perf_counter() - t0) / reps

        # flops: qkvo projections + causal attention (USEFUL work = the lower
        # triangle, L·L/2 — the flash kernel skips above-diagonal blocks; the
        # old dense form computed the full matrix and wasted half) + router +
        # top-8 MoE
        attn_proj = 2 * L * D * (N * hd) * 2 + 2 * L * D * (K * hd) * 2
        attn = 2 * 2 * N * (L * L // 2) * hd
        moe = L * cfg.num_experts_per_tok * (2 * D * M * 2 + 2 * M * D)
        router = 2 * L * D * E
        fl = attn_proj + attn + moe + router
        sfx = args.key_suffix
        out = {
            f"qwen30b_text_layer_prefill4k_ms{sfx}": round(t_layer * 1e3, 2),
            f"qwen30b_text_layer_mxu{sfx}": round(fl / t_layer / peak, 3),
            f"qwen30b_text_layer_compile_s{sfx}": round(compile_s, 1),
            f"qwen30b_step_prefill4k_derived_s{sfx}": round(
                t_layer * cfg.num_hidden_layers, 3),
        }
        emit(dict(out))

        # cached decode: one token against a 4096-token KV cache (the serving
        # decode inner loop at real dims)
        kc = jax.random.normal(jax.random.PRNGKey(2), (1, L + 1, K, hd),
                               jnp.bfloat16)
        vc = jax.random.normal(jax.random.PRNGKey(3), (1, L + 1, K, hd),
                               jnp.bfloat16)
        x1 = x[:, :1]
        pos1 = jnp.full((1, 1), L, jnp.int32)
        bias1 = jnp.zeros((1, 1, 1, L + 1), jnp.float32)

        @jax.jit
        def decode_reps(lp, x1, kc, vc):
            def body(c, _):
                y, _kv = _layer(lp, c, pos1, cfg, bias1, cache_kv=(kc, vc))
                return y, None
            y, _ = jax.lax.scan(body, x1, None, length=64)
            return jnp.sum(y.astype(jnp.float32))

        float(decode_reps(lp, x1, kc, vc))
        t0 = time.perf_counter()
        float(decode_reps(lp, x1, kc, vc))
        t_dec = (time.perf_counter() - t0) / 64
        out[f"qwen30b_text_layer_decode_us{sfx}"] = round(t_dec * 1e6, 1)
        out[f"qwen30b_decode_tok_s_derived{sfx}"] = round(
            1.0 / (t_dec * cfg.num_hidden_layers), 1)
        emit(dict(out))
        del lp, x, kc, vc

    # ---- vision block: 16-frame 640x640 video -> grid (8, 40, 40) ----
    # (segmented attention materializes [t, N, hw, hw] f32 logits; 64x64
    # grids would need 12.9 GB — this shape is the realistic smart-resize
    # video-VQA scale and fits comfortably)
    if args.tiny:
        vcfg = Qwen3VLVisionConfig(
            depth=4, deepstack_visual_indexes=(), hidden_size=64,
            intermediate_size=128, num_heads=4, out_hidden_size=64)
        t, h, w = 2, 4, 4
    else:
        # scanned depth (default 48 = the real tower, same block broadcast):
        # ONE dispatch amortizes the tunnel's ~25-28 ms host-sync floor — the
        # r4 single-block measurement was floor-dominated (bench_vision_ab.py:
        # GEMMs-only measured 27.6 ms vs ~2.4 ms of real work), which is what
        # made the tower look like 7.6% MXU
        # rope_dtype bfloat16 = the serving default (VLMConfig.
        # vision_rope_dtype); f32 stays the HF-parity mode
        vcfg = Qwen3VLVisionConfig(depth=args.vis_depth,
                                   deepstack_visual_indexes=(),
                                   attn_impl=args.attn_impl,
                                   rope_dtype="bfloat16")
        t, h, w = 8, 40, 40
    Lv = t * h * w
    Din = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    Dv, Nv, Mv = vcfg.hidden_size, vcfg.num_heads, vcfg.intermediate_size

    @jax.jit
    def init_vision(key):
        ks = jax.random.split(key, 12)
        r = lambda k, *s: (jax.random.normal(k, s, jnp.bfloat16)
                           * float(0.5 / np.sqrt(s[-2] if len(s) > 1 else 1)))
        dep = vcfg.depth
        bc = lambda a: jnp.broadcast_to(a[None], (dep,) + a.shape)
        blk = {
            "norm1": {"weight": jnp.ones((dep, Dv), jnp.bfloat16),
                      "bias": jnp.zeros((dep, Dv), jnp.bfloat16)},
            "norm2": {"weight": jnp.ones((dep, Dv), jnp.bfloat16),
                      "bias": jnp.zeros((dep, Dv), jnp.bfloat16)},
            "qkv_w": bc(r(ks[0], Dv, 3 * Dv)), "qkv_b": jnp.zeros((dep, 3 * Dv), jnp.bfloat16),
            "proj_w": bc(r(ks[1], Dv, Dv)), "proj_b": jnp.zeros((dep, Dv), jnp.bfloat16),
            "mlp_fc1_w": bc(r(ks[2], Dv, Mv)), "mlp_fc1_b": jnp.zeros((dep, Mv), jnp.bfloat16),
            "mlp_fc2_w": bc(r(ks[3], Mv, Dv)), "mlp_fc2_b": jnp.zeros((dep, Dv), jnp.bfloat16),
        }
        oh = vcfg.out_hidden_size
        mdim = Dv * vcfg.spatial_merge_size ** 2
        merger = {
            "norm": {"weight": jnp.ones((Dv,), jnp.bfloat16),
                     "bias": jnp.zeros((Dv,), jnp.bfloat16)},
            "fc1_w": r(ks[4], mdim, mdim), "fc1_b": jnp.zeros((mdim,), jnp.bfloat16),
            "fc2_w": r(ks[5], mdim, oh), "fc2_b": jnp.zeros((oh,), jnp.bfloat16),
        }
        return {
            "patch_embed": {"kernel": r(ks[6], Din, Dv),
                            "bias": jnp.zeros((Dv,), jnp.bfloat16)},
            "pos_embed": r(ks[7], vcfg.num_position_embeddings, Dv),
            "blocks": blk, "merger": merger, "deepstack": [],
        }

    print(f"[vis] init depth={vcfg.depth} grid=({t},{h},{w})", flush=True)
    vp = init_vision(jax.random.PRNGKey(4))
    patches = jax.random.normal(jax.random.PRNGKey(5), (Lv, Din), jnp.bfloat16)
    float(jnp.sum(patches.astype(jnp.float32)))
    print("[vis] params + inputs resident", flush=True)

    @jax.jit
    def vis(vp, patches):
        tokens, _ = vision_forward(vp, vcfg, patches, (t, h, w))
        return jnp.sum(tokens.astype(jnp.float32))

    tw = time.perf_counter()
    float(vis(vp, patches))
    print(f"[vis] warmup (compile) done in {time.perf_counter() - tw:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    n = args.vis_reps
    for _ in range(n):
        float(vis(vp, patches))
    # per-BLOCK time: the depth-stacked scan amortizes the ~25-28 ms
    # per-dispatch tunnel floor; patch-embed/pos/merger are shared tower
    # overhead outside the block scan and small next to depth x block
    t_vis = (time.perf_counter() - t0) / n / vcfg.depth
    # per-block flops: qkv+proj+mlp GEMMs + segmented attention (t groups of
    # h*w tokens)
    vfl = (2 * Lv * Dv * 3 * Dv + 2 * Lv * Dv * Dv + 2 * Lv * Dv * Mv * 2
           + 2 * 2 * Nv * t * (h * w) ** 2 * vcfg.head_dim)
    out[f"qwen30b_vision_block_ms{sfx}"] = round(t_vis * 1e3, 2)
    out[f"qwen30b_vision_block_mxu{sfx}"] = round(vfl / t_vis / peak, 3)
    emit(dict(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
