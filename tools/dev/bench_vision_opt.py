#!/usr/bin/env python
"""In-run A/B of vision-tower perf knobs (rope_dtype, attn_block_q).

Measures the FULL depth-`--depth` scanned tower (tpu_qwen_layer_bench's
canonical method — amortizes the ~25-28 ms per-dispatch tunnel floor) for
each knob combination back-to-back in ONE process, so variant ratios are
immune to day-to-day tunnel throughput drift. Also reports the bf16-rope
output delta vs the f32 parity mode (computed on device).

    python tools/dev/bench_vision_opt.py [--depth 48] [--reps 4]

Emits PHASE_JSON lines (merge with tools/dev/merge_phase_cache.py).
Reference envelope: the HF tower the reference runs inside
/root/reference/omnivideo/vllm_model.py:381-386.
"""
import argparse
import dataclasses
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
    ap.add_argument("--depth", type=int, default=48)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--only", default="",
                    help="comma-separated variant tags to run (default all)")
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from omnivideo_tpu.models.qwen3vl.vision_model import (
        Qwen3VLVisionConfig, vision_forward)

    if args.tiny:
        base = Qwen3VLVisionConfig(depth=2, deepstack_visual_indexes=(),
                                   hidden_size=64, intermediate_size=128,
                                   num_heads=4, out_hidden_size=64,
                                   attn_impl="flash_interpret")
        t, h, w = 2, 4, 4
        reps = 1
    else:
        base = Qwen3VLVisionConfig(depth=args.depth,
                                   deepstack_visual_indexes=())
        t, h, w = 8, 40, 40
        reps = args.reps
    Lv = t * h * w
    Din = base.in_channels * base.temporal_patch_size * base.patch_size ** 2
    Dv, Nv, Mv = base.hidden_size, base.num_heads, base.intermediate_size

    @jax.jit
    def init_vision(key):
        ks = jax.random.split(key, 12)
        r = lambda k, *s: (jax.random.normal(k, s, jnp.bfloat16)
                           * float(0.5 / np.sqrt(s[-2] if len(s) > 1 else 1)))
        dep = base.depth
        bc = lambda a: jnp.broadcast_to(a[None], (dep,) + a.shape)
        blk = {
            "norm1": {"weight": jnp.ones((dep, Dv), jnp.bfloat16),
                      "bias": jnp.zeros((dep, Dv), jnp.bfloat16)},
            "norm2": {"weight": jnp.ones((dep, Dv), jnp.bfloat16),
                      "bias": jnp.zeros((dep, Dv), jnp.bfloat16)},
            "qkv_w": bc(r(ks[0], Dv, 3 * Dv)),
            "qkv_b": jnp.zeros((dep, 3 * Dv), jnp.bfloat16),
            "proj_w": bc(r(ks[1], Dv, Dv)),
            "proj_b": jnp.zeros((dep, Dv), jnp.bfloat16),
            "mlp_fc1_w": bc(r(ks[2], Dv, Mv)),
            "mlp_fc1_b": jnp.zeros((dep, Mv), jnp.bfloat16),
            "mlp_fc2_w": bc(r(ks[3], Mv, Dv)),
            "mlp_fc2_b": jnp.zeros((dep, Dv), jnp.bfloat16),
        }
        oh = base.out_hidden_size
        mdim = Dv * base.spatial_merge_size ** 2
        merger = {
            "norm": {"weight": jnp.ones((Dv,), jnp.bfloat16),
                     "bias": jnp.zeros((Dv,), jnp.bfloat16)},
            "fc1_w": r(ks[4], mdim, mdim), "fc1_b": jnp.zeros((mdim,), jnp.bfloat16),
            "fc2_w": r(ks[5], mdim, oh), "fc2_b": jnp.zeros((oh,), jnp.bfloat16),
        }
        return {
            "patch_embed": {"kernel": r(ks[6], Din, Dv),
                            "bias": jnp.zeros((Dv,), jnp.bfloat16)},
            "pos_embed": r(ks[7], base.num_position_embeddings, Dv),
            "blocks": blk, "merger": merger, "deepstack": [],
        }

    vp = init_vision(jax.random.PRNGKey(4))
    patches = jax.random.normal(jax.random.PRNGKey(5), (Lv, Din), jnp.bfloat16)
    float(jnp.sum(patches.astype(jnp.float32)))
    print(f"[opt] tower depth={base.depth} resident", flush=True)

    peak = 197e12 if jax.default_backend() == "tpu" else 1e12
    hd = base.head_dim
    vfl = (2 * Lv * Dv * 3 * Dv + 2 * Lv * Dv * Dv + 2 * Lv * Dv * Mv * 2
           + 2 * 2 * Nv * t * (h * w) ** 2 * hd)

    out = {}
    kept = {}

    def measure(tag, cfg):
        @jax.jit
        def vis(vp, patches):
            tokens, _ = vision_forward(vp, cfg, patches, (t, h, w))
            return jnp.sum(tokens.astype(jnp.float32)), tokens

        tw = time.perf_counter()
        s, tok = vis(vp, patches)
        float(s)
        print(f"[opt] {tag}: compile {time.perf_counter() - tw:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            float(vis(vp, patches)[0])
        per_block = (time.perf_counter() - t0) / reps / cfg.depth
        out[f"visopt_{tag}_ms"] = round(per_block * 1e3, 3)
        out[f"visopt_{tag}_mxu"] = round(vfl / per_block / peak, 3)
        kept[tag] = tok
        emit(dict(out))
        return per_block

    variants = [
        ("base", base),
        ("rope_bf16", dataclasses.replace(base, rope_dtype="bfloat16")),
        ("bq512", dataclasses.replace(base, attn_block_q=512)),
        ("bq1600", dataclasses.replace(base, attn_block_q=1600)),
        ("rope_bf16_bq1600", dataclasses.replace(
            base, rope_dtype="bfloat16", attn_block_q=1600)),
    ]
    if args.only:
        sel = set(args.only.split(","))
        variants = [(t, c) for t, c in variants if t in sel]
    for tag, cfg in variants:
        try:
            measure(tag, cfg)
        except Exception as e:  # noqa: BLE001 — log and keep sweeping
            print(f"[opt] {tag} failed: {type(e)._name_ if 0 else type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    if "base" in kept and "rope_bf16" in kept:
        a = kept["base"].astype(jnp.float32)
        b = kept["rope_bf16"].astype(jnp.float32)
        rel = float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-30))
        out["visopt_rope_bf16_rel_delta"] = round(rel, 6)
        emit(dict(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
