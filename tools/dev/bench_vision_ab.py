#!/usr/bin/env python
"""Component-level A/B of the Qwen3-VL vision block on chip.

Round-5 finding: the pad-to-128 flash path measured WORSE than the r4
baseline (41.06 vs 32.45 ms) — so the block's time is NOT where the r4
analysis assumed. This tool times each candidate sink separately at the
real 640p video shape (grid (8, 40, 40), D=1152, 16 heads x 72):

  - full block, attn_impl in {flash (pad-128), dense}
  - attention-only (padded flash vs dense softmax vs unpadded flash)
  - the three GEMMs only (qkv/proj/mlp, no attention)
  - rope + reshapes only

    python tools/dev/bench_vision_ab.py [--reps 8]

Emits PHASE_JSON (merge with tools/dev/merge_phase_cache.py).
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
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from omnivideo_tpu.models.qwen3vl.vision_model import (
        Qwen3VLVisionConfig, _rotate_half, _rope_table)
    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention_infer

    if args.tiny:
        cfg = Qwen3VLVisionConfig(depth=1, deepstack_visual_indexes=(),
                                  hidden_size=64, intermediate_size=128,
                                  num_heads=4, out_hidden_size=64)
        t, h, w = 2, 4, 4
        reps = 2
    else:
        cfg = Qwen3VLVisionConfig(depth=1, deepstack_visual_indexes=())
        t, h, w = 8, 40, 40
        reps = args.reps
    Dv, Nv, Mv = cfg.hidden_size, cfg.num_heads, cfg.intermediate_size
    hd = cfg.head_dim
    L = t * h * w
    hw = L // t
    interp = jax.default_backend() != "tpu"

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    r = lambda k, *s: (jax.random.normal(k, s, jnp.bfloat16)
                       * float(0.5 / np.sqrt(s[-2] if len(s) > 1 else 1)))
    wq = {"qkv_w": r(ks[0], Dv, 3 * Dv), "proj_w": r(ks[1], Dv, Dv),
          "fc1_w": r(ks[2], Dv, Mv), "fc2_w": r(ks[3], Mv, Dv)}
    x = jax.random.normal(ks[4], (L, Dv), jnp.bfloat16)
    cos, sin = _rope_table(t, h, w, hd, cfg.spatial_merge_size)
    cos = jnp.asarray(cos)[:, None, :]
    sin = jnp.asarray(sin)[:, None, :]
    float(jnp.sum(x.astype(jnp.float32)))

    def timed(fn, *a):
        float(fn(*a))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(*a))
        return (time.perf_counter() - t0) / reps

    out = {}

    # --- GEMMs only ---
    @jax.jit
    def gemms(wq, x):
        qkv = x @ wq["qkv_w"]
        o = qkv[:, :Dv] @ wq["proj_w"]
        y = jax.nn.gelu(o @ wq["fc1_w"]) @ wq["fc2_w"]
        return jnp.sum(y.astype(jnp.float32))

    out["vis_gemms_ms"] = round(timed(gemms, wq, x) * 1e3, 2)

    # --- rope + reshapes only ---
    @jax.jit
    def rope_only(wq, x):
        qkv = (x @ wq["qkv_w"]).reshape(L, 3, Nv, hd)
        q, k = qkv[:, 0], qkv[:, 1]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos + _rotate_half(qf) * sin).astype(x.dtype)
        k = (kf * cos + _rotate_half(kf) * sin).astype(x.dtype)
        return jnp.sum(q.astype(jnp.float32)) + jnp.sum(k.astype(jnp.float32))

    out["vis_rope_qkv_ms"] = round(timed(rope_only, wq, x) * 1e3, 2)

    # --- attention-only variants ---
    qs = jax.random.normal(ks[5], (t, hw, Nv, hd), jnp.bfloat16)
    ks_ = jax.random.normal(ks[6], (t, hw, Nv, hd), jnp.bfloat16)
    vs = jax.random.normal(ks[7], (t, hw, Nv, hd), jnp.bfloat16)

    pd = (-hd) % 128

    @jax.jit
    def attn_pad128(qs, ks_, vs):
        zp = ((0, 0), (0, 0), (0, 0), (0, pd))
        o = flash_attention_infer(jnp.pad(qs, zp), jnp.pad(ks_, zp),
                                  jnp.pad(vs, zp), softmax_scale=hd ** -0.5,
                                  interpret=interp)[..., :hd]
        return jnp.sum(o.astype(jnp.float32))

    @jax.jit
    def attn_unpadded(qs, ks_, vs):
        o = flash_attention_infer(qs, ks_, vs, interpret=interp)
        return jnp.sum(o.astype(jnp.float32))

    @jax.jit
    def attn_dense(qs, ks_, vs):
        logits = jnp.einsum("bind,bjnd->bnij", qs, ks_,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (hd ** -0.5), -1).astype(vs.dtype)
        o = jnp.einsum("bnij,bjnd->bind", probs, vs,
                       preferred_element_type=jnp.float32)
        return jnp.sum(o)

    out["vis_attn_pad128_ms"] = round(timed(attn_pad128, qs, ks_, vs) * 1e3, 2)
    out["vis_attn_unpadded_ms"] = round(timed(attn_unpadded, qs, ks_, vs) * 1e3, 2)
    out["vis_attn_dense_ms"] = round(timed(attn_dense, qs, ks_, vs) * 1e3, 2)
    emit(dict(out))

    # --- full block via vision_forward (flash vs dense) ---
    from omnivideo_tpu.models.qwen3vl.vision_model import vision_forward

    Din = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    oh = cfg.out_hidden_size
    mdim = Dv * cfg.spatial_merge_size ** 2
    blk = {
        "norm1": {"weight": jnp.ones((1, Dv), jnp.bfloat16),
                  "bias": jnp.zeros((1, Dv), jnp.bfloat16)},
        "norm2": {"weight": jnp.ones((1, Dv), jnp.bfloat16),
                  "bias": jnp.zeros((1, Dv), jnp.bfloat16)},
        "qkv_w": r(ks[0], 1, Dv, 3 * Dv),
        "qkv_b": jnp.zeros((1, 3 * Dv), jnp.bfloat16),
        "proj_w": r(ks[1], 1, Dv, Dv),
        "proj_b": jnp.zeros((1, Dv), jnp.bfloat16),
        "mlp_fc1_w": r(ks[2], 1, Dv, Mv),
        "mlp_fc1_b": jnp.zeros((1, Mv), jnp.bfloat16),
        "mlp_fc2_w": r(ks[3], 1, Mv, Dv),
        "mlp_fc2_b": jnp.zeros((1, Dv), jnp.bfloat16),
    }
    vp = {
        "patch_embed": {"kernel": r(ks[4], Din, Dv),
                        "bias": jnp.zeros((Dv,), jnp.bfloat16)},
        "pos_embed": r(ks[5], cfg.num_position_embeddings, Dv),
        "blocks": blk,
        "merger": {
            "norm": {"weight": jnp.ones((Dv,), jnp.bfloat16),
                     "bias": jnp.zeros((Dv,), jnp.bfloat16)},
            "fc1_w": r(ks[6], mdim, mdim),
            "fc1_b": jnp.zeros((mdim,), jnp.bfloat16),
            "fc2_w": r(ks[7], mdim, oh), "fc2_b": jnp.zeros((oh,), jnp.bfloat16),
        },
        "deepstack": [],
    }
    patches = jax.random.normal(jax.random.PRNGKey(9), (L, Din), jnp.bfloat16)

    for impl in ("flash" if not interp else "flash_interpret", "dense"):
        c2 = dataclasses.replace(cfg, attn_impl=impl)

        @jax.jit
        def vis(vp, patches):
            tok, _ = vision_forward(vp, c2, patches, (t, h, w))
            return jnp.sum(tok.astype(jnp.float32))

        out[f"vis_block_{impl.split('_')[0]}_ms"] = round(
            timed(vis, vp, patches) * 1e3, 2)
    # merger + patch_embed + pos interp alone: block minus (gemms+attn+rope)
    emit(dict(out))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
