#!/usr/bin/env python
"""Component-level A/B of the Qwen3-VL vision block on chip.

Round-5 finding: EVERY single-dispatch measurement on this tunnel carries a
~25-28 ms host-sync floor (the r4 "41 ms vision block" was that floor — the
depth-48 scanned tower measures 11.6 ms/block). This tool therefore scans
each candidate sink `reps` times INSIDE one jit (output feeds input, so the
scan cannot be constant-folded) and reports per-iteration time, at the real
640p video shape (grid (8, 40, 40), D=1152, 16 heads x 72):

  - the three GEMM chains only (qkv/proj/mlp, no attention)
  - rope + reshapes only
  - attention-only (padded-128 flash vs dense softmax vs unpadded flash)
  - full block (flash vs dense) via the depth-`reps` scanned tower

    python tools/dev/bench_vision_ab.py [--reps 16]

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
    ap.add_argument("--reps", type=int, default=16,
                    help="scan length per timed dispatch (floor amortizer)")
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

    def timed_scan(step, carry_init, consts, n_dispatch=2):
        """Time `step` scanned `reps` times in ONE dispatch (carry feeds the
        next iteration → no folding); return seconds per iteration."""

        @jax.jit
        def run(carry, consts):
            def body(c, _):
                return step(c, consts), None
            c, _ = jax.lax.scan(body, carry, None, length=reps)
            return jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda v: jnp.sum(v.astype(jnp.float32)), c))

        float(run(carry_init, consts))  # compile
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            float(run(carry_init, consts))
        return (time.perf_counter() - t0) / n_dispatch / reps

    out = {}

    # --- GEMMs only (y feeds back as x) ---
    def gemms_step(xc, wq):
        qkv = xc @ wq["qkv_w"]
        o = qkv[:, :Dv] @ wq["proj_w"]
        return jax.nn.gelu(o @ wq["fc1_w"]) @ wq["fc2_w"]

    out["vis_gemms_ms"] = round(timed_scan(gemms_step, x, wq) * 1e3, 2)

    # --- rope + qkv reshapes only ---
    def rope_step(xc, wq):
        qkv = (xc @ wq["qkv_w"]).reshape(L, 3, Nv, hd)
        q, k = qkv[:, 0], qkv[:, 1]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos + _rotate_half(qf) * sin).astype(xc.dtype)
        k = (kf * cos + _rotate_half(kf) * sin).astype(xc.dtype)
        return (q + k).reshape(L, Nv * hd)[:, :Dv]

    out["vis_rope_qkv_ms"] = round(timed_scan(rope_step, x, wq) * 1e3, 2)

    # --- packed-form rope (what vision_forward now runs): [L, N·hd] dense
    # lanes + block-diag signed-perm matmul instead of per-head broadcasts ---
    from omnivideo_tpu.models.qwen3vl.vision_model import _rotate_half_perm

    cos_p = jnp.tile(jnp.asarray(cos[:, 0, :]), (1, Nv))
    sin_p = jnp.tile(jnp.asarray(sin[:, 0, :]), (1, Nv))
    P_rot = jnp.asarray(
        np.kron(np.eye(Nv, dtype=np.float32), _rotate_half_perm(hd)),
        jnp.bfloat16)

    def rope_packed_step(xc, wq):
        qkv = xc @ wq["qkv_w"]
        q2, k2 = qkv[:, : Nv * hd], qkv[:, Nv * hd : 2 * Nv * hd]
        qz = jnp.dot(q2, P_rot, preferred_element_type=jnp.float32)
        kz = jnp.dot(k2, P_rot, preferred_element_type=jnp.float32)
        q = (q2.astype(jnp.float32) * cos_p + qz * sin_p).astype(xc.dtype)
        k = (k2.astype(jnp.float32) * cos_p + kz * sin_p).astype(xc.dtype)
        return (q + k)[:, :Dv]

    out["vis_rope_packed_ms"] = round(
        timed_scan(rope_packed_step, x, wq) * 1e3, 2)
    emit(dict(out))

    # --- attention-only variants (o feeds back as q) ---
    qs = jax.random.normal(ks[5], (t, hw, Nv, hd), jnp.bfloat16)
    ks_ = jax.random.normal(ks[6], (t, hw, Nv, hd), jnp.bfloat16)
    vs = jax.random.normal(ks[7], (t, hw, Nv, hd), jnp.bfloat16)
    float(jnp.sum(vs.astype(jnp.float32)))

    pd = (-hd) % 128

    def attn_pad128(qc, kv, bq=1024, bounded=False):
        k_, v_ = kv
        zp = ((0, 0), (0, 0), (0, 0), (0, pd))
        return flash_attention_infer(
            jnp.pad(qc, zp), jnp.pad(k_, zp), jnp.pad(v_, zp),
            softmax_scale=hd ** -0.5, interpret=interp, block_q=bq,
            assume_normalized=bounded,
        )[..., :hd].astype(qc.dtype)

    def attn_unpadded(qc, kv, bq=1024, bounded=False):
        k_, v_ = kv
        return flash_attention_infer(
            qc, k_, v_, interpret=interp, block_q=bq,
            assume_normalized=bounded).astype(qc.dtype)

    def attn_dense(qc, kv):
        k_, v_ = kv
        logits = jnp.einsum("bind,bjnd->bnij", qc, k_,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (hd ** -0.5), -1).astype(v_.dtype)
        return jnp.einsum("bnij,bjnd->bind", probs, v_,
                          preferred_element_type=jnp.float32).astype(qc.dtype)

    # variant sweep: impl x block_q x {max-tracked, bounded-softmax}. The
    # bounded kernel needs no qk-norm: it computes Cauchy-Schwarz row-norm
    # bounds itself and lax.cond-falls back to max-tracked when unsafe.
    variants = {
        "vis_attn_pad128_ms": lambda q, kv: attn_pad128(q, kv),
        "vis_attn_unpadded_ms": lambda q, kv: attn_unpadded(q, kv),
        "vis_attn_dense_ms": attn_dense,
        "vis_attn_pad128_bnd_ms": lambda q, kv: attn_pad128(q, kv, bounded=True),
        "vis_attn_unpadded_bnd_ms": lambda q, kv: attn_unpadded(q, kv, bounded=True),
        "vis_attn_pad128_b512_ms": lambda q, kv: attn_pad128(q, kv, bq=512),
        "vis_attn_pad128_b1664_ms": lambda q, kv: attn_pad128(q, kv, bq=1664),
        "vis_attn_unpadded_b512_ms": lambda q, kv: attn_unpadded(q, kv, bq=512),
        "vis_attn_unpadded_b1664_ms": lambda q, kv: attn_unpadded(q, kv, bq=1664),
        "vis_attn_pad128_b512_bnd_ms": lambda q, kv: attn_pad128(
            q, kv, bq=512, bounded=True),
        "vis_attn_unpadded_b1664_bnd_ms": lambda q, kv: attn_unpadded(
            q, kv, bq=1664, bounded=True),
    }
    if args.tiny:  # CPU interpret: just exercise one of each dispatch
        variants = {k: variants[k] for k in
                    ("vis_attn_pad128_ms", "vis_attn_unpadded_ms",
                     "vis_attn_dense_ms", "vis_attn_unpadded_bnd_ms")}
    for name, fn in variants.items():
        try:
            out[name] = round(timed_scan(fn, qs, (ks_, vs)) * 1e3, 2)
        except Exception as e:  # noqa: BLE001 — a VMEM-overflow variant just logs
            print(f"[ab] {name} failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        emit(dict(out))

    # --- full block via the depth-`reps` scanned tower (flash vs dense) ---
    from omnivideo_tpu.models.qwen3vl.vision_model import vision_forward

    Din = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    oh = cfg.out_hidden_size
    mdim = Dv * cfg.spatial_merge_size ** 2
    dep = reps
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
    float(jnp.sum(patches.astype(jnp.float32)))

    for impl in ("flash" if not interp else "flash_interpret", "dense"):
        c2 = dataclasses.replace(cfg, attn_impl=impl, depth=dep)

        @jax.jit
        def vis(vp, patches):
            tok, _ = vision_forward(vp, c2, patches, (t, h, w))
            return jnp.sum(tok.astype(jnp.float32))

        float(vis(vp, patches))  # compile
        t0 = time.perf_counter()
        n = 2
        for _ in range(n):
            float(vis(vp, patches))
        out[f"vis_block_{impl.split('_')[0]}_ms"] = round(
            (time.perf_counter() - t0) / n / dep * 1e3, 2)
    emit(dict(out))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
