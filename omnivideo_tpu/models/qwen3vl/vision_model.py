"""Qwen3-VL vision tower in JAX.

TPU-native port of the ViT that encodes video frames into LLM-space tokens
for the reference's VLM conditioning stage (HF Qwen3VLVisionModel):

- patch embed: stride==kernel Conv3d over (t-patch, p, p) pixel patches → one
  MXU GEMM (the processor already delivers flattened patches);
- learned absolute position embeddings bilinearly interpolated from a
  num_grid_per_side² table to the actual (h, w) grid — interpolation indices/
  weights are host-precomputed per grid (static shapes);
- 2-D rotary embeddings over full-resolution (row, col) positions in
  spatial-merge-block order;
- pre-LN blocks (packed-QKV attention + GELU-tanh MLP);
- spatial 2×2 patch merger MLP to the LLM width, plus "deepstack" mergers
  tapping intermediate layers (fed into the early LLM layers).

Single-segment inputs (one image/video per call — the x2x pipeline conditions
on one clip), so the reference's cu_seqlens varlen batching reduces to plain
full attention.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Qwen3VLVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    depth: int = 27
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 2048
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: Tuple[int, ...] = (8, 16, 24)
    hidden_act: str = "gelu_pytorch_tanh"
    # segmented attention: "auto" (flash kernel on TPU — never materializes
    # the [t, N, hw, hw] f32 logits), "flash", "flash_interpret", "dense"
    attn_impl: str = "auto"
    # rope mix precision: "float32" (parity mode — HF computes rope in f32,
    # reference vllm_model.py:381-386 runs the HF tower) or "bfloat16"
    # (tables + multiply-add in bf16: halves the [L, N·hd] cos/sin HBM
    # traffic; rel. output delta measured ~2e-3 — see bench_vision_opt.py)
    rope_dtype: str = "float32"
    # flash block_q override for the segmented attention (0 = kernel default)
    attn_block_q: int = 0

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def num_grid_per_side(self):
        return int(self.num_position_embeddings**0.5)


def _lin(p, name, x):
    """Bare-kernel matmul with optional LoRA sibling keys (training/
    lora.py::inject_lora_bare — the reference's lora_vt target)."""
    y = x @ p[name]
    a = p.get(name + "_lora_a")
    if a is not None:
        y = y + (((x @ a) @ p[name + "_lora_b"])
                 * p[name + "_lora_scale"]).astype(y.dtype)
    return y


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["weight"] + p["bias"]).astype(x.dtype)


def _act(x, kind):
    if kind in ("gelu_pytorch_tanh",):
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


@functools.lru_cache(maxsize=16)
def _pos_interp_plan(h: int, w: int, grid_side: int):
    """Bilinear interpolation (indices, weights) from the learned pos table
    (HF fast_pos_embed_interpolate), host-side per static grid."""
    h_idx = np.linspace(0, grid_side - 1, h)
    w_idx = np.linspace(0, grid_side - 1, w)
    hf_, wf_ = h_idx.astype(np.int32), w_idx.astype(np.int32)
    hc = np.clip(hf_ + 1, None, grid_side - 1)
    wc = np.clip(wf_ + 1, None, grid_side - 1)
    dh, dw = h_idx - hf_, w_idx - wf_
    idx = np.stack([
        (hf_[:, None] * grid_side + wf_[None]).ravel(),
        (hf_[:, None] * grid_side + wc[None]).ravel(),
        (hc[:, None] * grid_side + wf_[None]).ravel(),
        (hc[:, None] * grid_side + wc[None]).ravel(),
    ])
    wgt = np.stack([
        ((1 - dh)[:, None] * (1 - dw)[None]).ravel(),
        ((1 - dh)[:, None] * dw[None]).ravel(),
        (dh[:, None] * (1 - dw)[None]).ravel(),
        (dh[:, None] * dw[None]).ravel(),
    ])
    return idx.astype(np.int32), wgt.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _rope_table(t: int, h: int, w: int, head_dim: int, merge: int, theta: float = 10000.0):
    """cos/sin [L, head_dim] over (row, col) positions in merge-block order."""
    dim = head_dim // 2  # rotary dim split between row and col
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    mh, mw = h // merge, w // merge
    rows = (
        (np.arange(mh)[:, None, None, None] * merge + np.arange(merge)[None, None, :, None])
        * np.ones((mh, mw, merge, merge), np.int64)
    ).reshape(-1)
    cols = (
        (np.arange(mw)[None, :, None, None] * merge + np.arange(merge)[None, None, None, :])
        * np.ones((mh, mw, merge, merge), np.int64)
    ).reshape(-1)
    freqs = np.concatenate(
        [rows[:, None] * inv[None], cols[:, None] * inv[None]], axis=1
    )  # [h*w, dim]
    freqs = np.tile(freqs, (t, 1))
    emb = np.concatenate([freqs, freqs], axis=1)  # [L, head_dim]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


@functools.lru_cache(maxsize=8)
def _rotate_half_perm(hd: int) -> np.ndarray:
    """[hd, hd] signed permutation with x @ P == rotate_half(x)."""
    P = np.zeros((hd, hd), np.float32)
    j = np.arange(hd // 2)
    P[j + hd // 2, j] = -1.0  # out[:hd/2] = -x[hd/2:]
    P[j, j + hd // 2] = 1.0   # out[hd/2:] =  x[:hd/2]
    return P


def _merge_order_pos_embed(pe, t, h, w, merge):
    """Tile pos embeds over frames and permute to merge-block order
    (HF fast_pos_embed_interpolate tail)."""
    D = pe.shape[-1]
    pe = jnp.tile(pe, (t, 1))
    pe = pe.reshape(t, h // merge, merge, w // merge, merge, D)
    pe = pe.transpose(0, 1, 3, 2, 4, 5)
    return pe.reshape(-1, D)


def vision_forward(params, cfg: Qwen3VLVisionConfig, patches: jnp.ndarray, grid_thw: Tuple[int, int, int]):
    """Encode one image/video.

    patches: [L, C·tp·p·p] flattened pixel patches in processor order
    (L = t·h·w); grid_thw: static (t, h, w) patch grid.
    Returns (tokens [L/merge², out_hidden], deepstack list of same shape).
    """
    from .text_model import _flash_mode

    t, h, w = grid_thw
    m = cfg.spatial_merge_size
    use_flash, interp = _flash_mode(cfg.attn_impl)
    x = patches @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]

    idx, wgt = _pos_interp_plan(h, w, cfg.num_grid_per_side)
    pe = jnp.einsum(
        "kl,kld->ld", jnp.asarray(wgt), params["pos_embed"][jnp.asarray(idx)]
    )
    x = x + _merge_order_pos_embed(pe, t, h, w, m)

    N, hd = cfg.num_heads, cfg.head_dim
    L = x.shape[0]

    # Packed-form RoPE: identical math applied to the [L, N·hd] qkv slices —
    # dense 128-lane tiles instead of per-head [L, N, 72] broadcasts (72 lanes
    # pad to 128 on TPU, and the rotate_half concat is a slow cross-lane VPU
    # shuffle). rotate_half becomes a 0/±1 block-diagonal signed-permutation
    # matmul on the MXU: each output lane sums exactly one ±bf16 term, so it
    # is bitwise the f32-cast-and-negate of the slice/concat form. Tables stay
    # [L, hd] host constants (tiled on device — no multi-MB jit literals).
    cos, sin = _rope_table(t, h, w, hd, m)
    rdt = jnp.dtype(cfg.rope_dtype)
    cos_p = jnp.tile(jnp.asarray(cos, rdt), (1, N))  # [L, N·hd]
    sin_p = jnp.tile(jnp.asarray(sin, rdt), (1, N))
    P_rot = jnp.asarray(
        np.kron(np.eye(N, dtype=np.float32), _rotate_half_perm(hd)),
        jnp.bfloat16,
    )

    taps = tuple(cfg.deepstack_visual_indexes)
    # one boolean per layer: emit this layer's activations for deepstack
    tap_flags = jnp.asarray(
        [i in taps for i in range(cfg.depth)], jnp.bool_
    )

    def block(x, scanned):
        bp, tap = scanned
        hn = _ln(x, bp["norm1"])
        qkv = _lin(bp, "qkv_w", hn) + bp["qkv_b"]  # [L, 3·D]
        q2, k2, v2 = qkv[:, : N * hd], qkv[:, N * hd : 2 * N * hd], qkv[:, 2 * N * hd :]
        qz = jnp.dot(q2, P_rot, preferred_element_type=rdt)
        kz = jnp.dot(k2, P_rot, preferred_element_type=rdt)
        q = (q2.astype(rdt) * cos_p + qz * sin_p).astype(x.dtype)
        k = (k2.astype(rdt) * cos_p + kz * sin_p).astype(x.dtype)
        # attention is segmented per temporal patch group (HF cu_seqlens =
        # repeat_interleave(h·w, t)): fold t into a batch axis
        hw = L // t
        qs = q.reshape(t, hw, N, hd)
        ks = k.reshape(t, hw, N, hd)
        vs = v2.reshape(t, hw, N, hd)
        if use_flash:
            from ...ops.pallas.flash_attention import (
                DEFAULT_BLOCK_Q, flash_attention_infer)

            # Measured in-run A/B at the 640p video shape (8×40×40 grid,
            # depth-48 scan, tools/dev/bench_vision_ab.py): unpadded small-D
            # flash + bounded softmax beats the r4 pad-to-128 path
            # (2.5-2.9 vs 3.5 ms attention-only; r4's "7.6% MXU small-D"
            # reading was the ~27 ms per-dispatch tunnel floor, not the
            # kernel). block_q stays the kernel default: 1664 (one q step
            # per 1600-token segment) wins attention-only but overflows the
            # compile inside the full block's fusion context.
            # bounded softmax is guarded: the kernel lax.cond-falls back to
            # max-tracked when the Cauchy-Schwarz logit bound nears the f32
            # exp2 underflow range, so un-qk-normed ViT activations stay
            # exact for any checkpoint.
            bq = cfg.attn_block_q or DEFAULT_BLOCK_Q
            o = flash_attention_infer(qs, ks, vs, interpret=interp,
                                      block_q=bq, assume_normalized=True)
            o = o.astype(x.dtype)
        else:
            logits = jnp.einsum("bind,bjnd->bnij", qs, ks, preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits * (hd**-0.5), axis=-1).astype(vs.dtype)
            o = jnp.einsum("bnij,bjnd->bind", probs, vs, preferred_element_type=jnp.float32)
        o = _lin(bp, "proj_w", o.astype(x.dtype).reshape(L, N * hd)) + bp["proj_b"]
        x = x + o
        hn = _ln(x, bp["norm2"])
        x = x + _lin(bp, "mlp_fc2_w", _act(_lin(bp, "mlp_fc1_w", hn) + bp["mlp_fc1_b"], cfg.hidden_act)) + bp["mlp_fc2_b"]
        # zero out non-tapped layers so the stacked output stays cheap to
        # fuse; the actual gather happens once after the scan
        return x, jnp.where(tap, x, jnp.zeros_like(x))

    x, tapped = jax.lax.scan(block, x, (params["blocks"], tap_flags))
    deepstack: List[jnp.ndarray] = [
        _merger(params["deepstack"][j], tapped[i], cfg, postshuffle=True)
        for j, i in enumerate(taps)
    ]
    return _merger(params["merger"], x, cfg, postshuffle=False), deepstack


def _merger(mp, x, cfg, postshuffle: bool):
    """PatchMerger: LN (pre- or post-shuffle) → fc1 → GELU → fc2."""
    u = cfg.spatial_merge_size**2
    D = cfg.hidden_size
    if postshuffle:
        y = _ln(x.reshape(-1, u * D), mp["norm"])
    else:
        y = _ln(x, mp["norm"]).reshape(-1, u * D)
    y = _act(y @ mp["fc1_w"] + mp["fc1_b"], "gelu")  # nn.GELU() = exact
    return y @ mp["fc2_w"] + mp["fc2_b"]


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------


def vision_hf_to_params(sd, cfg: Qwen3VLVisionConfig):
    g = lambda k: np.asarray(sd[k])
    t = lambda k: np.ascontiguousarray(g(k).T)

    pe_w = g("patch_embed.proj.weight")  # [D, C, tp, p, p]
    params = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(pe_w.reshape(pe_w.shape[0], -1).T),
            "bias": g("patch_embed.proj.bias"),
        },
        "pos_embed": g("pos_embed.weight"),
        "blocks": [],
        "merger": _merger_from_sd(sd, "merger"),
        "deepstack": [
            _merger_from_sd(sd, f"deepstack_merger_list.{i}")
            for i in range(len(cfg.deepstack_visual_indexes))
        ],
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        params["blocks"].append(
            {
                "norm1": {"weight": g(f"{p}.norm1.weight"), "bias": g(f"{p}.norm1.bias")},
                "norm2": {"weight": g(f"{p}.norm2.weight"), "bias": g(f"{p}.norm2.bias")},
                "qkv_w": t(f"{p}.attn.qkv.weight"),
                "qkv_b": g(f"{p}.attn.qkv.bias"),
                "proj_w": t(f"{p}.attn.proj.weight"),
                "proj_b": g(f"{p}.attn.proj.bias"),
                "mlp_fc1_w": t(f"{p}.mlp.linear_fc1.weight"),
                "mlp_fc1_b": g(f"{p}.mlp.linear_fc1.bias"),
                "mlp_fc2_w": t(f"{p}.mlp.linear_fc2.weight"),
                "mlp_fc2_b": g(f"{p}.mlp.linear_fc2.bias"),
            }
        )
    # stack blocks for the lax.scan over layers in vision_forward
    params["blocks"] = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *params["blocks"]
    )
    return jax.tree_util.tree_map(jnp.asarray, params)


def _merger_from_sd(sd, prefix):
    g = lambda k: np.asarray(sd[k])
    t = lambda k: np.ascontiguousarray(g(k).T)
    return {
        "norm": {"weight": g(f"{prefix}.norm.weight"), "bias": g(f"{prefix}.norm.bias")},
        "fc1_w": t(f"{prefix}.linear_fc1.weight"),
        "fc1_b": g(f"{prefix}.linear_fc1.bias"),
        "fc2_w": t(f"{prefix}.linear_fc2.weight"),
        "fc2_b": g(f"{prefix}.linear_fc2.bias"),
    }
