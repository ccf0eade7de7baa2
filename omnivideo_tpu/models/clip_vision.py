"""CLIP vision tower (XLM-Roberta-CLIP ViT-H/14) for image-to-video.

Functionally equivalent to the reference
`previous_version/.../wan/modules/clip.py:209-301` (VisionTransformer) as
used by WanI2V (`.../wan/image2video.py:233`): `visual(..., use_31_block=True)`
returns the PENULTIMATE block's token sequence [B, 257, 1280] — the image
conditioning features for the i2v cross-attention.

JAX: pre-LN ViT, quick-GELU MLP, cls+learned positional embeddings,
patch-embed as stride==kernel GEMM; only the use_31_block path is needed
(no pooled head)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: float = 4.0
    num_heads: int = 16
    num_layers: int = 32
    pre_norm: bool = True
    norm_eps: float = 1e-5
    activation: str = "gelu"  # vit-h-14 open_clip uses gelu


def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["weight"] + p["bias"]).astype(x.dtype)


def _act(x, kind):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def clip_vision_forward(
    params, cfg: CLIPVisionConfig, images: jnp.ndarray, use_31_block: bool = True
) -> jnp.ndarray:
    """images: [B, 3, H, W] normalized; returns [B, 1+N, dim] tokens
    (penultimate block when use_31_block — reference clip.py:294-299)."""
    B, C, H, W = images.shape
    p = cfg.patch_size
    # patch embed as GEMM
    x = images.reshape(B, C, H // p, p, W // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, (H // p) * (W // p), C * p * p)
    x = x @ params["patch_embedding"]["kernel"]
    if "bias" in params["patch_embedding"]:
        x = x + params["patch_embedding"]["bias"]
    cls = jnp.broadcast_to(params["cls_embedding"], (B, 1, cfg.dim)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    if cfg.pre_norm:
        x = _ln(x, params["pre_norm"], cfg.norm_eps)

    n_blocks = cfg.num_layers - 1 if use_31_block else cfg.num_layers
    N, hd = cfg.num_heads, cfg.dim // cfg.num_heads
    L = x.shape[1]
    for i in range(n_blocks):
        bp = params["blocks"][i]
        hn = _ln(x, bp["norm1"], cfg.norm_eps)
        qkv = hn @ bp["qkv_w"] + bp["qkv_b"]
        q, k, v = [t[:, :, 0] for t in jnp.split(qkv.reshape(B, L, 3, N, hd), 3, axis=2)]
        logits = jnp.einsum("bind,bjnd->bnij", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (hd**-0.5), axis=-1).astype(v.dtype)
        o = jnp.einsum("bnij,bjnd->bind", probs, v, preferred_element_type=jnp.float32)
        o = o.astype(x.dtype).reshape(B, L, cfg.dim) @ bp["proj_w"] + bp["proj_b"]
        x = x + o
        hn = _ln(x, bp["norm2"], cfg.norm_eps)
        h = _act(hn @ bp["mlp1_w"] + bp["mlp1_b"], cfg.activation)
        x = x + (h @ bp["mlp2_w"] + bp["mlp2_b"])
    if not use_31_block:
        x = _ln(x, params["post_norm"], cfg.norm_eps)
    return x


def clip_vision_from_state_dict(sd, cfg: CLIPVisionConfig, prefix: str = ""):
    """Reference VisionTransformer state_dict → pytree (names clip.py:209-277)."""
    g = lambda k: np.asarray(sd[prefix + k])
    t = lambda k: np.ascontiguousarray(g(k).T)

    pe_w = g("patch_embedding.weight")  # [dim, 3, p, p]
    params = {
        "patch_embedding": {
            "kernel": np.ascontiguousarray(pe_w.reshape(pe_w.shape[0], -1).T)
        },
        "cls_embedding": g("cls_embedding").reshape(1, 1, cfg.dim),
        "pos_embedding": g("pos_embedding").reshape(1, -1, cfg.dim),
        "blocks": [],
    }
    if prefix + "patch_embedding.bias" in sd:
        params["patch_embedding"]["bias"] = g("patch_embedding.bias")
    if cfg.pre_norm:
        params["pre_norm"] = {"weight": g("pre_norm.weight"), "bias": g("pre_norm.bias")}
    if prefix + "post_norm.weight" in sd:
        params["post_norm"] = {"weight": g("post_norm.weight"), "bias": g("post_norm.bias")}
    for i in range(cfg.num_layers):
        b = f"transformer.{i}"
        params["blocks"].append(
            {
                "norm1": {"weight": g(f"{b}.norm1.weight"), "bias": g(f"{b}.norm1.bias")},
                "norm2": {"weight": g(f"{b}.norm2.weight"), "bias": g(f"{b}.norm2.bias")},
                "qkv_w": t(f"{b}.attn.to_qkv.weight"),
                "qkv_b": g(f"{b}.attn.to_qkv.bias"),
                "proj_w": t(f"{b}.attn.proj.weight"),
                "proj_b": g(f"{b}.attn.proj.bias"),
                "mlp1_w": t(f"{b}.mlp.0.weight"),
                "mlp1_b": g(f"{b}.mlp.0.bias"),
                "mlp2_w": t(f"{b}.mlp.2.weight"),
                "mlp2_b": g(f"{b}.mlp.2.bias"),
            }
        )
    return jax.tree_util.tree_map(jnp.asarray, params)


# ImageNet-CLIP normalization used by the reference CLIPModel transforms
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(img: np.ndarray, size: int = 224) -> np.ndarray:
    """[H, W, 3] uint8 or [-1,1] float frame → [1, 3, size, size] CLIP input."""
    from PIL import Image

    if img.dtype != np.uint8:
        img = ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)
    pil = Image.fromarray(img).resize((size, size), Image.BICUBIC)
    arr = np.asarray(pil, np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)[None]


def init_clip_vision(key, cfg: CLIPVisionConfig, scale: float = 0.02):
    """Random init (tests / smoke pipelines)."""
    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    mid = int(cfg.dim * cfg.mlp_ratio)
    keys = iter(jax.random.split(key, 4 + 6 * cfg.num_layers))
    ln = lambda: {"weight": jnp.ones((cfg.dim,)), "bias": jnp.zeros((cfg.dim,))}
    params = {
        "patch_embedding": {
            "kernel": jax.random.normal(next(keys), (3 * cfg.patch_size**2, cfg.dim)) * scale,
        },
        "cls_embedding": jax.random.normal(next(keys), (1, 1, cfg.dim)) * scale,
        "pos_embedding": jax.random.normal(next(keys), (1, n_tok, cfg.dim)) * scale,
        "pre_norm": ln(),
        "post_norm": ln(),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["blocks"].append({
            "norm1": ln(), "norm2": ln(),
            "qkv_w": jax.random.normal(next(keys), (cfg.dim, 3 * cfg.dim)) * scale,
            "qkv_b": jnp.zeros((3 * cfg.dim,)),
            "proj_w": jax.random.normal(next(keys), (cfg.dim, cfg.dim)) * scale,
            "proj_b": jnp.zeros((cfg.dim,)),
            "mlp1_w": jax.random.normal(next(keys), (cfg.dim, mid)) * scale,
            "mlp1_b": jnp.zeros((mid,)),
            "mlp2_w": jax.random.normal(next(keys), (mid, cfg.dim)) * scale,
            "mlp2_b": jnp.zeros((cfg.dim,)),
        })
    return params
