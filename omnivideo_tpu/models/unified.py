"""Unified mixed-condition model: VLM features + text + visual context → DiT.

Equivalent to reference `omnivideo/modules/unified_model.py:13-307`
(UnifiedWanWithMixedConditionModel): RMS-norm + Linear projection of Qwen3-VL
hidden states, optional VisualContextAdapter over source-VAE latents, "tight
concatenation" `[VLM][<prp_st> text <prp_ed>][<img_st> visual <img_ed>]` with
learned special tokens, truncated to max_context_len — then the Wan DiT.

TPU-native differences:
- mixed-context assembly happens once per generate() call (it is
  timestep-independent) and is *padded to max_context_len with zeros* — which
  is exactly what the reference WanModel does anyway before the text-embedding
  MLP (model.py:479-485, cross-attn over embedded padding with
  context_lens=None) — so the fixed shape is semantically free;
- conditional and unconditional branches are stacked as batch-2 so CFG costs
  one forward pass per step instead of the reference's two
  (x2x_gen_unified.py:480-481);
- CFG training dropout uses explicit jax.random keys instead of pre-sampled
  python RNG for cross-rank synchrony (unified_model.py:157-192) — same-seed
  keys are deterministic across hosts by construction.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import PipelineConfig
from ..ops.norms import rms_norm
from .visual_context_adapter import vca_apply
from .wan_dit import _dense


def init_unified_companions(key: jax.Array, cfg: PipelineConfig):
    """vlm_norm + vlm_proj (+ VCA) params (unified_model.py:79-93)."""
    from .visual_context_adapter import init_vca

    k1, k2 = jax.random.split(key)
    params = {
        "vlm_norm": jnp.ones((cfg.vlm_in_dim,), jnp.float32),
        "vlm_proj": {
            "kernel": jax.random.normal(k1, (cfg.vlm_in_dim, cfg.dit.text_dim), jnp.float32)
            * cfg.vlm_in_dim**-0.5,
            "bias": jnp.zeros((cfg.dit.text_dim,), jnp.float32),
        },
    }
    if cfg.use_visual_context_adapter:
        params["visual_context_adapter"] = init_vca(
            k2,
            patch_size=cfg.visual_context_adapter_patch_size,
            in_channels=cfg.dit.in_dim,
            hidden_dim=cfg.dit.dim,
            out_dim=cfg.dit.text_dim,
        )
    return params


def project_vlm_features(companions, ar_vision: jnp.ndarray, eps: float = 1e-6):
    """vlm_norm → vlm_proj (unified_model.py:195-206). ar_vision: [L, vlm_dim]."""
    h = rms_norm(ar_vision, companions["vlm_norm"], eps)
    return _dense(companions["vlm_proj"], h)


def null_ar_vision(vlm_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Null VLM embedding for CFG: zeros(2, vlm_dim)+1e-6
    (unified_model.py:176-179, x2x_gen_unified.py:440-444)."""
    return jnp.zeros((2, vlm_dim), dtype) + 1e-6


def build_mixed_context(
    companions,
    cfg: PipelineConfig,
    context: Optional[jnp.ndarray] = None,
    ar_vision: Optional[jnp.ndarray] = None,
    visual_emb: Optional[jnp.ndarray] = None,
    aligned_emb: Optional[jnp.ndarray] = None,
    special_tokens: Optional[Dict[str, jnp.ndarray]] = None,
    condition_mode: str = "full",
    ref_images: Optional[jnp.ndarray] = None,
    order: str = "v2",
) -> jnp.ndarray:
    """Assemble one sample's mixed context, zero-padded to max_context_len.

    Inputs are per-sample 2D [L, D] arrays (context in text_dim space, already
    T5/VLM-encoded). Returns [max_context_len, text_dim].

    order="v2" (default): [VLM][<ipl> aligned][<prp> text][<img> visual] —
    the tight concatenation of unified_model.py:219-276.
    order="v1": [<img> visual][<img> ref][<ipl> aligned][<prp> text] — the v1
    mixed-condition assembly (omni_video_model.py:337-377), where reference
    images get a second <img_st>/<img_ed> sandwich and text comes last.
    ref_images: reference-image VAE latents [C, F, h, w], projected through
    the same visual-context adapter as visual_emb (omni_video_model.py:283-292).
    """
    assert condition_mode in (
        "auto", "full", "text_only",
        # v1 condition modes (reference omni_video_unified_gen.py:25-143)
        "aligned_emb_with_text", "aligned_emb_only", "visual_with_aligned_emb",
    )
    assert order in ("v1", "v2"), f"unknown token order {order!r}"
    td = cfg.dit.text_dim
    parts: List[jnp.ndarray] = []
    if condition_mode == "aligned_emb_only":
        context = None
        ar_vision = None
        visual_emb = None
    elif condition_mode == "aligned_emb_with_text":
        ar_vision = None
        visual_emb = None
    elif condition_mode == "visual_with_aligned_emb":
        context = None
        ar_vision = None

    def as2d(a):
        a = jnp.asarray(a)
        return a[None] if a.ndim == 1 else (a[0] if a.ndim == 3 else a)

    vlm_item = None
    if ar_vision is not None and condition_mode != "text_only":
        vlm_item = project_vlm_features(companions, as2d(ar_vision), cfg.dit.eps)

    visual_item = None
    if (
        visual_emb is not None
        and condition_mode != "text_only"
        and "visual_context_adapter" in companions
    ):
        visual_item = vca_apply(
            companions["visual_context_adapter"],
            visual_emb,
            cfg.visual_context_adapter_patch_size,
            cfg.dit.eps,
        )[0]

    aligned_item = as2d(aligned_emb) if aligned_emb is not None else None

    ref_item = None
    if ref_images is not None and "visual_context_adapter" in companions:
        ref_item = vca_apply(
            companions["visual_context_adapter"],
            ref_images,
            cfg.visual_context_adapter_patch_size,
            cfg.dit.eps,
        )[0]

    if special_tokens is not None:
        st = {k: as2d(v) for k, v in special_tokens.items()}

        def sandwich(start, item, end):
            if start in st and end in st:
                parts.extend([st[start], item, st[end]])
            else:
                parts.append(item)

        if order == "v1":
            # v1 order: visual, ref (both <img> sandwiched), aligned (<ipl>),
            # text (<prp>) — omni_video_model.py:337-377
            if visual_item is not None:
                sandwich("<img_st>", visual_item, "<img_ed>")
            if ref_item is not None:
                sandwich("<img_st>", ref_item, "<img_ed>")
            if aligned_item is not None:
                sandwich("<ipl_st>", aligned_item, "<ipl_ed>")
            if context is not None:
                sandwich("<prp_st>", as2d(context), "<prp_ed>")
        else:
            if vlm_item is not None:
                parts.append(vlm_item)
            if aligned_item is not None:
                # aligned embeddings sandwiched with <ipl_st>/<ipl_ed> when
                # present, else bare (omni_video_model.py:357-368)
                sandwich("<ipl_st>", aligned_item, "<ipl_ed>")
            if context is not None:
                sandwich("<prp_st>", as2d(context), "<prp_ed>")
            if visual_item is not None:
                sandwich("<img_st>", visual_item, "<img_ed>")
            if ref_item is not None:
                sandwich("<img_st>", ref_item, "<img_ed>")
    else:
        ordered = (
            (visual_item, ref_item, aligned_item,
             as2d(context) if context is not None else None)
            if order == "v1"
            else (vlm_item, aligned_item,
                  as2d(context) if context is not None else None,
                  visual_item, ref_item)
        )
        parts = [p for p in ordered if p is not None]

    if not parts:
        parts = [jnp.zeros((1, td), jnp.float32)]

    mixed = jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=0)
    L = cfg.max_context_len
    if mixed.shape[0] > L:
        mixed = mixed[:L]
    elif mixed.shape[0] < L:
        mixed = jnp.pad(mixed, ((0, L - mixed.shape[0]), (0, 0)))
    return mixed


def load_special_tokens_pkl(path: str, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Load special_tokens.pkl (x2x_gen_unified.py:214-226) — torch-free."""
    from ..io.torch_reader import read_torch_checkpoint, to_float_numpy

    obj = to_float_numpy(read_torch_checkpoint(path))
    assert isinstance(obj, dict)
    return {k: jnp.asarray(np.asarray(v), dtype=dtype) for k, v in obj.items()}


def build_mixed_context_batch(
    companions,
    cfg: PipelineConfig,
    text_ctx: Optional[jnp.ndarray] = None,
    vlm: Optional[jnp.ndarray] = None,
    visual_emb: Optional[jnp.ndarray] = None,
    special_tokens: Optional[Dict[str, jnp.ndarray]] = None,
    aligned_emb: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched mixed-context assembly for training.

    text_ctx: [B, Lt, text_dim] (zero-padded — matching the reference
    collate's pad-to-max, omnivideo_dataset_patched.py:96-234, which the tight
    concat then includes); vlm: [B, Lv, vlm_dim]; visual_emb: [B, C, F, h, w];
    aligned_emb: [B, La, text_dim] precomputed adapter-chain features (the v1
    offline dataset's `aligned_emb` key, omnivideo_dataset_patched.py:16-95),
    sandwiched with <ipl_st>/<ipl_ed> when present (omni_video_model.py:357-368).
    Returns [B, max_context_len, text_dim]. All lengths static → jit-stable.
    """
    td = cfg.dit.text_dim
    parts = []
    B = None
    for a in (text_ctx, vlm, visual_emb, aligned_emb):
        if a is not None:
            B = a.shape[0]
            break
    assert B is not None

    def tok(name):
        t = special_tokens[name]
        t = t if t.ndim == 2 else t[None]
        return jnp.broadcast_to(t[None].astype(jnp.float32), (B, t.shape[0], td))

    if vlm is not None:
        h = rms_norm(vlm, companions["vlm_norm"], cfg.dit.eps)
        parts.append(_dense(companions["vlm_proj"], h).astype(jnp.float32))
    if aligned_emb is not None:
        a = aligned_emb.astype(jnp.float32)
        if special_tokens is not None and "<ipl_st>" in special_tokens:
            parts.extend([tok("<ipl_st>"), a, tok("<ipl_ed>")])
        else:
            parts.append(a)
    if text_ctx is not None:
        if special_tokens is not None:
            parts.extend([tok("<prp_st>"), text_ctx.astype(jnp.float32), tok("<prp_ed>")])
        else:
            parts.append(text_ctx.astype(jnp.float32))
    if visual_emb is not None and "visual_context_adapter" in companions:
        vis = vca_apply(
            companions["visual_context_adapter"],
            visual_emb,
            cfg.visual_context_adapter_patch_size,
            cfg.dit.eps,
        ).astype(jnp.float32)
        if special_tokens is not None:
            parts.extend([tok("<img_st>"), vis, tok("<img_ed>")])
        else:
            parts.append(vis)
    mixed = jnp.concatenate(parts, axis=1)
    L = cfg.max_context_len
    if mixed.shape[1] > L:
        mixed = mixed[:, :L]
    elif mixed.shape[1] < L:
        mixed = jnp.pad(mixed, ((0, 0), (0, L - mixed.shape[1]), (0, 0)))
    return mixed
