"""Torch checkpoint → JAX param-pytree conversion (name mapping tables).

Ingests reference checkpoints (diffusers-subfolder WanModel, raw `.pt` expert
state dicts with `module`/`model` unwrapping, `.pth` T5/VAE weights,
`special_tokens.pkl`) into this framework's param pytrees. Layout parity
documented against `/root/reference` README.md:353-362 and the loading code
(`tools/inference/generate_omni_v2v.py:501-513`, `modules/t5.py:495`,
`modules/vae2_1.py:611-613`, `x2x_gen_unified.py:214-226`).

Works on plain dicts of numpy arrays, so the hot path stays torch-free; the
CLI converter (tools/convert_checkpoint.py) uses torch (CPU) only to *read*
the pickles.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

Array = np.ndarray


def _t(w: Array) -> Array:  # torch Linear weight [out, in] → kernel [in, out]
    return np.ascontiguousarray(np.asarray(w).T)


def _lin(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def unwrap_state_dict(sd: Mapping[str, Array]) -> Dict[str, Array]:
    """Strip DDP/engine wrappers: 'module' / 'model' top-level keys
    (generate_omni_v2v.py:501-513)."""
    for key in ("module", "model"):
        if key in sd and isinstance(sd[key], Mapping):
            sd = sd[key]
    out = {}
    for k, v in sd.items():
        for pref in ("module.", "model."):
            if k.startswith(pref):
                k = k[len(pref):]
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# WanModel (DiT)
# ---------------------------------------------------------------------------


def wan_state_dict_to_params(sd: Mapping[str, Array], num_layers: int, cross_attn_norm: bool = True):
    """Map reference WanModel state_dict names (modules/model.py:293-411) to the
    stacked functional pytree of models/wan_dit.py."""
    sd = unwrap_state_dict(sd)

    pe_w = np.asarray(sd["patch_embedding.weight"])  # [dim, C, pt, ph, pw]
    dim = pe_w.shape[0]
    params = {
        "patch_embedding": {
            "kernel": _t(pe_w.reshape(dim, -1)),
            "bias": np.asarray(sd["patch_embedding.bias"]),
        },
        "text_embedding": {
            "fc1": _lin(sd, "text_embedding.0"),
            "fc2": _lin(sd, "text_embedding.2"),
        },
        "time_embedding": {
            "fc1": _lin(sd, "time_embedding.0"),
            "fc2": _lin(sd, "time_embedding.2"),
        },
        "time_projection": _lin(sd, "time_projection.1"),
        "head": {
            "head": _lin(sd, "head.head"),
            "modulation": np.asarray(sd["head.modulation"]).reshape(2, dim),
        },
    }
    if "img_emb.proj.0.weight" in sd:  # i2v MLPProj
        params["img_emb"] = {
            "ln1": {"scale": np.asarray(sd["img_emb.proj.0.weight"]),
                    "bias": np.asarray(sd["img_emb.proj.0.bias"])},
            "fc1": _lin(sd, "img_emb.proj.1"),
            "fc2": _lin(sd, "img_emb.proj.3"),
            "ln2": {"scale": np.asarray(sd["img_emb.proj.4.weight"]),
                    "bias": np.asarray(sd["img_emb.proj.4.bias"])},
        }

    def attn(prefix):
        p = {
            "q": _lin(sd, f"{prefix}.q"),
            "k": _lin(sd, f"{prefix}.k"),
            "v": _lin(sd, f"{prefix}.v"),
            "o": _lin(sd, f"{prefix}.o"),
            "norm_q": np.asarray(sd[f"{prefix}.norm_q.weight"]),
            "norm_k": np.asarray(sd[f"{prefix}.norm_k.weight"]),
        }
        if f"{prefix}.k_img.weight" in sd:  # i2v cross-attention
            p["k_img"] = _lin(sd, f"{prefix}.k_img")
            p["v_img"] = _lin(sd, f"{prefix}.v_img")
            p["norm_k_img"] = np.asarray(sd[f"{prefix}.norm_k_img.weight"])
        return p

    blocks = []
    for i in range(num_layers):
        p = f"blocks.{i}"
        blk = {
            "modulation": np.asarray(sd[f"{p}.modulation"]).reshape(6, dim),
            "self_attn": attn(f"{p}.self_attn"),
            "cross_attn": attn(f"{p}.cross_attn"),
            "ffn": {"fc1": _lin(sd, f"{p}.ffn.0"), "fc2": _lin(sd, f"{p}.ffn.2")},
        }
        if cross_attn_norm:
            blk["norm3"] = {
                "scale": np.asarray(sd[f"{p}.norm3.weight"]),
                "bias": np.asarray(sd[f"{p}.norm3.bias"]),
            }
        blocks.append(blk)

    import jax

    params["blocks"] = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *blocks
    )
    return params


# ---------------------------------------------------------------------------
# Unified mixed-condition companions (unified_model.py:79-93)
# ---------------------------------------------------------------------------


def unified_companions_to_params(sd: Mapping[str, Array]):
    """vlm_norm / vlm_proj / visual_context_adapter from a unified state_dict."""
    sd = unwrap_state_dict(sd)
    out = {}
    if "vlm_norm.weight" in sd:
        out["vlm_norm"] = np.asarray(sd["vlm_norm.weight"])
    if "vlm_proj.weight" in sd:
        out["vlm_proj"] = _lin(sd, "vlm_proj")
    if "visual_context_adapter.patch_embedding.weight" in sd:
        w = np.asarray(sd["visual_context_adapter.patch_embedding.weight"])
        out["visual_context_adapter"] = {
            "patch_embedding": {
                "kernel": _t(w.reshape(w.shape[0], -1)),
                "bias": np.asarray(sd["visual_context_adapter.patch_embedding.bias"]),
            },
            "projection": _lin(sd, "visual_context_adapter.projection"),
        }
    return out


def split_unified_state_dict(sd: Mapping[str, Array]):
    """Split a fine-tuned unified `.pt` state dict into (wan_sd, companion_sd)."""
    sd = unwrap_state_dict(sd)
    wan = {k[len("wan_model."):]: v for k, v in sd.items() if k.startswith("wan_model.")}
    comp = {k: v for k, v in sd.items() if not k.startswith("wan_model.")}
    return wan, comp


def to_jnp(tree, dtype=None):
    """numpy pytree → jnp pytree (optionally casting floating leaves)."""
    import jax

    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a

    return jax.tree_util.tree_map(conv, tree)
