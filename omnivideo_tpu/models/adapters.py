"""v1 adapters: DM_Adapter and VisionHead (learnable-query transformers).

Role of reference `previous_version/.../nets/omni/modules/adapter.py:8-140`
(DM_Adapter: SigLIP-dim(1152)→text-dim(4096) MLP bridge + learnable 256-query
nn.Transformer with 4 encoder + 4 decoder layers) and
`.../llava/model/vila_with_vision_head.py:36-70` (VisionHead: LLM hidden →
1152 MLP + 4+4 transformer over learnable queries).

The shared core is a faithful JAX port of torch `nn.Transformer`
(batch_first, norm_first, relu FFN, packed-QKV MultiheadAttention, default 8
heads, final encoder/decoder norms, no masks).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _mha(p, q_in, kv_in, num_heads):
    """torch nn.MultiheadAttention with packed in_proj."""
    d = q_in.shape[-1]
    hd = d // num_heads
    w = p["in_proj_w"]  # [3d, d] torch layout
    b = p["in_proj_b"]
    wq, wk, wv = w[:d], w[d : 2 * d], w[2 * d :]
    bq, bk, bv = b[:d], b[d : 2 * d], b[2 * d :]
    B, Lq, _ = q_in.shape
    Lk = kv_in.shape[1]
    q = (q_in @ wq.T + bq).reshape(B, Lq, num_heads, hd)
    k = (kv_in @ wk.T + bk).reshape(B, Lk, num_heads, hd)
    v = (kv_in @ wv.T + bv).reshape(B, Lk, num_heads, hd)
    logits = jnp.einsum("bind,bjnd->bnij", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (hd**-0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bnij,bjnd->bind", probs, v, preferred_element_type=jnp.float32)
    o = o.astype(q_in.dtype).reshape(B, Lq, d)
    return o @ p["out_proj_w"].T + p["out_proj_b"]


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def _ffn(p, x):
    return jax.nn.relu(x @ p["w1"].T + p["b1"]) @ p["w2"].T + p["b2"]


def transformer_apply(p, src, tgt, num_heads=8):
    """torch nn.Transformer(norm_first=True) forward (no masks)."""
    x = src
    for lp in p["encoder"]:
        x = x + _mha(lp["self_attn"], _ln(x, lp["norm1"]), _ln(x, lp["norm1"]), num_heads)
        x = x + _ffn(lp["ffn"], _ln(x, lp["norm2"]))
    mem = _ln(x, p["encoder_norm"])
    t = tgt
    for lp in p["decoder"]:
        tn = _ln(t, lp["norm1"])
        t = t + _mha(lp["self_attn"], tn, tn, num_heads)
        t = t + _mha(lp["cross_attn"], _ln(t, lp["norm2"]), mem, num_heads)
        t = t + _ffn(lp["ffn"], _ln(t, lp["norm3"]))
    return _ln(t, p["decoder_norm"])


def _mlp_bridge(p, x):
    """Linear → GELU (exact) → Linear (adapter.py:57-62)."""
    h = jax.nn.gelu(x @ p["fc1_w"].T + p["fc1_b"], approximate=False)
    return h @ p["fc2_w"].T + p["fc2_b"]


def dm_adapter_apply(params, x):
    """DM_Adapter forward (adapter.py:133-140): fc bridge → transformer with
    learnable 256-query decoder. x: [B, L, in_channels] → [B, 256, out]."""
    h = _mlp_bridge(params["fc"], x)
    B = x.shape[0]
    q = jnp.broadcast_to(params["decoder_query"], (B,) + params["decoder_query"].shape[1:])
    return transformer_apply(params["transformer"], h, q)


def vision_head_apply(params, vlm_last_hidden_state):
    """VisionHead forward (vila_with_vision_head.py:64-70)."""
    h = _mlp_bridge(params["fc"], vlm_last_hidden_state)
    B = h.shape[0]
    q = jnp.broadcast_to(params["decoder_query"], (B,) + params["decoder_query"].shape[1:])
    return transformer_apply(params["transformer"], h, q)


# ---------------------------------------------------------------------------
# torch conversion
# ---------------------------------------------------------------------------


def _attn_from_sd(sd, prefix):
    return {
        "in_proj_w": np.asarray(sd[f"{prefix}.in_proj_weight"]),
        "in_proj_b": np.asarray(sd[f"{prefix}.in_proj_bias"]),
        "out_proj_w": np.asarray(sd[f"{prefix}.out_proj.weight"]),
        "out_proj_b": np.asarray(sd[f"{prefix}.out_proj.bias"]),
    }


def _ln_from_sd(sd, prefix):
    return {"weight": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _transformer_from_sd(sd, prefix, n_enc=4, n_dec=4):
    enc = []
    for i in range(n_enc):
        p = f"{prefix}.encoder.layers.{i}"
        enc.append(
            {
                "self_attn": _attn_from_sd(sd, f"{p}.self_attn"),
                "ffn": {
                    "w1": np.asarray(sd[f"{p}.linear1.weight"]),
                    "b1": np.asarray(sd[f"{p}.linear1.bias"]),
                    "w2": np.asarray(sd[f"{p}.linear2.weight"]),
                    "b2": np.asarray(sd[f"{p}.linear2.bias"]),
                },
                "norm1": _ln_from_sd(sd, f"{p}.norm1"),
                "norm2": _ln_from_sd(sd, f"{p}.norm2"),
            }
        )
    dec = []
    for i in range(n_dec):
        p = f"{prefix}.decoder.layers.{i}"
        dec.append(
            {
                "self_attn": _attn_from_sd(sd, f"{p}.self_attn"),
                "cross_attn": _attn_from_sd(sd, f"{p}.multihead_attn"),
                "ffn": {
                    "w1": np.asarray(sd[f"{p}.linear1.weight"]),
                    "b1": np.asarray(sd[f"{p}.linear1.bias"]),
                    "w2": np.asarray(sd[f"{p}.linear2.weight"]),
                    "b2": np.asarray(sd[f"{p}.linear2.bias"]),
                },
                "norm1": _ln_from_sd(sd, f"{p}.norm1"),
                "norm2": _ln_from_sd(sd, f"{p}.norm2"),
                "norm3": _ln_from_sd(sd, f"{p}.norm3"),
            }
        )
    return {
        "encoder": enc,
        "decoder": dec,
        "encoder_norm": _ln_from_sd(sd, f"{prefix}.encoder.norm"),
        "decoder_norm": _ln_from_sd(sd, f"{prefix}.decoder.norm"),
    }


def dm_adapter_from_state_dict(sd: Dict[str, np.ndarray]):
    """Reference DM_Adapter state_dict → pytree (transformer under 'adapter')."""
    params = {
        "decoder_query": np.asarray(sd["decoder_query"]),
        "fc": {
            "fc1_w": np.asarray(sd["fc.0.weight"]),
            "fc1_b": np.asarray(sd["fc.0.bias"]),
            "fc2_w": np.asarray(sd["fc.2.weight"]),
            "fc2_b": np.asarray(sd["fc.2.bias"]),
        },
        "transformer": _transformer_from_sd(sd, "adapter"),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def vision_head_from_state_dict(sd: Dict[str, np.ndarray]):
    params = {
        "decoder_query": np.asarray(sd["decoder_query"]),
        "fc": {
            "fc1_w": np.asarray(sd["fc.0.weight"]),
            "fc1_b": np.asarray(sd["fc.0.bias"]),
            "fc2_w": np.asarray(sd["fc.2.weight"]),
            "fc2_b": np.asarray(sd["fc.2.bias"]),
        },
        "transformer": _transformer_from_sd(sd, "visionHeadAdapter"),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def v1_aligned_embedding(
    vision_head_params,
    adapter_params,
    vlm_last_hidden_state: jnp.ndarray,
    is_video: bool = True,
) -> jnp.ndarray:
    """v1 conditioning chain (reference omni_video_model.py:243-265):
    VLM hidden states → VisionHead (learnable-query tokens, [B, Q, 1152]) →
    DM_Adapter per query token → 256-query aligned embeddings.

    Images use only query 0 → [B, 256, 4096]; videos run the adapter per
    vision-head query and concatenate → [B, Q·256, 4096].
    """
    heads = vision_head_apply(vision_head_params, vlm_last_hidden_state)  # [B, Q, 1152]
    B, Q, D = heads.shape
    if not is_video:
        return dm_adapter_apply(adapter_params, heads[:, 0:1])
    per = dm_adapter_apply(adapter_params, heads.reshape(B * Q, 1, D))  # [B·Q, 256, out]
    return per.reshape(B, Q * per.shape[1], per.shape[2])


# ---------------------------------------------------------------------------
# random init (from-scratch training / tests)
# ---------------------------------------------------------------------------


def _init_counter_keys(key):
    ctr = [0]

    def nk():
        ctr[0] += 1
        return jax.random.fold_in(key, ctr[0])

    return nk


def _init_attn(nk, d):
    return {
        "in_proj_w": jax.random.normal(nk(), (3 * d, d)) * 0.05,
        "in_proj_b": jnp.zeros((3 * d,)),
        "out_proj_w": jax.random.normal(nk(), (d, d)) * 0.05,
        "out_proj_b": jnp.zeros((d,)),
    }


def _init_ln(d):
    return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _init_ffn(nk, d, ffn):
    return {
        "w1": jax.random.normal(nk(), (ffn, d)) * 0.05, "b1": jnp.zeros((ffn,)),
        "w2": jax.random.normal(nk(), (d, ffn)) * 0.05, "b2": jnp.zeros((d,)),
    }


def init_transformer_stack(key, d, ffn, n_enc=4, n_dec=4):
    """Random torch-nn.Transformer-shaped params (norm_first layout)."""
    nk = _init_counter_keys(key)
    enc = [
        {"self_attn": _init_attn(nk, d), "norm1": _init_ln(d),
         "norm2": _init_ln(d), "ffn": _init_ffn(nk, d, ffn)}
        for _ in range(n_enc)
    ]
    dec = [
        {"self_attn": _init_attn(nk, d), "cross_attn": _init_attn(nk, d),
         "norm1": _init_ln(d), "norm2": _init_ln(d), "norm3": _init_ln(d),
         "ffn": _init_ffn(nk, d, ffn)}
        for _ in range(n_dec)
    ]
    return {
        "encoder": enc, "decoder": dec,
        "encoder_norm": _init_ln(d), "decoder_norm": _init_ln(d),
    }


def init_vision_head(key, in_dim, hidden_dim, out_dim, num_queries=4,
                     num_layers=4, num_heads=8, ffn_mult=4):
    """Random VisionHead params (vila_with_vision_head.py:36-70 shapes)."""
    del num_heads  # head count is an apply-time arg
    nk = _init_counter_keys(key)
    return {
        "fc": {
            "fc1_w": jax.random.normal(nk(), (hidden_dim, in_dim)) * 0.05,
            "fc1_b": jnp.zeros((hidden_dim,)),
            "fc2_w": jax.random.normal(nk(), (out_dim, hidden_dim)) * 0.05,
            "fc2_b": jnp.zeros((out_dim,)),
        },
        "decoder_query": jax.random.normal(nk(), (1, num_queries, out_dim)) * 0.05,
        "transformer": init_transformer_stack(
            nk(), out_dim, ffn_mult * out_dim, num_layers, num_layers),
    }


def init_dm_adapter(key, in_dim, hidden_dim, out_dim, num_queries=256,
                    num_layers=4, num_heads=8, ffn_mult=4):
    """Random DM_Adapter params (adapter.py:50-72 shapes)."""
    return init_vision_head(key, in_dim, hidden_dim, out_dim, num_queries,
                            num_layers, num_heads, ffn_mult)
