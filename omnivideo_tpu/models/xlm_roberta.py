"""XLM-Roberta text encoder (CLIP text tower) — TPU-native JAX.

Role of reference `previous_version/Omni-Video1/nets/third_party/wan/modules/
xlm_roberta.py:79-167` (XLMRoberta: token/type/position embeddings with
mask-cumsum position ids, post-norm attention blocks, additive pad mask) and
`.../wan/modules/clip.py:303-325` (XLMRobertaWithHead: masked mean pooling +
bias-free GELU MLP head projecting to the CLIP joint space).

The Wan i2v pipeline only consumes the CLIP *visual* tower
(`models/clip_vision.py`); this text tower completes the XLMRobertaCLIP pair
(clip.py:328-415) for text-image scoring and retrieval-style use. Layout is a
single stacked-parameters pytree scanned with `lax.scan` so 24 layers compile
as one block (XLA-friendly), with f32 layernorms and bf16-able matmuls.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm

PAD_ID = 1


def _affine_ln(x, scale, bias, eps):
    return layer_norm(x, eps) * scale + bias


def _dense(p, x):
    y = x @ p["kernel"]
    return y + p["bias"] if "bias" in p else y


def init_xlm_roberta(
    key: jax.Array,
    vocab_size: int = 250002,
    max_seq_len: int = 514,
    type_size: int = 1,
    dim: int = 1024,
    num_heads: int = 16,
    num_layers: int = 24,
    out_dim: int = 0,
    dtype=jnp.float32,
) -> Dict:
    """Random init (testing); shapes mirror the reference modules."""
    _ctr = [0]

    def _next_key():
        _ctr[0] += 1
        return jax.random.fold_in(key, _ctr[0])

    def lin(d_in, d_out, bias=True):
        p = {"kernel": jax.random.normal(_next_key(), (d_in, d_out), dtype) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((d_out,), dtype)
        return p

    def ln():
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    def stack(make):
        leaves = [make() for _ in range(num_layers)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *leaves)

    params = {
        "token_embedding": jax.random.normal(_next_key(), (vocab_size, dim), dtype) * 0.02,
        "type_embedding": jax.random.normal(_next_key(), (type_size, dim), dtype) * 0.02,
        "pos_embedding": jax.random.normal(_next_key(), (max_seq_len, dim), dtype) * 0.02,
        "norm": ln(),
        "blocks": stack(
            lambda: {
                "q": lin(dim, dim), "k": lin(dim, dim), "v": lin(dim, dim),
                "o": lin(dim, dim),
                "norm1": ln(), "norm2": ln(),
                "ffn_in": lin(dim, dim * 4), "ffn_out": lin(dim * 4, dim),
            }
        ),
    }
    if out_dim:
        mid = (dim + out_dim) // 2
        params["head"] = {
            "fc1": lin(dim, mid, bias=False),
            "fc2": lin(mid, out_dim, bias=False),
        }
    return params


def xlm_roberta_apply(
    params: Dict,
    ids: jnp.ndarray,
    num_heads: int = 16,
    pad_id: int = PAD_ID,
    post_norm: bool = True,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """ids: [B, L] int32 → [B, L, dim] hidden states (xlm_roberta.py:117-141).

    Position ids follow the roberta convention `pad_id + cumsum(mask)·mask`;
    pad tokens get an additive -inf attention mask.
    """
    B, L = ids.shape
    mask = (ids != pad_id).astype(jnp.int32)

    x = (
        params["token_embedding"][ids]
        + params["type_embedding"][jnp.zeros_like(ids)]
        + params["pos_embedding"][pad_id + jnp.cumsum(mask, axis=1) * mask]
    ).astype(jnp.float32)
    if post_norm:
        x = _affine_ln(x, params["norm"]["scale"], params["norm"]["bias"], eps)

    neg = jnp.finfo(jnp.float32).min
    attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, neg)  # [B,1,1,L]
    d = x.shape[-1] // num_heads

    def block(x, p):
        def mha(h):
            q = _dense(p["q"], h).reshape(B, L, num_heads, d).transpose(0, 2, 1, 3)
            k = _dense(p["k"], h).reshape(B, L, num_heads, d).transpose(0, 2, 1, 3)
            v = _dense(p["v"], h).reshape(B, L, num_heads, d).transpose(0, 2, 1, 3)
            logits = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(d) + attn_bias
            a = jax.nn.softmax(logits, axis=-1) @ v
            return _dense(p["o"], a.transpose(0, 2, 1, 3).reshape(B, L, -1))

        def ffn(h):
            return _dense(p["ffn_out"], jax.nn.gelu(_dense(p["ffn_in"], h),
                                                    approximate=False))

        if post_norm:
            x = _affine_ln(x + mha(x), p["norm1"]["scale"], p["norm1"]["bias"], eps)
            x = _affine_ln(x + ffn(x), p["norm2"]["scale"], p["norm2"]["bias"], eps)
        else:
            x = x + mha(_affine_ln(x, p["norm1"]["scale"], p["norm1"]["bias"], eps))
            x = x + ffn(_affine_ln(x, p["norm2"]["scale"], p["norm2"]["bias"], eps))
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    if not post_norm:
        x = _affine_ln(x, params["norm"]["scale"], params["norm"]["bias"], eps)
    return x


def xlm_roberta_with_head_apply(
    params: Dict,
    ids: jnp.ndarray,
    num_heads: int = 16,
    pad_id: int = PAD_ID,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Masked mean-pool + bias-free GELU MLP head → [B, out_dim]
    (clip.py:315-325)."""
    x = xlm_roberta_apply(params, ids, num_heads=num_heads, pad_id=pad_id, eps=eps)
    m = (ids != pad_id).astype(x.dtype)[..., None]
    # denominator clamped: an all-pad row pools to zeros instead of NaN
    # (reference clip.py:320 would 0/0 here)
    pooled = (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    h = jax.nn.gelu(_dense(params["head"]["fc1"], pooled), approximate=False)
    return _dense(params["head"]["fc2"], h)


def xlm_roberta_state_dict_to_params(sd: Dict[str, np.ndarray]) -> Dict:
    """torch XLMRoberta(WithHead) state dict → stacked JAX pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def lin(prefix):
        p = {"kernel": sd[f"{prefix}.weight"].T}
        if f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"]
        return p

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    n_layers = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    blocks = [
        {
            "q": lin(f"blocks.{i}.attn.q"), "k": lin(f"blocks.{i}.attn.k"),
            "v": lin(f"blocks.{i}.attn.v"), "o": lin(f"blocks.{i}.attn.o"),
            "norm1": ln(f"blocks.{i}.norm1"), "norm2": ln(f"blocks.{i}.norm2"),
            "ffn_in": lin(f"blocks.{i}.ffn.0"), "ffn_out": lin(f"blocks.{i}.ffn.2"),
        }
        for i in range(n_layers)
    ]
    params = {
        "token_embedding": sd["token_embedding.weight"],
        "type_embedding": sd["type_embedding.weight"],
        "pos_embedding": sd["pos_embedding.weight"],
        "norm": ln("norm"),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(
            [jnp.asarray(x) for x in xs]), *blocks),
    }
    if "head.0.weight" in sd:
        params["head"] = {"fc1": lin("head.0"), "fc2": lin("head.2")}
    return jax.tree_util.tree_map(jnp.asarray, params)
