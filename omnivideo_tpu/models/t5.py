"""umT5-XXL text encoder, TPU-native.

Functionally equivalent to the reference from-scratch T5
(`omnivideo/modules/t5.py:45-512`): relative-position-bucket attention with NO
QK scaling (t5.py:110-112), GELU-gated FFN `fc1(x)·gelu(gate(x))`
(t5.py:122-140), per-layer bidirectional relative embeddings
(shared_pos=False for umT5, t5.py:455-468), encoder-only instantiation
(vocab 256384 / dim 4096 / 24 layers).

TPU-native: stacked layer params + lax.scan; the relative-position bucket
index matrix is precomputed host-side (static text_len) so the per-layer bias
is a single embedding gather; softmax/norm math in f32, matmuls in bf16.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import T5Config
from .wan_dit import _gelu_tanh

# ---------------------------------------------------------------------------
# relative position buckets (host-side, static lengths)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def rel_position_buckets(
    lq: int, lk: int, num_buckets: int = 32, max_dist: int = 128, bidirectional: bool = True
) -> np.ndarray:
    """Bucket index matrix [lq, lk] (reference t5.py:244-263)."""
    rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    if bidirectional:
        nb = num_buckets // 2
        out = (rel > 0).astype(np.int64) * nb
        rel = np.abs(rel)
    else:
        nb = num_buckets
        out = np.zeros_like(rel)
        rel = -np.minimum(rel, 0)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(rel / max_exact + 1e-20) / math.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    out = out + np.where(rel < max_exact, rel, large)
    return out.astype(np.int32)


def _t5_norm(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = x * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps).astype(x.dtype)
    if w.dtype in (jnp.float16, jnp.bfloat16):
        y = y.astype(w.dtype)
    return w * y


def t5_layer_apply(lp, x, mask_bias, buckets, cfg: T5Config):
    """One T5SelfAttention block (t5.py:143-174). x: [B, L, D]."""
    B, L, D = x.shape
    N = cfg.num_heads
    hd = cfg.dim_attn // N
    pdtype = lp["attn"]["q"].dtype

    pos_bias = lp["pos_embedding"][buckets]  # [L, L, N]
    pos_bias = pos_bias.astype(jnp.float32).transpose(2, 0, 1)[None]  # [1, N, L, L]

    # self attention, NO scaling (t5.py:110-112). The norm computes in f32;
    # cast its output to the param dtype so bf16 checkpoints run the matmuls
    # on the bf16 MXU path and the residual stream keeps the carry dtype
    # (reference autocast semantics).
    h = _t5_norm(x, lp["norm1"]).astype(pdtype)
    q = (h @ lp["attn"]["q"]).reshape(B, L, N, hd)
    k = (h @ lp["attn"]["k"]).reshape(B, L, N, hd)
    v = (h @ lp["attn"]["v"]).reshape(B, L, N, hd)
    logits = jnp.einsum("binc,bjnc->bnij", q, k, preferred_element_type=jnp.float32)
    logits = logits + pos_bias + mask_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnij,bjnc->binc", probs, v, preferred_element_type=jnp.float32)
    o = o.astype(pdtype).reshape(B, L, N * hd) @ lp["attn"]["o"]
    x = x + o

    # gated FFN: fc1(x) · gelu_tanh(gate(x)) (t5.py:130-140)
    h = _t5_norm(x, lp["norm2"]).astype(pdtype)
    y = (h @ lp["ffn"]["fc1"]) * _gelu_tanh(h @ lp["ffn"]["gate"])
    x = x + (y @ lp["ffn"]["fc2"])
    return x


def t5_encode(params, cfg: T5Config, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Encode token ids [B, L] with attention mask [B, L] → [B, L, dim]."""
    B, L = ids.shape
    x = params["token_embedding"][ids]
    buckets = jnp.asarray(rel_position_buckets(L, L, cfg.num_buckets, cfg.rel_max_dist))
    mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -3.4e38).astype(jnp.float32)

    def body(xx, lp):
        return t5_layer_apply(lp, xx, mask_bias, buckets, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return _t5_norm(x, params["norm"])


def init_t5(key: jax.Array, cfg: T5Config, dtype=jnp.bfloat16):
    """Random init matching reference distributions (t5.py:26-42)."""
    keys = iter(jax.random.split(key, 8))
    d, da, df, N = cfg.dim, cfg.dim_attn, cfg.dim_ffn, cfg.num_heads

    def layer(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "norm1": jnp.ones((d,), jnp.float32),
            "norm2": jnp.ones((d,), jnp.float32),
            "attn": {
                "q": jax.random.normal(next(ks), (d, da)) * (d * da) ** -0.5,
                "k": jax.random.normal(next(ks), (d, da)) * d**-0.5,
                "v": jax.random.normal(next(ks), (d, da)) * d**-0.5,
                "o": jax.random.normal(next(ks), (da, d)) * (N * da) ** -0.5,
            },
            "ffn": {
                "gate": jax.random.normal(next(ks), (d, df)) * d**-0.5,
                "fc1": jax.random.normal(next(ks), (d, df)) * d**-0.5,
                "fc2": jax.random.normal(next(ks), (df, d)) * df**-0.5,
            },
            "pos_embedding": jax.random.normal(next(ks), (cfg.num_buckets, N))
            * (2 * cfg.num_buckets * N) ** -0.5,
        }

    lkeys = jax.random.split(next(keys), cfg.num_layers)
    params = {
        "token_embedding": jax.random.normal(next(keys), (cfg.vocab_size, d)),
        "layers": jax.vmap(layer)(lkeys),
        "norm": jnp.ones((d,), jnp.float32),
    }

    def cast(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "norm" in name:
            return leaf.astype(jnp.float32)
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def t5_state_dict_to_params(sd, cfg: T5Config):
    """Reference T5Encoder state_dict (t5.py:266-311 module tree) → pytree.

    Linear weights transpose [out,in]→[in,out]; per-layer rel embeddings keep
    [num_buckets, num_heads].
    """
    g = lambda k: np.asarray(sd[k])
    t = lambda k: np.ascontiguousarray(g(k).T)

    layers = []
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        layers.append(
            {
                "norm1": g(f"{p}.norm1.weight"),
                "norm2": g(f"{p}.norm2.weight"),
                "attn": {
                    "q": t(f"{p}.attn.q.weight"),
                    "k": t(f"{p}.attn.k.weight"),
                    "v": t(f"{p}.attn.v.weight"),
                    "o": t(f"{p}.attn.o.weight"),
                },
                "ffn": {
                    "gate": t(f"{p}.ffn.gate.0.weight"),
                    "fc1": t(f"{p}.ffn.fc1.weight"),
                    "fc2": t(f"{p}.ffn.fc2.weight"),
                },
                "pos_embedding": g(f"{p}.pos_embedding.embedding.weight"),
            }
        )
    return {
        "token_embedding": g("token_embedding.weight"),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers),
        "norm": g("norm.weight"),
    }


# ---------------------------------------------------------------------------
# tokenizer + encoder wrapper (role of T5EncoderModel, t5.py:471-512)
# ---------------------------------------------------------------------------


class HuggingfaceTokenizer:
    """Tokenizer wrapper (reference `omnivideo/modules/tokenizers.py:36-81`):
    whitespace cleaning, fixed-length padding/truncation, attention mask.

    Loads a fast tokenizer (tokenizer.json). SP-only checkpoint dirs
    (spiece.model without tokenizer.json, the reference's umT5 layout) are
    converted automatically via utils/spm_convert.py — no sentencepiece
    runtime needed.
    """

    def __init__(self, name: str, seq_len: int = 512, clean: str = "whitespace"):
        from transformers import AutoTokenizer

        try:
            self.tokenizer = AutoTokenizer.from_pretrained(name, use_fast=True)
        except Exception as e:
            from pathlib import Path

            has_sp = (Path(name) / "spiece.model").exists() if Path(name).is_dir() else False
            if not has_sp:
                raise
            # SP-only dir: convert spiece.model -> tokenizer.json in place
            # (or to a tmp cache if the dir is read-only) and load that.
            from transformers import PreTrainedTokenizerFast

            from ..utils.spm_convert import ensure_fast_tokenizer

            fast_path = ensure_fast_tokenizer(name)
            if fast_path is None:
                raise RuntimeError(
                    f"could not convert {name!r}/spiece.model to a fast "
                    "tokenizer; see tools/export_tokenizer.py"
                ) from e
            self.tokenizer = PreTrainedTokenizerFast(
                tokenizer_file=str(fast_path),
                unk_token="<unk>", eos_token="</s>", pad_token="<pad>",
            )
        self.seq_len = seq_len
        self.clean = clean

    def _clean(self, text: str) -> str:
        if self.clean == "whitespace":
            import re

            return re.sub(r"\s+", " ", text).strip()
        return text

    def __call__(self, texts: List[str], return_mask: bool = True):
        texts = [self._clean(t) for t in texts]
        out = self.tokenizer(
            texts,
            padding="max_length",
            truncation=True,
            max_length=self.seq_len,
            return_tensors="np",
            add_special_tokens=True,
        )
        ids = jnp.asarray(out["input_ids"], jnp.int32)
        mask = jnp.asarray(out["attention_mask"], jnp.int32)
        return (ids, mask) if return_mask else ids


class T5EncoderModel:
    """Tokenize + encode; returns per-text [len_i, dim] arrays stripped to
    true lengths (reference t5.py:505-512)."""

    def __init__(
        self,
        params,
        cfg: T5Config,
        tokenizer: Optional[HuggingfaceTokenizer] = None,
        tokenizer_path: Optional[str] = None,
    ):
        self.params = params
        self.cfg = cfg
        if tokenizer is None and tokenizer_path:
            tokenizer = HuggingfaceTokenizer(tokenizer_path, seq_len=cfg.text_len)
        self.tokenizer = tokenizer
        self._encode = jax.jit(lambda p, ids, mask: t5_encode(p, cfg, ids, mask))

    def __call__(self, texts: List[str]):
        assert self.tokenizer is not None, "no tokenizer configured"
        ids, mask = self.tokenizer(texts, return_mask=True)
        ctx = self._encode(self.params, ids, mask)
        lens = np.asarray(mask.sum(axis=1))
        return [ctx[i, : int(lens[i])] for i in range(len(texts))]
