"""Qwen3 text decoder (dense and MoE) in JAX — the language side of Qwen3-VL.

TPU-native rebuild of the reference's VLM stage backbone (the reference runs
Qwen3-VL-30B-A3B through HF transformers, `omnivideo/vllm_model.py:24-103`):

- GQA attention with per-head Q/K RMSNorm and rotate-half RoPE;
- SwiGLU MLP; MoE layers (softmax router, top-k, optional prob renorm) —
  computed as a dense one-hot-weighted mixture (exact; a sorted/ragged
  grouped-GEMM kernel is the scale-up path);
- prefill: one full causal forward (used for feature extraction — the
  conditioning path needs `hidden_states[-1]`, vllm_model.py:381-399);
- decode: greedy loop under `lax.scan` with a static-shape KV cache
  (captioning path).

Weights convert from HF Qwen3/Qwen3Moe state dicts (hf_to_params).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Qwen3TextConfig:
    vocab_size: int = 151936
    hidden_size: int = 2048
    intermediate_size: int = 6144
    num_hidden_layers: int = 28
    num_attention_heads: int = 32
    num_key_value_heads: int = 4
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    # MoE (None → dense)
    num_experts: Optional[int] = None
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 768
    norm_topk_prob: bool = True
    moe_impl: str = "ragged"  # "ragged" | "megablox" (TPU Pallas) | "dense"
    # causal-prefill attention: "auto" (flash kernel on TPU, dense
    # elsewhere), "flash", "flash_interpret" (CPU tests), "dense". The
    # dense-softmax form materializes [B, N, L, L] f32 logits (2.1 GB at
    # L=4096) — the flash kernel never does and skips above-diagonal blocks.
    attn_impl: str = "auto"


def _flash_mode(impl: str):
    """→ (use_flash, interpret) for the causal-prefill dispatch."""
    if impl == "dense":
        return False, False
    if impl == "flash":
        return True, False
    if impl == "flash_interpret":
        return True, True
    return jax.default_backend() == "tpu", False  # auto


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


def _rope(x, pos, theta):
    """rotate-half RoPE. x: [B, L, N, D]; pos: [B, L]."""
    D = x.shape[-1]
    inv = 1.0 / (theta ** (np.arange(0, D, 2) / D))
    ang = pos[..., None].astype(jnp.float32) * jnp.asarray(inv, jnp.float32)
    cos = jnp.cos(ang)[:, :, None, :]  # [B, L, 1, D/2]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., : D // 2], x[..., D // 2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    ).astype(x.dtype)


def _lin(p, name, x):
    """Bare-kernel matmul with optional LoRA sibling keys
    ``{name}_lora_a/_lora_b/_lora_scale`` (training/lora.py::
    inject_lora_bare); the delta x@A@B*scale is zero until trained."""
    y = x @ p[name]
    a = p.get(name + "_lora_a")
    if a is not None:
        y = y + (((x @ a) @ p[name + "_lora_b"])
                 * p[name + "_lora_scale"]).astype(y.dtype)
    return y


def _mlp(p, x):
    g = jax.nn.silu(_lin(p, "gate", x))
    return _lin(p, "down", g * _lin(p, "up", x))


def _router(p, xt, cfg: Qwen3TextConfig):
    """softmax router → top-k (HF Qwen3MoeSparseMoeBlock semantics)."""
    logits = (xt @ p["gate"]).astype(jnp.float32)  # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, -1, keepdims=True)
    return topv, topi, probs


def _moe_dense(p, x, cfg: Qwen3TextConfig):
    """Exact dense-mixture MoE oracle: every expert for every token, one-hot
    combine. O(E·T·D·M) — reference semantics, used for parity checks."""
    B, L, D = x.shape
    xt = x.reshape(B * L, D)
    topv, topi, probs = _router(p, xt, cfg)
    # dense combine weights [T, E]
    w = jax.vmap(lambda wi, ii, vv: wi.at[ii].set(vv))(
        jnp.zeros_like(probs), topi, topv
    )
    # expert outputs: [E, T, D]
    g = jnp.einsum("td,edm->etm", xt, p["experts"]["gate"])
    u = jnp.einsum("td,edm->etm", xt, p["experts"]["up"])
    o = jnp.einsum("etm,emd->etd", jax.nn.silu(g) * u, p["experts"]["down"])
    y = jnp.einsum("te,etd->td", w.astype(o.dtype), o)
    return y.reshape(B, L, D)


def _grouped_matmul(xs, w, group_sizes, impl: str):
    """[S, D] × [E, D, M] with expert-contiguous rows → [S, M]."""
    if impl == "megablox":
        # Pallas grouped-GEMM kernel (per-expert MXU tiles, no padding waste)
        import jax.experimental.pallas.ops.tpu.megablox as mb

        return mb.gmm(xs, w, group_sizes, preferred_element_type=xs.dtype)
    return jax.lax.ragged_dot(xs, w, group_sizes)


def _moe(p, x, cfg: Qwen3TextConfig):
    """Grouped-GEMM MoE: sort (token, expert) pairs by expert, run per-expert
    contiguous GEMMs (MXU tiled, static shapes), scatter-add back.
    O(k·T·D·M) — E/k× fewer FLOPs than the dense mixture (16× for
    Qwen3-VL-30B-A3B's 128-expert/top-8 FFNs, vllm_model.py:30-31).

    cfg.moe_impl: "ragged" (jax.lax.ragged_dot, portable) or "megablox"
    (Pallas TPU grouped-GEMM kernel); "dense" falls back to the exact
    all-experts oracle (_moe_dense)."""
    if cfg.moe_impl == "dense":
        return _moe_dense(p, x, cfg)
    B, L, D = x.shape
    xt = x.reshape(B * L, D)
    T = xt.shape[0]
    k = cfg.num_experts_per_tok
    E = p["experts"]["gate"].shape[0]

    topv, topi, _ = _router(p, xt, cfg)

    flat_e = topi.reshape(T * k)  # expert id per (token, slot) pair
    flat_w = topv.reshape(T * k)
    order = jnp.argsort(flat_e)  # stable sort: pairs grouped by expert
    tok_of = order // k  # originating token per sorted row
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    xs = xt[tok_of]  # [T·k, D] gathered rows, expert-contiguous
    g = _grouped_matmul(xs, p["experts"]["gate"], group_sizes, cfg.moe_impl)
    u = _grouped_matmul(xs, p["experts"]["up"], group_sizes, cfg.moe_impl)
    o = _grouped_matmul(jax.nn.silu(g) * u, p["experts"]["down"], group_sizes,
                        cfg.moe_impl)
    o = o * flat_w[order][:, None].astype(o.dtype)
    y = jnp.zeros((T, D), o.dtype).at[tok_of].add(o)
    return y.reshape(B, L, D)


class KVCache(NamedTuple):
    k: jnp.ndarray  # [layers, B, max_len, kv_heads, head_dim]
    v: jnp.ndarray
    length: jnp.ndarray  # [] int32


def _attention(lp, x, pos, cfg, mask_bias, cache_kv=None):
    """Returns (out, (k_new, v_new)) — k/v for this call's tokens only.

    mask_bias=None means PURE token causality: eligible for the flash
    kernel (cfg.attn_impl), which never materializes the [B, N, L, L]
    logits. An explicit bias (padded batches, custom masks) or a KV cache
    (decode) takes the dense path."""
    B, L, D = x.shape
    N, K, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = _lin(lp, "q", x).reshape(B, L, N, hd)
    k = _lin(lp, "k", x).reshape(B, L, K, hd)
    v = _lin(lp, "v", x).reshape(B, L, K, hd)
    q = _rms(q, lp["q_norm"], cfg.rms_norm_eps)
    k = _rms(k, lp["k_norm"], cfg.rms_norm_eps)
    q = _rope(q, pos, cfg.rope_theta)
    k = _rope(k, pos, cfg.rope_theta)

    if cache_kv is not None:
        k_all, v_all = cache_kv  # [B, S, K, hd] including current positions
    else:
        k_all, v_all = k, v

    rep = N // K
    use_flash, interp = _flash_mode(cfg.attn_impl)
    if mask_bias is None and cache_kv is None and use_flash:
        from ...ops.pallas.flash_attention import flash_attention_infer

        o = flash_attention_infer(
            q, jnp.repeat(k, rep, axis=2), jnp.repeat(v, rep, axis=2),
            causal=True, interpret=interp)
        o = _lin(lp, "o", o.astype(x.dtype).reshape(B, L, N * hd))
        return o, (k, v)

    if mask_bias is None:  # dense fallback builds the causal bias itself
        tri = jnp.tril(jnp.ones((L, L), bool))[None, None]
        mask_bias = jnp.where(tri, 0.0, -3.4e38).astype(jnp.float32)

    k_r = jnp.repeat(k_all, rep, axis=2)
    v_r = jnp.repeat(v_all, rep, axis=2)
    logits = jnp.einsum(
        "bind,bjnd->bnij", q, k_r, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    logits = logits + mask_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v_r.dtype)
    o = jnp.einsum("bnij,bjnd->bind", probs, v_r, preferred_element_type=jnp.float32)
    o = _lin(lp, "o", o.astype(x.dtype).reshape(B, L, N * hd))
    return o, (k, v)


def _layer(lp, x, pos, cfg, mask_bias, cache_kv=None):
    h, kv = _attention(
        lp["attn"], _rms(x, lp["ln1"], cfg.rms_norm_eps), pos, cfg, mask_bias, cache_kv
    )
    x = x + h
    hn = _rms(x, lp["ln2"], cfg.rms_norm_eps)
    if "experts" in lp["mlp"]:
        x = x + _moe(lp["mlp"], hn, cfg)
    else:
        x = x + _mlp(lp["mlp"], hn)
    return x, kv


def qwen3_forward(
    params, cfg: Qwen3TextConfig, ids: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full causal forward. Returns (last_hidden [B,L,D], logits [B,L,V])."""
    B, L = ids.shape
    x = params["embed"][ids]
    pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    bias = None  # pure causal → flash-eligible (_attention)
    if attn_mask is not None:
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        bias = jnp.where(causal, 0.0, -3.4e38).astype(jnp.float32)
        bias = bias + jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -3.4e38)

    def body(xx, lp):
        y, _ = _layer(lp, xx, pos, cfg, bias)
        return y, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    hidden = _rms(x, params["norm"], cfg.rms_norm_eps)
    head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = hidden @ (head.T if cfg.tie_word_embeddings else head)
    return hidden, logits


def qwen3_greedy_decode(
    params,
    cfg: Qwen3TextConfig,
    prompt_ids: jnp.ndarray,
    max_new_tokens: int,
    eos_token_id: Optional[int] = None,
) -> jnp.ndarray:
    """Greedy decoding with a static KV cache in lax.scan.

    prompt_ids: [1, Lp]. Returns [1, max_new_tokens] (padded with eos after
    stop). Prefill populates the cache; decode appends one token per step.
    """
    B, Lp = prompt_ids.shape
    assert B == 1
    max_len = Lp + max_new_tokens
    N, K, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    nl = cfg.num_hidden_layers

    # ---- prefill (scan over stacked layers — no per-layer unroll) ---------
    x = params["embed"][prompt_ids]
    pos = jnp.arange(Lp)[None]

    def prefill_body(xx, lp):
        y, (k, v) = _layer(lp, xx, pos, cfg, None)  # pure causal → flash-ok
        return y, (k.astype(jnp.float32), v.astype(jnp.float32))

    x, (k_pref, v_pref) = jax.lax.scan(prefill_body, x, params["layers"])
    pad = ((0, 0), (0, 0), (0, max_len - Lp), (0, 0), (0, 0))
    k_cache = jnp.pad(k_pref, pad)  # [nl, B, max_len, K, hd]
    v_cache = jnp.pad(v_pref, pad)
    hidden = _rms(x[:, -1:], params["norm"], cfg.rms_norm_eps)
    head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = hidden @ (head.T if cfg.tie_word_embeddings else head)
    first_tok = jnp.argmax(logits[:, -1], -1)  # [1]

    # ---- decode scan (layers scanned, not unrolled: one compiled layer
    # body regardless of depth — 48-layer 30B decode compiles like 2-layer) --
    def step(carry, _):
        tok, length, kc, vc, done = carry
        x = params["embed"][tok[:, None]]
        pos = length[None, None]
        valid = jnp.arange(max_len)[None, None, None, :] < (length + 1)
        bias = jnp.where(valid, 0.0, -3.4e38).astype(jnp.float32)

        def layer_body(xx, layer_in):
            lp, kc_i, vc_i = layer_in
            h, (k1, v1) = _layer_cached(lp, xx, pos, cfg, bias, kc_i, vc_i, length)
            kc_i = jax.lax.dynamic_update_slice(
                kc_i, k1.astype(jnp.float32), (0, length, 0, 0))
            vc_i = jax.lax.dynamic_update_slice(
                vc_i, v1.astype(jnp.float32), (0, length, 0, 0))
            return h, (kc_i, vc_i)

        x, (kc, vc) = jax.lax.scan(layer_body, x, (params["layers"], kc, vc))
        hidden = _rms(x, params["norm"], cfg.rms_norm_eps)
        logits = hidden @ (head.T if cfg.tie_word_embeddings else head)
        nxt = jnp.argmax(logits[:, -1], -1)
        if eos_token_id is not None:
            done_now = jnp.logical_or(done, tok[0] == eos_token_id)
            nxt = jnp.where(done_now, jnp.full_like(nxt, eos_token_id), nxt)
        else:
            done_now = done
        return (nxt, length + 1, kc, vc, done_now), tok

    def _layer_cached(lp, x, pos, cfg_, bias, kc_i, vc_i, length):
        xn = _rms(x, lp["ln1"], cfg_.rms_norm_eps)
        B_, L_, D_ = xn.shape
        q = _lin(lp["attn"], "q", xn).reshape(B_, L_, N, hd)
        k = _lin(lp["attn"], "k", xn).reshape(B_, L_, K, hd)
        v = _lin(lp["attn"], "v", xn).reshape(B_, L_, K, hd)
        q = _rms(q, lp["attn"]["q_norm"], cfg_.rms_norm_eps)
        k = _rms(k, lp["attn"]["k_norm"], cfg_.rms_norm_eps)
        q = _rope(q, pos, cfg_.rope_theta)
        k = _rope(k, pos, cfg_.rope_theta)
        k_all = jax.lax.dynamic_update_slice(kc_i, k.astype(jnp.float32), (0, length, 0, 0))
        v_all = jax.lax.dynamic_update_slice(vc_i, v.astype(jnp.float32), (0, length, 0, 0))
        rep = N // K
        k_r = jnp.repeat(k_all, rep, axis=2).astype(q.dtype)
        v_r = jnp.repeat(v_all, rep, axis=2).astype(q.dtype)
        logits = jnp.einsum("bind,bjnd->bnij", q, k_r, preferred_element_type=jnp.float32) * (
            hd**-0.5
        )
        logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v_r.dtype)
        o = jnp.einsum("bnij,bjnd->bind", probs, v_r, preferred_element_type=jnp.float32)
        o = _lin(lp["attn"], "o", o.astype(x.dtype).reshape(B_, L_, N * hd))
        h = x + o
        hn = _rms(h, lp["ln2"], cfg_.rms_norm_eps)
        if "experts" in lp["mlp"]:
            h = h + _moe(lp["mlp"], hn, cfg_)
        else:
            h = h + _mlp(lp["mlp"], hn)
        return h, (k, v)

    init = (first_tok, jnp.asarray(Lp, jnp.int32), k_cache, v_cache, jnp.asarray(False))
    _, toks = jax.lax.scan(step, init, None, length=max_new_tokens)
    return toks.T  # [1, max_new_tokens]


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------


def abstract_params(cfg: Qwen3TextConfig, dtype=jnp.bfloat16):
    """ShapeDtypeStruct pytree matching `hf_to_params` output — for sharded
    compile checks of configs too large to materialize (30B-A3B exceeds one
    chip's HBM; reference serves it via vLLM GPU sharding,
    vllm_model.py:24-103)."""
    D, V, nl = cfg.hidden_size, cfg.vocab_size, cfg.num_hidden_layers
    N, K, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    s = lambda *shape: jax.ShapeDtypeStruct(shape, dtype)
    lp = {
        "ln1": s(nl, D),
        "ln2": s(nl, D),
        "attn": {
            "q": s(nl, D, N * hd), "k": s(nl, D, K * hd), "v": s(nl, D, K * hd),
            "o": s(nl, N * hd, D), "q_norm": s(nl, hd), "k_norm": s(nl, hd),
        },
    }
    if cfg.num_experts:
        E, M = cfg.num_experts, cfg.moe_intermediate_size
        lp["mlp"] = {
            "gate": s(nl, D, E),
            "experts": {"gate": s(nl, E, D, M), "up": s(nl, E, D, M),
                        "down": s(nl, E, M, D)},
        }
    else:
        M = cfg.intermediate_size
        lp["mlp"] = {"gate": s(nl, D, M), "up": s(nl, D, M), "down": s(nl, M, D)}
    params = {"embed": s(V, D), "layers": lp, "norm": s(D)}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = s(D, V)
    return params


def hf_to_params(sd: Dict[str, Any], cfg: Qwen3TextConfig):
    """HF Qwen3/Qwen3Moe state_dict (numpy) → pytree."""
    g = lambda k: np.asarray(sd[k])
    t = lambda k: np.ascontiguousarray(g(k).T)
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        lp = {
            "ln1": g(f"{p}.input_layernorm.weight"),
            "ln2": g(f"{p}.post_attention_layernorm.weight"),
            "attn": {
                "q": t(f"{p}.self_attn.q_proj.weight"),
                "k": t(f"{p}.self_attn.k_proj.weight"),
                "v": t(f"{p}.self_attn.v_proj.weight"),
                "o": t(f"{p}.self_attn.o_proj.weight"),
                "q_norm": g(f"{p}.self_attn.q_norm.weight"),
                "k_norm": g(f"{p}.self_attn.k_norm.weight"),
            },
        }
        if cfg.num_experts and f"{p}.mlp.gate.weight" in sd:
            E = cfg.num_experts
            lp["mlp"] = {
                "gate": t(f"{p}.mlp.gate.weight"),
                "experts": {
                    "gate": np.stack([t(f"{p}.mlp.experts.{e}.gate_proj.weight") for e in range(E)]),
                    "up": np.stack([t(f"{p}.mlp.experts.{e}.up_proj.weight") for e in range(E)]),
                    "down": np.stack([t(f"{p}.mlp.experts.{e}.down_proj.weight") for e in range(E)]),
                },
            }
        else:
            lp["mlp"] = {
                "gate": t(f"{p}.mlp.gate_proj.weight"),
                "up": t(f"{p}.mlp.up_proj.weight"),
                "down": t(f"{p}.mlp.down_proj.weight"),
            }
        layers.append(lp)
    params = {
        "embed": g("model.embed_tokens.weight"),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers),
        "norm": g("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = t("lm_head.weight")
    return jax.tree_util.tree_map(jnp.asarray, params)


def qwen3_forward_sp(
    params,
    cfg: Qwen3TextConfig,
    ids: jnp.ndarray,
    mesh,
    seq_axis: str = "seq",
    ulysses_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence-parallel causal forward: tokens sharded over `seq_axis`,
    attention via the differentiable token-causal ring
    (parallel/ring.py::ring_attention_local — role of the reference hybrid
    Ulysses×ring MLLM training stack, hybrid_attn.py:93-190). GQA K/V heads
    are expanded before the ring, like the reference _ExpandKVFunction
    (ulysses_attn.py:26). With `ulysses_axis` set this becomes the 2-D hybrid:
    tokens sharded over (ulysses × ring), heads scattered over the ulysses
    axis around the ring (SeqAllToAll4D, all_to_all.py:25). Returns GLOBAL
    (hidden, logits), sharded over L.
    """
    from jax.sharding import PartitionSpec as P

    from ...parallel.ring import ring_attention_local
    from ...parallel.ulysses import _a2a_gather_heads, _a2a_scatter_heads

    n = mesh.shape[seq_axis]
    nu = mesh.shape[ulysses_axis] if ulysses_axis else 1
    B, L = ids.shape
    assert L % (n * nu) == 0, (L, n, nu)
    N, K, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if ulysses_axis:
        assert N % nu == 0, (N, nu)

    def local(params, ids_l):
        Ll = ids_l.shape[1]
        i = jax.lax.axis_index(seq_axis)
        if ulysses_axis:
            # ring-major layout (reference use_ulysses_low: ring outer,
            # ulysses inner) so each ring rank holds one CONTIGUOUS
            # superblock after the head-scatter a2a gathers the sequence
            iu = jax.lax.axis_index(ulysses_axis)
            start = (i * nu + iu) * Ll
        else:
            start = i * Ll
        pos = jnp.broadcast_to(start + jnp.arange(Ll)[None], (B, Ll))
        x = params["embed"][ids_l]

        def body(xx, lp):
            hn = _rms(xx, lp["ln1"], cfg.rms_norm_eps)
            ap = lp["attn"]
            q = _lin(ap, "q", hn).reshape(B, Ll, N, hd)
            k = _lin(ap, "k", hn).reshape(B, Ll, K, hd)
            v = _lin(ap, "v", hn).reshape(B, Ll, K, hd)
            q = _rms(q, ap["q_norm"], cfg.rms_norm_eps)
            k = _rms(k, ap["k_norm"], cfg.rms_norm_eps)
            q = _rope(q, pos, cfg.rope_theta)
            k = _rope(k, pos, cfg.rope_theta)
            rep = N // K
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            if ulysses_axis:
                q = _a2a_scatter_heads(q, ulysses_axis)
                k = _a2a_scatter_heads(k, ulysses_axis)
                v = _a2a_scatter_heads(v, ulysses_axis)
            o = ring_attention_local(q, k, v, axis=seq_axis, causal="token")
            if ulysses_axis:
                o = _a2a_gather_heads(o, ulysses_axis)
            xx = xx + _lin(ap, "o", o.reshape(B, Ll, N * hd))
            hn2 = _rms(xx, lp["ln2"], cfg.rms_norm_eps)
            if "experts" in lp["mlp"]:
                xx = xx + _moe(lp["mlp"], hn2, cfg)
            else:
                xx = xx + _mlp(lp["mlp"], hn2)
            return xx, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        hidden = _rms(x, params["norm"], cfg.rms_norm_eps)
        head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
        logits = hidden @ (head.T if cfg.tie_word_embeddings else head)
        return hidden, logits

    shard = (seq_axis, ulysses_axis) if ulysses_axis else seq_axis
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, shard)),
        out_specs=(P(None, shard, None), P(None, shard, None)),
        check_vma=False,
    )
    return fn(params, ids)
