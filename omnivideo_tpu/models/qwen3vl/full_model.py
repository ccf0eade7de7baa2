"""Full Qwen3-VL multimodal forward in JAX (feature-extraction path).

Combines the vision tower (vision_model.py) with the text decoder under
Qwen3-VL's multimodal mechanics (HF Qwen3VLModel):

- visual tokens spliced into the text embedding stream at `<|video_pad|>` /
  `<|image_pad|>` positions;
- interleaved MRoPE: 3-D (t, h, w) position ids — text advances all three,
  vision segments use their grid coordinates with frame time encoded by
  interleaved timestamp text tokens (t is always a single step per segment) —
  with the frequency lanes interleaved [T H W T H W …] per mrope_section;
- "deepstack": intermediate vision features added to the hidden states at
  visual positions after each of the first K text layers.

This powers both VLM flows fully TPU-native: `extract_features`
(vllm_model.py:313-413 — last_hidden_state conditioning) via qwen3vl_forward,
and captioning via qwen3vl_greedy_decode (static KV cache in lax.scan;
decode-step MRoPE degenerates to standard RoPE since positions advance
uniformly). Both are token-/value-exact against HF.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .text_model import Qwen3TextConfig, _mlp, _moe, _rms
from .vision_model import Qwen3VLVisionConfig, vision_forward


@dataclasses.dataclass(frozen=True)
class Qwen3VLConfig:
    text: Qwen3TextConfig
    vision: Qwen3VLVisionConfig
    mrope_section: Tuple[int, int, int] = (24, 20, 20)
    video_token_id: int = 151656
    image_token_id: int = 151655
    vision_start_token_id: int = 151652


# ---------------------------------------------------------------------------
# 3-D position ids (host-side port of HF Qwen3VLModel.get_rope_index, batch 1)
# ---------------------------------------------------------------------------


def get_rope_index(
    input_ids: np.ndarray,
    grid_thw: Optional[np.ndarray],
    cfg: Qwen3VLConfig,
    is_video: bool = True,
) -> np.ndarray:
    """position_ids [3, L] for one sample. Video grids are split per frame
    with t=1 (temporal info rides on timestamp text tokens)."""
    ids = np.asarray(input_ids).reshape(-1)
    L = len(ids)
    if grid_thw is None:
        return np.broadcast_to(np.arange(L), (3, L)).copy()
    grids = np.asarray(grid_thw)
    if is_video:
        grids = np.repeat(grids, grids[:, 0], axis=0)
        grids = grids.copy()
        grids[:, 0] = 1
    m = cfg.vision.spatial_merge_size
    tok = cfg.video_token_id if is_video else cfg.image_token_id

    pos = []
    st = 0
    toks = ids.tolist()
    for g in grids:
        try:
            ed = toks.index(tok, st)
        except ValueError:
            break
        t, h, w = int(g[0]), int(g[1]) // m, int(g[2]) // m
        text_len = ed - st
        st_idx = pos[-1].max() + 1 if pos else 0
        pos.append(np.broadcast_to(np.arange(text_len), (3, text_len)) + st_idx)
        t_i = np.repeat(np.arange(t), h * w)
        h_i = np.tile(np.repeat(np.arange(h), w), t)
        w_i = np.tile(np.arange(w), t * h)
        st_idx = pos[-1].max() + 1 if pos and pos[-1].size else st_idx
        pos.append(np.stack([t_i, h_i, w_i]) + st_idx)
        st = ed + t * h * w
    if st < L:
        st_idx = pos[-1].max() + 1 if pos else 0
        rest = L - st
        pos.append(np.broadcast_to(np.arange(rest), (3, rest)) + st_idx)
    return np.concatenate(pos, axis=1)


def _mrope_cos_sin(position_ids: np.ndarray, cfg: Qwen3VLConfig):
    """Interleaved-MRoPE cos/sin [L, head_dim] (HF apply_interleaved_mrope)."""
    hd = cfg.text.head_dim
    theta = cfg.text.rope_theta
    inv = 1.0 / (theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))  # [hd/2]
    freqs3 = position_ids[:, :, None].astype(np.float64) * inv[None, None]  # [3, L, hd/2]
    out = freqs3[0].copy()
    for dim, offset in enumerate((1, 2), start=1):
        length = cfg.mrope_section[dim] * 3
        idx = slice(offset, length, 3)
        out[:, idx] = freqs3[dim][:, idx]
    emb = np.concatenate([out, out], axis=-1)  # [L, hd]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _text_layer_mrope(lp, x, cos, sin, cfg: Qwen3TextConfig, mask_bias):
    """mask_bias=None → pure token causality, flash-eligible (cfg.attn_impl
    — same dispatch as text_model._attention)."""
    from .text_model import _flash_mode

    B, L, D = x.shape
    N, K, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    hn = _rms(x, lp["ln1"], cfg.rms_norm_eps)
    q = (hn @ lp["attn"]["q"]).reshape(B, L, N, hd)
    k = (hn @ lp["attn"]["k"]).reshape(B, L, K, hd)
    v = (hn @ lp["attn"]["v"]).reshape(B, L, K, hd)
    q = _rms(q, lp["attn"]["q_norm"], cfg.rms_norm_eps)
    k = _rms(k, lp["attn"]["k_norm"], cfg.rms_norm_eps)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q = (qf * c + _rotate_half(qf) * s).astype(x.dtype)
    k = (kf * c + _rotate_half(kf) * s).astype(x.dtype)
    k = jnp.repeat(k, N // K, axis=2)
    v = jnp.repeat(v, N // K, axis=2)
    use_flash, interp = _flash_mode(cfg.attn_impl)
    if mask_bias is None and use_flash:
        from ...ops.pallas.flash_attention import flash_attention_infer

        o = flash_attention_infer(q, k, v, causal=True, interpret=interp)
        o = o.astype(x.dtype).reshape(B, L, N * hd) @ lp["attn"]["o"]
        x = x + o
        hn = _rms(x, lp["ln2"], cfg.rms_norm_eps)
        if "experts" in lp["mlp"]:
            x = x + _moe(lp["mlp"], hn, cfg)
        else:
            x = x + _mlp(lp["mlp"], hn)
        return x
    if mask_bias is None:
        tri = jnp.tril(jnp.ones((L, L), bool))[None, None]
        mask_bias = jnp.where(tri, 0.0, -3.4e38).astype(jnp.float32)
    logits = jnp.einsum("bind,bjnd->bnij", q, k, preferred_element_type=jnp.float32) * (
        hd**-0.5
    )
    probs = jax.nn.softmax(logits + mask_bias, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnij,bjnd->bind", probs, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).reshape(B, L, N * hd) @ lp["attn"]["o"]
    x = x + o
    hn = _rms(x, lp["ln2"], cfg.rms_norm_eps)
    if "experts" in lp["mlp"]:
        x = x + _moe(lp["mlp"], hn, cfg)
    else:
        x = x + _mlp(lp["mlp"], hn)
    return x


def qwen3vl_forward(
    params,
    cfg: Qwen3VLConfig,
    input_ids: np.ndarray,
    pixel_patches: Optional[jnp.ndarray] = None,
    grid_thw: Optional[Tuple[int, int, int]] = None,
    is_video: bool = True,
    final_norm: bool = False,
) -> jnp.ndarray:
    """Multimodal forward → last hidden state [1, L, D].

    Defaults to the PRE-final-norm hidden state: HF Qwen3VL's
    `hidden_states[-1]` — which is what the reference extracts as
    conditioning features (vllm_model.py:381-388) — is recorded before the
    final RMSNorm (unlike plain Qwen3). Set final_norm=True for the
    post-norm `last_hidden_state`.

    input_ids: [1, L] with `<|video_pad|>`/`<|image_pad|>` spans already
    expanded to grid token counts (as the HF processor emits); pixel_patches:
    [num_patches, C·tp·p·p]; grid_thw: static (t, h, w) patch grid.
    """
    ids = np.asarray(input_ids)
    tcfg = cfg.text
    x = params["text"]["embed"][jnp.asarray(ids)]

    visual_mask = None
    deepstack: List[jnp.ndarray] = []
    if pixel_patches is not None:
        grids = np.array([list(grid_thw)])
        tokens, deepstack = vision_forward(params["vision"], cfg.vision, pixel_patches, grid_thw)
        tok_id = cfg.video_token_id if is_video else cfg.image_token_id
        visual_mask = ids[0] == tok_id
        assert visual_mask.sum() == tokens.shape[0], (
            f"{visual_mask.sum()} placeholder tokens vs {tokens.shape[0]} visual tokens"
        )
        idx = jnp.asarray(np.nonzero(visual_mask)[0])
        x = x.at[0, idx].set(tokens.astype(x.dtype))
        pos = get_rope_index(ids, grids, cfg, is_video)
    else:
        pos = get_rope_index(ids, None, cfg)

    cos, sin = _mrope_cos_sin(pos, cfg)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    L = ids.shape[1]
    bias = None  # pure causal → flash-eligible (_text_layer_mrope)

    nl = tcfg.num_hidden_layers
    n_deep = len(deepstack)
    vis_idx = (
        jnp.asarray(np.nonzero(visual_mask)[0]) if visual_mask is not None else None
    )
    # deepstack features as scan inputs: zeros past the first K layers
    if vis_idx is not None and n_deep:
        ds_arr = jnp.stack(
            [deepstack[i] if i < n_deep else jnp.zeros_like(deepstack[0])
             for i in range(nl)]
        ).astype(x.dtype)
    else:
        ds_arr = jnp.zeros((nl, 1, x.shape[-1]), x.dtype)

    def body(xx, inp):
        lp, ds = inp
        y = _text_layer_mrope(lp, xx, cos, sin, tcfg, bias)
        if vis_idx is not None and n_deep:
            # add intermediate vision features at visual positions after each
            # of the first K layers (HF Qwen3VLTextModel.forward); ds is zero
            # for layers ≥ K so the add is exact
            y = y.at[0, vis_idx].add(ds)
        return y, None

    x, _ = jax.lax.scan(body, x, (params["text"]["layers"], ds_arr))
    if final_norm:
        x = _rms(x, params["text"]["norm"], tcfg.rms_norm_eps)
    return x


def qwen3vl_hf_to_params(sd, cfg: Qwen3VLConfig):
    """HF Qwen3VLForConditionalGeneration state_dict → {'vision', 'text'}."""
    from .text_model import hf_to_params
    from .vision_model import vision_hf_to_params

    vis_sd = {k[len("model.visual."):]: v for k, v in sd.items() if k.startswith("model.visual.")}
    txt_sd = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            txt_sd["model." + k[len("model.language_model."):]] = v
        elif k == "lm_head.weight":
            txt_sd[k] = v
    if "lm_head.weight" not in txt_sd:
        txt_sd["lm_head.weight"] = txt_sd["model.embed_tokens.weight"]
    return {
        "vision": vision_hf_to_params(vis_sd, cfg.vision),
        "text": hf_to_params(txt_sd, cfg.text),
    }


# ---------------------------------------------------------------------------
# multimodal greedy decoding (captioning path)
# ---------------------------------------------------------------------------


def _sample_token(logits, key, temperature: float, top_p: float):
    """Greedy (T=0) or top-p nucleus sampling. logits: [V]."""
    if temperature <= 0:
        return jnp.argmax(logits, -1)
    logits = logits / temperature
    sorted_logits = jnp.sort(logits)[::-1]
    probs = jax.nn.softmax(sorted_logits)
    cum = jnp.cumsum(probs)
    # keep the smallest set with cumulative prob ≥ top_p
    cutoff_idx = jnp.sum(cum < top_p)
    cutoff = sorted_logits[jnp.minimum(cutoff_idx, logits.shape[-1] - 1)]
    filtered = jnp.where(logits >= cutoff, logits, -1e30)
    return jax.random.categorical(key, filtered)


def qwen3vl_greedy_decode(
    params,
    cfg: Qwen3VLConfig,
    input_ids: np.ndarray,
    pixel_patches: Optional[jnp.ndarray] = None,
    grid_thw: Optional[Tuple[int, int, int]] = None,
    max_new_tokens: int = 128,
    eos_token_id: Optional[int] = None,
    is_video: bool = True,
    temperature: float = 0.0,
    top_p: float = 0.9,
    rng_seed: int = 0,
) -> np.ndarray:
    """Greedy caption decoding with a static KV cache (role of HF
    model.generate in vllm_model.py:189-203).

    Prefill runs the full multimodal forward caching post-RoPE K/V; decode
    positions advance uniformly on (t, h, w), for which interleaved MRoPE
    degenerates to standard RoPE — each step is one cached-attention layer
    pass inside lax.scan. Returns [max_new_tokens] (eos-padded after stop).
    """
    tcfg = cfg.text
    ids = np.asarray(input_ids)
    B, Lp = ids.shape
    assert B == 1
    N, K, hd = tcfg.num_attention_heads, tcfg.num_key_value_heads, tcfg.head_dim
    nl = tcfg.num_hidden_layers
    max_len = Lp + max_new_tokens

    # ---- prefill (mirrors qwen3vl_forward, additionally caching K/V) ------
    x = params["text"]["embed"][jnp.asarray(ids)]
    visual_mask = None
    deepstack: List[jnp.ndarray] = []
    if pixel_patches is not None:
        tokens, deepstack = vision_forward(params["vision"], cfg.vision, pixel_patches, grid_thw)
        tok_id = cfg.video_token_id if is_video else cfg.image_token_id
        visual_mask = ids[0] == tok_id
        idx = jnp.asarray(np.nonzero(visual_mask)[0])
        x = x.at[0, idx].set(tokens.astype(x.dtype))
        pos = get_rope_index(ids, np.array([list(grid_thw)]), cfg, is_video)
    else:
        pos = get_rope_index(ids, None, cfg)
    cos_np, sin_np = _mrope_cos_sin(pos, cfg)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    from .text_model import _flash_mode

    use_flash, interp = _flash_mode(tcfg.attn_impl)
    if not use_flash:
        causal = jnp.tril(jnp.ones((Lp, Lp), bool))[None, None]
        bias = jnp.where(causal, 0.0, -3.4e38).astype(jnp.float32)

    k_cache = jnp.zeros((nl, B, max_len, K, hd), jnp.float32)
    v_cache = jnp.zeros_like(k_cache)

    for i in range(nl):
        lp = jax.tree_util.tree_map(lambda a: a[i], params["text"]["layers"])
        # replicate _text_layer_mrope but capture k/v
        hn = _rms(x, lp["ln1"], tcfg.rms_norm_eps)
        q = (hn @ lp["attn"]["q"]).reshape(B, Lp, N, hd)
        k = (hn @ lp["attn"]["k"]).reshape(B, Lp, K, hd)
        v = (hn @ lp["attn"]["v"]).reshape(B, Lp, K, hd)
        q = _rms(q, lp["attn"]["q_norm"], tcfg.rms_norm_eps)
        k = _rms(k, lp["attn"]["k_norm"], tcfg.rms_norm_eps)
        c, s = cos[None, :, None, :], sin[None, :, None, :]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * c + _rotate_half(qf) * s).astype(x.dtype)
        k = (kf * c + _rotate_half(kf) * s).astype(x.dtype)
        k_cache = k_cache.at[i, :, :Lp].set(k.astype(jnp.float32))
        v_cache = v_cache.at[i, :, :Lp].set(v.astype(jnp.float32))
        kr = jnp.repeat(k, N // K, axis=2)
        vr = jnp.repeat(v, N // K, axis=2)
        if use_flash:
            from ...ops.pallas.flash_attention import flash_attention_infer

            o = flash_attention_infer(q, kr, vr, causal=True,
                                      interpret=interp)
        else:
            logits = jnp.einsum("bind,bjnd->bnij", q, kr, preferred_element_type=jnp.float32) * (hd**-0.5)
            probs = jax.nn.softmax(logits + bias, axis=-1).astype(vr.dtype)
            o = jnp.einsum("bnij,bjnd->bind", probs, vr, preferred_element_type=jnp.float32)
        x = x + (o.astype(x.dtype).reshape(B, Lp, N * hd) @ lp["attn"]["o"])
        hn = _rms(x, lp["ln2"], tcfg.rms_norm_eps)
        x = x + (_moe(lp["mlp"], hn, tcfg) if "experts" in lp["mlp"] else _mlp(lp["mlp"], hn))
        if visual_mask is not None and i < len(deepstack):
            idx = jnp.asarray(np.nonzero(visual_mask)[0])
            x = x.at[0, idx].add(deepstack[i].astype(x.dtype))

    hidden = _rms(x[:, -1:], params["text"]["norm"], tcfg.rms_norm_eps)
    head = params["text"].get("lm_head", params["text"]["embed"].T)
    rng = jax.random.PRNGKey(rng_seed)
    rng, k0 = jax.random.split(rng)
    first_tok = _sample_token((hidden @ head)[0, -1].astype(jnp.float32), k0,
                              temperature, top_p)[None]

    # decode positions: uniform (p, p, p) → standard 1D rope
    start_pos = int(pos.max()) + 1
    inv = 1.0 / (tcfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    inv = jnp.asarray(inv, jnp.float32)

    def step(carry, i):
        tok, length, kc, vc, done, rng = carry
        rng, kstep = jax.random.split(rng)
        xx = params["text"]["embed"][tok[:, None]]
        p = (start_pos + i).astype(jnp.float32)
        ang = p * inv
        c1 = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)])[None, None, None, :]
        s1 = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)])[None, None, None, :]
        valid = jnp.arange(max_len)[None, None, None, :] < (length + 1)
        bias_d = jnp.where(valid, 0.0, -3.4e38).astype(jnp.float32)

        # layers are scanned, not unrolled: one compiled layer body whatever
        # the depth (48-layer 30B decode compiles like the 2-layer test cfg)
        def layer_body(h_in, layer_in):
            lp, kc_i, vc_i = layer_in
            hn = _rms(h_in, lp["ln1"], tcfg.rms_norm_eps)
            q = (hn @ lp["attn"]["q"]).reshape(B, 1, N, hd)
            k = (hn @ lp["attn"]["k"]).reshape(B, 1, K, hd)
            v = (hn @ lp["attn"]["v"]).reshape(B, 1, K, hd)
            q = _rms(q, lp["attn"]["q_norm"], tcfg.rms_norm_eps)
            k = _rms(k, lp["attn"]["k_norm"], tcfg.rms_norm_eps)
            qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
            q = (qf * c1 + _rotate_half(qf) * s1).astype(h_in.dtype)
            k = (kf * c1 + _rotate_half(kf) * s1).astype(h_in.dtype)
            k_all = jax.lax.dynamic_update_slice(kc_i, k.astype(jnp.float32), (0, length, 0, 0))
            v_all = jax.lax.dynamic_update_slice(vc_i, v.astype(jnp.float32), (0, length, 0, 0))
            kr = jnp.repeat(k_all, N // K, axis=2).astype(q.dtype)
            vr = jnp.repeat(v_all, N // K, axis=2).astype(q.dtype)
            lo = jnp.einsum("bind,bjnd->bnij", q, kr, preferred_element_type=jnp.float32) * (hd**-0.5)
            pr = jax.nn.softmax(lo + bias_d, axis=-1).astype(vr.dtype)
            o = jnp.einsum("bnij,bjnd->bind", pr, vr, preferred_element_type=jnp.float32)
            h2 = h_in + (o.astype(h_in.dtype).reshape(B, 1, N * hd) @ lp["attn"]["o"])
            hn = _rms(h2, lp["ln2"], tcfg.rms_norm_eps)
            h2 = h2 + (_moe(lp["mlp"], hn, tcfg) if "experts" in lp["mlp"] else _mlp(lp["mlp"], hn))
            return h2, (k_all, v_all)

        xx, (kc, vc) = jax.lax.scan(
            layer_body, xx, (params["text"]["layers"], kc, vc))
        hid = _rms(xx, params["text"]["norm"], tcfg.rms_norm_eps)
        nxt = _sample_token((hid @ head)[0, -1].astype(jnp.float32), kstep,
                            temperature, top_p)[None]
        if eos_token_id is not None:
            done_now = jnp.logical_or(done, tok[0] == eos_token_id)
            nxt = jnp.where(done_now, jnp.full_like(nxt, eos_token_id), nxt)
        else:
            done_now = done
        return (nxt, length + 1, kc, vc, done_now, rng), tok

    init = (first_tok, jnp.asarray(Lp, jnp.int32), k_cache, v_cache,
            jnp.asarray(False), rng)
    _, toks = jax.lax.scan(step, init, jnp.arange(max_new_tokens))
    return np.asarray(toks.reshape(-1))
