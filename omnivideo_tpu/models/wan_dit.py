"""Wan video diffusion transformer (DiT backbone), TPU-native.

Functionally equivalent to the reference `WanModel`
(`omnivideo/modules/model.py:293-573`): Conv3d patchify, per-token time
embedding, 6-way AdaLN modulation per block, 3D-factorized RoPE, self-attn +
cross-attn + GELU-tanh FFN, 2-way modulated head, einsum unpatchify — but
re-designed for XLA/TPU:

- pure functional: params are an explicit pytree; blocks are *stacked* along a
  leading layer axis and executed with `lax.scan` (fast compiles, natural
  `jax.checkpoint` rematerialization, clean fsdp sharding of the stacked
  leaves);
- patchify/unpatchify are reshape+matmul (a stride==kernel Conv3d is exactly
  that) so the embedding runs on the MXU as one large GEMM;
- the AdaLN tensors stay [B, T, 6, dim] f32 with T=1 for the (universal)
  scalar-timestep case and broadcast into the blocks, instead of the
  reference's materialized [B, L, 6, dim] fp32 tensor (model.py:467-476) —
  identical math, ~L× less HBM traffic;
- residual stream carried in f32, matmul inputs cast to the param dtype
  (bf16), norms/modulation in f32 — matching the reference's autocast
  behavior (model.py:237-257);
- RoPE uses precomputed f32 cos/sin tables (TPUs have no fp64; numerics
  validated in tests against an fp64 oracle).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import WanDiTConfig
from ..ops import tuning
from ..ops.attention import attention
from ..ops.fused_adaln import fused_adaln
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import apply_rope, rope_3d_tables

# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def _linear(key, d_in, d_out, init="xavier", std=0.02, zero=False):
    kk, _ = jax.random.split(key)
    if zero:
        kernel = jnp.zeros((d_in, d_out), jnp.float32)
    elif init == "normal":
        kernel = jax.random.normal(kk, (d_in, d_out), jnp.float32) * std
    else:
        kernel = _xavier_uniform(kk, (d_in, d_out))
    return {"kernel": kernel, "bias": jnp.zeros((d_out,), jnp.float32)}


def init_wan_dit(key: jax.Array, cfg: WanDiTConfig, dtype=jnp.bfloat16,
                 with_blocks: bool = True):
    """Initialize parameters (Xavier linears, normal-0.02 embeddings, zero head
    — reference model.py:551-573). Returned leaves are cast to `dtype` except
    modulation tables, norms, and the head, which stay f32 (reference keeps
    modulation math in fp32).

    with_blocks=False skips the stacked block params — the resident
    (embed/head) subset used by the layer-streaming executor, whose block
    stack lives in host memory (pipelines/streaming.py)."""
    d, fd, td = cfg.dim, cfg.ffn_dim, cfg.text_dim
    keys = iter(jax.random.split(key, 16))
    in_patch = cfg.in_dim * int(np.prod(cfg.patch_size))

    params = {
        "patch_embedding": _linear(next(keys), in_patch, d),
        "text_embedding": {
            "fc1": _linear(next(keys), td, d, init="normal"),
            "fc2": _linear(next(keys), d, d, init="normal"),
        },
        "time_embedding": {
            "fc1": _linear(next(keys), cfg.freq_dim, d, init="normal"),
            "fc2": _linear(next(keys), d, d, init="normal"),
        },
        "time_projection": _linear(next(keys), d, 6 * d),
        "head": {
            "head": _linear(next(keys), d, int(np.prod(cfg.patch_size)) * cfg.out_dim, zero=True),
            "modulation": jax.random.normal(next(keys), (2, d), jnp.float32) / d**0.5,
        },
    }

    if with_blocks:
        bkeys = jax.random.split(next(keys), cfg.num_layers)
        params["blocks"] = jax.vmap(lambda k: _init_block_f32(k, cfg))(bkeys)

    return cast_wan_params(params, dtype)


def _init_block_f32(bkey, cfg: WanDiTConfig):
    """One WanAttentionBlock's parameters, f32 (pre-cast)."""
    d, fd = cfg.dim, cfg.ffn_dim
    ks = iter(jax.random.split(bkey, 12))
    blk = {
            "modulation": jax.random.normal(next(ks), (6, d), jnp.float32) / d**0.5,
            "self_attn": {
                "q": _linear(next(ks), d, d),
                "k": _linear(next(ks), d, d),
                "v": _linear(next(ks), d, d),
                "o": _linear(next(ks), d, d),
                "norm_q": jnp.ones((d,), jnp.float32),
                "norm_k": jnp.ones((d,), jnp.float32),
            },
            "cross_attn": {
                "q": _linear(next(ks), d, d),
                "k": _linear(next(ks), d, d),
                "v": _linear(next(ks), d, d),
                "o": _linear(next(ks), d, d),
                "norm_q": jnp.ones((d,), jnp.float32),
                "norm_k": jnp.ones((d,), jnp.float32),
            },
            "ffn": {
                "fc1": _linear(next(ks), d, fd),
                "fc2": _linear(next(ks), fd, d),
            },
        }
    if cfg.cross_attn_norm:
        blk["norm3"] = {
            "scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32),
        }
    return blk


def init_wan_block(key: jax.Array, cfg: WanDiTConfig, dtype=jnp.bfloat16):
    """Single-block init (for per-block benchmarking of models too large to
    materialize whole — e.g. one A14B block is ~0.6 GB bf16 and fits a chip
    the full 40-layer model does not)."""
    return cast_wan_params(_init_block_f32(key, cfg), dtype)


def cast_wan_params(params, dtype):
    """Cast matmul weights to `dtype`; keep modulation/norm/head leaves f32."""

    def cast(path, leaf):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        if "modulation" in name or "norm" in name or name.startswith("head"):
            return leaf.astype(jnp.float32)
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _dense(p, x, dtype=None):
    w = p["kernel"]
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    y = x @ w
    if "lora_a" in p:  # LoRA adapter delta (training/lora.py); B=0 at init
        a = p["lora_a"].astype(x.dtype)
        b = p["lora_b"].astype(x.dtype)
        y = y + (((x @ a) @ b) * p["lora_scale"]).astype(y.dtype)
    return y + p["bias"].astype(y.dtype)


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """cat([cos, sin]) sinusoid (reference model.py:13-23), f32."""
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(
        jnp.float32(10000.0), -jnp.arange(half, dtype=jnp.float32) / half
    )
    sinusoid = pos[..., None] * freqs
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)


def patchify(x: jnp.ndarray, patch_size: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, C, F, H, W] → [B, L, C·pt·ph·pw] with conv-compatible (c,i,j,k) order."""
    B, C, F, H, W = x.shape
    pt, ph, pw = patch_size
    f, h, w = F // pt, H // ph, W // pw
    x = x.reshape(B, C, f, pt, h, ph, w, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # [B, f, h, w, C, pt, ph, pw]
    return x.reshape(B, f * h * w, C * pt * ph * pw)


def unpatchify(
    x: jnp.ndarray, grid: Tuple[int, int, int], patch_size: Tuple[int, int, int], out_dim: int
) -> jnp.ndarray:
    """[B, L, pt·ph·pw·c] → [B, c, F, H, W] (reference einsum 'fhwpqrc->cfphqwr',
    model.py:526-549)."""
    B = x.shape[0]
    f, h, w = grid
    pt, ph, pw = patch_size
    x = x[:, : f * h * w].reshape(B, f, h, w, pt, ph, pw, out_dim)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # [B, c, f, pt, h, ph, w, pw]
    return x.reshape(B, out_dim, f * pt, h * ph, w * pw)


@dataclasses.dataclass(frozen=True)
class SPConfig:
    """Sequence-parallel configuration for the DiT forward.

    Replaces the reference's monkey-patched sequence-parallel forwards
    (full_sequence_parallel.py:63-232, installed via types.MethodType at
    x2x_gen_unified.py:171-182) with a declarative option: one forward,
    sharding chosen by config.

    mode: 'ulysses' (all_to_all head-scatter, C14), 'ring' (ppermute K/V
    rotation, P11), 'hybrid' (2-D Ulysses×ring, P10), or 'tp' (head-sharded
    attention over the 'tensor' axis — keeps the Pallas flash kernel usable
    under tensor parallelism, where GSPMD alone would force the XLA path).
    """

    mesh: Any
    mode: str = "ulysses"
    seq_axis: str = "seq"
    ulysses_axis: str = "fsdp"  # inner axis for hybrid
    ring_impl: str = "ppermute"  # "ppermute" (differentiable) | "pallas" (fused RDMA, fwd-only)
    tp_axis: str = "tensor"

    @property
    def sp_size(self) -> int:
        if self.mode == "tp":
            return 1  # tp shards heads, not sequence
        n = self.mesh.shape[self.seq_axis]
        if self.mode == "hybrid":
            n *= self.mesh.shape[self.ulysses_axis]
        return n


class WanAuxInputs(NamedTuple):
    """Per-call tensors shared by every block."""

    e0: jnp.ndarray  # [B, T, 6, dim] f32 AdaLN input (T=1 or L)
    context: jnp.ndarray  # [B, Lc, dim] embedded context (param dtype)
    rope_cos: jnp.ndarray  # [Lr, head_dim//2] f32
    rope_sin: jnp.ndarray
    kv_lens: Optional[jnp.ndarray]  # [B] valid self-attn kv length or None
    sp: Optional[SPConfig] = None


def wan_block_apply(
    bp,
    x: jnp.ndarray,
    aux: WanAuxInputs,
    cfg: WanDiTConfig,
    attn_impl: str = "auto",
    ew_impl: str = "xla",
    qk_impl: str = "xla",
) -> jnp.ndarray:
    """One WanAttentionBlock (reference model.py:182-258). x: [B, L, dim] f32.

    qk_impl="pallas" fuses the attention prologue (rms-norm + gain + rope +
    bounded-softmax row-norm bound) into one HBM pass per q/k tensor
    (ops/pallas/qk_prep.py) and dispatches through the non-differentiable
    flash_attention_infer — INFERENCE ONLY; training keeps the default
    "xla" chain. "pallas_interpret" runs the same kernels emulated on CPU
    (CI). "auto" on either impl resolves to the measured winner for this
    width from the persisted tuning table (ops/tuning.py, rewritten by
    tools/dev/bench_a14b_ab.py --write-tuned)."""
    B, L, d = x.shape
    N, hd = cfg.num_heads, cfg.head_dim
    ew_impl = tuning.resolve_impl("ew_impl", ew_impl, d, jax.default_backend())
    qk_impl = tuning.resolve_impl("qk_impl", qk_impl, d, jax.default_backend())
    pdtype = bp["self_attn"]["q"]["kernel"].dtype
    fuse_qk = (qk_impl in ("pallas", "pallas_interpret") and aux.sp is None
               and cfg.qk_norm and hd % 128 == 0 and N <= 128
               and attn_impl in ("auto", "pallas", "pallas_interpret"))
    if fuse_qk:
        from ..ops.pallas.flash_attention import flash_attention_infer
        from ..ops.pallas.qk_prep import qk_prep

        _interp = qk_impl == "pallas_interpret"
        _fa_kw = dict(block_q=128, block_k=128) if _interp else {}

        def _fused_attn(q_raw, gq, rope_q, k_raw, gk, rope_k, v, kv_lens):
            cq = (aux.rope_cos, aux.rope_sin) if rope_q else (None, None)
            ck = (aux.rope_cos, aux.rope_sin) if rope_k else (None, None)
            q, qn = qk_prep(q_raw, gq, cq[0], cq[1], N, cfg.eps,
                            interpret=_interp)
            k, kn = qk_prep(k_raw, gk, ck[0], ck[1], N, cfg.eps,
                            interpret=_interp)
            v = v.reshape(v.shape[0], v.shape[1], N, hd)
            return flash_attention_infer(
                q, k, v, kv_lens=kv_lens, assume_normalized=True,
                qk_row_norms=(qn, kn), interpret=_interp, **_fa_kw)

    # residual STORAGE dtype = x's dtype: f32 (reference parity — torch
    # promotion keeps the reference's stream f32, model.py:245-246) or bf16
    # (opt-in bandwidth mode via wan_dit_apply(residual_dtype=...): residual
    # adds still compute in f32, but the [B,L,dim] stream the norms re-read
    # moves at half the HBM bytes)
    rdt = x.dtype
    # AdaLN: (modulation + e0).chunk(6) in f32 (model.py:236-239)
    e = bp["modulation"].astype(jnp.float32)[None, None] + aux.e0  # [B,T,6,d]
    e1, e2, e3, e4, e5, e6 = [e[:, :, i] for i in range(6)]
    # fused residual+LN+modulate sandwich (one HBM pass) — scalar-timestep
    # path only; per-token modulation (T=L) keeps the broadcast XLA form
    fused = (ew_impl != "xla" and e.shape[1] == 1 and d % 128 == 0
             and rdt == jnp.float32)

    # --- self attention -------------------------------------------------
    if fused:
        _, y = fused_adaln(
            x, None, None, None, None, e2[:, 0], e1[:, 0],
            cfg.eps, pdtype, ew_impl,
        )
    else:
        xn = layer_norm(x, cfg.eps, out_f32=True)
        y = (xn * (1.0 + e2) + e1).astype(pdtype)
    sa = bp["self_attn"]
    sp = aux.sp
    if not fuse_qk:
        q = rms_norm(_dense(sa["q"], y), sa["norm_q"], cfg.eps).reshape(B, L, N, hd)
        k = rms_norm(_dense(sa["k"], y), sa["norm_k"], cfg.eps).reshape(B, L, N, hd)
        v = _dense(sa["v"], y).reshape(B, L, N, hd)
        q = apply_rope(q, aux.rope_cos, aux.rope_sin)
        k = apply_rope(k, aux.rope_cos, aux.rope_sin)
    if fuse_qk:
        o = _fused_attn(_dense(sa["q"], y), sa["norm_q"], True,
                        _dense(sa["k"], y), sa["norm_k"], True,
                        _dense(sa["v"], y), aux.kv_lens)
    elif sp is None:
        # qk_norm bounds q/k row norms → bounded-softmax flash fast path
        o = attention(q, k, v, kv_lens=aux.kv_lens, impl=attn_impl,
                      assume_normalized=cfg.qk_norm)
    elif sp.mode == "tp":
        from ..parallel.tp import tp_head_attention

        o = tp_head_attention(q, k, v, sp.mesh, axis=sp.tp_axis,
                              kv_lens=aux.kv_lens, impl=attn_impl,
                              assume_normalized=cfg.qk_norm)
    elif sp.mode == "ulysses":
        from ..parallel.ulysses import ulysses_attention

        # comm_dtype=pdtype: SP collectives ride ICI at the param precision
        # (bf16 production = half the wire bytes; f32 CPU-parity paths are
        # bit-identical no-ops). Reference flash-attn is half precision
        # anyway (attention.py:24), so this matches its numerics class.
        o = ulysses_attention(
            q, k, v, sp.mesh, axis=sp.seq_axis, kv_lens=aux.kv_lens,
            impl=attn_impl, assume_normalized=cfg.qk_norm, comm_dtype=pdtype
        )
    elif sp.mode == "ring":
        from ..parallel.ring import ring_attention

        o = ring_attention(q, k, v, sp.mesh, axis=sp.seq_axis,
                           impl=getattr(sp, "ring_impl", "ppermute"),
                           kv_lens=aux.kv_lens, comm_dtype=pdtype)
    elif sp.mode == "hybrid":
        from ..parallel.ring import hybrid_attention

        o = hybrid_attention(
            q, k, v, sp.mesh, ulysses_axis=sp.ulysses_axis,
            ring_axis=sp.seq_axis, kv_lens=aux.kv_lens, comm_dtype=pdtype
        )
    else:
        raise ValueError(sp.mode)
    o = o.reshape(B, L, d)
    o = _dense(sa["o"], o)
    # --- cross attention --------------------------------------------------
    if fused and cfg.cross_attn_norm:
        # f32 residual (model.py:245-246) + norm3, one pass; normed output
        # emitted directly in the param dtype (the only consumer is the
        # cross-attn q projection)
        x, xq = fused_adaln(
            x, o, e3[:, 0], bp["norm3"]["scale"], bp["norm3"]["bias"],
            None, None, cfg.eps, pdtype, ew_impl,
        )
    else:
        # f32-computed residual (model.py:245-246), stored at rdt
        x = (x.astype(jnp.float32) + o.astype(jnp.float32) * e3).astype(rdt)
        if cfg.cross_attn_norm:
            xn = layer_norm(
                x, cfg.eps, scale=bp["norm3"]["scale"], bias=bp["norm3"]["bias"]
            )
        else:
            xn = x
    ca = bp["cross_attn"]
    ctx = aux.context
    if sp is not None and sp.mode == "tp":
        from ..parallel.tp import tp_head_attention

        def _xattn(q, k, v):
            return tp_head_attention(q, k, v, sp.mesh, axis=sp.tp_axis,
                                     impl=attn_impl,
                                     assume_normalized=cfg.qk_norm)
    else:
        def _xattn(q, k, v):
            # context_lens=None in reference (model.py:479): attend over
            # the full padded ctx
            return attention(q, k, v, kv_lens=None, impl=attn_impl,
                             assume_normalized=cfg.qk_norm)
    if not (fused and cfg.cross_attn_norm):
        xq = xn.astype(pdtype)
    if fuse_qk and "k_img" not in ca:
        # cross-attention: rms-norm + gain fused (no rope on either side);
        # attends over the full padded ctx (reference context_lens=None,
        # model.py:479)
        o = _fused_attn(_dense(ca["q"], xq), ca["norm_q"], False,
                        _dense(ca["k"], ctx), ca["norm_k"], False,
                        _dense(ca["v"], ctx), None).reshape(B, L, d)
        o = _dense(ca["o"], o)
    else:
        o = _cross_attn_unfused(ca, xq, ctx, cfg, _xattn, B, L, N, hd, d)

    # --- ffn ---------------------------------------------------------------
    if fused:
        x, y = fused_adaln(
            x, o, None, None, None, e5[:, 0], e4[:, 0],
            cfg.eps, pdtype, ew_impl,
        )
    else:
        x = (x.astype(jnp.float32) + o.astype(jnp.float32)).astype(rdt)
        xn = layer_norm(x, cfg.eps, out_f32=True)
        y = (xn * (1.0 + e5) + e4).astype(pdtype)
    y = _dense(bp["ffn"]["fc2"], _gelu_tanh(_dense(bp["ffn"]["fc1"], y)))
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e6).astype(rdt)
    return x


def _cross_attn_unfused(ca, xq, ctx, cfg, _xattn, B, L, N, hd, d):
    """Cross-attention through the unfused rms-norm chain (reference
    model.py:185-226): plain, and the i2v k_img variant."""
    q = rms_norm(_dense(ca["q"], xq), ca["norm_q"], cfg.eps).reshape(B, L, N, hd)
    if "k_img" in ca:
        # i2v cross-attention (v1 wan model.py:185-226): first 257 context
        # tokens are CLIP image features with separate K/V; outputs sum
        ctx_img, ctx_txt = ctx[:, :257], ctx[:, 257:]
        Li, Lt = ctx_img.shape[1], ctx_txt.shape[1]
        kk = rms_norm(_dense(ca["k"], ctx_txt), ca["norm_k"], cfg.eps).reshape(B, Lt, N, hd)
        vv = _dense(ca["v"], ctx_txt).reshape(B, Lt, N, hd)
        ki = rms_norm(_dense(ca["k_img"], ctx_img), ca["norm_k_img"], cfg.eps).reshape(B, Li, N, hd)
        vi = _dense(ca["v_img"], ctx_img).reshape(B, Li, N, hd)
        o = _xattn(q, kk, vv).reshape(B, L, d)
        o = o + _xattn(q, ki, vi).reshape(B, L, d)
    else:
        Lc = ctx.shape[1]
        kk = rms_norm(_dense(ca["k"], ctx), ca["norm_k"], cfg.eps).reshape(B, Lc, N, hd)
        vv = _dense(ca["v"], ctx).reshape(B, Lc, N, hd)
        o = _xattn(q, kk, vv).reshape(B, L, d)
    return _dense(ca["o"], o)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def mlp_proj_apply(p, x):
    """MLPProj (v1 wan model.py:347-360): LN → Linear → GELU → Linear → LN."""
    h = layer_norm(x, 1e-5, scale=p["ln1"]["scale"], bias=p["ln1"]["bias"])
    h = _dense(p["fc1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = _dense(p["fc2"], h)
    return layer_norm(h, 1e-5, scale=p["ln2"]["scale"], bias=p["ln2"]["bias"])


def embed_context(params, cfg: WanDiTConfig, context: jnp.ndarray) -> jnp.ndarray:
    """text_embedding MLP over (zero-padded) context (model.py:479-485).

    context: [B, Lc, text_dim], already padded to the target context length —
    the reference pads with zeros to text_len and attends over the embedded
    padding (context_lens=None), which we reproduce exactly.
    """
    te = params["text_embedding"]
    pdtype = te["fc1"]["kernel"].dtype
    h = _dense(te["fc1"], context.astype(pdtype))
    return _dense(te["fc2"], _gelu_tanh(h))


def time_embeddings(params, cfg: WanDiTConfig, t: jnp.ndarray):
    """e: [B, T, dim] f32; e0: [B, T, 6, dim] f32 (model.py:467-476).

    t: [B] (scalar per sample → T=1, broadcast later) or [B, L] per-token.
    """
    if t.ndim == 1:
        t = t[:, None]  # T = 1
    B, T = t.shape
    emb = sinusoidal_embedding_1d(cfg.freq_dim, t)  # [B, T, freq_dim] f32
    te = params["time_embedding"]
    e = _dense(te["fc2"], jax.nn.silu(_dense(te["fc1"], emb, dtype=jnp.float32)), dtype=jnp.float32)
    e0 = _dense(params["time_projection"], jax.nn.silu(e), dtype=jnp.float32)
    return e, e0.reshape(B, T, 6, cfg.dim)


def wan_dit_apply(
    params,
    cfg: WanDiTConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    *,
    seq_len: Optional[int] = None,
    context_embedded: bool = False,
    attn_impl: str = "auto",
    remat: bool = False,
    mesh=None,
    sp: Optional[SPConfig] = None,
    y: Optional[jnp.ndarray] = None,
    clip_fea: Optional[jnp.ndarray] = None,
    carry_dtype=None,
    residual_dtype=None,
    ew_impl: str = "xla",
    qk_impl: str = "xla",
) -> jnp.ndarray:
    """Full DiT forward (reference model.py:417-524).

    Args:
      x: [B, C_in, F, H, W] noisy latents.
      t: [B] (or [B, L]) diffusion timesteps.
      context: [B, Lc, text_dim] conditioning (or [B, Lc, dim] if
        `context_embedded`); pad to the model's context budget beforehand.
      seq_len: pad video tokens to this length (for sp-divisibility); defaults
        to the natural token count.
      y: optional conditional video input for image-to-video mode, channel-
        concatenated with x (reference model.py:451-452; i2v in_dim doubles).
      ew_impl: elementwise (AdaLN sandwich) implementation: "xla" (default —
        measured fastest on v5e, see the note below) or "pallas" (the fused
        ops/fused_adaln.py kernel, opt-in for shapes where the balance may
        differ). An explicit argument — callers that expose the knob (e.g.
        tools/dev/bench_adaln_ab.py) read any env var ONCE at their own
        layer; the forward itself is referentially transparent.
    Returns:
      [B, C_out, F, H, W] predicted velocity, f32.
    """
    if y is not None:
        x = jnp.concatenate([x, y], axis=1)
    B = x.shape[0]
    pt, ph, pw = cfg.patch_size
    grid = (x.shape[2] // pt, x.shape[3] // ph, x.shape[4] // pw)
    L_nat = grid[0] * grid[1] * grid[2]
    L = seq_len if seq_len is not None else L_nat
    assert L >= L_nat, (L, L_nat)

    pdtype = params["patch_embedding"]["kernel"].dtype
    tokens = patchify(x.astype(pdtype), cfg.patch_size)  # [B, L_nat, ...]
    h = _dense(params["patch_embedding"], tokens)
    if L > L_nat:
        h = jnp.pad(h, ((0, 0), (0, L - L_nat), (0, 0)))
    if mesh is not None:
        from ..parallel.sharding import seq_constraint

        h = seq_constraint(h, mesh)
    kv_lens = jnp.full((B,), L_nat, jnp.int32) if L > L_nat else None

    e, e0 = time_embeddings(params, cfg, t)
    if mesh is not None:
        # Anchor the tiny AdaLN tensors to batch-only sharding: without this,
        # GSPMD propagation flips their layout between fsdp/seq tilings inside
        # the block scan ("Involuntary full rematerialization" warnings).
        from jax.sharding import NamedSharding, PartitionSpec as _P

        repl = lambda a: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, _P("data", *([None] * (a.ndim - 1))))
        )
        e, e0 = repl(e), repl(e0)

    if not context_embedded:
        context = embed_context(params, cfg, context)
    if clip_fea is not None:
        # i2v: MLPProj'd CLIP tokens prepended to the text context
        # (v1 wan model.py: context = cat([img_emb(clip_fea), context]))
        img_ctx = mlp_proj_apply(params["img_emb"], clip_fea)
        context = jnp.concatenate([img_ctx.astype(context.dtype), context], axis=1)
    context = context.astype(pdtype)

    if sp is not None:
        assert L % sp.sp_size == 0, (
            f"seq_len {L} not divisible by sp_size {sp.sp_size}; round it up "
            "(reference x2x_gen_unified.py:332-334)"
        )
    cos, sin = rope_3d_tables(grid, cfg.head_dim, cfg.rope_max_seq_len, cfg.rope_theta)
    # The fused Pallas sandwich (ops/fused_adaln.py) measured ~0.6% SLOWER
    # than XLA's own elementwise fusion in-DiT on v5e (tools/dev/
    # bench_adaln_ab.py: 3.949 vs 3.972 s/step at 480p·81f, invariant to the
    # 256/512/1024 row-tile sweep) — XLA recomputes the residual add into
    # both layernorm passes instead of materializing x_new, which beats the
    # kernel's extra f32 stream write. ew_impl="pallas" is opt-in; forced to
    # "xla" under mesh/sp (Pallas is opaque to GSPMD sharding propagation).
    if mesh is not None or sp is not None:
        ew_impl = "xla"
        qk_impl = "xla"  # the fused prologue path is single-device-only
    else:
        # "auto" = the measured winner for this model width from the
        # persisted tuning table (ops/tuning.py; performance-only, value-
        # parity asserted by the A/B drivers). The table is read once per
        # process, so identical calls always resolve identically.
        ew_impl = tuning.resolve_impl("ew_impl", ew_impl, cfg.dim,
                                      jax.default_backend())
        qk_impl = tuning.resolve_impl("qk_impl", qk_impl, cfg.dim,
                                      jax.default_backend())
    aux = WanAuxInputs(
        e0=e0, context=context, rope_cos=cos, rope_sin=sin, kv_lens=kv_lens, sp=sp
    )

    block_fn = lambda bp, xx: wan_block_apply(bp, xx, aux, cfg, attn_impl,
                                              ew_impl, qk_impl)
    if residual_dtype is not None and residual_dtype != jnp.float32:
        # bandwidth mode: the [B,L,dim] residual STREAM inside every block
        # is stored at residual_dtype (adds/norms still compute f32 — see
        # wan_block_apply rdt). Distinct from carry_dtype, which upcasts at
        # block entry and only shrinks the scan carry / remat checkpoints
        # without touching in-block traffic. Opt-in: the reference's stream
        # is f32 (torch promotion, model.py:245-246), so parity runs f32.
        assert carry_dtype in (None, residual_dtype), (carry_dtype,
                                                       residual_dtype)
        hf = h.astype(residual_dtype)
        if remat:
            block_fn = jax.checkpoint(block_fn)
        hf, _ = jax.lax.scan(lambda xx, bp: (block_fn(bp, xx), None), hf,
                             params["blocks"])
        hf = hf.astype(jnp.float32)
        return _wan_head(params, cfg, hf, e, ew_impl, grid)
    cdt = carry_dtype if carry_dtype is not None else jnp.float32
    if cdt != jnp.float32:
        # cast INSIDE the (possibly rematerialized) block so the scan carry —
        # and the 30 per-block checkpoints the backward saves — live in cdt;
        # all in-block math still upcasts to f32 (memory knob, not a
        # precision knob: halves the 30·[B,L,dim] f32 checkpoint stack that
        # dominates single-chip training HBM at 480p — see TrainConfig)
        inner_fn = block_fn
        block_fn = lambda bp, xx: inner_fn(bp, xx.astype(jnp.float32)).astype(cdt)
    if remat:
        block_fn = jax.checkpoint(block_fn)

    def scan_body(xx, bp):
        return block_fn(bp, xx), None

    hf = h.astype(cdt)
    hf, _ = jax.lax.scan(scan_body, hf, params["blocks"])
    hf = hf.astype(jnp.float32)
    return _wan_head(params, cfg, hf, e, ew_impl, grid)


def _wan_head(params, cfg: WanDiTConfig, hf, e, ew_impl, grid):
    """Output head (reference model.py:261-290): 2-way modulation with e
    (not e0), f32, then unpatchify."""
    hp = params["head"]
    eh = hp["modulation"].astype(jnp.float32)[None, None] + e[:, :, None]  # [B,T,2,d]
    if ew_impl != "xla" and eh.shape[1] == 1 and cfg.dim % 128 == 0:
        _, y = fused_adaln(
            hf, None, None, None, None, eh[:, 0, 1], eh[:, 0, 0],
            cfg.eps, jnp.float32, ew_impl,
        )
    else:
        xn = layer_norm(hf, cfg.eps, out_f32=True)
        y = xn * (1.0 + eh[:, :, 1]) + eh[:, :, 0]
    out = _dense(hp["head"], y, dtype=jnp.float32)

    return unpatchify(out, grid, cfg.patch_size, cfg.out_dim)
