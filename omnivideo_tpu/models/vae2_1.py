"""Wan2.1 causal 3D VAE (8×8 spatial / 4× temporal, z_dim 16), TPU-native.

Functionally equivalent to the reference
`omnivideo/modules/vae2_1.py` (CausalConv3d with left-only temporal padding,
RMS channel norm, single-head spatial attention in the bottleneck, streaming
chunked encode in 1+4k-frame chunks and per-latent-frame streaming decode with
a per-conv `feat_cache`), re-designed for XLA:

- the reference's *mutable* `feat_cache`/`feat_idx` dict threading
  (vae2_1.py:100-159,317-365) becomes an explicit, statically-shaped cache
  pytree: each temporal conv carries its last `k_t−1` input frames; the
  stride-2 downsample time conv carries 1 frame;
- streaming runs as `lax.scan` over chunks with the cache pytree as carry; the
  first chunk (which the reference special-cases: 'Rep' markers skip the
  up/down temporal convs, vae2_1.py:103-136) is peeled out of the scan so
  every scanned step has identical shapes;
- convs use `lax.conv_general_dilated` in NCDHW/OIDHW (torch weight layout —
  checkpoints load without transposition); nearest-exact ×2 upsampling is an
  exact `jnp.repeat`;
- compute in float32 (matching the reference's fp32 autocast); a bf16 path is
  available via the `dtype` argument for throughput.

Note the reference's non-streaming path silently skips temporal resampling
(vae2_1.py:102,142 gate on `feat_cache is not None`), so streaming *is* the
semantics; we implement only it.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import VAEConfig

CACHE_T = 2  # frames carried per k_t=3 causal conv (vae2_1.py:13)

# latent channel statistics (vae2_1.py:628-638)
WAN21_LATENT_MEAN = np.array(
    [
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
        0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
    ],
    dtype=np.float32,
)
WAN21_LATENT_STD = np.array(
    [
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
    ],
    dtype=np.float32,
)


# ---------------------------------------------------------------------------
# structural plan — shared by builder, apply, and checkpoint converter
# ---------------------------------------------------------------------------


def encoder_plan(cfg: VAEConfig) -> List[Tuple[str, int, int]]:
    """Ordered (kind, in_dim, out_dim) for encoder.downsamples (vae2_1.py:289-305)."""
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    plan: List[Tuple[str, int, int]] = []
    scale = 1.0
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", din, dout))
            if scale in cfg.attn_scales:
                plan.append(("attn", dout, dout))
            din = dout
        if i != len(cfg.dim_mult) - 1:
            kind = "down3d" if cfg.temperal_downsample[i] else "down2d"
            plan.append((kind, dout, dout))
            scale /= 2.0
    return plan


def decoder_plan(cfg: VAEConfig) -> List[Tuple[str, int, int]]:
    """Ordered (kind, in_dim, out_dim) for decoder.upsamples (vae2_1.py:398-415)."""
    mult = tuple(cfg.dim_mult)
    dims = [cfg.dim * u for u in (mult[-1],) + tuple(reversed(mult))]
    plan: List[Tuple[str, int, int]] = []
    scale = 1.0 / 2 ** (len(mult) - 2)
    ups = cfg.temperal_upsample
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        if i in (1, 2, 3):
            din = din // 2  # previous upsample halved channels (vae2_1.py:402-403)
        for _ in range(cfg.num_res_blocks + 1):
            plan.append(("res", din, dout))
            if scale in cfg.attn_scales:
                plan.append(("attn", dout, dout))
            din = dout
        if i != len(mult) - 1:
            kind = "up3d" if ups[i] else "up2d"
            plan.append((kind, dout, dout // 2))
            scale *= 2.0
    return plan


# ---------------------------------------------------------------------------
# primitive layers (torch weight layouts)
# ---------------------------------------------------------------------------


def _conv3d(x, w, b, stride=(1, 1, 1), spatial_pad=(0, 0)):
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=[(0, 0), (spatial_pad[0], spatial_pad[0]), (spatial_pad[1], spatial_pad[1])],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return y + b.astype(x.dtype)[None, :, None, None, None]


def _conv2d(x, w, b, stride=(1, 1), padding=((1, 1), (1, 1))):
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=list(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b.astype(x.dtype)[None, :, None, None]


def causal_conv3d(p, x, cache, stride=(1, 1, 1)):
    """CausalConv3d streaming step (vae2_1.py:16-35).

    cache holds the last k_t−1 input frames from earlier chunks (zeros before
    the first chunk — identical to the reference's left zero-pad). Returns
    (y, new_cache). Temporal-kernel-1 convs carry no cache (pass None).
    """
    w, b = p["weight"], p["bias"]
    kt, kh, kw = w.shape[2], w.shape[3], w.shape[4]
    if kt == 1:
        return _conv3d(x, w, b, stride, (kh // 2, kw // 2)), None
    if cache is None:
        cache = jnp.zeros(x.shape[:2] + (kt - 1,) + x.shape[3:], x.dtype)
    xin = jnp.concatenate([cache, x], axis=2)
    y = _conv3d(xin, w, b, stride, (kh // 2, kw // 2))
    return y, xin[:, :, -(kt - 1):]


def vae_rms_norm(x, gamma):
    """RMS_norm (vae2_1.py:38-53): F.normalize along channels · sqrt(C) · gamma."""
    xf = x.astype(jnp.float32)
    l2 = jnp.sqrt(jnp.sum(jnp.square(xf), axis=1, keepdims=True))
    y = xf / jnp.maximum(l2, 1e-12) * math.sqrt(x.shape[1])
    g = gamma.astype(jnp.float32).reshape((1, -1) + (1,) * (x.ndim - 2))
    return (y * g).astype(x.dtype)


def res_block(p, x, cache):
    """ResidualBlock (vae2_1.py:185-219). cache: {'c1': s, 'c2': s}."""
    if "shortcut" in p:
        h, _ = causal_conv3d(p["shortcut"], x, None)
    else:
        h = x
    y = jax.nn.silu(vae_rms_norm(x, p["norm1"]))
    y, c1 = causal_conv3d(p["conv1"], y, cache["c1"])
    y = jax.nn.silu(vae_rms_norm(y, p["norm2"]))
    y, c2 = causal_conv3d(p["conv2"], y, cache["c2"])
    return y + h, {"c1": c1, "c2": c2}


def attention_block(p, x):
    """Single-head per-frame spatial attention (vae2_1.py:222-261)."""
    B, C, T, H, W = x.shape
    y = vae_rms_norm(x, p["norm"])
    y = y.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    qkv = _conv2d(y, p["qkv_w"], p["qkv_b"], padding=((0, 0), (0, 0)))
    qkv = qkv.reshape(B * T, 3 * C, H * W).transpose(0, 2, 1)  # [bt, hw, 3c]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (C**-0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bij,bjc->bic", probs, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).transpose(0, 2, 1).reshape(B * T, C, H, W)
    o = _conv2d(o, p["proj_w"], p["proj_b"], padding=((0, 0), (0, 0)))
    o = o.reshape(B, T, C, H, W).transpose(0, 2, 1, 3, 4)
    return x + o


def _spatial(fn, x):
    B, C, T, H, W = x.shape
    y = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    y = fn(y)
    C2, H2, W2 = y.shape[1:]
    return y.reshape(B, T, C2, H2, W2).transpose(0, 2, 1, 3, 4)


def downsample(p, x, cache, kind: str, first: bool):
    """Resample down2d/down3d (vae2_1.py:86-95,142-158)."""
    # spatial: ZeroPad2d(right+bottom 1) then 3x3 stride-2 conv
    x = _spatial(
        lambda y: _conv2d(y, p["conv_w"], p["conv_b"], stride=(2, 2), padding=((0, 1), (0, 1))),
        x,
    )
    if kind == "down2d":
        return x, cache
    if first:
        # first chunk: no temporal conv; cache the last frame (vae2_1.py:145-147)
        return x, x[:, :, -1:]
    xin = jnp.concatenate([cache, x], axis=2)
    y = _conv3d(xin, p["time_w"], p["time_b"], stride=(2, 1, 1))  # valid temporal conv
    return y, x[:, :, -1:]


def upsample(p, x, cache, kind: str, first: bool):
    """Resample up2d/up3d (vae2_1.py:75-84,100-136)."""
    if kind == "up3d" and not first:
        # temporal 2x: conv to 2C over [cache(2), x], interleave to 2T
        B, C, T, H, W = x.shape
        xin = jnp.concatenate([cache, x], axis=2)
        y = _conv3d(xin, p["time_w"], p["time_b"])  # valid temporal conv
        y = y.reshape(B, 2, C, T, H, W)
        y = jnp.stack([y[:, 0], y[:, 1]], axis=3).reshape(B, C, 2 * T, H, W)
        new_cache = xin[:, :, -CACHE_T:]
        x = y
    elif kind == "up3d":
        # first chunk: skip temporal conv entirely ('Rep', vae2_1.py:105-107,
        # 126-127): the next chunk's conv is zero-padded — chunk 0's frames
        # never enter the time conv, so the carried state is pure zeros.
        new_cache = jnp.zeros(x.shape[:2] + (CACHE_T,) + x.shape[3:], x.dtype)
    else:
        new_cache = cache

    # spatial: nearest-exact 2x then 3x3 conv to C//2
    def up2x(y):
        y = jnp.repeat(jnp.repeat(y, 2, axis=2), 2, axis=3)
        return _conv2d(y, p["conv_w"], p["conv_b"])

    x = _spatial(up2x, x)
    return x, new_cache


# ---------------------------------------------------------------------------
# encoder / decoder chunk applications
# ---------------------------------------------------------------------------


def _head_apply(p, x, cache):
    y = jax.nn.silu(vae_rms_norm(x, p["norm"]))
    y, c = causal_conv3d(p["conv"], y, cache)
    return y, c


def encoder_chunk(params, cfg: VAEConfig, x, cache, first: bool):
    """One streaming encoder step over a 1- or 4-frame pixel chunk
    (reference Encoder3d.forward, vae2_1.py:317-365)."""
    enc = params["encoder"]
    new_cache: Dict[str, Any] = {}
    x, new_cache["conv1"] = causal_conv3d(enc["conv1"], x, cache["conv1"])

    for i, (kind, _, _) in enumerate(encoder_plan(cfg)):
        key = f"d{i}"
        p = enc["down"][key]
        if kind == "res":
            x, new_cache[key] = res_block(p, x, cache[key])
        elif kind == "attn":
            x = attention_block(p, x)
        else:
            x, new_cache[key] = downsample(p, x, cache[key], kind, first)

    x, new_cache["mid0"] = res_block(enc["mid0"], x, cache["mid0"])
    x = attention_block(enc["mid_attn"], x)
    x, new_cache["mid1"] = res_block(enc["mid1"], x, cache["mid1"])
    x, new_cache["head"] = _head_apply(enc["head"], x, cache["head"])
    return x, new_cache


def decoder_chunk(params, cfg: VAEConfig, z, cache, first: bool):
    """One streaming decoder step over a single latent frame
    (reference Decoder3d.forward, vae2_1.py:422-471)."""
    dec = params["decoder"]
    new_cache: Dict[str, Any] = {}
    x, new_cache["conv1"] = causal_conv3d(dec["conv1"], z, cache["conv1"])

    x, new_cache["mid0"] = res_block(dec["mid0"], x, cache["mid0"])
    x = attention_block(dec["mid_attn"], x)
    x, new_cache["mid1"] = res_block(dec["mid1"], x, cache["mid1"])

    for i, (kind, _, _) in enumerate(decoder_plan(cfg)):
        key = f"u{i}"
        p = dec["up"][key]
        if kind == "res":
            x, new_cache[key] = res_block(p, x, cache[key])
        elif kind == "attn":
            x = attention_block(p, x)
        else:
            x, new_cache[key] = upsample(p, x, cache[key], kind, first)

    x, new_cache["head"] = _head_apply(dec["head"], x, cache["head"])
    return x, new_cache


def _zero_cache_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


# ---------------------------------------------------------------------------
# public encode / decode (streaming via peel + lax.scan)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 4), static_argnames=("dtype",))
def vae_encode(
    params,
    cfg: VAEConfig,
    videos: jnp.ndarray,
    scale: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Encode [B, 3, T, H, W] (T = 1+4k) → normalized latents [B, z, t, h, w].

    Streaming in 1+4k chunks (reference WanVAE_.encode, vae2_1.py:515-541);
    returns the mean channelwise-normalized with (mean, 1/std) `scale`.
    """
    x = videos.astype(dtype)
    T = x.shape[2]
    assert (T - 1) % 4 == 0, "frame count must be 4n+1"
    n_chunks = (T - 1) // 4

    # peel chunk 0 (1 frame) — builds the cache pytree with zero init
    cache0 = _init_encoder_cache(params, cfg, x[:, :, :1])
    z0, cache = encoder_chunk(params, cfg, x[:, :, :1], cache0, first=True)

    if n_chunks:
        rest = x[:, :, 1:]
        B, C, _, H, W = rest.shape
        chunks = rest.reshape(B, C, n_chunks, 4, H, W).transpose(2, 0, 1, 3, 4, 5)

        def body(carry, chunk):
            z, new_cache = encoder_chunk(params, cfg, chunk, carry, first=False)
            return new_cache, z

        _, zs = jax.lax.scan(body, cache, chunks)
        # zs: [n, B, 2z, 1, h, w] → fold the chunk axis into time
        zs = zs.transpose(1, 2, 0, 3, 4, 5).reshape(
            z0.shape[0], z0.shape[1], -1, z0.shape[3], z0.shape[4]
        )
        out = jnp.concatenate([z0, zs], axis=2)
    else:
        out = z0

    # WanVAE_.conv1 (1x1) then take mu (vae2_1.py:534-539)
    out, _ = causal_conv3d(params["conv1"], out, None)
    mu = out[:, : cfg.z_dim]
    if scale is not None:
        mean, inv_std = scale
        mu = (mu - mean.reshape(1, -1, 1, 1, 1)) * inv_std.reshape(1, -1, 1, 1, 1)
    return mu.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 4), static_argnames=("dtype",))
def vae_decode(
    params,
    cfg: VAEConfig,
    z: jnp.ndarray,
    scale: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Decode latents [B, z, t, h, w] → video [B, 3, 1+4(t−1), H, W], clamped
    to [-1, 1] (reference WanVAE_.decode, vae2_1.py:543-567).

    Jitted WHOLE: run eagerly, the chunk scan + transpose/concat staging
    materializes every intermediate and the 480p·81f decode exceeds HBM
    (measured: the jitted form fits with >8 GB to spare, the eager form
    OOMs in a fresh process); under jit XLA plans and frees buffers."""
    z = z.astype(dtype)
    if scale is not None:
        mean, inv_std = scale
        z = z / inv_std.reshape(1, -1, 1, 1, 1) + mean.reshape(1, -1, 1, 1, 1)
    x, _ = causal_conv3d(params["conv2"], z, None)

    cache0 = _init_decoder_cache(params, cfg, x[:, :, :1])
    y0, cache = decoder_chunk(params, cfg, x[:, :, :1], cache0, first=True)

    t_lat = x.shape[2]
    if t_lat > 1:
        frames = x[:, :, 1:].transpose(2, 0, 1, 3, 4)[:, :, :, None]  # [n,B,C,1,h,w]

        def body(carry, zf):
            y, new_cache = decoder_chunk(params, cfg, zf, carry, first=False)
            return new_cache, y

        _, ys = jax.lax.scan(body, cache, frames)
        # ys: [n, B, 3, 4·2^k?, H, W] — fixed per-chunk frame count
        ys = ys.transpose(1, 2, 0, 3, 4, 5).reshape(
            y0.shape[0], y0.shape[1], -1, y0.shape[3], y0.shape[4]
        )
        out = jnp.concatenate([y0, ys], axis=2)
    else:
        out = y0

    return jnp.clip(out.astype(jnp.float32), -1.0, 1.0)


# ---------------------------------------------------------------------------
# cache initialization: run shape inference by building zeros alongside params
# ---------------------------------------------------------------------------


def _init_encoder_cache(params, cfg: VAEConfig, x):
    B, _, _, H, W = x.shape
    dt = x.dtype
    cache: Dict[str, Any] = {}
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    cache["conv1"] = jnp.zeros((B, 3, CACHE_T, H, W), dt)
    h, w = H, W
    cur = dims[0]
    for i, (kind, din, dout) in enumerate(encoder_plan(cfg)):
        key = f"d{i}"
        if kind == "res":
            cache[key] = {
                "c1": jnp.zeros((B, din, CACHE_T, h, w), dt),
                "c2": jnp.zeros((B, dout, CACHE_T, h, w), dt),
            }
            cur = dout
        elif kind == "attn":
            cache[key] = {}
        else:
            h, w = h // 2, w // 2
            if kind == "down3d":
                cache[key] = jnp.zeros((B, dout, 1, h, w), dt)
            else:
                cache[key] = jnp.zeros((0,), dt)  # placeholder leaf
    d = dims[-1]
    cache["mid0"] = {
        "c1": jnp.zeros((B, d, CACHE_T, h, w), dt),
        "c2": jnp.zeros((B, d, CACHE_T, h, w), dt),
    }
    cache["mid1"] = dict(cache["mid0"])
    cache["head"] = jnp.zeros((B, d, CACHE_T, h, w), dt)
    return cache


def _init_decoder_cache(params, cfg: VAEConfig, z):
    B, _, _, h, w = z.shape
    dt = z.dtype
    mult = tuple(cfg.dim_mult)
    d0 = cfg.dim * mult[-1]
    cache: Dict[str, Any] = {}
    cache["conv1"] = jnp.zeros((B, cfg.z_dim, CACHE_T, h, w), dt)
    cache["mid0"] = {
        "c1": jnp.zeros((B, d0, CACHE_T, h, w), dt),
        "c2": jnp.zeros((B, d0, CACHE_T, h, w), dt),
    }
    cache["mid1"] = dict(cache["mid0"])
    t_mult = 1  # temporal frames per latent frame at the current level
    for i, (kind, din, dout) in enumerate(decoder_plan(cfg)):
        key = f"u{i}"
        if kind == "res":
            cache[key] = {
                "c1": jnp.zeros((B, din, CACHE_T, h, w), dt),
                "c2": jnp.zeros((B, dout, CACHE_T, h, w), dt),
            }
        elif kind == "attn":
            cache[key] = {}
        else:
            if kind == "up3d":
                cache[key] = jnp.zeros((B, dout * 2, CACHE_T, h, w), dt)
                t_mult *= 2
            else:
                cache[key] = jnp.zeros((0,), dt)
            h, w = h * 2, w * 2
    dlast = cfg.dim
    cache["head"] = jnp.zeros((B, dlast, CACHE_T, h, w), dt)
    return cache


# ---------------------------------------------------------------------------
# parameter initialization / conversion
# ---------------------------------------------------------------------------


def _conv_param(key, cin, cout, k3, scale=0.05):
    kk = jax.random.split(key, 1)[0]
    return {
        "weight": jax.random.normal(kk, (cout, cin) + k3, jnp.float32) * scale,
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def init_vae(key: jax.Array, cfg: VAEConfig):
    """Random init (for tests / from-scratch training)."""
    keys = iter(jax.random.split(key, 256))

    def res_p(din, dout):
        p = {
            "norm1": jnp.ones((din,), jnp.float32),
            "conv1": _conv_param(next(keys), din, dout, (3, 3, 3)),
            "norm2": jnp.ones((dout,), jnp.float32),
            "conv2": _conv_param(next(keys), dout, dout, (3, 3, 3)),
        }
        if din != dout:
            p["shortcut"] = _conv_param(next(keys), din, dout, (1, 1, 1))
        return p

    def attn_p(d):
        return {
            "norm": jnp.ones((d,), jnp.float32),
            "qkv_w": jax.random.normal(next(keys), (3 * d, d, 1, 1), jnp.float32) * 0.05,
            "qkv_b": jnp.zeros((3 * d,), jnp.float32),
            "proj_w": jnp.zeros((d, d, 1, 1), jnp.float32),
            "proj_b": jnp.zeros((d,), jnp.float32),
        }

    def resample_p(kind, d, dout):
        p = {}
        if kind in ("down2d", "down3d"):
            c = _conv_param(next(keys), d, d, (3, 3))
            p["conv_w"], p["conv_b"] = c["weight"], c["bias"]
            if kind == "down3d":
                c = _conv_param(next(keys), d, d, (3, 1, 1))
                p["time_w"], p["time_b"] = c["weight"], c["bias"]
        else:
            c = _conv_param(next(keys), d, d // 2, (3, 3))
            p["conv_w"], p["conv_b"] = c["weight"], c["bias"]
            if kind == "up3d":
                c = _conv_param(next(keys), d, d * 2, (3, 1, 1))
                p["time_w"], p["time_b"] = c["weight"], c["bias"]
        return p

    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    d_top = dims[-1]
    enc = {
        "conv1": _conv_param(next(keys), 3, dims[0], (3, 3, 3)),
        "down": {},
        "mid0": res_p(d_top, d_top),
        "mid_attn": attn_p(d_top),
        "mid1": res_p(d_top, d_top),
        "head": {
            "norm": jnp.ones((d_top,), jnp.float32),
            "conv": _conv_param(next(keys), d_top, cfg.z_dim * 2, (3, 3, 3)),
        },
    }
    for i, (kind, din, dout) in enumerate(encoder_plan(cfg)):
        enc["down"][f"d{i}"] = (
            res_p(din, dout) if kind == "res"
            else attn_p(dout) if kind == "attn"
            else resample_p(kind, dout, dout)
        )

    dec = {
        "conv1": _conv_param(next(keys), cfg.z_dim, d_top, (3, 3, 3)),
        "mid0": res_p(d_top, d_top),
        "mid_attn": attn_p(d_top),
        "mid1": res_p(d_top, d_top),
        "head": {
            "norm": jnp.ones((cfg.dim,), jnp.float32),
            "conv": _conv_param(next(keys), cfg.dim, 3, (3, 3, 3)),
        },
        "up": {},
    }
    for i, (kind, din, dout) in enumerate(decoder_plan(cfg)):
        dec["up"][f"u{i}"] = (
            res_p(din, dout) if kind == "res"
            else attn_p(dout) if kind == "attn"
            else resample_p(kind, din, dout)
        )

    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _conv_param(next(keys), cfg.z_dim * 2, cfg.z_dim * 2, (1, 1, 1)),
        "conv2": _conv_param(next(keys), cfg.z_dim, cfg.z_dim, (1, 1, 1)),
    }


def vae_state_dict_to_params(sd, cfg: VAEConfig):
    """Reference state_dict (torch names, vae2_1.py module tree) → param pytree.

    Conv weights keep torch OIDHW/OIHW layouts (no transposition needed).
    """
    import numpy as np

    g = lambda k: np.asarray(sd[k])

    def conv(prefix):
        return {"weight": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")}

    def res(prefix, has_shortcut):
        p = {
            "norm1": g(f"{prefix}.residual.0.gamma").reshape(-1),
            "conv1": conv(f"{prefix}.residual.2"),
            "norm2": g(f"{prefix}.residual.3.gamma").reshape(-1),
            "conv2": conv(f"{prefix}.residual.6"),
        }
        if has_shortcut:
            p["shortcut"] = conv(f"{prefix}.shortcut")
        return p

    def attn(prefix):
        return {
            "norm": g(f"{prefix}.norm.gamma").reshape(-1),
            "qkv_w": g(f"{prefix}.to_qkv.weight"),
            "qkv_b": g(f"{prefix}.to_qkv.bias"),
            "proj_w": g(f"{prefix}.proj.weight"),
            "proj_b": g(f"{prefix}.proj.bias"),
        }

    def resample(prefix, kind):
        p = {}
        if kind in ("down2d", "down3d"):
            c = conv(f"{prefix}.resample.1")
        else:
            c = conv(f"{prefix}.resample.1")
        p["conv_w"], p["conv_b"] = c["weight"], c["bias"]
        if kind in ("down3d", "up3d"):
            t = conv(f"{prefix}.time_conv")
            p["time_w"], p["time_b"] = t["weight"], t["bias"]
        return p

    enc = {
        "conv1": conv("encoder.conv1"),
        "down": {},
        "mid0": res("encoder.middle.0", False),
        "mid_attn": attn("encoder.middle.1"),
        "mid1": res("encoder.middle.2", False),
        "head": {
            "norm": g("encoder.head.0.gamma").reshape(-1),
            "conv": conv("encoder.head.2"),
        },
    }
    for i, (kind, din, dout) in enumerate(encoder_plan(cfg)):
        pref = f"encoder.downsamples.{i}"
        enc["down"][f"d{i}"] = (
            res(pref, din != dout) if kind == "res"
            else attn(pref) if kind == "attn"
            else resample(pref, kind)
        )

    dec = {
        "conv1": conv("decoder.conv1"),
        "mid0": res("decoder.middle.0", False),
        "mid_attn": attn("decoder.middle.1"),
        "mid1": res("decoder.middle.2", False),
        "head": {
            "norm": g("decoder.head.0.gamma").reshape(-1),
            "conv": conv("decoder.head.2"),
        },
        "up": {},
    }
    for i, (kind, din, dout) in enumerate(decoder_plan(cfg)):
        pref = f"decoder.upsamples.{i}"
        dec["up"][f"u{i}"] = (
            res(pref, din != dout) if kind == "res"
            else attn(pref) if kind == "attn"
            else resample(pref, kind)
        )

    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": conv("conv1"),
        "conv2": conv("conv2"),
    }


@dataclasses.dataclass(frozen=True)
class Wan21VAE:
    """Convenience wrapper bundling params + channel stats
    (role of reference Wan2_1_VAE, vae2_1.py:618-663)."""

    params: Any
    cfg: VAEConfig
    mean: jnp.ndarray
    inv_std: jnp.ndarray

    @staticmethod
    def create(params, cfg: VAEConfig) -> "Wan21VAE":
        return Wan21VAE(
            params=params,
            cfg=cfg,
            mean=jnp.asarray(WAN21_LATENT_MEAN[: cfg.z_dim]),
            inv_std=jnp.asarray(1.0 / WAN21_LATENT_STD[: cfg.z_dim]),
        )

    def encode(self, videos: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        return vae_encode(self.params, self.cfg, videos, (self.mean, self.inv_std), dtype)

    def decode(self, z: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        return vae_decode(self.params, self.cfg, z, (self.mean, self.inv_std), dtype)
