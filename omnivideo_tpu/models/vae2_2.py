"""Wan2.2 causal 3D VAE (z_dim 48, pixel-patchified input), TPU-native.

Functionally equivalent to reference `omnivideo/modules/vae2_2.py`
(Wan2_2_VAE / WanVAE_): pixel patchify(2) before encode / unpatchify after
decode (vae2_2.py:279-312,784,836), residual down/up stages with parameter-
free AvgDown3D / DupUp3D shortcuts (vae2_2.py:315-509), asymmetric encoder
(dim=160) / decoder (dec_dim=256) widths (vae2_2.py:733-775), 48-channel
latent stats (vae2_2.py:899-987).

Streaming design matches models/vae2_1.py: `lax.scan` over chunks with
explicit conv-cache carries; first chunk peeled (the decoder's first_chunk
also trims DupUp3D's leading duplicated frames, vae2_2.py:396-399). The
shortcut paths are stateless per chunk (the reference computes them per chunk
with no feat_cache), so they carry nothing.

Reuses the 2.1 primitives (causal_conv3d, vae_rms_norm, res_block,
attention_block, spatial resampling).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import VAEConfig
from .vae2_1 import (
    CACHE_T,
    _conv2d,
    _conv3d,
    _spatial,
    attention_block,
    causal_conv3d,
    res_block,
    vae_rms_norm,
)

# 48-channel latent statistics (vae2_2.py:903-1009)
WAN22_LATENT_MEAN = np.array([
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
], dtype=np.float32)
WAN22_LATENT_STD = np.array([
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class VAE22Config:
    dim: int = 160  # encoder width (c_dim)
    dec_dim: int = 256  # decoder width
    z_dim: int = 48
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    patch_size: int = 2
    # net-level compression: temporal 4x, spatial 8x (patchify 2 + 2 resamples
    # of the 3 down stages; stride exposed for pipeline shape math)
    vae_stride: Tuple[int, int, int] = (4, 16, 16)

    @property
    def temperal_upsample(self):
        return tuple(reversed(self.temperal_downsample))


# ---------------------------------------------------------------------------
# pixel patchify (vae2_2.py:279-312): 'b c f (h q) (w r) -> b (c r q) f h w'
# ---------------------------------------------------------------------------


def patchify_pixels(x: jnp.ndarray, p: int) -> jnp.ndarray:
    if p == 1:
        return x
    B, C, F, H, W = x.shape
    x = x.reshape(B, C, F, H // p, p, W // p, p)  # b c f h q w r
    x = x.transpose(0, 1, 6, 4, 2, 3, 5)  # b c r q f h w
    return x.reshape(B, C * p * p, F, H // p, W // p)


def unpatchify_pixels(x: jnp.ndarray, p: int) -> jnp.ndarray:
    if p == 1:
        return x
    B, CP, F, H, W = x.shape
    C = CP // (p * p)
    x = x.reshape(B, C, p, p, F, H, W)  # b c r q f h w
    x = x.transpose(0, 1, 4, 5, 3, 6, 2)  # b c f h q w r
    return x.reshape(B, C, F, H * p, W * p)


# ---------------------------------------------------------------------------
# parameter-free shortcuts (vae2_2.py:315-411)
# ---------------------------------------------------------------------------


def avg_down3d(x, out_channels: int, factor_t: int, factor_s: int):
    """Front-padded temporal + spatial average pooling with channel grouping."""
    pad_t = (-x.shape[2]) % factor_t
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_t, 0), (0, 0), (0, 0)))
    B, C, T, H, W = x.shape
    ft, fs = factor_t, factor_s
    x = x.reshape(B, C, T // ft, ft, H // fs, fs, W // fs, fs)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    x = x.reshape(B, C * ft * fs * fs, T // ft, H // fs, W // fs)
    group = C * ft * fs * fs // out_channels
    x = x.reshape(B, out_channels, group, T // ft, H // fs, W // fs)
    return jnp.mean(x, axis=2)


def dup_up3d(x, out_channels: int, factor_t: int, factor_s: int, first_chunk: bool):
    """repeat_interleave channel→space duplication upsample."""
    B, C, T, H, W = x.shape
    repeats = out_channels * factor_t * factor_s * factor_s // C
    x = jnp.repeat(x, repeats, axis=1)
    x = x.reshape(B, out_channels, factor_t, factor_s, factor_s, T, H, W)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(B, out_channels, T * factor_t, H * factor_s, W * factor_s)
    if first_chunk:
        x = x[:, :, factor_t - 1:]
    return x


# ---------------------------------------------------------------------------
# resample (2.2 variant: upsample keeps channel count, vae2_2.py:85-96)
# ---------------------------------------------------------------------------


def _resample22(p, x, cache, kind: str, first: bool):
    if kind in ("down2d", "down3d"):
        x = _spatial(
            lambda y: _conv2d(y, p["conv_w"], p["conv_b"], stride=(2, 2),
                              padding=((0, 1), (0, 1))),
            x,
        )
        if kind == "down2d":
            return x, cache
        if first:
            return x, x[:, :, -1:]
        xin = jnp.concatenate([cache, x], axis=2)
        y = _conv3d(xin, p["time_w"], p["time_b"], stride=(2, 1, 1))
        return y, x[:, :, -1:]

    # upsample
    if kind == "up3d" and not first:
        B, C, T, H, W = x.shape
        xin = jnp.concatenate([cache, x], axis=2)
        y = _conv3d(xin, p["time_w"], p["time_b"])
        y = y.reshape(B, 2, C, T, H, W)
        y = jnp.stack([y[:, 0], y[:, 1]], axis=3).reshape(B, C, 2 * T, H, W)
        new_cache = xin[:, :, -CACHE_T:]
        x = y
    elif kind == "up3d":
        new_cache = jnp.zeros(x.shape[:2] + (CACHE_T,) + x.shape[3:], x.dtype)
    else:
        new_cache = cache

    def up2x(y):
        y = jnp.repeat(jnp.repeat(y, 2, axis=2), 2, axis=3)
        return _conv2d(y, p["conv_w"], p["conv_b"])

    return _spatial(up2x, x), new_cache


# ---------------------------------------------------------------------------
# structural plan
# ---------------------------------------------------------------------------


def _enc_levels(cfg: VAE22Config):
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    out = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        t_down = cfg.temperal_downsample[i] if i < len(cfg.temperal_downsample) else False
        out.append((din, dout, t_down, i != len(cfg.dim_mult) - 1))
    return out


def _dec_levels(cfg: VAE22Config):
    mult = tuple(cfg.dim_mult)
    dims = [cfg.dec_dim * u for u in (mult[-1],) + tuple(reversed(mult))]
    ups = cfg.temperal_upsample
    out = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        t_up = ups[i] if i < len(ups) else False
        out.append((din, dout, t_up, i != len(mult) - 1))
    return out


def _down_block(p, cfg, x, cache_list, t_down, down_flag, first):
    """Down_ResidualBlock (vae2_2.py:414-451): cached main + stateless shortcut."""
    x_in = x
    new_caches = []
    h = x
    for j in range(cfg.num_res_blocks):
        h, c = res_block(p["res"][j], h, cache_list[j])
        new_caches.append(c)
    if down_flag:
        kind = "down3d" if t_down else "down2d"
        h, c = _resample22(p["resample"], h, cache_list[cfg.num_res_blocks], kind, first)
        new_caches.append(c)
    out_ch = h.shape[1]
    sc = avg_down3d(x_in, out_ch, 2 if t_down else 1, 2 if down_flag else 1)
    return h + sc, new_caches


def _up_block(p, cfg, x, cache_list, t_up, up_flag, first):
    """Up_ResidualBlock (vae2_2.py:454-496)."""
    h = x
    new_caches = []
    for j in range(cfg.num_res_blocks + 1):
        h, c = res_block(p["res"][j], h, cache_list[j])
        new_caches.append(c)
    if up_flag:
        kind = "up3d" if t_up else "up2d"
        h, c = _resample22(p["resample"], h, cache_list[cfg.num_res_blocks + 1], kind, first)
        new_caches.append(c)
        out_ch = h.shape[1]
        sc = dup_up3d(x, out_ch, 2 if t_up else 1, 2, first_chunk=first)
        h = h + sc
    return h, new_caches


def encoder_chunk22(params, cfg: VAE22Config, x, cache, first: bool):
    enc = params["encoder"]
    nc: Dict[str, Any] = {}
    x, nc["conv1"] = causal_conv3d(enc["conv1"], x, cache["conv1"])
    for i, (din, dout, t_down, down_flag) in enumerate(_enc_levels(cfg)):
        x, nc[f"d{i}"] = _down_block(enc["down"][f"d{i}"], cfg, x, cache[f"d{i}"],
                                     t_down, down_flag, first)
    x, nc["mid0"] = res_block(enc["mid0"], x, cache["mid0"])
    x = attention_block(enc["mid_attn"], x)
    x, nc["mid1"] = res_block(enc["mid1"], x, cache["mid1"])
    y = jax.nn.silu(vae_rms_norm(x, enc["head"]["norm"]))
    y, nc["head"] = causal_conv3d(enc["head"]["conv"], y, cache["head"])
    return y, nc


def decoder_chunk22(params, cfg: VAE22Config, z, cache, first: bool):
    dec = params["decoder"]
    nc: Dict[str, Any] = {}
    x, nc["conv1"] = causal_conv3d(dec["conv1"], z, cache["conv1"])
    x, nc["mid0"] = res_block(dec["mid0"], x, cache["mid0"])
    x = attention_block(dec["mid_attn"], x)
    x, nc["mid1"] = res_block(dec["mid1"], x, cache["mid1"])
    for i, (din, dout, t_up, up_flag) in enumerate(_dec_levels(cfg)):
        x, nc[f"u{i}"] = _up_block(dec["up"][f"u{i}"], cfg, x, cache[f"u{i}"],
                                   t_up, up_flag, first)
    y = jax.nn.silu(vae_rms_norm(x, dec["head"]["norm"]))
    y, nc["head"] = causal_conv3d(dec["head"]["conv"], y, cache["head"])
    return y, nc


# ---------------------------------------------------------------------------
# public encode / decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 4), static_argnames=("dtype",))
def vae22_encode(params, cfg: VAE22Config, videos, scale=None, dtype=jnp.float32):
    """[B, 3, T, H, W] (T = 1+4k) → normalized latents (vae2_2.py:782-809)."""
    x = patchify_pixels(videos.astype(dtype), cfg.patch_size)
    T = x.shape[2]
    assert (T - 1) % 4 == 0
    n_chunks = (T - 1) // 4

    cache0 = _init_cache22(params, cfg, x, encoder=True)
    z0, cache = encoder_chunk22(params, cfg, x[:, :, :1], cache0, first=True)
    if n_chunks:
        rest = x[:, :, 1:]
        B, C, _, H, W = rest.shape
        chunks = rest.reshape(B, C, n_chunks, 4, H, W).transpose(2, 0, 1, 3, 4, 5)

        def body(carry, chunk):
            z, ncache = encoder_chunk22(params, cfg, chunk, carry, first=False)
            return ncache, z

        _, zs = jax.lax.scan(body, cache, chunks)
        zs = zs.transpose(1, 2, 0, 3, 4, 5).reshape(
            z0.shape[0], z0.shape[1], -1, z0.shape[3], z0.shape[4]
        )
        out = jnp.concatenate([z0, zs], axis=2)
    else:
        out = z0
    out, _ = causal_conv3d(params["conv1"], out, None)
    mu = out[:, : cfg.z_dim]
    if scale is not None:
        mean, inv_std = scale
        mu = (mu - mean.reshape(1, -1, 1, 1, 1)) * inv_std.reshape(1, -1, 1, 1, 1)
    return mu.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 4), static_argnames=("dtype",))
def vae22_decode(params, cfg: VAE22Config, z, scale=None, dtype=jnp.float32):
    """latents → video [B, 3, 1+4(t−1), H, W] clamped (vae2_2.py:811-840)."""
    z = z.astype(dtype)
    if scale is not None:
        mean, inv_std = scale
        z = z / inv_std.reshape(1, -1, 1, 1, 1) + mean.reshape(1, -1, 1, 1, 1)
    x, _ = causal_conv3d(params["conv2"], z, None)

    cache0 = _init_cache22(params, cfg, x, encoder=False)
    y0, cache = decoder_chunk22(params, cfg, x[:, :, :1], cache0, first=True)
    if x.shape[2] > 1:
        frames = x[:, :, 1:].transpose(2, 0, 1, 3, 4)[:, :, :, None]

        def body(carry, zf):
            y, ncache = decoder_chunk22(params, cfg, zf, carry, first=False)
            return ncache, y

        _, ys = jax.lax.scan(body, cache, frames)
        ys = ys.transpose(1, 2, 0, 3, 4, 5).reshape(
            y0.shape[0], y0.shape[1], -1, y0.shape[3], y0.shape[4]
        )
        out = jnp.concatenate([y0, ys], axis=2)
    else:
        out = y0
    out = unpatchify_pixels(out, cfg.patch_size)
    return jnp.clip(out.astype(jnp.float32), -1.0, 1.0)


# ---------------------------------------------------------------------------
# caches / init / conversion
# ---------------------------------------------------------------------------


def _init_cache22(params, cfg: VAE22Config, x, encoder: bool):
    B = x.shape[0]
    dt = x.dtype
    c: Dict[str, Any] = {}
    z2 = lambda ch, h, w: jnp.zeros((B, ch, CACHE_T, h, w), dt)
    if encoder:
        H, W = x.shape[3], x.shape[4]
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        c["conv1"] = z2(12, H, W)
        h, w = H, W
        for i, (din, dout, t_down, down_flag) in enumerate(_enc_levels(cfg)):
            lv = []
            cin = din
            for _ in range(cfg.num_res_blocks):
                lv.append({"c1": z2(cin, h, w), "c2": z2(dout, h, w)})
                cin = dout
            if down_flag:
                h, w = h // 2, w // 2
                lv.append(z2(dout, h, w)[:, :, :1] if t_down else jnp.zeros((0,), dt))
            c[f"d{i}"] = lv
        d = dims[-1]
        c["mid0"] = {"c1": z2(d, h, w), "c2": z2(d, h, w)}
        c["mid1"] = {"c1": z2(d, h, w), "c2": z2(d, h, w)}
        c["head"] = z2(d, h, w)
    else:
        h, w = x.shape[3], x.shape[4]
        mult = tuple(cfg.dim_mult)
        d0 = cfg.dec_dim * mult[-1]
        c["conv1"] = z2(cfg.z_dim, h, w)
        c["mid0"] = {"c1": z2(d0, h, w), "c2": z2(d0, h, w)}
        c["mid1"] = {"c1": z2(d0, h, w), "c2": z2(d0, h, w)}
        for i, (din, dout, t_up, up_flag) in enumerate(_dec_levels(cfg)):
            lv = []
            cin = din
            for _ in range(cfg.num_res_blocks + 1):
                lv.append({"c1": z2(cin, h, w), "c2": z2(dout, h, w)})
                cin = dout
            if up_flag:
                # up3d time conv consumes dout channels (CausalConv3d(dim, 2·dim))
                lv.append(z2(dout, h, w) if t_up else jnp.zeros((0,), dt))
                h, w = h * 2, w * 2
            c[f"u{i}"] = lv
        c["head"] = z2(cfg.dec_dim, h, w)
    return c


def vae22_state_dict_to_params(sd, cfg: VAE22Config):
    """Reference vae2_2 state_dict → pytree (torch conv layouts kept)."""
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

    def resample(prefix, has_time):
        p = {}
        cc = conv(f"{prefix}.resample.1")
        p["conv_w"], p["conv_b"] = cc["weight"], cc["bias"]
        if has_time:
            t = conv(f"{prefix}.time_conv")
            p["time_w"], p["time_b"] = t["weight"], t["bias"]
        return p

    enc = {
        "conv1": conv("encoder.conv1"),
        "down": {},
        "mid0": res("encoder.middle.0", False),
        "mid_attn": attn("encoder.middle.1"),
        "mid1": res("encoder.middle.2", False),
        "head": {"norm": g("encoder.head.0.gamma").reshape(-1),
                 "conv": conv("encoder.head.2")},
    }
    for i, (din, dout, t_down, down_flag) in enumerate(_enc_levels(cfg)):
        pref = f"encoder.downsamples.{i}.downsamples"
        blk = {"res": []}
        cin = din
        for j in range(cfg.num_res_blocks):
            blk["res"].append(res(f"{pref}.{j}", cin != dout))
            cin = dout
        if down_flag:
            blk["resample"] = resample(f"{pref}.{cfg.num_res_blocks}", t_down)
        enc["down"][f"d{i}"] = blk

    dec = {
        "conv1": conv("decoder.conv1"),
        "mid0": res("decoder.middle.0", False),
        "mid_attn": attn("decoder.middle.1"),
        "mid1": res("decoder.middle.2", False),
        "head": {"norm": g("decoder.head.0.gamma").reshape(-1),
                 "conv": conv("decoder.head.2")},
        "up": {},
    }
    for i, (din, dout, t_up, up_flag) in enumerate(_dec_levels(cfg)):
        pref = f"decoder.upsamples.{i}.upsamples"
        blk = {"res": []}
        cin = din
        for j in range(cfg.num_res_blocks + 1):
            blk["res"].append(res(f"{pref}.{j}", cin != dout))
            cin = dout
        if up_flag:
            blk["resample"] = resample(f"{pref}.{cfg.num_res_blocks + 1}", t_up)
        dec["up"][f"u{i}"] = blk

    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": conv("conv1"),
        "conv2": conv("conv2"),
    }


@dataclasses.dataclass(frozen=True)
class Wan22VAE:
    """Bundled params + 48-channel stats (role of Wan2_2_VAE, vae2_2.py:887)."""

    params: Any
    cfg: VAE22Config
    mean: jnp.ndarray
    inv_std: jnp.ndarray

    @staticmethod
    def create(params, cfg: VAE22Config) -> "Wan22VAE":
        return Wan22VAE(
            params=params, cfg=cfg,
            mean=jnp.asarray(WAN22_LATENT_MEAN[: cfg.z_dim]),
            inv_std=jnp.asarray(1.0 / WAN22_LATENT_STD[: cfg.z_dim]),
        )

    def encode(self, videos, dtype=jnp.float32):
        return vae22_encode(self.params, self.cfg, videos, (self.mean, self.inv_std), dtype)

    def decode(self, z, dtype=jnp.float32):
        return vae22_decode(self.params, self.cfg, z, (self.mean, self.inv_std), dtype)
