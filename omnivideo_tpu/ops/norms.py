"""Normalization primitives, computed in float32 regardless of input dtype.

Matches reference numerics: WanRMSNorm (`omnivideo/modules/model.py:68-84`,
norm in f32 then cast back, weight applied after cast), WanLayerNorm
(`model.py:87-97`, f32 layernorm), T5LayerNorm (`modules/t5.py:52-65`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """WanRMSNorm: x̂ = x·rsqrt(mean(x²)+eps) (f32) cast back, then ·weight."""
    xf = x.astype(jnp.float32)
    y = xf * lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype) * weight.astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    eps: float = 1e-6,
    scale: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    out_f32: bool = False,
) -> jnp.ndarray:
    """WanLayerNorm: f32 layernorm, optional affine, cast back to input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y if out_f32 else y.astype(x.dtype)


def t5_layer_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """T5 RMS-style norm: x·rsqrt(mean_f32(x²)+eps), cast to weight dtype, ·weight."""
    xf = x.astype(jnp.float32)
    y = x * lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps).astype(
        x.dtype
    )
    if weight.dtype in (jnp.float16, jnp.bfloat16):
        y = y.astype(weight.dtype)
    return weight * y
