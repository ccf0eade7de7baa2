"""Visual context adapter: source-video VAE latents → conditioning tokens.

Equivalent to reference `omnivideo/modules/visual_context_adapter.py:4-115`:
Conv3d patchify stride (1,4,4) → non-affine LayerNorm → Linear(hidden→out) →
non-affine LayerNorm, returning [B, N, out_dim]. The stride==kernel conv is a
reshape+matmul (MXU GEMM), like the DiT patchify.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm
from .wan_dit import _dense, _xavier_uniform, patchify


def init_vca(
    key: jax.Array,
    patch_size: Tuple[int, int, int] = (1, 4, 4),
    in_channels: int = 16,
    hidden_dim: int = 2048,
    out_dim: int = 4096,
):
    k1, k2 = jax.random.split(key)
    in_patch = in_channels * int(np.prod(patch_size))
    return {
        "patch_embedding": {
            "kernel": _xavier_uniform(k1, (in_patch, hidden_dim)),
            "bias": jnp.zeros((hidden_dim,), jnp.float32),
        },
        "projection": {
            "kernel": _xavier_uniform(k2, (hidden_dim, out_dim)),
            "bias": jnp.zeros((out_dim,), jnp.float32),
        },
    }


def vca_apply(
    params,
    x: jnp.ndarray,
    patch_size: Tuple[int, int, int] = (1, 4, 4),
    eps: float = 1e-6,
) -> jnp.ndarray:
    """x: [B, C, F, H, W] VAE latents → [B, N, out_dim] tokens."""
    if x.ndim == 4:
        x = x[None]
    pdtype = params["patch_embedding"]["kernel"].dtype
    tokens = patchify(x.astype(pdtype), patch_size)
    h = _dense(params["patch_embedding"], tokens)
    h = layer_norm(h, eps)
    h = _dense(params["projection"], h)
    return layer_norm(h, eps)
