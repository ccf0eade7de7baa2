"""3D-factorized rotary position embedding for video DiT.

Matches the reference's complex-valued fp64 RoPE
(`omnivideo/modules/model.py:27-65`: `rope_params` builds per-axis complex
frequency tables; `rope_apply` splits head_dim/2 complex lanes
`[c−2(c//3), c//3, c//3]` across (frame, height, width) and rotates q/k) —
re-expressed TPU-natively: tables are precomputed on the host in float64
numpy and materialized as float32 cos/sin arrays (TPUs have no f64; parity
validated numerically in tests), and the rotation is a fused elementwise
multiply in f32 applied to the packed (even, odd) lanes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def axis_freqs(max_len: int, dim: int, theta: float = 10000.0) -> np.ndarray:
    """Angles θ[p, j] = p · theta^(−2j/dim) for one axis (model.py:27-34), f64."""
    assert dim % 2 == 0
    inv = 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)
    return np.outer(np.arange(max_len, dtype=np.float64), inv)


@functools.lru_cache(maxsize=32)
def rope_3d_tables(
    grid: Tuple[int, int, int],
    head_dim: int,
    max_len: int = 1024,
    theta: float = 10000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [L, head_dim//2] for a (F, H, W) token grid.

    The complex lane budget c = head_dim//2 is split `c−2(c//3)` for frames and
    `c//3` each for height/width (model.py:42), equivalently
    `(d−4(d//6))/2, d//6, d//6` real pairs (model.py:406-411).
    """
    f, h, w = grid
    c = head_dim // 2
    ct = c - 2 * (c // 3)
    ch = cw = c // 3

    ang_t = axis_freqs(max_len, 2 * ct, theta)[:f]  # [f, ct]
    ang_h = axis_freqs(max_len, 2 * ch, theta)[:h]  # [h, ch]
    ang_w = axis_freqs(max_len, 2 * cw, theta)[:w]  # [w, cw]

    ang = np.concatenate(
        [
            np.broadcast_to(ang_t[:, None, None, :], (f, h, w, ct)),
            np.broadcast_to(ang_h[None, :, None, :], (f, h, w, ch)),
            np.broadcast_to(ang_w[None, None, :, :], (f, h, w, cw)),
        ],
        axis=-1,
    ).reshape(f * h * w, c)

    # numpy (not jnp) so the lru_cache is safe to hit from inside jit traces
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _swap_sign_perm(D: int) -> np.ndarray:
    """[D, D] signed permutation: (x @ P)[2j] = -x[2j+1], (x @ P)[2j+1] = x[2j]."""
    P = np.zeros((D, D), np.float32)
    idx = np.arange(D // 2)
    P[2 * idx + 1, 2 * idx] = -1.0
    P[2 * idx, 2 * idx + 1] = 1.0
    return P


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate packed complex lanes of q/k.

    x: [B, L, N, D] with D = head_dim; lanes packed as (re, im) pairs along D.
    cos/sin: [Lr, D//2] — Lr ≤ L; positions beyond Lr (seq padding) pass through
    unrotated, matching reference `rope_apply` (model.py:61: tail concatenated
    unchanged). Math in f32, result cast back to x.dtype.

    TPU note: the interleaved-pair rotation is expressed as
        y = x·Ce + (x @ P)·Se
    with expanded [L, D] tables and P a signed pair-swap permutation matrix —
    the swap runs on the MXU (tiny [*,D]x[D,D] matmul, exact for a 0/±1
    matrix) instead of lane-strided shuffles on the VPU, which are ~3x slower
    at video sequence lengths. Bitwise identical to the slice/stack form.
    """
    B, L, N, D = x.shape
    Lr = cos.shape[0]
    if isinstance(cos, jnp.ndarray) or isinstance(sin, jnp.ndarray):
        xp, cos, sin = jnp, jnp.asarray(cos), jnp.asarray(sin)
    else:
        xp, cos, sin = np, np.asarray(cos), np.asarray(sin)
    # expanded per-lane tables: Ce[l, 2j] = Ce[l, 2j+1] = cos[l, j]
    ce = xp.repeat(cos.astype(xp.float32), 2, axis=-1)
    se = xp.repeat(sin.astype(xp.float32), 2, axis=-1)
    if Lr < L:
        ce = xp.concatenate([ce, xp.ones((L - Lr, D), xp.float32)], axis=0)
        se = xp.concatenate([se, xp.zeros((L - Lr, D), xp.float32)], axis=0)
    Ce = jnp.asarray(ce)[None, :, None, :]
    Se = jnp.asarray(se)[None, :, None, :]
    P = jnp.asarray(_swap_sign_perm(D), x.dtype)
    z = jnp.dot(x, P, preferred_element_type=jnp.float32)  # signed pair swap
    return (x.astype(jnp.float32) * Ce + z * Se).astype(x.dtype)
