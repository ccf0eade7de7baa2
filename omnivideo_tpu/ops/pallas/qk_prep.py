"""Fused q/k preparation for the Wan DiT attention prologue.

Between the q/k projection GEMMs and the flash kernel the model does, per
tensor: full-dim RMS norm (f32), per-channel gain, 3D RoPE (f32 tables +
signed-perm pair swap), and — for the bounded-softmax fast path — a
Cauchy-Schwarz row-norm reduction (reference chain: WanRMSNorm + rope_apply,
`omnivideo/modules/model.py:68-84,46-65`). XLA executes that as ~4-5 HBM
passes over a [B, L, N·D] stream (f32 intermediates for the rope) plus one
more read for the row-norm bound.

This kernel does all of it in ONE read + ONE write:

  y = rope(rms_norm(x) · g)           (bit-compatible op order with the
                                       unfused chain: f32 rms → bf16 cast →
                                       bf16 gain → f32 rope → bf16 cast)
  rn[b, n] = max_rows |row(y)|        (computed on the f32 pre-cast values;
                                       rope is a pairwise rotation so the
                                       norm equals the pre-rope norm exactly)

The row-norm output feeds flash attention's bounded softmax directly
(ops/pallas/flash_attention.py), replacing its two full q/k HBM reads.

Opt-in (like ops/pallas/adaln.py): the XLA chain stays the default until
the chip A/B (tools/dev/bench_a14b_ab.py) shows a win at a given dim.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rope import _swap_sign_perm


def _qk_prep_kernel(x_ref, g_ref, ce_ref, se_ref, p_ref, y_ref, rn_ref,
                    *, d: int, n_heads: int, head_dim: int, eps: float,
                    with_rope: bool):
    x = x_ref[0].astype(jnp.float32)                     # [bq, d]
    rs = jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)
    xh = (x * rs).astype(y_ref.dtype) * g_ref[0]         # bf16, rms_norm order
    bq = xh.shape[0]
    x3 = xh.reshape(bq, n_heads, head_dim)
    if with_rope:
        # pair swap on the MXU (exact 0/±1 matmul), rotate in f32 — the
        # same formulation as ops/rope.py::apply_rope
        z = jax.lax.dot_general(
            x3, p_ref[...].astype(xh.dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, N, D]
        y3 = (x3.astype(jnp.float32) * ce_ref[...][:, None, :]
              + z * se_ref[...][:, None, :])
    else:
        y3 = x3.astype(jnp.float32)
    y_ref[0] = y3.astype(y_ref.dtype).reshape(bq, d)
    # per-head max row norm (f32 pre-cast; rope preserves row norms, the
    # wrapper adds slack for the bf16 cast). Stores stay 2D and the output
    # block carries a sublane dim of 8 — TPU tiling requires the last two
    # block dims be (8k, 128k) or full; a (1, 128) row block is unlowerable.
    rn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(y3), axis=-1),
                          axis=0, keepdims=True))           # [1, N]
    rn = jnp.pad(rn, ((0, 0), (0, rn_ref.shape[-1] - n_heads)))
    rn_ref[0, 0] = jnp.broadcast_to(rn, rn_ref.shape[2:])   # [8, rn_w]


def qk_prep(
    x: jnp.ndarray,
    gain: jnp.ndarray,
    cos: Optional[np.ndarray],
    sin: Optional[np.ndarray],
    num_heads: int,
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, L, d] raw projection output; gain: [d] (WanRMSNorm weight);
    cos/sin: rope tables [Lr, head_dim//2] (None → norm+gain only, e.g.
    cross-attention K). Returns (y [B, L, N, head_dim], row_norm_max [B, N]
    f32 — inflated by 2^-7 to stay an upper bound after the bf16 cast)."""
    B, L, d = x.shape
    hd = d // num_heads
    # VMEM cap: the kernel holds ~3 f32 copies of the [bq, d] row tile
    # (x_f32, z, y3) plus bf16 in/out — ~16 B/elem of stack. Cap the tile to
    # ~7 MB so dim 5120 compiles (256 rows x 5120 x 16 B would be 21 MB).
    cap_rows = max(8, (7 * 2**20) // (d * 16) // 8 * 8)
    bq = min(block_rows, cap_rows, max(8, L))
    L_p = (L + bq - 1) // bq * bq
    if L_p != L:
        x = jnp.pad(x, ((0, 0), (0, L_p - L), (0, 0)))

    if cos is not None:
        # jnp ops throughout: tables arrive as numpy constants (host-cached
        # rope_3d_tables) or as traced device arrays (aux pytrees) — XLA
        # folds the constant case at compile time
        ce = jnp.repeat(jnp.asarray(cos, jnp.float32), 2, axis=-1)
        se = jnp.repeat(jnp.asarray(sin, jnp.float32), 2, axis=-1)
        if ce.shape[0] < L_p:  # padded rows pass through unrotated
            ce = jnp.concatenate(
                [ce, jnp.ones((L_p - ce.shape[0], hd), jnp.float32)])
            se = jnp.concatenate(
                [se, jnp.zeros((L_p - se.shape[0], hd), jnp.float32)])
        ce, se = ce[:L_p], se[:L_p]
    else:
        ce = jnp.ones((L_p, hd), jnp.float32)
        se = jnp.zeros((L_p, hd), jnp.float32)
    P = jnp.asarray(_swap_sign_perm(hd), x.dtype)
    rn_w = max(128, num_heads)

    kernel = functools.partial(
        _qk_prep_kernel, d=d, n_heads=num_heads, head_dim=hd, eps=float(eps),
        with_rope=cos is not None)
    y, rn = pl.pallas_call(
        kernel,
        grid=(B, L_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, hd), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, hd), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, rn_w), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L_p, d), x.dtype),
            jax.ShapeDtypeStruct((B, L_p // bq, 8, rn_w), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, gain.astype(x.dtype)[None], ce, se, P)
    y = y[:, :L].reshape(B, L, num_heads, hd)
    # tile-max -> global max; *(1+2^-7) covers the bf16 round-up of y
    rn = (jnp.max(rn[:, :, 0, :num_heads], axis=1)
          * jnp.float32(1.0 + 2.0**-7))
    return y, rn
