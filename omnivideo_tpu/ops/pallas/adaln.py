"""Pallas TPU fused residual + LayerNorm + AdaLN-modulate kernel.

The Wan DiT block (reference `omnivideo/modules/model.py:182-258`) separates
each stage with the same elementwise sandwich:

    x_new = x + branch_out * gate          # f32 residual stream
    y     = LN(x_new) [*ln_scale + ln_bias] [*(1+mod_scale) + mod_shift]

XLA materializes the f32 residual stream between the residual-add fusion and
the (two-pass) layernorm fusion, so each boundary costs ~2 extra HBM passes
over the [B, L, dim] activation. At 480p·81f (L=32,760, dim=1536, CFG
batch-2) that is the ~0.3 s/step elementwise floor in the round-3 step
decomposition (docs/PERFORMANCE.md). This kernel does the whole sandwich in
one pass: read x (+branch), write x_new (f32) and y (bf16) once, with the
mean/variance reduction done in-register per row tile.

Only used on the T=1 path (scalar per-sample timestep → per-batch modulation
vectors); per-token modulation falls back to the XLA reference in
`ops/fused_adaln.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# [rows, 1536] f32 tiles: x 1.5 MB + o 0.75 + x_new 1.5 + y 0.75 ≈ 4.5 MB,
# ~9 MB with double buffering — comfortably inside VMEM next to nothing else.
DEFAULT_BLOCK_ROWS = 256


def _adaln_kernel(
    *refs,
    eps: float,
    has_res: bool,
    has_gate: bool,
    has_affine: bool,
    has_mod: bool,
):
    """One [1, R, d] tile: optional residual add, then LN + optional affine
    + optional AdaLN modulate. Rows are independent, so the ragged final
    block needs no masking beyond Mosaic's out-of-bounds store clipping."""
    it = iter(refs)
    x_ref = next(it)
    o_ref = next(it) if has_res else None
    gate_ref = next(it) if has_gate else None
    g_ref = next(it) if has_affine else None
    b_ref = next(it) if has_affine else None
    ms_ref = next(it) if has_mod else None
    mb_ref = next(it) if has_mod else None
    xn_ref = next(it) if has_res else None
    y_ref = next(it)

    xf = x_ref[0].astype(jnp.float32)  # [R, d]
    if has_res:
        r = o_ref[0].astype(jnp.float32)
        if has_gate:
            r = r * gate_ref[0].astype(jnp.float32)  # [1, d] broadcast
        xf = xf + r
        xn_ref[0] = xf

    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * lax.rsqrt(var + eps)
    if has_affine:
        y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    if has_mod:
        y = y * (1.0 + ms_ref[0].astype(jnp.float32)) + mb_ref[0].astype(
            jnp.float32
        )
    y_ref[0] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "out_dtype", "block_rows", "interpret"),
)
def fused_adaln_pallas(
    x: jnp.ndarray,
    o: jnp.ndarray | None = None,
    gate: jnp.ndarray | None = None,
    ln_scale: jnp.ndarray | None = None,
    ln_bias: jnp.ndarray | None = None,
    mod_scale: jnp.ndarray | None = None,
    mod_shift: jnp.ndarray | None = None,
    *,
    eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
):
    """Fused `x_new = x + o*gate; y = mod(LN(x_new))` over [B, L, d].

    Args:
      x: [B, L, d] f32 residual stream.
      o: optional [B, L, d] branch output (any dtype; upcast to f32).
      gate: optional [B, d] f32 residual gate (requires `o`).
      ln_scale/ln_bias: optional [d] f32 LayerNorm affine.
      mod_scale/mod_shift: optional [B, d] f32 AdaLN modulation
        (y*(1+scale)+shift).
    Returns:
      (x_new f32 [B, L, d] or None, y out_dtype [B, L, d]).
    """
    B, L, d = x.shape
    assert d % 128 == 0, d
    # VMEM cap: each grid step holds ~4 row tensors (x, o, x_new, y) at up
    # to f32 plus pipeline double-buffering — ~16 B/elem of stack. Cap the
    # row tile so dim 5120 fits the 16 MB scoped-vmem limit (256 rows at
    # d=5120 compiled to a 20.2 MB allocation and was rejected); dim 1536
    # keeps the tuned 256-row tile.
    cap_rows = max(8, (7 * 2**20) // (d * 16) // 8 * 8)
    block_rows = min(block_rows, cap_rows)
    has_res, has_gate = o is not None, gate is not None
    has_affine, has_mod = ln_scale is not None, mod_scale is not None
    assert has_res or not has_gate
    assert (ln_bias is not None) == has_affine
    assert (mod_shift is not None) == has_mod

    nb = pl.cdiv(L, block_rows)
    row_spec = pl.BlockSpec(
        (1, block_rows, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    # per-batch vectors carried as [B, 1, d] so the trailing (1, d) block tile
    # is legal (second-minor block dim must equal the array dim when < 8)
    vec_spec = pl.BlockSpec((1, 1, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(
        (1, 1, d), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM
    )

    in_specs, inputs = [row_spec], [x]
    if has_res:
        in_specs.append(row_spec)
        inputs.append(o)
    if has_gate:
        in_specs.append(vec_spec)
        inputs.append(gate.reshape(B, 1, d))
    if has_affine:
        in_specs += [const_spec, const_spec]
        inputs += [ln_scale.reshape(1, 1, d), ln_bias.reshape(1, 1, d)]
    if has_mod:
        in_specs += [vec_spec, vec_spec]
        inputs += [mod_scale.reshape(B, 1, d), mod_shift.reshape(B, 1, d)]

    out_shapes, out_specs = [], []
    if has_res:
        out_shapes.append(jax.ShapeDtypeStruct((B, L, d), jnp.float32))
        out_specs.append(row_spec)
    out_shapes.append(jax.ShapeDtypeStruct((B, L, d), out_dtype))
    out_specs.append(row_spec)

    kernel = functools.partial(
        _adaln_kernel,
        eps=eps,
        has_res=has_res,
        has_gate=has_gate,
        has_affine=has_affine,
        has_mod=has_mod,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)
    if has_res:
        return outs[0], outs[1]
    return None, outs[0]
