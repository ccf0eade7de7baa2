"""Fused residual+LayerNorm+AdaLN-modulate: dispatch + gradient.

Public entry `fused_adaln(...)` computes, in one HBM pass on TPU (Pallas
kernel `ops/pallas/adaln.py`) or via plain XLA ops elsewhere:

    x_new = x + o * gate            (optional residual branch)
    y     = LN(x_new; eps) [* ln_scale + ln_bias]
                           [* (1 + mod_scale) + mod_shift]   -> out_dtype

matching the per-stage elementwise sandwich of the reference WanAttentionBlock
(`omnivideo/modules/model.py:236-258`: `norm(x).float() * (1 + e[1]) + e[0]`
and `x + y * e[2]`).

Differentiable via `jax.custom_vjp`: the backward pass re-derives gradients
from the XLA reference formula (the saved inputs are exactly the kernel's
inputs, so training pays one recompute of the cheap elementwise chain, no
extra residuals). The forward is used inside `lax.scan` over blocks, so the
VJP also keeps the Pallas call out of the transpose path, where Mosaic
kernels cannot be transposed automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _ref_impl(x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift, eps, out_dtype):
    """XLA reference (also the numerics spec for the Pallas kernel)."""
    xf = x.astype(jnp.float32)
    if o is not None:
        r = o.astype(jnp.float32)
        if gate is not None:
            r = r * gate.astype(jnp.float32)[:, None, :]
        xf = xf + r
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * lax.rsqrt(var + eps)
    if ln_scale is not None:
        y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    if mod_scale is not None:
        y = y * (1.0 + mod_scale.astype(jnp.float32)[:, None, :]) + mod_shift.astype(
            jnp.float32
        )[:, None, :]
    x_new = xf if o is not None else None
    return x_new, y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_adaln(
    x,
    o=None,
    gate=None,
    ln_scale=None,
    ln_bias=None,
    mod_scale=None,
    mod_shift=None,
    eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
    impl: str = "auto",
):
    """(x_new | None, y) — see module docstring. impl: auto|pallas|xla."""
    return _fused_fwd_impl(
        x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift, eps, out_dtype, impl
    )


# CI hook: run the Pallas kernel in interpret mode on CPU (tests set this)
_INTERPRET = False
# row-tile override for sweeps (tools/dev/bench_adaln_ab.py); None = kernel default
_BLOCK_ROWS = None


def _use_pallas(impl: str) -> bool:
    import os

    if os.environ.get("OMNIVIDEO_FUSED_ADALN", "1") == "0":  # triage kill-switch
        return False
    if impl == "auto":
        return jax.default_backend() == "tpu"
    return impl == "pallas"


def _fused_fwd_impl(
    x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift, eps, out_dtype, impl
):
    if _use_pallas(impl):
        from .pallas.adaln import fused_adaln_pallas

        from .pallas.adaln import DEFAULT_BLOCK_ROWS

        return fused_adaln_pallas(
            x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift,
            eps=eps, out_dtype=out_dtype, interpret=_INTERPRET,
            block_rows=_BLOCK_ROWS or DEFAULT_BLOCK_ROWS,
        )
    return _ref_impl(x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift, eps, out_dtype)


def _fused_fwd(x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift, eps, out_dtype, impl):
    out = _fused_fwd_impl(
        x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift, eps, out_dtype, impl
    )
    return out, (x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift)

def _fused_bwd(eps, out_dtype, impl, saved, ct):
    x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift = saved
    _, vjp = jax.vjp(
        lambda *a: _ref_impl(*a, eps, out_dtype),
        x, o, gate, ln_scale, ln_bias, mod_scale, mod_shift,
    )
    return vjp(ct)


fused_adaln.defvjp(_fused_fwd, _fused_bwd)
