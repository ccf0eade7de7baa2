#!/usr/bin/env python
"""Compare RoPE implementations on the real chip at bench shapes."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=5, warm=2):
    for _ in range(warm):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    from omnivideo_tpu.ops.rope import apply_rope, rope_3d_tables

    B, L, N, D = 2, 32760, 12, 128
    nl = 30
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, N, D), jnp.bfloat16)
    cos, sin = rope_3d_tables((21, 30, 52), D, 1024, 10000.0)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    def loop(fn):
        def run(x):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, x, None, length=nl)
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(run)

    # A. current (strided slices + stack)
    t = timed(loop(lambda c: apply_rope(c, cos, sin)), x)
    print(f"A current            : {t:.3f}s")

    # B. pairwise swap: y = x*Ce + swap(x)*Se  (expanded [L,D] tables)
    Ce = jnp.repeat(cos, 2, axis=-1)[None, :, None, :]          # [1,L,1,D]
    Se_base = jnp.repeat(sin, 2, axis=-1)
    sign = jnp.tile(jnp.array([-1.0, 1.0], jnp.float32), D // 2)
    Se = (Se_base * sign[None, :])[None, :, None, :]

    def rope_swap(c):
        cf = c.astype(jnp.float32)
        sw = cf.reshape(B, L, N, D // 2, 2)[..., ::-1].reshape(B, L, N, D)
        return (cf * Ce + sw * Se).astype(c.dtype)

    t = timed(loop(rope_swap), x)
    print(f"B pairwise swap      : {t:.3f}s")

    # C. split-halves convention (layout-permuted upper bound)
    Ch = jnp.concatenate([cos, cos], axis=-1)[None, :, None, :]
    Sh = jnp.concatenate([sin, sin], axis=-1)[None, :, None, :]

    def rope_half(c):
        cf = c.astype(jnp.float32)
        x1, x2 = cf[..., : D // 2], cf[..., D // 2 :]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return (cf * Ch + rot * Sh).astype(c.dtype)

    t = timed(loop(rope_half), x)
    print(f"C split halves       : {t:.3f}s")

    # D. bf16 math variant of B (tables bf16, no f32 upcast)
    Ce16, Se16 = Ce.astype(jnp.bfloat16), Se.astype(jnp.bfloat16)

    def rope_swap16(c):
        sw = c.reshape(B, L, N, D // 2, 2)[..., ::-1].reshape(B, L, N, D)
        return c * Ce16 + sw * Se16

    t = timed(loop(rope_swap16), x)
    print(f"D swap bf16          : {t:.3f}s")

    # E. signed-permutation matmul: z = x @ P (MXU), y = x*Ce + z*|Se|
    Pm = np.zeros((D, D), np.float32)
    for j in range(D // 2):
        Pm[2 * j + 1, 2 * j] = -1.0  # z[2j]   = -x[2j+1]
        Pm[2 * j, 2 * j + 1] = 1.0   # z[2j+1] = +x[2j]
    P16 = jnp.asarray(Pm, jnp.bfloat16)
    Se_abs = jnp.repeat(sin, 2, axis=-1)[None, :, None, :]

    def rope_mm(c):
        z = jnp.dot(c, P16, preferred_element_type=jnp.float32)
        return (c.astype(jnp.float32) * Ce + z * Se_abs).astype(c.dtype)

    t = timed(loop(rope_mm), x)
    print(f"E signed-perm matmul : {t:.3f}s")

    ye = rope_mm(x)

    # numeric check B vs A (full tensors)
    ya = apply_rope(x, cos, sin)
    yb = rope_swap(x)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    erre = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - ye.astype(jnp.float32))))
    print(f"max|A-B|             : {err:.2e}")
    print(f"max|A-E|             : {erre:.2e}")


if __name__ == "__main__":
    main()
