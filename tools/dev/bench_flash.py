#!/usr/bin/env python
"""Sweep flash-attention block sizes on the real chip at bench shapes."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def timed(fn, *args, n=3, warm=1):
    for _ in range(warm):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention

    B, L, N, D = 2, 32760, 12, 128
    Lc = 6272
    nl = 30
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, L, N, D), jnp.bfloat16)
    kx = jax.random.normal(key, (B, Lc, N, D), jnp.bfloat16)

    def loop(fn, *extra):
        def run(q, *extra):
            def body(c, _):
                return fn(c, *extra), None
            out, _ = jax.lax.scan(body, q, None, length=nl)
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(run)

    self_fl = nl * 4 * B * N * L * L * D
    cross_fl = nl * 4 * B * N * L * Lc * D

    for bq, bk in [(1024, 1024), (2048, 1024), (1024, 2048), (512, 1024), (2048, 512), (1024, 512)]:
        try:
            t = timed(loop(lambda c, bq=bq, bk=bk: flash_attention(
                c, c, c, block_q=bq, block_k=bk)), q)
            print(f"self  bq={bq:4d} bk={bk:4d}: {t:.3f}s  {self_fl/t/1e12:5.1f} TF/s ({self_fl/t/197e12*100:.1f}%)")
        except Exception as e:
            print(f"self  bq={bq:4d} bk={bk:4d}: FAIL {str(e)[:90]}")

    for bq, bk in [(1024, 1024), (2048, 1024), (4096, 896), (2048, 896), (1024, 896), (2048, 2048), (4096, 448)]:
        try:
            t = timed(loop(lambda c, k2, bq=bq, bk=bk: flash_attention(
                c, k2, k2, block_q=bq, block_k=bk), kx), q, kx)
            print(f"cross bq={bq:4d} bk={bk:4d}: {t:.3f}s  {cross_fl/t/1e12:5.1f} TF/s ({cross_fl/t/197e12*100:.1f}%)")
        except Exception as e:
            print(f"cross bq={bq:4d} bk={bk:4d}: FAIL {str(e)[:90]}")


if __name__ == "__main__":
    main()
