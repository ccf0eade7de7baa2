"""Validate Pallas kernels against XLA oracles on the real TPU chip.

Run directly on a TPU host: python tools/dev/tpu_kernel_check.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from omnivideo_tpu.ops import attention_xla
from omnivideo_tpu.ops.pallas.flash_attention import flash_attention


def main():
    assert jax.default_backend() == "tpu", "requires a TPU"
    rng = np.random.default_rng(0)
    cases = [
        (2, 300, 200, 3, 64, [200, 130]),
        (1, 1024, 1024, 4, 128, None),
        (2, 777, 515, 2, 128, [515, 100]),
        (1, 4096, 4096, 8, 128, None),
    ]
    for (B, Lq, Lk, N, D, lens) in cases:
        q = jnp.asarray(rng.standard_normal((B, Lq, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, Lk, N, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Lk, N, D)), jnp.bfloat16)
        kv = None if lens is None else jnp.array(lens, jnp.int32)
        ref = attention_xla(q, k, v, kv).astype(jnp.float32)
        out = flash_attention(q, k, v, kv).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ref - out)))
        out_b = flash_attention(q, k, v, kv,
                                assume_normalized=True).astype(jnp.float32)
        err_b = float(jnp.max(jnp.abs(ref - out_b)))
        print(f"B{B} Lq{Lq} Lk{Lk} N{N} D{D} lens={lens}: "
              f"max_err={err:.4f} bounded={err_b:.4f}")
        assert err < 0.07
        assert err_b < 0.07
    print("OK")


if __name__ == "__main__":
    main()
