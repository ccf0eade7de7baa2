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


FAILURES = []


def _section(name):
    """Isolate a check section: record the failure, keep going (one broken
    kernel must not mask parity evidence for the others)."""
    import contextlib
    import traceback

    @contextlib.contextmanager
    def cm():
        try:
            yield
        except Exception:
            traceback.print_exc()
            FAILURES.append(name)
            print(f"SECTION_FAILED: {name}", flush=True)
    return cm()


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
        with _section(f"flash B{B} Lq{Lq} Lk{Lk} lens={lens}"):
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

    # round-4 paths -------------------------------------------------------
    import os

    # multi-step bounded cross-attention (divisor bk + wide q tiles):
    # A14B-context-shaped Lk with padded kv_lens
    for lens in (None, [6272, 5000]):
        with _section(f"xattn-multi lens={lens}"):
            B, Lq, Lk, N, D = 2, 1560, 6272, 4, 128
            q = jnp.asarray(rng.standard_normal((B, Lq, N, D)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((B, Lk, N, D)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((B, Lk, N, D)), jnp.bfloat16)
            kv = None if lens is None else jnp.array(lens, jnp.int32)
            ref = attention_xla(q, k, v, kv).astype(jnp.float32)
            os.environ["FLASH_XATTN_MODE"] = "multi"
            try:
                out_m = flash_attention(
                    q, k, v, kv, assume_normalized=True).astype(jnp.float32)
            finally:
                os.environ.pop("FLASH_XATTN_MODE", None)
            err_m = float(jnp.max(jnp.abs(ref - out_m)))
            print(f"xattn multi Lk{Lk} lens={lens}: max_err={err_m:.4f}")
            assert err_m < 0.07

    # fused qk-prep prologue (rms-norm + gain + rope + row-norm bound)
    from omnivideo_tpu.ops.norms import rms_norm
    from omnivideo_tpu.ops.pallas.qk_prep import qk_prep
    from omnivideo_tpu.ops.rope import apply_rope, rope_3d_tables

    for N, hd, L, with_rope in ((4, 128, 1560, True), (4, 128, 512, False)):
        with _section(f"qk_prep L{L} rope={with_rope}"):
            d = N * hd
            x = jnp.asarray(rng.standard_normal((2, L, d)), jnp.bfloat16)
            g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
            cos, sin = (rope_3d_tables((10, 13, 12), hd, 2048, 10000.0)
                        if with_rope else (None, None))
            ref = rms_norm(x, g, 1e-5).reshape(2, L, N, hd)
            if with_rope:
                ref = apply_rope(ref, cos, sin)
            y, rn = qk_prep(x, g, cos, sin, N)
            err_q = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                          - ref.astype(jnp.float32))))
            actual = jnp.max(jnp.linalg.norm(y.astype(jnp.float32), axis=-1),
                             axis=1)
            bound_ok = bool(jnp.all(rn >= actual - 1e-6))
            print(f"qk_prep L{L} rope={with_rope}: max_err={err_q:.4f} "
                  f"bound_valid={bound_ok}")
            assert err_q < 0.04 and bound_ok

    if FAILURES:
        print(f"FAILED_SECTIONS: {FAILURES}")
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
