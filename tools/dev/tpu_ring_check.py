"""On-chip validation of the fused ring flash-attention kernel family.

Runs every kernel branch on the real TPU (1-device ring: the remote DMA
targets self, exercising the full Mosaic lowering — remote copy, barrier,
semaphores). The multi-device data path is covered by the Mosaic-interpreter
tests in tests/test_ring_pallas.py; multi-chip hardware runs remain for an
environment that has >1 chip.

    python tools/dev/tpu_ring_check.py

Measured 2026-08-16 (v5e-1): full 2e-3 · token-causal 1.2e-2 (bf16) ·
zigzag/stripe 4.7e-3 · varlen 1.2e-3 · grads (dq,dk,dv) ≤8e-4 ·
hybrid Ulysses×ring via MESH device ids 1.5e-3.
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from omnivideo_tpu.ops import attention_xla
from omnivideo_tpu.ops.pallas.ring_attention import (
    ring_flash_attention_shard,
    ring_flash_attention_trainable,
)
from omnivideo_tpu.parallel.mesh import create_mesh
from omnivideo_tpu.parallel.ring import (
    hybrid_attention,
    stripe_ring_attention,
    zigzag_ring_attention,
)


def main():
    assert jax.default_backend() == "tpu", "requires a TPU"
    mesh = create_mesh(1, 1, 1)
    rng = np.random.default_rng(0)
    B, L, N, D = 1, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    def sm(fn, **kw):
        return jax.shard_map(
            functools.partial(fn, axis_name="seq", block_q=128, block_k=128, **kw),
            mesh=mesh, in_specs=(P(None, "seq"),) * 3, out_specs=P(None, "seq"),
            check_vma=False,
        )

    ref = attention_xla(q, k, v)
    err = float(jnp.max(jnp.abs(sm(ring_flash_attention_shard)(q, k, v) - ref)))
    print(f"full:         {err:.2e}")

    s = jnp.einsum("bind,bjnd->bnij", q, k) / np.sqrt(D)
    sc = jnp.where(jnp.tril(jnp.ones((L, L), bool))[None, None], s, -1e30)
    ref_c = jnp.einsum("bnij,bjnd->bind", jax.nn.softmax(sc, -1), v)
    err = float(jnp.max(jnp.abs(
        sm(ring_flash_attention_shard, causal="token")(q, k, v) - ref_c)))
    print(f"token-causal: {err:.2e}")

    err = float(jnp.max(jnp.abs(
        zigzag_ring_attention(q, k, v, mesh, axis="seq",
                              block_q=128, block_k=128) - ref_c)))
    print(f"zigzag:       {err:.2e}")
    err = float(jnp.max(jnp.abs(
        stripe_ring_attention(q, k, v, mesh, axis="seq",
                              block_q=128, block_k=128) - ref_c)))
    print(f"stripe:       {err:.2e}")

    lens = jnp.asarray([300], jnp.int32)
    err = float(jnp.max(jnp.abs(
        sm(ring_flash_attention_shard, kv_lens=lens)(q, k, v)
        - attention_xla(q, k, v, kv_lens=lens))))
    print(f"varlen:       {err:.2e}")

    def ring_loss(q, k, v):
        f = sm(ring_flash_attention_trainable)
        return jnp.sum(f(q, k, v) * w)

    g_r = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(lambda q, k, v: jnp.sum(attention_xla(q, k, v) * w),
                   argnums=(0, 1, 2))(q, k, v)
    errs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_r, g_d)]
    print(f"grads dq/dk/dv: {errs[0]:.2e} {errs[1]:.2e} {errs[2]:.2e}")

    err = float(jnp.max(jnp.abs(
        hybrid_attention(q, k, v, mesh, ulysses_axis="fsdp", ring_axis="seq",
                         ring_impl="pallas") - ref)))
    print(f"hybrid (MESH ids): {err:.2e}")


if __name__ == "__main__":
    main()
