"""Fused ring flash-attention Pallas kernel under the Mosaic TPU interpreter
on a virtual CPU mesh — validates the RDMA K/V rotation + online merge
against single-device attention and the ppermute ring implementation."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from omnivideo_tpu.ops import attention_xla
from omnivideo_tpu.ops.pallas.ring_attention import ring_flash_attention_shard


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devs[:n]), ("seq",))


@pytest.mark.parametrize("B,L,N,D,ndev", [(1, 512, 2, 128, 4), (2, 256, 4, 128, 2)])
def test_ring_pallas_matches_full_attention(B, L, N, D, ndev):
    mesh = _mesh(ndev)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    ref = attention_xla(q, k, v)

    fn = shard_map(
        functools.partial(
            ring_flash_attention_shard, axis_name="seq", interpret=True,
            block_q=128, block_k=128,
        ),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_ring_pallas_matches_ppermute_ring():
    from omnivideo_tpu.parallel.ring import ring_attention_local

    mesh = _mesh(4)
    rng = np.random.default_rng(1)
    B, L, N, D = 1, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    pall = shard_map(
        functools.partial(
            ring_flash_attention_shard, axis_name="seq", interpret=True,
            block_q=128, block_k=128,
        ),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )(q, k, v)
    perm = shard_map(
        functools.partial(ring_attention_local, axis="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(pall), np.asarray(perm), rtol=2e-3, atol=2e-3)


def test_ring_attention_global_pallas_impl():
    """Global-view ring_attention(impl="pallas") == XLA full attention."""
    from omnivideo_tpu.parallel.ring import ring_attention

    mesh = _mesh(4)
    rng = np.random.default_rng(2)
    B, L, N, D = 1, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    out = ring_attention(q, k, v, mesh, axis="seq", impl="pallas", interpret=True)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_ring_pallas_block_causal_matches_ppermute():
    """causal="block" == parallel/ring.py ring_attention_local(causal=True)."""
    from omnivideo_tpu.parallel.ring import ring_attention_local

    mesh = _mesh(4)
    rng = np.random.default_rng(3)
    B, L, N, D = 1, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    pall = shard_map(
        functools.partial(ring_flash_attention_shard, axis_name="seq",
                          interpret=True, block_q=128, block_k=128,
                          causal="block"),
        mesh=mesh, in_specs=(P(None, "seq"),) * 3, out_specs=P(None, "seq"),
        check_vma=False,
    )(q, k, v)
    perm = shard_map(
        functools.partial(ring_attention_local, axis="seq", causal=True),
        mesh=mesh, in_specs=(P(None, "seq"),) * 3, out_specs=P(None, "seq"),
        check_vma=False,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(pall), np.asarray(perm), rtol=2e-3, atol=2e-3)


def test_ring_pallas_token_causal_matches_oracle():
    """causal="token" == dense token-causal attention."""
    mesh = _mesh(4)
    rng = np.random.default_rng(4)
    B, L, N, D = 1, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    s = jnp.einsum("bind,bjnd->bnij", q, k) / np.sqrt(D)
    mask = jnp.tril(jnp.ones((L, L), bool))
    s = jnp.where(mask[None, None], s, -1e30)
    ref = jnp.einsum("bnij,bjnd->bind", jax.nn.softmax(s, axis=-1), v)

    out = shard_map(
        functools.partial(ring_flash_attention_shard, axis_name="seq",
                          interpret=True, block_q=128, block_k=128,
                          causal="token"),
        mesh=mesh, in_specs=(P(None, "seq"),) * 3, out_specs=P(None, "seq"),
        check_vma=False,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_zigzag_ring_matches_causal_oracle():
    """Load-balanced zigzag layout == dense token-causal attention in the
    ORIGINAL sequence order."""
    from omnivideo_tpu.parallel.ring import zigzag_ring_attention

    mesh = _mesh(4)
    rng = np.random.default_rng(5)
    B, L, N, D = 1, 1024, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    s = jnp.einsum("bind,bjnd->bnij", q, k) / np.sqrt(D)
    s = jnp.where(jnp.tril(jnp.ones((L, L), bool))[None, None], s, -1e30)
    ref = jnp.einsum("bnij,bjnd->bind", jax.nn.softmax(s, axis=-1), v)

    out = zigzag_ring_attention(q, k, v, mesh, axis="seq",
                                block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_ring_pallas_varlen_kv_lens():
    """kv_lens masking == XLA masked attention (reference ring varlen role)."""
    mesh = _mesh(4)
    rng = np.random.default_rng(6)
    B, L, N, D = 2, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    lens = jnp.asarray([300, 450], jnp.int32)

    ref = attention_xla(q, k, v, kv_lens=lens)
    out = shard_map(
        functools.partial(ring_flash_attention_shard, axis_name="seq",
                          interpret=True, block_q=128, block_k=128,
                          kv_lens=lens),
        mesh=mesh, in_specs=(P(None, "seq"),) * 3, out_specs=P(None, "seq"),
        check_vma=False,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_stripe_ring_matches_causal_oracle():
    """Stripe round-robin layout == dense token-causal attention in the
    original order."""
    from omnivideo_tpu.parallel.ring import stripe_ring_attention

    mesh = _mesh(4)
    rng = np.random.default_rng(7)
    B, L, N, D = 1, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    s = jnp.einsum("bind,bjnd->bnij", q, k) / np.sqrt(D)
    s = jnp.where(jnp.tril(jnp.ones((L, L), bool))[None, None], s, -1e30)
    ref = jnp.einsum("bnij,bjnd->bind", jax.nn.softmax(s, axis=-1), v)

    out = stripe_ring_attention(q, k, v, mesh, axis="seq",
                                block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_ring_trainable_gradients_match_dense():
    """VJP of the fused ring kernel == VJP of dense attention (dq, dk, dv)."""
    from omnivideo_tpu.ops.pallas.ring_attention import (
        ring_flash_attention_trainable,
    )

    mesh = _mesh(4)
    rng = np.random.default_rng(8)
    B, L, N, D = 1, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    def ring_loss(q, k, v):
        f = shard_map(
            functools.partial(ring_flash_attention_trainable, axis_name="seq",
                              block_q=128, block_k=128, interpret=True),
            mesh=mesh,
            in_specs=(P(None, "seq"),) * 3,
            out_specs=P(None, "seq"),
            check_vma=False,
        )
        return jnp.sum(f(q, k, v) * w)

    def dense_loss(q, k, v):
        return jnp.sum(attention_xla(q, k, v) * w)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_dense, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3, err_msg=name
        )


def test_hybrid_with_pallas_ring():
    """2-D Ulysses×ring with the fused kernel inner == full attention.

    jax's interpret-mode remote-DMA discharge only emulates meshes with ONE
    named axis (dma_start all_gathers over a single shard axis), so
    hybrid_attention(ring_impl="pallas") cannot run end-to-end under the
    Mosaic interpreter. This shim runs the same composition in two real
    stages instead: (1) the hybrid's Ulysses head-scatter all_to_all on the
    true 2-D mesh, (2) the real fused ring kernel — identical block sizes to
    hybrid_attention's inner call — in a 1-D interpret shard_map over the
    ring axis on the scattered layout. Full (non-causal) attention is
    KV-permutation-invariant and Q-equivariant, so the dense reference maps
    into scattered space by the same all_to_all. The only part this cannot
    cover is MESH device-id addressing, which tools/dev/tpu_ring_check.py
    validates on the chip."""
    from omnivideo_tpu.ops.pallas.ring_attention import (
        ring_flash_attention_trainable,
    )
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.parallel.ulysses import _a2a_scatter_heads

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = create_mesh(1, 2, 2)  # ulysses axis "fsdp"=2 × ring axis "seq"=2
    rng = np.random.default_rng(9)
    B, L, N, D = 1, 512, 4, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    # stage 1: hybrid's head-scatter a2a on the 2-D mesh — tokens go from
    # (fsdp, seq)-sharded to seq-sharded, heads to fsdp-sharded
    scatter = shard_map(
        lambda x: _a2a_scatter_heads(x, "fsdp"),
        mesh=mesh,
        in_specs=(P(None, ("fsdp", "seq"), None, None),),
        out_specs=P(None, "seq", "fsdp", None),
        check_vma=False,
    )
    # host round-trip between stages: stage 1's outputs live on the 4-device
    # mesh, stage 2 runs on a 2-device ring mesh
    q2, k2, v2 = (jnp.asarray(np.asarray(scatter(x))) for x in (q, k, v))

    # stage 2: the real fused ring kernel over the ring axis, same block
    # sizes hybrid_attention passes (256, 256)
    ring_mesh = _mesh(2)
    ring = shard_map(
        functools.partial(
            ring_flash_attention_trainable, axis_name="seq",
            block_q=256, block_k=256, interpret=True, mesh_axes=("seq",),
        ),
        mesh=ring_mesh, in_specs=(P(None, "seq"),) * 3,
        out_specs=P(None, "seq"), check_vma=False,
    )
    out = ring(q2, k2, v2)

    ref = np.asarray(scatter(attention_xla(q, k, v)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_ring_trainable_causal_gradients():
    """Causal (token) trainable ring gradients == dense causal VJP."""
    from omnivideo_tpu.ops.pallas.ring_attention import (
        ring_flash_attention_trainable,
    )

    mesh = _mesh(4)
    rng = np.random.default_rng(10)
    B, L, N, D = 1, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    def ring_loss(q, k, v):
        f = shard_map(
            functools.partial(ring_flash_attention_trainable, axis_name="seq",
                              block_q=128, block_k=128, interpret=True,
                              causal="token"),
            mesh=mesh, in_specs=(P(None, "seq"),) * 3,
            out_specs=P(None, "seq"), check_vma=False,
        )
        return jnp.sum(f(q, k, v) * w)

    def dense_loss(q, k, v):
        s = jnp.einsum("bind,bjnd->bnij", q, k) / np.sqrt(D)
        s = jnp.where(jnp.tril(jnp.ones((L, L), bool))[None, None], s, -1e30)
        o = jnp.einsum("bnij,bjnd->bind", jax.nn.softmax(s, axis=-1), v)
        return jnp.sum(o * w)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_dense, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3, err_msg=name
        )


@pytest.mark.slow
def test_ppermute_ring_token_causal():
    """ring_attention_local(causal="token") == dense causal, and is
    differentiable (the SP-LM training path)."""
    from omnivideo_tpu.parallel.ring import ring_attention_local

    mesh = _mesh(4)
    rng = np.random.default_rng(11)
    B, L, N, D = 1, 256, 2, 32
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)

    def ring(q, k, v):
        f = shard_map(
            functools.partial(ring_attention_local, axis="seq", causal="token"),
            mesh=mesh, in_specs=(P(None, "seq"),) * 3,
            out_specs=P(None, "seq"), check_vma=False,
        )
        return f(q, k, v)

    s = jnp.einsum("bind,bjnd->bnij", q, k) / np.sqrt(D)
    s = jnp.where(jnp.tril(jnp.ones((L, L), bool))[None, None], s, -1e30)
    ref = jnp.einsum("bnij,bjnd->bind", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(ring(q, k, v)), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    g_r = jax.grad(lambda *a: jnp.sum(ring(*a) * w), argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(
        lambda q, k, v: jnp.sum(jnp.einsum(
            "bnij,bjnd->bind",
            jax.nn.softmax(jnp.where(
                jnp.tril(jnp.ones((L, L), bool))[None, None],
                jnp.einsum("bind,bjnd->bnij", q, k) / np.sqrt(D), -1e30),
                axis=-1), v) * w),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_r, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_ring_trainable_varlen_gradients_match_dense():
    """Padded-sequence training through the fused ring kernel: kv_lens output
    AND gradients match dense masked attention; padded rows get zero grad
    (reference sp-multiple seq rounding, x2x_gen_unified.py:332-334)."""
    from omnivideo_tpu.ops.pallas.ring_attention import (
        ring_flash_attention_trainable,
    )

    mesh = _mesh(4)
    rng = np.random.default_rng(11)
    B, L, N, D = 2, 512, 2, 128
    lens = jnp.asarray([384, 512], jnp.int32)  # batch 0 padded by one shard
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    # upstream cotangent zeroed on padded rows (the loss never sees them)
    valid = (jnp.arange(L)[None, :, None, None] < lens[:, None, None, None])
    w = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32) * valid

    def ring_loss(q, k, v):
        f = shard_map(
            lambda q, k, v, lens: ring_flash_attention_trainable(
                q, k, v, axis_name="seq", block_q=128, block_k=128,
                interpret=True, kv_lens=lens),
            mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"), P(None)),
            out_specs=P(None, "seq"),
            check_vma=False,
        )
        return jnp.sum(f(q, k, v, lens) * w)

    def dense_loss(q, k, v):
        return jnp.sum(attention_xla(q, k, v, kv_lens=lens) * valid * w)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_dense, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3, err_msg=name
        )
    # padded rows must not leak gradient
    pad = ~np.asarray(valid)[:, :, 0, 0]  # [B, L]
    for g, name in zip(g_ring, ("dq", "dk", "dv")):
        leak = float(np.max(np.abs(np.asarray(g)[pad])))
        assert leak == 0.0, f"{name} leaks {leak} into padded rows"
