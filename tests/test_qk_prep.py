"""Fused qk-prep kernel (rms-norm + gain + rope + row-norm bound) parity.

Must match the unfused chain rms_norm -> apply_rope (models/wan_dit.py's
attention prologue, reference model.py:68-84,46-65) and emit VALID upper
bounds for the bounded-softmax dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.ops.norms import rms_norm
from omnivideo_tpu.ops.pallas.qk_prep import qk_prep
from omnivideo_tpu.ops.rope import apply_rope, rope_3d_tables


def _setup(B=2, L=300, N=2, hd=128, seed=0, grid=(3, 10, 10)):
    d = N * hd
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, L, d)), jnp.bfloat16)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
    cos, sin = rope_3d_tables(grid, hd, 1024, 10000.0)
    return x, g, cos, sin, N, hd


def _ref(x, g, cos, sin, N, hd, eps=1e-5):
    B, L, d = x.shape
    y = rms_norm(x, g, eps).reshape(B, L, N, hd)
    if cos is not None:
        y = apply_rope(y, cos, sin)
    return y


@pytest.mark.parametrize("block_rows", [128, 256])
def test_qk_prep_matches_unfused_chain(block_rows):
    x, g, cos, sin, N, hd = _setup()
    ref = _ref(x, g, cos, sin, N, hd)
    y, rn = qk_prep(x, g, cos, sin, N, block_rows=block_rows, interpret=True)
    assert y.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)  # bf16 ULP differences only
    # bound validity: rn >= every actual (bf16) row norm, per (batch, head)
    actual = np.linalg.norm(np.asarray(y, np.float32), axis=-1).max(axis=1)
    assert (np.asarray(rn) >= actual - 1e-6).all()
    # and tight: within the bf16-slack factor of the true max
    assert (np.asarray(rn) <= actual * 1.02 + 1e-3).all()


def test_qk_prep_norm_only_cross_k():
    x, g, _, _, N, hd = _setup(L=256, seed=3)
    ref = _ref(x, g, None, None, N, hd)
    y, rn = qk_prep(x, g, None, None, N, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)
    actual = np.linalg.norm(np.asarray(y, np.float32), axis=-1).max(axis=1)
    assert (np.asarray(rn) >= actual - 1e-6).all()


def test_qk_prep_rows_past_rope_table():
    """Sequence padding (L > Lr): rows past the rope table pass through
    unrotated, matching apply_rope's tail concat (reference model.py:61)."""
    x, g, cos, sin, N, hd = _setup(L=340, seed=5)  # Lr=300 < L=340
    ref = _ref(x, g, cos, sin, N, hd)
    y, _ = qk_prep(x, g, cos, sin, N, block_rows=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_wan_block_fused_qk_prologue_matches_xla():
    """wan_block_apply(qk_impl='pallas_interpret') — the fused prologue +
    flash_attention_infer path — must match the default XLA chain for BOTH
    the self-attn (rope) and cross-attn (norm-only) prologues."""
    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.models.wan_dit import (
        WanAuxInputs, init_wan_block, wan_block_apply)

    cfg = WanDiTConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=256, ffn_dim=256,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=2, num_layers=1)
    assert cfg.head_dim == 128
    bp = init_wan_block(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B, L, Lc = 1, 260, 16
    cos, sin = rope_3d_tables((4, 8, 8), cfg.head_dim, 1024, 10000.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg.dim), jnp.float32)
    e0 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 6, cfg.dim),
                           jnp.float32) * 0.02
    ctx = jax.random.normal(jax.random.PRNGKey(3), (B, Lc, cfg.dim),
                            jnp.bfloat16)
    aux = WanAuxInputs(e0=e0, context=ctx, rope_cos=cos, rope_sin=sin,
                       kv_lens=None, sp=None)
    ref = wan_block_apply(bp, x, aux, cfg, attn_impl="pallas_interpret")
    out = wan_block_apply(bp, x, aux, cfg, attn_impl="pallas_interpret",
                          qk_impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
    # and against the pure-XLA oracle too
    oracle = wan_block_apply(bp, x, aux, cfg, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=3e-2, atol=3e-2)


def test_qk_prep_feeds_bounded_flash_parity():
    """End-to-end: qk_prep outputs + row-norm bounds through
    flash_attention_infer == the unfused chain through flash_attention."""
    from omnivideo_tpu.ops.pallas.flash_attention import (
        flash_attention, flash_attention_infer)

    x, g, cos, sin, N, hd = _setup(B=1, L=256, seed=7, grid=(4, 8, 8))
    kx, kg = _setup(B=1, L=256, seed=8, grid=(4, 8, 8))[:2]
    q_ref = _ref(x, g, cos, sin, N, hd)
    k_ref = _ref(kx, kg, cos, sin, N, hd)
    v = jnp.asarray(np.random.default_rng(9).standard_normal(
        (1, 256, N, hd)), jnp.bfloat16)
    ref = flash_attention(q_ref, k_ref, v, block_q=128, block_k=128,
                          interpret=True, assume_normalized=True)
    q, qn = qk_prep(x, g, cos, sin, N, block_rows=128, interpret=True)
    k, kn = qk_prep(kx, kg, cos, sin, N, block_rows=128, interpret=True)
    out = flash_attention_infer(q, k, v, block_q=128, block_k=128,
                                interpret=True, assume_normalized=True,
                                qk_row_norms=(qn, kn))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)
