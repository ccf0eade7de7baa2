"""Attention tests: XLA oracle invariants + Pallas kernel (interpret mode).

The Pallas kernel is additionally validated against the XLA oracle on real
TPU hardware by tools/dev/tpu_kernel_check.py (bf16 max-err ≤ 8e-3 at
D=128, L≈1k); interpret-mode here covers the same code path on CPU with
tiny shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.ops import attention_xla
from omnivideo_tpu.ops.pallas.flash_attention import flash_attention


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), dtype)


def test_xla_attention_matches_manual_softmax():
    B, L, N, D = 1, 7, 2, 8
    q, k, v = _rand((B, L, N, D), 0), _rand((B, L, N, D), 1), _rand((B, L, N, D), 2)
    out = attention_xla(q, k, v)
    qf = np.asarray(q, np.float64)
    kf = np.asarray(k, np.float64)
    vf = np.asarray(v, np.float64)
    logits = np.einsum("bind,bjnd->bnij", qf, kf) / np.sqrt(D)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bnij,bjnd->bind", w, vf)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_xla_attention_kv_mask():
    B, Lq, Lk, N, D = 2, 5, 9, 2, 8
    q, k, v = _rand((B, Lq, N, D), 0), _rand((B, Lk, N, D), 1), _rand((B, Lk, N, D), 2)
    lens = jnp.array([9, 4], jnp.int32)
    out = attention_xla(q, k, v, kv_lens=lens)
    # batch row 1 must equal attention over truncated kv
    out_trunc = attention_xla(q[1:], k[1:, :4], v[1:, :4])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out_trunc[0]), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_pallas_flash_matches_xla_interpret():
    B, Lq, Lk, N, D = 1, 256, 256, 1, 64
    q, k, v = _rand((B, Lq, N, D), 0), _rand((B, Lk, N, D), 1), _rand((B, Lk, N, D), 2)
    lens = jnp.array([200], jnp.int32)
    ref = attention_xla(q, k, v, kv_lens=lens)
    out = flash_attention(q, k, v, lens, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_attention_grad_path():
    """custom_vjp backward (XLA recompute) is differentiable."""
    B, L, N, D = 1, 8, 1, 8

    def loss(q, k, v):
        # interpret=True so it runs on CPU
        out = flash_attention(q, k, v, None, None, 128, 128, True)
        return jnp.sum(out**2)

    q, k, v = _rand((B, L, N, D), 0), _rand((B, L, N, D), 1), _rand((B, L, N, D), 2)
    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        assert bool(jnp.isfinite(gi).all())
        assert float(jnp.abs(gi).sum()) > 0


@pytest.mark.slow
def test_pallas_backward_matches_xla_vjp():
    """Pallas flash backward (dq/dk/dv kernels from LSE residuals) vs the XLA
    attention VJP — including masked KV and Lq != Lk."""
    B, Lq, Lk, N, D = 1, 200, 150, 2, 64
    q = _rand((B, Lq, N, D), 0)
    k = _rand((B, Lk, N, D), 1)
    v = _rand((B, Lk, N, D), 2)
    kv = jnp.array([120], jnp.int32)
    g = _rand((B, Lq, N, D), 3)

    out_p, vjp_p = jax.vjp(lambda q, k, v: flash_attention(q, k, v, kv, None, 128, 128, True), q, k, v)
    out_x, vjp_x = jax.vjp(lambda q, k, v: attention_xla(q, k, v, kv), q, k, v)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-4, atol=2e-5)
    for a, b in zip(vjp_p(g), vjp_x(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5)


def test_pallas_backward_nondivisible_blocks():
    """Padded KV length NOT divisible by the requested block must not drop
    grid blocks. Lk=300 → Lk_p=384 with fwd bk=128; a bwd that re-derives
    bk=min(256, 384)=256 and floor-divides covers only 256 of 384 kv rows —
    silently wrong dq/dk/dv (found on chip by tools/dev/bench_train_step.py,
    where Lk=4680 → Lk_p=4736=37·128 also compile-OOM'd scoped VMEM)."""
    B, Lq, Lk, N, D = 1, 300, 300, 1, 64
    q = _rand((B, Lq, N, D), 7)
    k = _rand((B, Lk, N, D), 8)
    v = _rand((B, Lk, N, D), 9)
    g = _rand((B, Lq, N, D), 10)

    out_p, vjp_p = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, None, None, 256, 256, True),
        q, k, v)
    out_x, vjp_x = jax.vjp(lambda q, k, v: attention_xla(q, k, v), q, k, v)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=2e-4, atol=2e-5)
    for a, b in zip(vjp_p(g), vjp_x(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5)


@pytest.mark.slow
def test_pallas_backward_unmasked_square():
    B, L, N, D = 1, 256, 1, 64
    q, k, v = _rand((B, L, N, D), 4), _rand((B, L, N, D), 5), _rand((B, L, N, D), 6)

    def lp(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, None, 128, 128, True) ** 2)

    def lx(q, k, v):
        return jnp.sum(attention_xla(q, k, v) ** 2)

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lx, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5)


def test_flash_packed_and_fallback_layouts_match():
    """The packed [B,L,N·D] path (D%128==0) and the head-major transpose
    fallback (D%128!=0) both match the XLA oracle in interpret mode — pins
    the layout dispatch in _flash_fwd_unpadded."""
    from omnivideo_tpu.ops import attention_xla
    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention

    for (B, Lq, Lk, N, D) in [(1, 260, 200, 2, 128),   # packed
                              (2, 130, 70, 3, 64)]:    # fallback
        q = _rand((B, Lq, N, D), 0)
        k = _rand((B, Lk, N, D), 1)
        v = _rand((B, Lk, N, D), 2)
        ref = np.asarray(attention_xla(q, k, v), np.float32)
        out = np.asarray(
            flash_attention(q, k, v, None, None, 128, 128, True), np.float32)
        np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-2)


def test_pallas_flash_bounded_softmax_matches_xla():
    """assume_normalized=True (bounded softmax, no running max) == oracle —
    exactness: subtracting the Cauchy-Schwarz log2 bound only shifts f32
    exponents. Covers packed D=128, kv_lens masking, and cross-attn
    single-kv-step shapes."""
    rng = np.random.default_rng(11)

    def mk(B, L, N, D, scale=1.0):
        x = rng.standard_normal((B, L, N, D)).astype(np.float32) * scale
        # qk-normed-like rows: normalize to |row| = sqrt(D)
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return jnp.asarray(x / n * np.sqrt(D))

    # self-attention, multi-kv-step
    q, k, v = mk(1, 512, 2, 128), mk(1, 512, 2, 128), mk(1, 512, 2, 128)
    ref = attention_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True,
                          assume_normalized=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-3, atol=2e-3)

    # kv_lens masking (padded tail must not contribute)
    lens = jnp.asarray([300], jnp.int32)
    ref = attention_xla(q, k, v, kv_lens=lens)
    out = flash_attention(q, k, v, kv_lens=lens, block_q=128, block_k=128,
                          interpret=True, assume_normalized=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-3, atol=2e-3)

    # cross-attention single-kv-step form (small Lk spans one block)
    kc, vc = mk(1, 256, 2, 128), mk(1, 256, 2, 128)
    ref = attention_xla(q, kc, vc)
    out = flash_attention(q, kc, vc, block_q=128, block_k=2048,
                          interpret=True, assume_normalized=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-3, atol=2e-3)


def test_bounded_softmax_xattn_multi_vs_single_step(monkeypatch):
    """Cross-attention-sized Lk (block_k < Lk_r <= 8192) under bounded
    softmax now defaults to MULTI-step KV with a divisor bk (no rescale
    exists to amortize, and the smaller logits tile frees VMEM for wider q
    tiles on chip). Both routes must match the oracle, and each other."""
    rng = np.random.default_rng(7)

    def mk(B, L, N, D):
        x = rng.standard_normal((B, L, N, D)).astype(np.float32)
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return jnp.asarray(x / n * np.sqrt(D))

    # Lk=2500 -> Lk_r=2560: multi picks divisor bk=512 (5 steps); the tail
    # 60 rows of the boundary block exercise the kv_len mask + zero_oob_v
    q, k, v = mk(1, 256, 2, 128), mk(1, 2500, 2, 128), mk(1, 2500, 2, 128)
    ref = attention_xla(q, k, v)
    outs = {}
    for mode in ("multi", "single"):
        monkeypatch.setenv("FLASH_XATTN_MODE", mode)
        outs[mode] = flash_attention(q, k, v, block_q=256, block_k=512,
                                     interpret=True, assume_normalized=True)
        np.testing.assert_allclose(np.asarray(outs[mode]), np.asarray(ref),
                                   rtol=3e-3, atol=2e-3, err_msg=mode)
    np.testing.assert_allclose(np.asarray(outs["multi"]),
                               np.asarray(outs["single"]), rtol=1e-6, atol=1e-6)


def test_bounded_softmax_huge_norm_guard():
    """Rows far below the global Cauchy-Schwarz bound must NOT be zeroed:
    when the worst-case slack approaches f32 exp2's underflow range (e.g.
    qk-norm gains grown by a finetune), the dispatch falls back to the
    max-tracked kernel via lax.cond — output still a correct softmax."""
    rng = np.random.default_rng(3)
    B, L, N, D = 1, 256, 2, 128
    q = rng.standard_normal((B, L, N, D)).astype(np.float32)
    k = rng.standard_normal((B, L, N, D)).astype(np.float32)
    v = rng.standard_normal((B, L, N, D)).astype(np.float32)
    # blow up ONE k row so the global bound dwarfs every other row's max
    # logit: under the unguarded bounded kernel all other rows' exp2 terms
    # flush to zero and those rows emit zeros
    k[0, 0, :, :] *= 3e4
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    ref = attention_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True,
                          assume_normalized=True)
    assert np.isfinite(np.asarray(out)).all()
    # without the guard, rows that don't attend to the huge key are ~0
    assert float(jnp.max(jnp.abs(out[:, 1:]))) > 1e-3
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_dit_passes_assume_normalized(monkeypatch):
    """wan_block_apply must hand assume_normalized=cfg.qk_norm to the
    attention dispatch (both self- and cross-attention) — a silent loss of
    this flag would silently forfeit the bounded-softmax fast path."""
    import jax

    import omnivideo_tpu.models.wan_dit as wd
    from omnivideo_tpu.configs.base import WanDiTConfig

    seen = []
    orig = wd.attention

    def spy(*a, **kw):
        seen.append(kw.get("assume_normalized", False))
        return orig(*a, **kw)

    monkeypatch.setattr(wd, "attention", spy)
    cfg = WanDiTConfig(patch_size=(1, 2, 2), text_len=8, in_dim=4, dim=64,
                       ffn_dim=128, freq_dim=32, text_dim=48, out_dim=4,
                       num_heads=4, num_layers=1)
    params = wd.init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 8, 8))
    out = wd.wan_dit_apply(params, cfg, x, jnp.array([500.0]),
                           jax.random.normal(jax.random.PRNGKey(2), (1, 8, 48)),
                           attn_impl="xla")
    assert seen and all(seen), seen  # qk_norm=True default → flag passed
    assert out.shape == (1, 4, 2, 8, 8)


@pytest.mark.parametrize("gain", [0.5, 1.0, 1.7, 2.2, 4.0, 10.0])
def test_bounded_softmax_gain_sweep(gain):
    """VERDICT r4 item 8: finetuned/LoRA-merged checkpoints can GROW the
    qk-norm gains, moving the Cauchy-Schwarz bound toward (and past) the
    underflow-guard fallback threshold. Sweep row-norm gains across the
    boundary (at hd=128 the lax.cond flips near gain ~1.9) — every
    magnitude must still match the oracle softmax, with no zeroed rows."""
    rng = np.random.default_rng(int(gain * 10))
    B, L, N, D = 1, 256, 2, 128

    def mk(seed_off, g):
        x = rng.standard_normal((B, L, N, D)).astype(np.float32)
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return jnp.asarray(x / n * (g * np.sqrt(D)))

    q, k, v = mk(0, gain), mk(1, gain), mk(2, 1.0)
    ref = attention_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True,
                          assume_normalized=True)
    assert np.isfinite(np.asarray(out)).all()
    # no silently-zeroed rows: softmax(v rows of unit-ish norm) can't be ~0
    row_norms = np.linalg.norm(np.asarray(out, np.float32), axis=-1)
    assert row_norms.min() > 1e-4, f"zeroed rows at gain={gain}"
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=7e-3, atol=7e-3,
                               err_msg=f"gain={gain}")


@pytest.mark.parametrize("gain", [1.0, 2.5, 8.0])
def test_bounded_softmax_gain_sweep_qk_prep_path(gain):
    """Same sweep through the PRODUCTION fused path: qk_prep's row-norm
    bounds feed the dispatch, so a grown gain vector must trip the same
    fallback there (the r4 fix only unit-tested a fixed threshold)."""
    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention_infer
    from omnivideo_tpu.ops.pallas.qk_prep import qk_prep
    from omnivideo_tpu.ops.norms import rms_norm

    rng = np.random.default_rng(5)
    B, L, N, hd = 1, 256, 2, 128
    d = N * hd
    xq = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)
    xk = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, hd)) * 0.5, jnp.float32)
    g = jnp.full((d,), gain, jnp.float32)  # LoRA-merged/finetuned gains

    q, qn = qk_prep(xq, g, None, None, N, interpret=True)
    k, kn = qk_prep(xk, g, None, None, N, interpret=True)
    ref = attention_xla(rms_norm(xq, g, 1e-5).reshape(B, L, N, hd),
                        rms_norm(xk, g, 1e-5).reshape(B, L, N, hd), v)
    out = flash_attention_infer(q, k, v, block_q=128, block_k=128,
                                interpret=True, assume_normalized=True,
                                qk_row_norms=(qn, kn))
    assert np.isfinite(np.asarray(out)).all()
    row_norms = np.linalg.norm(np.asarray(out, np.float32), axis=-1)
    assert row_norms.min() > 1e-4, f"zeroed rows at gain={gain}"
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=7e-3, atol=7e-3, err_msg=f"gain={gain}")
