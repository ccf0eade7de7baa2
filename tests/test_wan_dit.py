"""Wan DiT parity and invariant tests.

The golden fixture (tests/golden/wan_dit_tiny.npz) was produced by running the
*reference torch implementation* on CPU (tools/dev/make_golden_dit.py) — the
strongest possible parity evidence without importing torch at test time.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.configs.base import WanDiTConfig
from omnivideo_tpu.io.torch_convert import to_jnp, wan_state_dict_to_params
from omnivideo_tpu.models.wan_dit import (
    init_wan_dit,
    patchify,
    sinusoidal_embedding_1d,
    unpatchify,
    wan_dit_apply,
)
from omnivideo_tpu.ops.rope import apply_rope, rope_3d_tables

GOLDEN = Path(__file__).parent / "golden" / "wan_dit_tiny.npz"

TINY = WanDiTConfig(
    patch_size=(1, 2, 2),
    text_len=16,
    in_dim=4,
    dim=64,
    ffn_dim=128,
    freq_dim=32,
    text_dim=48,
    out_dim=4,
    num_heads=4,
    num_layers=2,
    qk_norm=True,
    cross_attn_norm=True,
    eps=1e-6,
)


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "run tools/dev/make_golden_dit.py"
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def golden_params(golden):
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    params = wan_state_dict_to_params(sd, num_layers=TINY.num_layers)
    return to_jnp(params, dtype=jnp.float32)


def _golden_ctx(golden):
    ctx = np.zeros((2, TINY.text_len, TINY.text_dim), np.float32)
    c0, c1 = golden["ctx0"], golden["ctx1"]
    ctx[0, : len(c0)] = c0
    ctx[1, : len(c1)] = c1
    return jnp.asarray(ctx)


def test_golden_forward_parity(golden, golden_params):
    out = wan_dit_apply(
        golden_params,
        TINY,
        jnp.asarray(golden["x"]),
        jnp.asarray(golden["t"]),
        _golden_ctx(golden),
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), golden["out"], rtol=2e-4, atol=2e-4)


def test_golden_forward_parity_padded_seq(golden, golden_params):
    out = wan_dit_apply(
        golden_params,
        TINY,
        jnp.asarray(golden["x"]),
        jnp.asarray(golden["t"]),
        _golden_ctx(golden),
        seq_len=100,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out), golden["out_padded"], rtol=2e-4, atol=2e-4
    )


def test_remat_matches(golden, golden_params):
    args = (
        jnp.asarray(golden["x"]),
        jnp.asarray(golden["t"]),
        _golden_ctx(golden),
    )
    y0 = wan_dit_apply(golden_params, TINY, *args, attn_impl="xla")
    y1 = wan_dit_apply(golden_params, TINY, *args, attn_impl="xla", remat=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


def test_residual_dtype_bf16_close_to_f32(golden, golden_params):
    """residual_dtype=bf16 (bandwidth mode) stays close to the f32-stream
    parity path: the residual adds still compute in f32, only the stored
    [B,L,dim] stream is rounded to bf16 between ops."""
    args = (
        jnp.asarray(golden["x"]),
        jnp.asarray(golden["t"]),
        _golden_ctx(golden),
    )
    y0 = wan_dit_apply(golden_params, TINY, *args, attn_impl="xla")
    y1 = wan_dit_apply(golden_params, TINY, *args, attn_impl="xla",
                       residual_dtype=jnp.bfloat16)
    d = np.abs(np.asarray(y1) - np.asarray(y0))
    scale = np.abs(np.asarray(y0)).mean() + 1e-6
    assert (d.mean() / scale) < 3e-2, (d.mean(), scale)
    # and the mode composes with remat (inference-time memory knob)
    y2 = wan_dit_apply(golden_params, TINY, *args, attn_impl="xla",
                       residual_dtype=jnp.bfloat16, remat=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 3, 8, 8)), jnp.float32)
    tokens = patchify(x, (1, 2, 2))
    assert tokens.shape == (2, 3 * 4 * 4, 4 * 1 * 2 * 2)
    back = unpatchify(tokens, (3, 4, 4), (1, 2, 2), 4)
    # patchify flattens as (C, pt, ph, pw); unpatchify expects (pt, ph, pw, C)
    t2 = tokens.reshape(2, 48, 4, 1, 2, 2).transpose(0, 1, 3, 4, 5, 2).reshape(2, 48, 16)
    back = unpatchify(t2, (3, 4, 4), (1, 2, 2), 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)


def test_sinusoidal_embedding_matches_reference_formula():
    t = jnp.asarray([0.0, 250.0, 999.0])
    emb = sinusoidal_embedding_1d(32, t)
    half = 16
    pos = np.asarray(t, np.float64)
    sin = np.outer(pos, np.power(10000.0, -np.arange(half) / half))
    ref = np.concatenate([np.cos(sin), np.sin(sin)], axis=1)
    np.testing.assert_allclose(np.asarray(emb), ref, rtol=1e-4, atol=1e-5)


def test_rope_matches_complex_oracle():
    """apply_rope (f32 cos/sin) vs the reference's complex fp64 rotation
    (model.py:38-65), re-derived in numpy."""
    grid, n, d = (3, 4, 5), 2, 24
    L = int(np.prod(grid))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, L, n, d))

    c = d // 2
    ct, ch, cw = c - 2 * (c // 3), c // 3, c // 3
    freqs = []
    for axis_len, cdim in zip(grid, (ct, ch, cw)):
        ang = np.outer(
            np.arange(1024, dtype=np.float64),
            1.0 / np.power(10000.0, np.arange(0, 2 * cdim, 2, np.float64) / (2 * cdim)),
        )
        freqs.append(np.exp(1j * ang))
    f, h, w = grid
    fr = np.concatenate(
        [
            np.broadcast_to(freqs[0][:f][:, None, None, :], (f, h, w, ct)),
            np.broadcast_to(freqs[1][:h][None, :, None, :], (f, h, w, ch)),
            np.broadcast_to(freqs[2][:w][None, None, :, :], (f, h, w, cw)),
        ],
        axis=-1,
    ).reshape(L, 1, c)
    xc = x.reshape(1, L, n, c, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    yc = xc * fr[None]
    ref = np.stack([yc.real, yc.imag], axis=-1).reshape(1, L, n, d)

    cos, sin = rope_3d_tables(grid, d)
    out = apply_rope(jnp.asarray(x, jnp.float32), cos, sin)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_zero_head_init_gives_zero_velocity():
    cfg = TINY
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))
    y = wan_dit_apply(params, cfg, x, jnp.array([500.0]), ctx, attn_impl="xla")
    assert float(jnp.abs(y).max()) == 0.0


def test_gradients_flow():
    cfg = TINY
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))

    tgt = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 3, 8, 8))

    def loss(p):
        y = wan_dit_apply(p, cfg, x, jnp.array([500.0]), ctx, attn_impl="xla", remat=True)
        return jnp.mean(y * tgt)  # linear: nonzero grads even with zero-init head

    grads = jax.grad(loss)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), grads, 0.0
    )
    assert jnp.isfinite(gnorm)
    hk = grads["head"]["head"]["kernel"]
    assert float(jnp.sum(jnp.abs(hk))) > 0.0


def test_aux_inputs_is_jit_safe_pytree():
    """WanAuxInputs must remain passable AS A JIT ARGUMENT: every field is
    either an array or None/SPConfig-free in the hot benches (the A14B block
    bench jits `lambda bp, x, aux: wan_block_apply(...)`). A non-array leaf
    (e.g. a str config knob — round-3 regression) breaks tracing with
    'cannot interpret str as abstract array'."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.models import wan_dit as wd

    cfg = WanDiTConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=1,
                       freq_dim=32, text_dim=64, in_dim=16, out_dim=16)
    bp = wd.init_wan_block(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, L = 1, 24
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg.dim), jnp.float32)
    e0 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 6, cfg.dim), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (B, 8, cfg.dim), jnp.float32)
    cos, sin = wd.rope_3d_tables((2, 3, 4), cfg.head_dim, 64, 10000.0)
    aux = wd.WanAuxInputs(e0=e0, context=ctx, rope_cos=cos, rope_sin=sin,
                          kv_lens=None, sp=None)

    out = jax.jit(
        lambda bp, x, aux: wd.wan_block_apply(bp, x, aux, cfg, "xla")
    )(bp, x, aux)
    assert out.shape == (B, L, cfg.dim)
