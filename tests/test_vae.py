"""Causal 3D VAE parity tests against reference-generated golden fixtures.

The fixture (tests/golden/vae_tiny.npz) was produced by the *reference torch
implementation* with a shrunken but structurally-identical config (same
dim_mult / temporal-downsample schedule as Wan2.1_VAE); see
tools/dev/make_golden_vae.py. These tests prove the lax.scan streaming
formulation (explicit conv-cache carries, peeled first chunk) matches the
reference's mutable feat_cache streaming bit-for-bit up to f32 tolerance.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.configs.base import VAEConfig
from omnivideo_tpu.io.torch_convert import to_jnp
from omnivideo_tpu.models.vae2_1 import (
    Wan21VAE,
    init_vae,
    vae_decode,
    vae_encode,
    vae_state_dict_to_params,
)

GOLDEN = Path(__file__).parent / "golden" / "vae_tiny.npz"

TINY = VAEConfig(
    dim=8,
    z_dim=4,
    dim_mult=(1, 2, 4, 4),
    num_res_blocks=2,
    attn_scales=(),
    temperal_downsample=(False, True, True),
)


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "run tools/dev/make_golden_vae.py"
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    return to_jnp(vae_state_dict_to_params(sd, TINY))


def test_encode_parity(golden, params):
    z = vae_encode(params, TINY, jnp.asarray(golden["x"]))
    assert z.shape == golden["z"].shape
    np.testing.assert_allclose(np.asarray(z), golden["z"], rtol=1e-4, atol=1e-4)


def test_decode_parity(golden, params):
    rec = vae_decode(params, TINY, jnp.asarray(golden["z_in"]))
    assert rec.shape == golden["rec"].shape
    np.testing.assert_allclose(np.asarray(rec), golden["rec"], rtol=1e-4, atol=1e-4)


def test_encode_shapes_compression():
    cfg = TINY
    params = init_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 16, 16))
    z = vae_encode(params, cfg, x)
    # stride (4, 8, 8): T 5→2, H/W 16→2
    assert z.shape == (1, cfg.z_dim, 2, 2, 2)


def test_roundtrip_shape_and_range():
    cfg = TINY
    params = init_vae(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 3, 2, 2))
    rec = vae_decode(params, cfg, z)
    assert rec.shape == (1, 3, 9, 16, 16)
    assert float(jnp.max(rec)) <= 1.0 and float(jnp.min(rec)) >= -1.0


def test_streaming_consistency_longer_video(golden, params):
    """Streaming must be self-consistent: encoding a longer clip gives the
    same leading latent frames as encoding its prefix (causality)."""
    x = jnp.asarray(golden["x"])  # [1, 3, 9, 16, 16]
    z_full = vae_encode(params, TINY, x)
    z_prefix = vae_encode(params, TINY, x[:, :, :5])
    np.testing.assert_allclose(
        np.asarray(z_full[:, :, :2]), np.asarray(z_prefix), rtol=1e-4, atol=1e-5
    )


def test_wan21_vae_wrapper_scaling(golden, params):
    cfg = VAEConfig(
        dim=8, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=2,
        temperal_downsample=(False, True, True),
    )
    vae = Wan21VAE.create(params, cfg)
    x = jnp.asarray(golden["x"])
    z = vae.encode(x)
    z_raw = vae_encode(params, cfg, x)
    np.testing.assert_allclose(
        np.asarray(z),
        (np.asarray(z_raw) - np.asarray(vae.mean).reshape(1, -1, 1, 1, 1))
        * np.asarray(vae.inv_std).reshape(1, -1, 1, 1, 1),
        rtol=1e-5,
    )
