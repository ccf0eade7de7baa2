"""Wan2.2 VAE parity tests vs reference-generated golden fixtures."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.io.torch_convert import to_jnp
from omnivideo_tpu.models.vae2_2 import (
    VAE22Config,
    patchify_pixels,
    unpatchify_pixels,
    vae22_decode,
    vae22_encode,
    vae22_state_dict_to_params,
)

GOLDEN = Path(__file__).parent / "golden" / "vae22_tiny.npz"

TINY = VAE22Config(
    dim=8, dec_dim=12, z_dim=6, dim_mult=(1, 2, 4, 4), num_res_blocks=2,
    temperal_downsample=(False, True, True),
)


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "run tools/dev/make_golden_vae22.py"
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    return to_jnp(vae22_state_dict_to_params(sd, TINY))


def test_patchify_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 5, 8, 8)), jnp.float32)
    y = patchify_pixels(x, 2)
    assert y.shape == (1, 12, 5, 4, 4)
    np.testing.assert_allclose(np.asarray(unpatchify_pixels(y, 2)), np.asarray(x))


def test_encode22_parity(golden, params):
    z = vae22_encode(params, TINY, jnp.asarray(golden["x"]))
    assert z.shape == golden["z"].shape
    np.testing.assert_allclose(np.asarray(z), golden["z"], rtol=1e-4, atol=1e-4)


def test_decode22_parity(golden, params):
    rec = vae22_decode(params, TINY, jnp.asarray(golden["z_in"]))
    assert rec.shape == golden["rec"].shape
    np.testing.assert_allclose(np.asarray(rec), golden["rec"], rtol=1e-4, atol=1e-4)
