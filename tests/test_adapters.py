"""DM_Adapter / VisionHead parity vs the reference torch implementation."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.models.adapters import (
    dm_adapter_apply,
    dm_adapter_from_state_dict,
    vision_head_apply,
    vision_head_from_state_dict,
)

GOLDEN = Path(__file__).parent / "golden" / "adapter_tiny.npz"


def test_dm_adapter_parity():
    g = np.load(GOLDEN)
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    params = dm_adapter_from_state_dict(sd)
    out = dm_adapter_apply(params, jnp.asarray(g["x"]))
    assert out.shape == g["out"].shape  # [B, 8 queries, 32]
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=2e-4, atol=2e-4)


def test_vision_head_same_core():
    """VisionHead uses the same seq2seq core with 'visionHeadAdapter' prefix;
    remap the DM_Adapter fixture names and verify identical outputs."""
    g = np.load(GOLDEN)
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    vh_sd = {k.replace("adapter.", "visionHeadAdapter."): v for k, v in sd.items()}
    params = vision_head_from_state_dict(vh_sd)
    out = vision_head_apply(params, jnp.asarray(g["x"]))
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=2e-4, atol=2e-4)
