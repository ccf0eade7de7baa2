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


def test_v1_aligned_embedding_chain():
    """VisionHead -> DM_Adapter per-frame chain (omni_video_model.py:243-265)."""
    from omnivideo_tpu.models.adapters import v1_aligned_embedding

    g = np.load(GOLDEN)
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    # adapter fixture: in=24 out=32, 8 queries. The vision head (same weights)
    # emits 32-dim tokens, so widen the adapter bridge input 24→32 for the
    # chain-shape test (chain semantics, not numerics, are under test here —
    # both submodules have their own golden parity tests).
    sd2 = dict(sd)
    w = np.asarray(sd["fc.0.weight"])  # [32, 24]
    sd2["fc.0.weight"] = np.concatenate([w, w[:, :8]], axis=1)  # [32, 32]
    adapter = dm_adapter_from_state_dict(sd2)
    vh_sd = {k.replace("adapter.", "visionHeadAdapter."): v for k, v in sd.items()}
    vh = vision_head_from_state_dict(vh_sd)

    vlm = jnp.asarray(np.random.default_rng(0).standard_normal((1, 10, 24)), jnp.float32)
    # image: only query 0 -> [1, 8 queries of adapter, 32]
    img = v1_aligned_embedding(vh, adapter, vlm, is_video=False)
    assert img.shape == (1, 8, 32)
    # video: all 8 head queries x 8 adapter queries
    vid = v1_aligned_embedding(vh, adapter, vlm, is_video=True)
    assert vid.shape == (1, 64, 32)
    assert np.isfinite(np.asarray(vid)).all()
