"""JAX Qwen3-VL vision tower parity against HF transformers."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from omnivideo_tpu.models.qwen3vl.vision_model import (
    Qwen3VLVisionConfig,
    vision_forward,
    vision_hf_to_params,
)


@pytest.fixture(scope="module")
def tiny():
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLVisionConfig as HFCfg,
    )
    from transformers.models.qwen3_vl.modeling_qwen3_vl import Qwen3VLVisionModel

    hf_cfg = HFCfg(
        hidden_size=64,
        intermediate_size=128,
        depth=4,
        num_heads=4,
        in_channels=3,
        patch_size=4,
        temporal_patch_size=2,
        spatial_merge_size=2,
        out_hidden_size=48,
        num_position_embeddings=64,  # 8x8 grid
        deepstack_visual_indexes=[1, 2],
    )
    torch.manual_seed(0)
    m = Qwen3VLVisionModel._from_config(hf_cfg).eval().float()
    cfg = Qwen3VLVisionConfig(
        hidden_size=64, intermediate_size=128, depth=4, num_heads=4,
        in_channels=3, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, out_hidden_size=48, num_position_embeddings=64,
        deepstack_visual_indexes=(1, 2),
    )
    return m, cfg


@pytest.mark.parametrize("grid", [(1, 4, 6), (2, 6, 4)])
def test_vision_tower_parity(tiny, grid):
    m, cfg = tiny
    t, h, w = grid
    L = t * h * w
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2
    g = torch.Generator().manual_seed(1)
    patches = torch.randn(L, patch_dim, generator=g)
    grid_thw = torch.tensor([[t, h, w]])
    with torch.no_grad():
        ref_tokens, ref_deep = m(patches, grid_thw)

    params = vision_hf_to_params(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg
    )
    tokens, deep = vision_forward(params, cfg, jnp.asarray(patches.numpy()), grid)
    np.testing.assert_allclose(
        np.asarray(tokens), ref_tokens.numpy(), rtol=3e-4, atol=3e-4
    )
    assert len(deep) == len(ref_deep) == 2
    for a, b in zip(deep, ref_deep):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=3e-4, atol=3e-4)


def test_vision_flash_matches_dense(tiny):
    """attn_impl=flash_interpret (segments batched through the flash kernel,
    head-major path at head_dim 16) equals the dense segmented softmax."""
    import dataclasses

    m, cfg = tiny
    t, h, w = 2, 6, 4
    L = t * h * w
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2
    g = torch.Generator().manual_seed(3)
    patches = jnp.asarray(torch.randn(L, patch_dim, generator=g).numpy())
    params = vision_hf_to_params(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg
    )
    ref_tokens, ref_deep = vision_forward(
        params, dataclasses.replace(cfg, attn_impl="dense"), patches, (t, h, w))
    tokens, deep = vision_forward(
        params, dataclasses.replace(cfg, attn_impl="flash_interpret"),
        patches, (t, h, w))
    np.testing.assert_allclose(np.asarray(tokens), np.asarray(ref_tokens),
                               rtol=2e-3, atol=2e-3)
    for a, b in zip(deep, ref_deep):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
