"""Full JAX Qwen3-VL multimodal forward parity vs HF (video feature path)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from omnivideo_tpu.models.qwen3vl.full_model import (
    Qwen3VLConfig,
    get_rope_index,
    qwen3vl_forward,
    qwen3vl_hf_to_params,
)
from omnivideo_tpu.models.qwen3vl.text_model import Qwen3TextConfig
from omnivideo_tpu.models.qwen3vl.vision_model import Qwen3VLVisionConfig


@pytest.fixture(scope="module")
def tiny():
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLConfig as HFConfig,
    )
    from transformers.models.qwen3_vl.modeling_qwen3_vl import (
        Qwen3VLForConditionalGeneration,
    )

    head_dim = 16
    hf_cfg = HFConfig(
        text_config=dict(
            vocab_size=160, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=head_dim, rope_theta=10000.0, tie_word_embeddings=False,
            rope_scaling={"rope_type": "default", "mrope_section": [2, 3, 3],
                          "mrope_interleaved": True},
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, depth=3, num_heads=4,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=48,
            num_position_embeddings=36, deepstack_visual_indexes=[0, 1],
        ),
        image_token_id=151, video_token_id=152, vision_start_token_id=150,
        vision_end_token_id=153,
    )
    torch.manual_seed(0)
    m = Qwen3VLForConditionalGeneration(hf_cfg).eval().float()
    cfg = Qwen3VLConfig(
        text=Qwen3TextConfig(
            vocab_size=160, hidden_size=48, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=head_dim, rope_theta=10000.0,
        ),
        vision=Qwen3VLVisionConfig(
            hidden_size=32, intermediate_size=64, depth=3, num_heads=4,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=48,
            num_position_embeddings=36, deepstack_visual_indexes=(0, 1),
        ),
        mrope_section=(2, 3, 3),
        video_token_id=152, image_token_id=151, vision_start_token_id=150,
    )
    return m, cfg


def _build_inputs(cfg, t=2, h=4, w=4, seed=1):
    """ids with per-frame video segments (processor layout):
    text | per frame: <vstart> <vpad>x(hw/4) <vend> | text"""
    g = torch.Generator().manual_seed(seed)
    n_per_frame = (h // 2) * (w // 2)
    ids = [5, 6, 7]
    for _ in range(t):
        ids += [150] + [152] * n_per_frame + [153]
    ids += [8, 9]
    input_ids = torch.tensor([ids])
    patch_dim = 3 * 2 * 4 * 4
    pixel = torch.randn(t * h * w, patch_dim, generator=g)
    grid = torch.tensor([[t, h, w]])
    return input_ids, pixel, grid


@pytest.mark.slow
def test_full_multimodal_parity(tiny):
    m, cfg = tiny
    input_ids, pixel, grid = _build_inputs(cfg)
    with torch.no_grad():
        out = m(
            input_ids=input_ids,
            pixel_values_videos=pixel,
            video_grid_thw=grid,
            output_hidden_states=True,
        )
    ref_hidden = out.hidden_states[-1].numpy()

    params = qwen3vl_hf_to_params({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    hidden = qwen3vl_forward(
        params, cfg, input_ids.numpy(), jnp.asarray(pixel.numpy()), (2, 4, 4)
    )
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, rtol=1e-3, atol=1e-3)


def test_rope_index_matches_hf(tiny):
    m, cfg = tiny
    input_ids, pixel, grid = _build_inputs(cfg)
    ref_pos, _ = m.model.get_rope_index(
        input_ids, video_grid_thw=grid, attention_mask=torch.ones_like(input_ids)
    )
    ours = get_rope_index(input_ids.numpy(), grid.numpy(), cfg, is_video=True)
    np.testing.assert_array_equal(ours, ref_pos[:, 0].numpy())


def test_text_only_parity(tiny):
    m, cfg = tiny
    ids = torch.tensor([[5, 6, 7, 8, 9, 10]])
    with torch.no_grad():
        out = m(input_ids=ids, output_hidden_states=True)
    params = qwen3vl_hf_to_params({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    hidden = qwen3vl_forward(params, cfg, ids.numpy())
    np.testing.assert_allclose(
        np.asarray(hidden), out.hidden_states[-1].numpy(), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_multimodal_greedy_decode_parity(tiny):
    """JAX mrope KV-cache greedy decode == HF generate on a video prompt."""
    from omnivideo_tpu.models.qwen3vl.full_model import qwen3vl_greedy_decode

    m, cfg = tiny
    input_ids, pixel, grid = _build_inputs(cfg, seed=3)
    with torch.no_grad():
        hf = m.generate(
            input_ids=input_ids, pixel_values_videos=pixel, video_grid_thw=grid,
            max_new_tokens=6, do_sample=False,
        )
    params = qwen3vl_hf_to_params({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    ours = qwen3vl_greedy_decode(
        params, cfg, input_ids.numpy(), jnp.asarray(pixel.numpy()), (2, 4, 4),
        max_new_tokens=6,
    )
    np.testing.assert_array_equal(ours, hf[0, input_ids.shape[1]:].numpy())


@pytest.mark.slow
def test_sampled_decode_runs(tiny):
    """top-p sampling path (reference caption defaults T=0.7 p=0.9) produces
    valid tokens and is deterministic per seed."""
    from omnivideo_tpu.models.qwen3vl.full_model import qwen3vl_greedy_decode

    m, cfg = tiny
    input_ids, pixel, grid = _build_inputs(cfg, seed=5)
    params = qwen3vl_hf_to_params({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    a = qwen3vl_greedy_decode(params, cfg, input_ids.numpy(),
                              jnp.asarray(pixel.numpy()), (2, 4, 4),
                              max_new_tokens=5, temperature=0.7, top_p=0.9,
                              rng_seed=7)
    b = qwen3vl_greedy_decode(params, cfg, input_ids.numpy(),
                              jnp.asarray(pixel.numpy()), (2, 4, 4),
                              max_new_tokens=5, temperature=0.7, top_p=0.9,
                              rng_seed=7)
    assert (a >= 0).all() and (a < cfg.text.vocab_size).all()
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fsdp_sharded_vlm_inference(tiny):
    """FSDP-sharded VLM params (deployment path for 30B-A3B > 1 chip HBM):
    sharded forward and greedy decode match unsharded."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from omnivideo_tpu.models.qwen3vl.full_model import qwen3vl_greedy_decode
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.parallel.sharding import params_shardings

    m, cfg = tiny
    input_ids, pixel, grid = _build_inputs(cfg, t=2, h=4, w=4, seed=5)
    params = qwen3vl_hf_to_params({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    mesh = create_mesh(1, 8, 1)
    sh = params_shardings(params, mesh)
    params_sh = jax.tree_util.tree_map(jax.device_put, params, sh)

    ref = qwen3vl_forward(params, cfg, input_ids.numpy(),
                          jnp.asarray(pixel.numpy()), (2, 4, 4))
    out = qwen3vl_forward(params_sh, cfg, input_ids.numpy(),
                          jnp.asarray(pixel.numpy()), (2, 4, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    t_ref = qwen3vl_greedy_decode(params, cfg, input_ids.numpy(),
                                  jnp.asarray(pixel.numpy()), (2, 4, 4), 6)
    t_sh = qwen3vl_greedy_decode(params_sh, cfg, input_ids.numpy(),
                                 jnp.asarray(pixel.numpy()), (2, 4, 4), 6)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_sh))
