"""CLIP vision tower parity + i2v DiT conditioning tests."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.models.clip_vision import (
    CLIPVisionConfig,
    clip_vision_forward,
    clip_vision_from_state_dict,
    preprocess_image,
)

GOLDEN = Path(__file__).parent / "golden" / "clip_tiny.npz"

TINY = CLIPVisionConfig(
    image_size=32, patch_size=8, dim=64, mlp_ratio=4.0, num_heads=4,
    num_layers=3, pre_norm=True, activation="gelu",
)


def test_clip_use_31_block_parity():
    g = np.load(GOLDEN)
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    params = clip_vision_from_state_dict(sd, TINY)
    out = clip_vision_forward(params, TINY, jnp.asarray(g["x"]), use_31_block=True)
    np.testing.assert_allclose(np.asarray(out), g["out31"], rtol=3e-4, atol=3e-4)


def test_preprocess_image():
    img = (np.random.default_rng(0).uniform(0, 255, (40, 60, 3))).astype(np.uint8)
    x = preprocess_image(img, size=32)
    assert x.shape == (1, 3, 32, 32)
    assert np.isfinite(x).all()


def test_i2v_dit_parity():
    """i2v WanModel (y-concat + CLIP MLPProj + split cross-attention) vs the
    v1 reference implementation."""
    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.io.torch_convert import to_jnp, wan_state_dict_to_params
    from omnivideo_tpu.models.wan_dit import wan_dit_apply

    g = np.load(Path(__file__).parent / "golden" / "i2v_tiny.npz")
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    cfg = WanDiTConfig(
        model_type="i2v", patch_size=(1, 2, 2), text_len=16, in_dim=12,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=48, out_dim=4,
        num_heads=4, num_layers=2,
    )
    params = to_jnp(wan_state_dict_to_params(sd, cfg.num_layers), dtype=jnp.float32)
    assert "img_emb" in params
    assert "k_img" in params["blocks"]["cross_attn"]

    ctx = np.zeros((1, 16, 48), np.float32)
    c0 = g["ctx"]
    ctx[0, : len(c0)] = c0
    out = wan_dit_apply(
        params, cfg,
        jnp.asarray(g["x"]), jnp.asarray(g["t"]), jnp.asarray(ctx),
        seq_len=3 * 4 * 4, y=jnp.asarray(g["y"]),
        clip_fea=jnp.asarray(g["clip_fea"]), attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_wan_i2v_pipeline_smoke():
    """End-to-end WanI2V: first frame -> CLIP + mask/latent conditioning ->
    denoise -> decode (tiny random weights)."""
    from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
    from omnivideo_tpu.io.torch_convert import to_jnp, wan_state_dict_to_params
    from omnivideo_tpu.models.vae2_1 import Wan21VAE, init_vae
    from omnivideo_tpu.pipelines.i2v import WanI2V

    g = np.load(Path(__file__).parent / "golden" / "i2v_tiny.npz")
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    cfg = PipelineConfig(
        name="tiny-i2v",
        dit=WanDiTConfig(model_type="i2v", patch_size=(1, 2, 2), text_len=16,
                         in_dim=12, dim=64, ffn_dim=128, freq_dim=32,
                         text_dim=48, out_dim=4, num_heads=4, num_layers=2),
        vae=VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=1,
                      temperal_downsample=(False, True, True)),
        param_dtype="float32",
    )
    wan_params = to_jnp(wan_state_dict_to_params(sd, 2), dtype=jnp.float32)

    # the i2v model's img_emb expects CLIP dim 1280 (v1 model.py:482)
    from omnivideo_tpu.models.clip_vision import init_clip_vision

    clip_cfg = CLIPVisionConfig(image_size=32, patch_size=16, dim=1280,
                                mlp_ratio=1.0, num_heads=16, num_layers=2)
    clip_params = init_clip_vision(jax.random.PRNGKey(3), clip_cfg)

    vae = Wan21VAE.create(init_vae(jax.random.PRNGKey(0), cfg.vae), cfg.vae)
    pipe = WanI2V(cfg, wan_params, vae, clip_params, clip_cfg, attn_impl="xla")

    img = (np.random.default_rng(1).uniform(0, 255, (32, 48, 3))).astype(np.uint8)
    video = pipe.generate(
        img,
        precomputed_context=jnp.ones((8, 48), jnp.float32) * 0.1,
        precomputed_context_null=jnp.zeros((8, 48), jnp.float32),
        size=(64, 32), frame_num=9, sampling_steps=2, guide_scale=3.0, seed=0,
    )
    assert video.shape == (3, 9, 32, 64)
    assert np.isfinite(video).all()
