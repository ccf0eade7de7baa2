"""Model / pipeline configuration dataclasses.

Mirrors the reference's EasyDict config system
(`/root/reference/omnivideo/configs/{shared_config,wan_t2v_1_3B,wan_t2v_A14B}.py`)
as frozen dataclasses with static, hashable fields so they can be closed over
by jit-compiled functions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WanDiTConfig:
    """Wan video-DiT backbone hyperparameters.

    Reference: `omnivideo/modules/model.py:304-321` (WanModel.__init__) and the
    variant tables `configs/wan_t2v_A14B.py:19-28` / `wan_t2v_1_3B.py:19-28`.
    """

    model_type: str = "t2v"
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    window_size: Tuple[int, int] = (-1, -1)
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    # rope table length per axis (reference: model.py:406 rope_params(1024, ...))
    rope_max_seq_len: int = 1024
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        assert self.dim % self.num_heads == 0
        return self.dim // self.num_heads

    def replace(self, **kw) -> "WanDiTConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Wan2.1 causal 3D VAE hyperparameters.

    Reference: `omnivideo/modules/vae2_1.py:591-615` (_video_vae cfg) and
    `vae2_1.py:618-644` (Wan2_1_VAE channel stats).
    """

    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    # spatial/temporal compression: stride (4, 8, 8) (configs/wan_t2v_A14B.py:16)
    vae_stride: Tuple[int, int, int] = (4, 8, 8)

    @property
    def temperal_upsample(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.temperal_downsample))


@dataclasses.dataclass(frozen=True)
class T5Config:
    """umT5-XXL encoder hyperparameters (reference: `omnivideo/modules/t5.py:455-468`)."""

    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False  # umT5: per-layer relative embeddings
    rel_max_dist: int = 128
    text_len: int = 512


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end x2x pipeline configuration.

    Mirrors `omnivideo/configs/shared_config.py` + model variant files; holds
    everything `OmniVideoX2XUnified` (reference `x2x_gen_unified.py:24`)
    reads from its EasyDict config.
    """

    name: str = "t2v-1.3B"
    dit: WanDiTConfig = WanDiTConfig()
    vae: VAEConfig = VAEConfig()
    t5: T5Config = T5Config()

    num_train_timesteps: int = 1000
    sample_fps: int = 16
    frame_num: int = 81
    sample_shift: float = 12.0
    sample_steps: int = 40
    boundary: float = 0.875
    # (low-noise, high-noise) guidance scales (wan_t2v_A14B.py:36)
    sample_guide_scale: Tuple[float, float] = (3.0, 4.0)

    # dual expert? (A14B has high/low-noise experts; 1.3B single)
    dual_expert: bool = False

    # conditioning
    use_visual_context_adapter: bool = True
    visual_context_adapter_patch_size: Tuple[int, int, int] = (1, 4, 4)
    condition_mode: str = "full"
    vlm_in_dim: int = 2048  # Qwen3-VL hidden dim (wan_t2v_A14B.py:42)
    max_context_len: int = 6144

    # dtypes
    param_dtype: str = "bfloat16"
    t5_dtype: str = "bfloat16"

    # checkpoint file names within checkpoint_dir (README.md:353-362 layout)
    t5_checkpoint: str = "models_t5_umt5-xxl-enc-bf16.pth"
    t5_tokenizer: str = "google/umt5-xxl"
    vae_checkpoint: str = "Wan2.1_VAE.pth"
    low_noise_checkpoint: str = "low_noise_model"
    high_noise_checkpoint: str = "high_noise_model"

    @property
    def jnp_param_dtype(self):
        return jnp.dtype(self.param_dtype)

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Model variants (reference: configs/wan_t2v_1_3B.py, configs/wan_t2v_A14B.py)
# ---------------------------------------------------------------------------

T2V_1_3B = PipelineConfig(
    name="t2v-1.3B",
    dit=WanDiTConfig(
        patch_size=(1, 2, 2),
        dim=1536,
        ffn_dim=8960,
        freq_dim=256,
        num_heads=12,
        num_layers=30,
        qk_norm=True,
        cross_attn_norm=True,
        eps=1e-6,
    ),
    dual_expert=False,
    max_context_len=6272,  # inference_omni_v2v_1_3B.sh:67
)

T2V_14B = PipelineConfig(
    name="t2v-14B",
    # vanilla Wan2.1 14B (reference previous_version/.../wan/configs/
    # wan_t2v_14B.py): single expert, text-only conditioning
    dit=WanDiTConfig(
        patch_size=(1, 2, 2),
        dim=5120,
        ffn_dim=13824,
        freq_dim=256,
        num_heads=40,
        num_layers=40,
        qk_norm=True,
        cross_attn_norm=True,
        eps=1e-6,
    ),
    dual_expert=False,
    max_context_len=512,
)

I2V_14B = PipelineConfig(
    name="i2v-14B",
    # vanilla Wan2.1 i2v 14B (reference wan_i2v_14B.py): first-frame latent +
    # mask concatenated on the input channels (in_dim 36 = 16 latent +
    # 4 mask + 16 y, model.py:451-452) and CLIP-token split cross-attention
    dit=WanDiTConfig(
        model_type="i2v",
        patch_size=(1, 2, 2),
        in_dim=36,
        dim=5120,
        ffn_dim=13824,
        freq_dim=256,
        num_heads=40,
        num_layers=40,
        qk_norm=True,
        cross_attn_norm=True,
        eps=1e-6,
    ),
    dual_expert=False,
    max_context_len=512,
)

T2V_A14B = PipelineConfig(
    name="t2v-A14B",
    dit=WanDiTConfig(
        patch_size=(1, 2, 2),
        dim=5120,
        ffn_dim=13824,
        freq_dim=256,
        num_heads=40,
        num_layers=40,
        qk_norm=True,
        cross_attn_norm=True,
        eps=1e-6,
    ),
    dual_expert=True,
    max_context_len=6144,  # generate_omni_v2v.py:213
)
