"""Image-to-video pipeline (vanilla Wan i2v).

Role of reference `previous_version/.../wan/image2video.py:29-300` (WanI2V):
first frame → CLIP ViT features (use_31_block) + VAE-encoded padded clip with
a first-frame mask → channel-concatenated conditioning `y = [msk; latents]`
(image2video.py:207-246) → i2v WanModel (CLIP K/V branch in cross-attention)
→ flow-matching denoise.

TPU-native: same jitted denoise-scan machinery as pipelines/x2x.py; the mask
construction follows the reference exactly: frame-0 mask repeated 4× then
grouped to latent frames.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import prompts
from ..configs.base import PipelineConfig
from ..models.clip_vision import CLIPVisionConfig, clip_vision_forward, preprocess_image
from ..models.vae2_1 import Wan21VAE
from ..models.wan_dit import embed_context, wan_dit_apply
from ..schedulers import FlowUniPC

log = logging.getLogger(__name__)


def build_i2v_mask(frame_num: int, lat_h: int, lat_w: int) -> jnp.ndarray:
    """First-frame conditioning mask → [4, F_lat, h, w]
    (reference image2video.py:207-214)."""
    msk = np.ones((1, frame_num, lat_h, lat_w), np.float32)
    msk[:, 1:] = 0
    msk = np.concatenate([np.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]], axis=1)
    msk = msk.reshape(1, msk.shape[1] // 4, 4, lat_h, lat_w)
    return jnp.asarray(msk.transpose(0, 2, 1, 3, 4)[0])


class WanI2V:
    """Single-expert i2v pipeline over an i2v-variant WanModel."""

    def __init__(
        self,
        config: PipelineConfig,
        wan_params: Any,
        vae: Wan21VAE,
        clip_params: Any,
        clip_cfg: CLIPVisionConfig = CLIPVisionConfig(),
        text_encoder=None,
        attn_impl: str = "auto",
    ):
        self.config = config
        self.wan_params = wan_params
        self.vae = vae
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.text_encoder = text_encoder
        self.attn_impl = attn_impl
        self.dit_cfg = config.dit

    def generate(
        self,
        img: np.ndarray,
        input_prompt: str = "",
        precomputed_context: Optional[jnp.ndarray] = None,
        precomputed_context_null: Optional[jnp.ndarray] = None,
        size: Tuple[int, int] = (832, 480),
        frame_num: int = 81,
        shift: float = 5.0,
        sampling_steps: int = 40,
        guide_scale: float = 5.0,
        seed: int = -1,
        decode: bool = True,
    ):
        """img: [H, W, 3] first frame; returns video [3, F, H, W]."""
        cfg = self.config
        vs = cfg.vae.vae_stride
        lat_f = (frame_num - 1) // vs[0] + 1
        lat_h, lat_w = size[1] // vs[1], size[0] // vs[2]
        pt, ph, pw = self.dit_cfg.patch_size
        seq_len = math.ceil(lat_h * lat_w / (ph * pw) * lat_f)

        seed = seed if seed >= 0 else int(np.random.randint(0, 2**31 - 1))
        key = jax.random.PRNGKey(seed)

        # CLIP features from the first frame (image2video.py:232-233)
        clip_in = jnp.asarray(preprocess_image(img, self.clip_cfg.image_size))
        clip_fea = clip_vision_forward(self.clip_params, self.clip_cfg, clip_in)

        # y = [msk; vae_encode([img, zeros...])] (image2video.py:237-246)
        from PIL import Image

        if img.dtype != np.uint8:
            img8 = ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)
        else:
            img8 = img
        first = np.asarray(
            Image.fromarray(img8).resize((size[0], size[1]), Image.BICUBIC), np.float32
        ) / 127.5 - 1.0
        clip_pad = np.zeros((3, frame_num, size[1], size[0]), np.float32)
        clip_pad[:, 0] = first.transpose(2, 0, 1)
        y_lat = self.vae.encode(jnp.asarray(clip_pad)[None])[0][:, :lat_f]
        msk = build_i2v_mask(frame_num, lat_h, lat_w)
        y = jnp.concatenate([msk, y_lat], axis=0)[None]  # [1, 4+z, F_lat, h, w]

        context = (
            precomputed_context if precomputed_context is not None
            else self.text_encoder([input_prompt])[0]
        )
        context_null = (
            precomputed_context_null if precomputed_context_null is not None
            else (self.text_encoder([prompts.SAMPLE_NEG_PROMPT_EN])[0]
                  if self.text_encoder else jnp.zeros((1, self.dit_cfg.text_dim)))
        )

        def pad_ctx(c):
            c = jnp.asarray(c)
            L = self.dit_cfg.text_len
            return jnp.pad(c, ((0, max(0, L - c.shape[0])), (0, 0)))[:L]

        ctx2 = jnp.stack([pad_ctx(context), pad_ctx(context_null)])

        solver = FlowUniPC.create(sampling_steps, shift=shift,
                                  num_train_timesteps=cfg.num_train_timesteps)
        noise = jax.random.normal(key, (1, cfg.vae.z_dim, lat_f, lat_h, lat_w), jnp.float32)
        state = solver.init_state(noise)
        dit_cfg = self.dit_cfg
        attn_impl = self.attn_impl
        pdtype = cfg.jnp_param_dtype

        @jax.jit
        def run(params, state, coeffs, ctx2, y, clip_fea, g):
            ctx_emb2 = embed_context(params, dit_cfg, ctx2.astype(pdtype))
            y2 = jnp.concatenate([y, y], axis=0)
            clip2 = jnp.concatenate([clip_fea, clip_fea], axis=0)

            def body(st, c):
                x2 = jnp.concatenate([st.x, st.x], axis=0).astype(pdtype)
                t2 = jnp.full((2,), c.timestep, jnp.float32)
                v2 = wan_dit_apply(
                    params, dit_cfg, x2, t2, ctx_emb2, seq_len=seq_len,
                    context_embedded=True, attn_impl=attn_impl,
                    y=y2.astype(pdtype), clip_fea=clip2.astype(pdtype),
                )
                v = v2[1:] + g * (v2[0:1] - v2[1:])
                return FlowUniPC.scan_step(st, c, v), None

            st, _ = jax.lax.scan(body, state, coeffs)
            return st

        state = run(self.wan_params, state, solver.coeffs, ctx2, y, clip_fea,
                    jnp.float32(guide_scale))
        latents = state.x
        if not decode:
            return latents
        return np.asarray(self.vae.decode(latents)[0])
