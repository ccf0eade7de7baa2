"""High-level multi-task generator orchestrator (v1 API surface).

Role of reference
`previous_version/Omni-Video1/nets/omni/omni_video_generator.py:23-200`
(OmniVideoGenerator): a one-stop object over a fixed `omni_ckpts/` bundle
layout wiring the AR model (captioning/features), adapters, special tokens,
unconditioned context, and the x2x pipeline, exposing task methods
(t2v / t2i / v2v / i2v).

Layout (v1-compatible, superset of the v2 flat layout):

    omni_ckpts/
      wan/...  or  low_noise_model/model.pt      # DiT expert(s)
      special_tokens/tokens.pkl  or  special_tokens.pkl
      unconditioned_context/context.pkl          # optional
      ar_model/...                               # Qwen3-VL (optional)
      models_t5_umt5-xxl-enc-bf16.pth, Wan2.1_VAE.pth
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..configs import WAN_CONFIGS
from ..configs.base import PipelineConfig

log = logging.getLogger(__name__)


class OmniVideoGenerator:
    def __init__(
        self,
        models_dir: str,
        task: str = "t2v-1.3B",
        config: Optional[PipelineConfig] = None,
        vlm_backend: str = "jax",
        attn_impl: str = "auto",
    ):
        from .loading import load_pipeline

        self.models_dir = Path(models_dir)
        self.config = config or WAN_CONFIGS[task]
        self.pipe = load_pipeline(self.config, str(self.models_dir), attn_impl=attn_impl)

        # v1 nested special-token location (omni_video_generator.py:59)
        if self.pipe.special_tokens is None:
            alt = self.models_dir / "special_tokens" / "tokens.pkl"
            if alt.exists():
                from ..models.unified import load_special_tokens_pkl

                self.pipe.special_tokens = load_special_tokens_pkl(str(alt))

        self.unconditioned_context = None
        for cand in (
            self.models_dir / "unconditioned_context" / "context.pkl",
            self.models_dir / "unconditioned_context.pkl",
        ):
            if cand.exists():
                from ..io.torch_reader import read_torch_checkpoint, to_float_numpy

                obj = to_float_numpy(read_torch_checkpoint(str(cand)))
                self.unconditioned_context = (
                    jnp.asarray(obj["uncond_context"]) if isinstance(obj, dict)
                    and "uncond_context" in obj else jnp.asarray(obj)
                )
                break

        self.vlm = None
        ar_dir = self.models_dir / "ar_model"
        if ar_dir.exists():
            try:
                from ..models.qwen3vl.engine import Qwen3VLEngine, VLMConfig

                self.vlm = Qwen3VLEngine(
                    VLMConfig(model_path=str(ar_dir), backend=vlm_backend)
                )
            except Exception as e:  # pragma: no cover
                log.warning("AR model unavailable (%s); text-only conditioning", e)

    # -- task methods (reference omni_video_generator task dispatch) ---------

    def text_to_video(self, prompt: str, **kw) -> np.ndarray:
        ar = None
        if self.vlm is not None:
            feats = self.vlm.generate_caption_and_extract_features(None, prompt)
            prompt = (feats["target_caption"] + " " + prompt).strip()
            ar = jnp.asarray(feats["vlm_last_hidden_states"])
        return self.pipe.generate(input_prompt=prompt, ar_vision_input=ar, **kw)

    def text_to_image(self, prompt: str, **kw) -> np.ndarray:
        kw.setdefault("frame_num", 1)
        return self.text_to_video(prompt, **kw)

    def video_to_video(self, source_clip_path: str, edit_prompt: str,
                       size=(832, 480), frame_num: int = 41, **kw) -> np.ndarray:
        from ..utils.video import read_video_frames, sample_and_transform_frames

        frames, fps = read_video_frames(source_clip_path)
        clip = sample_and_transform_frames(frames, frame_num, size, fps,
                                           self.config.sample_fps)
        visual_emb = self.pipe.vae.encode(jnp.asarray(clip)[None])[0]
        lat_f = (frame_num - 1) // self.config.vae.vae_stride[0] + 1
        visual_emb = visual_emb[:, :lat_f]

        ar = None
        prompt = edit_prompt
        if self.vlm is not None:
            feats = self.vlm.generate_caption_and_extract_features(
                source_clip_path, edit_prompt
            )
            prompt = (feats["target_caption"] + " " + edit_prompt).strip()
            ar = jnp.asarray(feats["vlm_last_hidden_states"])
        return self.pipe.generate(
            input_prompt=prompt, ar_vision_input=ar, visual_emb=visual_emb,
            size=size, frame_num=frame_num, **kw,
        )
