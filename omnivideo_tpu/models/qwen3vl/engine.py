"""Qwen3-VL conditioning stage: captioning + hidden-state feature extraction.

Role of reference `omnivideo/vllm_model.py` (C13): three calls per sample —
source-caption generation (:110-203), target-caption prediction (T2V prompt
expansion / V2V edit-aware rewrite, :206-271), and last-hidden-state feature
extraction with system-prompt token dropping (:278-413) — plus the one-stop
`generate_caption_and_extract_features` (:416-466).

Backends:
- "hf":   transformers AutoModelForImageTextToText on host (CPU here; GPU/TPU
          via torch-xla elsewhere). Functional parity path; works with real
          Qwen3-VL checkpoints and with tiny random configs in tests.
- "jax":  the TPU deployment path, fully TORCH-FREE: weights stream straight
          from the checkpoint's .safetensors shards (io/hf_reader.py — no HF
          torch model is ever instantiated, so no 2x host-RAM spike at 30B),
          preprocessing is native (models/qwen3vl/preprocess.py: codec-less
          frame sampling, smart-resize, patchify, chat template with the
          per-frame `<t seconds>` video expansion), and BOTH flows run in
          JAX — feature extraction via qwen3vl_forward and greedy caption
          decoding via qwen3vl_greedy_decode (token-exact vs HF). Only the
          checkpoint's tokenizer.json is loaded (fast tokenizer; torch stays
          unimported — asserted by tests/test_vlm_eval.py).

The pipeline's `precomputed_context` / offline-feature path
(x2x_gen_unified.py:353-354) remains the escape hatch: the DiT never requires
a live VLM.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ...configs import prompts as P

log = logging.getLogger(__name__)


def _chat_template_kwargs(processor, feature_extraction: bool = False):
    kw = dict(tokenize=True, add_generation_prompt=True, return_dict=True,
              return_tensors="pt")
    if hasattr(processor, "video_processor"):
        if getattr(processor.video_processor, "fps", None) is None:
            kw["num_frames"] = getattr(processor.video_processor, "num_frames", 6) or 6
            kw["do_sample_frames"] = True
        if feature_extraction:
            kw["size"] = {"shortest_edge": 480, "longest_edge": 1920}
        elif hasattr(processor.video_processor, "size"):
            kw["size"] = processor.video_processor.size
    return kw


def compute_system_prompt_drop_idx(tokenizer, system_prompt: str) -> int:
    """Tokens of `<|im_start|>system\\n{sys}<|im_end|>\\n<|im_start|>user\\n`
    to drop from extracted features (vllm_model.py:278-292)."""
    prefix = f"<|im_start|>system\n{system_prompt}<|im_end|>\n<|im_start|>user\n"
    ids = tokenizer(prefix, add_special_tokens=False)["input_ids"]
    return len(ids)


def extract_masked_hidden(hidden: np.ndarray, mask: np.ndarray):
    """Split valid positions per batch row (vllm_model.py:295-310)."""
    out = []
    for i in range(hidden.shape[0]):
        out.append(hidden[i][mask[i].astype(bool)])
    return out


@dataclasses.dataclass
class VLMConfig:
    model_path: str
    backend: str = "hf"  # "hf" | "jax"
    dtype: str = "bf16"
    target_short_side: int = 480
    video_nframes: int = 6
    max_new_tokens: int = 512
    temperature: float = 0.0  # greedy by default (inference_omni_v2v_1_3B.sh:73-75)
    fsdp: int = 1  # >1: shard the JAX params over an fsdp mesh axis — the
    # 30B-A3B checkpoint exceeds a single chip's HBM (deployment path)
    # vision-tower rope mix precision (inference default bf16, like the DiT's
    # residual_dtype: measured block 9.05→8.63 ms, output rel Δ 2.2e-3 —
    # bf16-level, the tower's activations are already bf16 end to end;
    # "float32" = parity mode matching HF's f32 rope)
    vision_rope_dtype: str = "bfloat16"


class Qwen3VLEngine:
    """Caption + feature engine over a Qwen3-VL checkpoint."""

    def __init__(self, cfg: VLMConfig):
        self.cfg = cfg
        if cfg.backend == "hf":
            self._init_hf()
        elif cfg.backend == "jax":
            self._init_jax()
        else:
            raise ValueError(cfg.backend)

    # -- hf backend ----------------------------------------------------------
    def _init_hf(self):
        import torch
        from transformers import AutoModelForImageTextToText, AutoProcessor

        cfg = self.cfg
        self.processor = AutoProcessor.from_pretrained(cfg.model_path)
        # pixel-budget processor config (vllm_model.py:57-85)
        short = cfg.target_short_side
        min_px, max_px = short * short, short * short * 4
        for attr in ("image_processor", "video_processor"):
            proc = getattr(self.processor, attr, None)
            if proc is None:
                continue
            proc.size = {"shortest_edge": min_px, "longest_edge": max_px}
            proc.min_pixels, proc.max_pixels = min_px, max_px
            if attr == "video_processor":
                proc.num_frames = cfg.video_nframes
                proc.fps = None
        dtype = {"fp32": torch.float32, "fp16": torch.float16, "bf16": torch.bfloat16}[
            cfg.dtype
        ]
        self.model = AutoModelForImageTextToText.from_pretrained(
            cfg.model_path, dtype=dtype
        ).eval()
        self._torch = torch

    def _run_template(self, messages, feature_extraction=False):
        inputs = self.processor.apply_chat_template(
            messages, **_chat_template_kwargs(self.processor, feature_extraction)
        )
        torch = self._torch
        dt = next(self.model.parameters()).dtype
        out = {}
        for k, v in inputs.items():
            if isinstance(v, torch.Tensor) and "pixel_values" in k and v.dtype != dt:
                v = v.to(dt)
            out[k] = v
        return out

    def _generate_hf(self, messages) -> str:
        torch = self._torch
        inputs = self._run_template(messages)
        with torch.no_grad():
            gen = self.model.generate(
                **inputs,
                max_new_tokens=self.cfg.max_new_tokens,
                do_sample=self.cfg.temperature > 0,
            )
        trimmed = gen[:, inputs["input_ids"].shape[1]:]
        text = self.processor.batch_decode(
            trimmed, skip_special_tokens=True, clean_up_tokenization_spaces=False
        )[0]
        return text.strip()

    # -- jax backend (torch-free) ---------------------------------------------
    @staticmethod
    def jax_cfg_from_hf(hf_cfg):
        """Map an HF Qwen3VLConfig object to this repo's Qwen3VLConfig."""
        tc, vc = hf_cfg.text_config, hf_cfg.vision_config
        d = {
            "text_config": tc.to_dict(), "vision_config": vc.to_dict(),
            "video_token_id": hf_cfg.video_token_id,
            "image_token_id": hf_cfg.image_token_id,
            "vision_start_token_id": hf_cfg.vision_start_token_id,
        }
        return Qwen3VLEngine.jax_cfg_from_dict(d)

    @staticmethod
    def jax_cfg_from_dict(d: dict, vision_rope_dtype: str = "float32"):
        """Build this repo's Qwen3VLConfig from a checkpoint's config.json
        dict — no transformers config classes needed."""
        from .full_model import Qwen3VLConfig
        from .text_model import Qwen3TextConfig
        from .vision_model import Qwen3VLVisionConfig as JVis

        tc, vc = d["text_config"], d["vision_config"]
        rope_scaling = tc.get("rope_scaling") or {}
        return Qwen3VLConfig(
            text=Qwen3TextConfig(
                vocab_size=tc["vocab_size"],
                hidden_size=tc["hidden_size"],
                intermediate_size=tc.get("intermediate_size", 0),
                num_hidden_layers=tc["num_hidden_layers"],
                num_attention_heads=tc["num_attention_heads"],
                num_key_value_heads=tc["num_key_value_heads"],
                head_dim=tc.get("head_dim",
                                tc["hidden_size"] // tc["num_attention_heads"]),
                rope_theta=tc.get("rope_theta", 1e6),
                rms_norm_eps=tc.get("rms_norm_eps", 1e-6),
                num_experts=tc.get("num_experts"),
                num_experts_per_tok=tc.get("num_experts_per_tok", 8),
                moe_intermediate_size=tc.get("moe_intermediate_size", 768),
                norm_topk_prob=tc.get("norm_topk_prob", True),
            ),
            vision=JVis(
                hidden_size=vc["hidden_size"],
                intermediate_size=vc["intermediate_size"],
                depth=vc["depth"],
                num_heads=vc["num_heads"],
                in_channels=vc.get("in_channels", 3),
                patch_size=vc["patch_size"],
                temporal_patch_size=vc["temporal_patch_size"],
                spatial_merge_size=vc["spatial_merge_size"],
                out_hidden_size=vc["out_hidden_size"],
                num_position_embeddings=vc["num_position_embeddings"],
                deepstack_visual_indexes=tuple(vc["deepstack_visual_indexes"]),
                rope_dtype=vision_rope_dtype,
            ),
            mrope_section=tuple(rope_scaling.get("mrope_section", (24, 20, 20))),
            video_token_id=d.get("video_token_id", 151656),
            image_token_id=d.get("image_token_id", 151655),
            vision_start_token_id=d.get("vision_start_token_id", 151652),
        )

    def _init_jax(self):
        """Torch-free init: config.json → Qwen3VLConfig, tokenizer.json →
        fast tokenizer (`tokenizers` directly — even `import transformers`
        pulls torch in this image), .safetensors → param pytree (bf16
        preserved). Replaces the HF AutoModel load of vllm_model.py:24-103."""
        from ...io.hf_reader import (
            load_fast_tokenizer, load_hf_config, load_hf_safetensors)
        from .full_model import qwen3vl_hf_to_params

        cfg = self.cfg
        cfg_dict = load_hf_config(cfg.model_path)
        self.jax_cfg = self.jax_cfg_from_dict(
            cfg_dict, vision_rope_dtype=cfg.vision_rope_dtype)
        self.tokenizer = load_fast_tokenizer(cfg.model_path)
        sd = load_hf_safetensors(cfg.model_path)
        self.jax_params = qwen3vl_hf_to_params(sd, self.jax_cfg)
        del sd

        eos = cfg_dict.get("text_config", {}).get("eos_token_id")
        if eos is None:
            import json
            from pathlib import Path

            gc = Path(cfg.model_path) / "generation_config.json"
            if gc.exists():
                eos = json.loads(gc.read_text()).get("eos_token_id")
        if isinstance(eos, (list, tuple)):
            eos = eos[0]
        self._eos = eos if eos is not None else self.tokenizer.eos_token_id

        if cfg.fsdp > 1:
            import jax

            from ...parallel.mesh import create_mesh
            from ...parallel.sharding import params_shardings

            self.mesh = create_mesh(1, cfg.fsdp, 1)
            sh = params_shardings(self.jax_params, self.mesh)
            self.jax_params = jax.tree_util.tree_map(
                jax.device_put, self.jax_params, sh
            )
            log.info("VLM params FSDP-sharded over %d devices", cfg.fsdp)

    def _native_inputs(
        self,
        user_text: str,
        system_prompt: Optional[str],
        video_path: Optional[str] = None,
        feature_extraction: bool = False,
    ):
        """(ids [1,L], patches|None, grid|None) via the native preprocessing
        stack — the torch-free analog of processor.apply_chat_template."""
        from .preprocess import build_chat_ids, preprocess_video_timestamps

        patches = grid = ts = None
        if video_path and os.path.exists(video_path):
            vc = self.jax_cfg.vision
            short = self.cfg.target_short_side
            if feature_extraction:
                # reference pixel budget for the feature pass
                # (vllm_model.py + _chat_template_kwargs: 480..1920 px)
                min_px, max_px = 480, 1920
            else:
                min_px, max_px = short * short, short * short * 4
            patches, grid, ts = preprocess_video_timestamps(
                video_path,
                patch_size=vc.patch_size,
                temporal_patch_size=vc.temporal_patch_size,
                merge_size=vc.spatial_merge_size,
                nframes=self.cfg.video_nframes,
                min_pixels=min_px, max_pixels=max_px,
            )
        ids = build_chat_ids(
            self.tokenizer, user_text, system_prompt=system_prompt,
            grid=grid, timestamps=ts,
            merge_size=self.jax_cfg.vision.spatial_merge_size, is_video=True,
        )
        return ids, patches, grid

    def _generate_jax(self, user_text: str, system_prompt: Optional[str],
                      video_path: Optional[str] = None) -> str:
        import jax.numpy as jnp

        from .full_model import qwen3vl_greedy_decode

        ids, patches, grid = self._native_inputs(user_text, system_prompt,
                                                 video_path)
        toks = qwen3vl_greedy_decode(
            self.jax_params, self.jax_cfg, ids,
            jnp.asarray(patches) if patches is not None else None,
            grid, max_new_tokens=self.cfg.max_new_tokens,
            eos_token_id=self._eos, is_video=True,
            temperature=self.cfg.temperature,
        )
        toks = [int(t) for t in np.asarray(toks).tolist() if t != self._eos]
        return self.tokenizer.decode(toks, skip_special_tokens=True).strip()

    def _extract_hidden_jax(self, ids, patches, grid) -> np.ndarray:
        """Run the multimodal forward in JAX; returns [1, L, D] numpy."""
        import jax.numpy as jnp

        from .full_model import qwen3vl_forward

        if patches is not None:
            hidden = qwen3vl_forward(
                self.jax_params, self.jax_cfg, ids,
                jnp.asarray(patches), grid, is_video=True,
            )
        else:
            hidden = qwen3vl_forward(self.jax_params, self.jax_cfg, ids)
        return np.asarray(hidden, np.float32)

    def _generate(self, messages) -> str:
        """Backend-dispatching chat generation over the reference's message
        structure (system + user[video|image|text...]) — used by
        utils.prompt_extend.QwenPromptExpander."""
        if self.cfg.backend == "hf":
            return self._generate_hf(messages)
        system_prompt, user_text, video, image = None, "", None, None
        for msg in messages:
            content = msg.get("content", [])
            if isinstance(content, str):
                content = [{"type": "text", "text": content}]
            for ele in content:
                if msg.get("role") == "system" and ele.get("type") == "text":
                    system_prompt = ele["text"]
                elif ele.get("type") == "text":
                    user_text += ele["text"]
                elif ele.get("type") == "video":
                    video = ele.get("video")
                elif ele.get("type") == "image":
                    image = ele.get("image")
        if image is not None:
            import jax.numpy as jnp

            from .full_model import qwen3vl_greedy_decode
            from .preprocess import build_chat_ids, preprocess_image

            vc = self.jax_cfg.vision
            short = self.cfg.target_short_side
            patches, grid = preprocess_image(
                image, patch_size=vc.patch_size,
                temporal_patch_size=vc.temporal_patch_size,
                merge_size=vc.spatial_merge_size,
                min_pixels=short * short, max_pixels=short * short * 4)
            ids = build_chat_ids(
                self.tokenizer, user_text, system_prompt=system_prompt,
                grid=grid, merge_size=vc.spatial_merge_size, is_video=False)
            toks = qwen3vl_greedy_decode(
                self.jax_params, self.jax_cfg, ids, jnp.asarray(patches),
                grid, max_new_tokens=self.cfg.max_new_tokens,
                eos_token_id=self._eos, is_video=False,
                temperature=self.cfg.temperature)
            toks = [int(t) for t in np.asarray(toks).tolist() if t != self._eos]
            return self.tokenizer.decode(toks, skip_special_tokens=True).strip()
        return self._generate_jax(user_text, system_prompt, video)

    # -- public flows (mirror vllm_model.py) --------------------------------

    def generate_source_video_caption(
        self, video_path: str, system_prompt: str = P.SOURCE_CAPTION_SYSTEM_PROMPT
    ) -> str:
        """Detailed source-video caption (vllm_model.py:110-203)."""
        if not video_path or not os.path.exists(video_path):
            return ""
        ask = "Please provide a detailed, fine-grained caption for this video."
        if self.cfg.backend == "jax":
            return self._generate_jax(ask, system_prompt, video_path)
        messages = [
            {"role": "system", "content": [{"type": "text", "text": system_prompt}]},
            {
                "role": "user",
                "content": [
                    {"type": "video", "video": video_path},
                    {"type": "text", "text": ask},
                ],
            },
        ]
        return self._generate_hf(messages)

    def predict_target_video_caption(
        self,
        source_video_caption: str,
        edit_prompt: str,
        system_prompt: str = P.TARGET_CAPTION_SYSTEM_PROMPT,
    ) -> str:
        """Target caption: V2V edit-aware rewrite / T2V prompt expansion
        (vllm_model.py:206-271)."""
        if source_video_caption:
            user_text = (
                f"Source video: {source_video_caption}\n\nEdit: {edit_prompt}\n\n"
                "Now directly describe the edited video (do not mention what "
                "was changed, just describe the final video):"
            )
        else:
            user_text = (
                "Expand this short prompt into a detailed, descriptive video "
                f"caption: {edit_prompt}"
            )
        if self.cfg.backend == "jax":
            return self._generate_jax(user_text, system_prompt)
        messages = [
            {"role": "system", "content": [{"type": "text", "text": system_prompt}]},
            {"role": "user", "content": [{"type": "text", "text": user_text}]},
        ]
        return self._generate_hf(messages)

    def extract_features(
        self,
        source_video_path: Optional[str],
        edit_prompt: str,
        system_prompt: str = P.FEATURE_EXTRACTION_SYSTEM_PROMPT,
    ) -> Dict[str, Any]:
        """Last-hidden-state conditioning features with system-prefix dropped
        (vllm_model.py:313-413)."""
        if self.cfg.backend == "jax":
            drop_idx = compute_system_prompt_drop_idx(self.tokenizer, system_prompt)
            ids, patches, grid = self._native_inputs(
                edit_prompt, system_prompt, source_video_path,
                feature_extraction=True)
            hidden = self._extract_hidden_jax(ids, patches, grid)
            valid = hidden[0]  # native path emits no padding (batch 1)
        else:
            torch = self._torch
            drop_idx = compute_system_prompt_drop_idx(
                self.processor.tokenizer, system_prompt)
            user_content = []
            if source_video_path and os.path.exists(source_video_path):
                user_content.append({"type": "video", "video": source_video_path})
            user_content.append({"type": "text", "text": edit_prompt})
            messages = [
                {"role": "system", "content": [{"type": "text", "text": system_prompt}]},
                {"role": "user", "content": user_content},
            ]
            inputs = self._run_template(messages, feature_extraction=True)
            with torch.no_grad():
                outputs = self.model(**inputs, output_hidden_states=True,
                                     return_dict=True)
            hidden = outputs.hidden_states[-1].float().numpy()
            mask = (
                inputs["attention_mask"].numpy()
                if "attention_mask" in inputs
                else np.ones(hidden.shape[:2], np.int64)
            )
            valid = extract_masked_hidden(hidden, mask)[0]
        if drop_idx > 0 and valid.shape[0] > drop_idx:
            valid = valid[drop_idx:]
        return {
            "source_video_path": source_video_path,
            "edit_prompt": edit_prompt,
            "vlm_last_hidden_states": valid,
            "attention_mask": np.ones(valid.shape[0], np.int64),
            "hidden_dim": valid.shape[-1],
            "seq_len": valid.shape[0],
        }

    def generate_caption_and_extract_features(
        self,
        source_video_path: Optional[str],
        edit_prompt: str,
        source_caption_system_prompt: str = P.SOURCE_CAPTION_SYSTEM_PROMPT,
        target_caption_system_prompt: str = P.TARGET_CAPTION_SYSTEM_PROMPT,
        feature_system_prompt: str = P.FEATURE_EXTRACTION_SYSTEM_PROMPT,
    ) -> Dict[str, Any]:
        """One-stop: source caption → target caption → features
        (vllm_model.py:416-466)."""
        source_caption = (
            self.generate_source_video_caption(source_video_path, source_caption_system_prompt)
            if source_video_path
            else ""
        )
        target_caption = self.predict_target_video_caption(
            source_caption, edit_prompt, target_caption_system_prompt
        )
        feats = self.extract_features(source_video_path, edit_prompt, feature_system_prompt)
        feats["source_caption"] = source_caption
        feats["target_caption"] = target_caption
        return feats
