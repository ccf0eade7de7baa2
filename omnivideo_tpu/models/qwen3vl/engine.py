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
- "jax":  JAX prefill+decode engine (models/qwen3vl/model.py) — the TPU-native
          target; text decoder implemented, vision tower staged next round.

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


class Qwen3VLEngine:
    """Caption + feature engine over a Qwen3-VL checkpoint."""

    def __init__(self, cfg: VLMConfig):
        self.cfg = cfg
        if cfg.backend == "hf":
            self._init_hf()
        elif cfg.backend == "jax":
            raise NotImplementedError(
                "JAX Qwen3-VL backend: text decoder available in "
                "models/qwen3vl/model.py; full multimodal engine lands next "
                "round — use backend='hf' or precomputed features meanwhile"
            )
        else:
            raise ValueError(cfg.backend)

    # -- hf backend --------------------------------------------------------
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

    def _generate(self, messages) -> str:
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

    # -- public flows (mirror vllm_model.py) --------------------------------

    def generate_source_video_caption(
        self, video_path: str, system_prompt: str = P.SOURCE_CAPTION_SYSTEM_PROMPT
    ) -> str:
        """Detailed source-video caption (vllm_model.py:110-203)."""
        if not video_path or not os.path.exists(video_path):
            return ""
        messages = [
            {"role": "system", "content": [{"type": "text", "text": system_prompt}]},
            {
                "role": "user",
                "content": [
                    {"type": "video", "video": video_path},
                    {
                        "type": "text",
                        "text": "Please provide a detailed, fine-grained caption for this video.",
                    },
                ],
            },
        ]
        return self._generate(messages)

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
        messages = [
            {"role": "system", "content": [{"type": "text", "text": system_prompt}]},
            {"role": "user", "content": [{"type": "text", "text": user_text}]},
        ]
        return self._generate(messages)

    def extract_features(
        self,
        source_video_path: Optional[str],
        edit_prompt: str,
        system_prompt: str = P.FEATURE_EXTRACTION_SYSTEM_PROMPT,
    ) -> Dict[str, Any]:
        """Last-hidden-state conditioning features with system-prefix dropped
        (vllm_model.py:313-413)."""
        torch = self._torch
        drop_idx = compute_system_prompt_drop_idx(self.processor.tokenizer, system_prompt)

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
            outputs = self.model(**inputs, output_hidden_states=True, return_dict=True)
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
