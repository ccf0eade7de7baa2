"""Native Qwen3-VL host preprocessing: image/video → pixel patches + prompt ids.

Role of the reference's HF AutoProcessor use (`omnivideo/vllm_model.py:30-85`):
this module removes the HF processor dependency from the TPU deployment path
— only the checkpoint's tokenizer.json is needed. The pixel math reproduces
transformers' Qwen2VLImageProcessor exactly (parity-tested in
tests/test_vlm_eval.py): smart-resize to the pixel budget, CLIP-normalize,
then split into [grid_t·grid_h·grid_w, C·tp·p·p] flattened patches in the
processor's merge-grouped traversal order.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ...utils.qwen_vl_media import fetch_video, smart_resize

# CLIP normalization constants (Qwen2VLImageProcessor defaults)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def frames_to_patches(
    frames: np.ndarray,  # [T, H, W, 3] uint8 (already smart-resized)
    patch_size: int,
    temporal_patch_size: int,
    merge_size: int,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Normalize + patchify frames → ([n_patches, C·tp·p·p] f32, (t, h, w) grid).

    Traversal order matches Qwen2VLImageProcessor._preprocess: within each
    merge window the spatial patches are contiguous, windows scan row-major.
    """
    T, H, W, C = frames.shape
    p, tp, m = patch_size, temporal_patch_size, merge_size
    assert H % (p * m) == 0 and W % (p * m) == 0, (H, W, p, m)

    x = frames.astype(np.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    x = x.transpose(0, 3, 1, 2)  # [T, C, H, W]
    if T % tp:
        x = np.concatenate([x, np.repeat(x[-1:], tp - T % tp, axis=0)], axis=0)
    T = x.shape[0]

    gt, gh, gw = T // tp, H // p, W // p
    x = x.reshape(gt, tp, C, gh // m, m, p, gw // m, m, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(gt * gh * gw, C * tp * p * p), (gt, gh, gw)


def load_image(
    path_or_img,
    factor: int,
    min_pixels: int = 4 * 28 * 28,
    max_pixels: int = 16384 * 28 * 28,
) -> np.ndarray:
    """Open + smart-resize an image → [1, H, W, 3] uint8."""
    from PIL import Image

    img = path_or_img if isinstance(path_or_img, Image.Image) else Image.open(path_or_img)
    img = img.convert("RGB")
    w, h = img.size
    rh, rw = smart_resize(h, w, factor=factor, min_pixels=min_pixels,
                          max_pixels=max_pixels)
    if (rh, rw) != (h, w):
        img = img.resize((rw, rh), Image.BICUBIC)
    return np.asarray(img)[None]


def preprocess_image(
    path_or_img,
    patch_size: int = 16,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    min_pixels: int = 4 * 28 * 28,
    max_pixels: int = 16384 * 28 * 28,
):
    """Image file/PIL → (patches [n, C·tp·p·p] f32, grid (1, h, w))."""
    frames = load_image(path_or_img, factor=patch_size * merge_size,
                        min_pixels=min_pixels, max_pixels=max_pixels)
    return frames_to_patches(frames, patch_size, temporal_patch_size, merge_size)


def preprocess_video(
    path: str,
    patch_size: int = 16,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    nframes: Optional[int] = None,
):
    """Video file → (patches, grid (t, h, w)) via the codec-less readers."""
    ele = {"video": path}
    if nframes is not None:
        ele["nframes"] = nframes
    frames, _fps = fetch_video(ele)
    # fetch_video aligns to IMAGE_FACTOR=28; re-align to this model's factor
    f = patch_size * merge_size
    H, W = frames.shape[1:3]
    if H % f or W % f:
        from PIL import Image

        rh, rw = (H // f) * f or f, (W // f) * f or f
        frames = np.stack([
            np.asarray(Image.fromarray(fr).resize((rw, rh), Image.BICUBIC))
            for fr in frames
        ])
    return frames_to_patches(frames, patch_size, temporal_patch_size, merge_size)


# ---------------------------------------------------------------------------
# prompt assembly (the Qwen3-VL chat template, hand-rolled)
# ---------------------------------------------------------------------------

VISION_START = "<|vision_start|>"
VISION_END = "<|vision_end|>"
IMAGE_PAD = "<|image_pad|>"
VIDEO_PAD = "<|video_pad|>"


def build_vqa_ids(
    tokenizer,
    question: str,
    n_vision_tokens: int = 0,
    is_video: bool = False,
    system_prompt: Optional[str] = None,
) -> np.ndarray:
    """Token ids for `<system?> user(<vision> question) assistant` — the
    Qwen3-VL chat template rendered without the HF processor.

    n_vision_tokens = grid_t·grid_h·grid_w / merge_size² (the number of
    placeholder tokens the vision tower output splices into).
    """
    pad = VIDEO_PAD if is_video else IMAGE_PAD
    parts = []
    if system_prompt:
        parts.append(f"<|im_start|>system\n{system_prompt}<|im_end|>\n")
    vision = f"{VISION_START}{pad * n_vision_tokens}{VISION_END}" if n_vision_tokens else ""
    parts.append(f"<|im_start|>user\n{vision}{question}<|im_end|>\n")
    parts.append("<|im_start|>assistant\n")
    ids = tokenizer("".join(parts), add_special_tokens=False)["input_ids"]
    return np.asarray([ids], np.int32)
