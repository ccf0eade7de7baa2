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


def preprocess_video_timestamps(
    path: str,
    patch_size: int = 16,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    nframes: int = 6,
    min_pixels: int = 4 * 28 * 28,
    max_pixels: int = 16384 * 28 * 28,
):
    """Video file → (patches, grid, per-grid-frame timestamps [s]).

    The Qwen3-VL prompt interleaves a `<{t:.1f} seconds>` text token group
    before every temporal grid frame's vision tokens (HF Qwen3VLProcessor);
    timestamps are the sampled frame indices / fps, averaged over each
    merge-size group — reproduced here so the TPU deployment path needs no
    HF processor (role of vllm_model.py:30-85 preprocessing)."""
    from ...utils.qwen_vl_media import round_by_factor
    from ...utils.video import read_video_frames

    frames, video_fps = read_video_frames(path)
    total = len(frames)
    n = max(temporal_patch_size,
            min(round_by_factor(nframes, temporal_patch_size), total))
    idx = np.linspace(0, total - 1, n).round().astype(int)
    sel = frames[idx]

    f = patch_size * merge_size
    H, W = sel.shape[1:3]
    rh, rw = smart_resize(H, W, factor=f, min_pixels=min_pixels,
                          max_pixels=max_pixels)
    if (rh, rw) != (H, W):
        from PIL import Image

        sel = np.stack([
            np.asarray(Image.fromarray(fr).resize((rw, rh), Image.BICUBIC))
            for fr in sel
        ])
    patches, grid = frames_to_patches(sel, patch_size, temporal_patch_size,
                                      merge_size)
    # HF Qwen3VLProcessor._calculate_timestamps: pad indices to a merge_size
    # multiple, convert to seconds, average each group of merge_size
    ind = list(idx)
    if len(ind) % merge_size:
        ind.extend(ind[-1] for _ in range(merge_size - len(ind) % merge_size))
    ts = [i / video_fps for i in ind]
    ts = [(ts[i] + ts[i + merge_size - 1]) / 2
          for i in range(0, len(ts), merge_size)]
    return patches, grid, ts[: grid[0]]


# ---------------------------------------------------------------------------
# prompt assembly (the Qwen3-VL chat template, hand-rolled)
# ---------------------------------------------------------------------------

VISION_START = "<|vision_start|>"
VISION_END = "<|vision_end|>"
IMAGE_PAD = "<|image_pad|>"
VIDEO_PAD = "<|video_pad|>"


def build_chat_ids(
    tokenizer,
    user_text: str,
    system_prompt: Optional[str] = None,
    grid: Optional[Tuple[int, int, int]] = None,
    timestamps: Optional[Sequence[float]] = None,
    merge_size: int = 2,
    is_video: bool = True,
) -> np.ndarray:
    """Token ids for a full Qwen3-VL chat turn, HF-processor-free.

    Renders `<system?> user(<video?> text) assistant` with the processor's
    video expansion: per temporal grid frame, `<{t:.1f} seconds>` +
    vision_start + grid_h·grid_w/merge² pad tokens + vision_end (HF
    Qwen3VLProcessor.__call__). Vision tokens precede the user text, matching
    the chat template's content ordering."""
    parts = []
    if system_prompt:
        parts.append(f"<|im_start|>system\n{system_prompt}<|im_end|>\n")
    vision = ""
    if grid is not None:
        gt, gh, gw = grid
        frame_seqlen = gh * gw // (merge_size ** 2)
        pad = VIDEO_PAD if is_video else IMAGE_PAD
        if is_video:
            ts = list(timestamps if timestamps is not None
                      else [float(i) for i in range(gt)])
            for i in range(gt):
                vision += (f"<{ts[i]:.1f} seconds>"
                           + VISION_START + pad * frame_seqlen + VISION_END)
        else:
            vision = VISION_START + pad * (gt * frame_seqlen) + VISION_END
    parts.append(f"<|im_start|>user\n{vision}{user_text}<|im_end|>\n")
    parts.append("<|im_start|>assistant\n")
    ids = tokenizer("".join(parts), add_special_tokens=False)["input_ids"]
    return np.asarray([ids], np.int32)


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
