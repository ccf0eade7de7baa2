"""Qwen-VL media preprocessing utilities.

Role of reference `omnivideo/utils/qwen_vl_utils.py` (smart_resize pixel
budgeting :53, smart_nframes frame sampling :132, video readers :176-343,
process_vision_info) — re-implemented with the codec-less readers of
utils/video.py (decord is not available on this image).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

IMAGE_FACTOR = 28
MIN_PIXELS = 4 * 28 * 28
MAX_PIXELS = 16384 * 28 * 28
MAX_RATIO = 200

VIDEO_MIN_PIXELS = 128 * 28 * 28
VIDEO_MAX_PIXELS = 768 * 28 * 28
VIDEO_TOTAL_PIXELS = 24576 * 28 * 28
FRAME_FACTOR = 2
FPS = 2.0
FPS_MIN_FRAMES = 4
FPS_MAX_FRAMES = 768


def round_by_factor(number: float, factor: int) -> int:
    return round(number / factor) * factor


def ceil_by_factor(number: float, factor: int) -> int:
    return math.ceil(number / factor) * factor


def floor_by_factor(number: float, factor: int) -> int:
    return math.floor(number / factor) * factor


def smart_resize(
    height: int,
    width: int,
    factor: int = IMAGE_FACTOR,
    min_pixels: int = MIN_PIXELS,
    max_pixels: int = MAX_PIXELS,
) -> Tuple[int, int]:
    """Target (h, w) for a pixel-budgeted, patch-aligned resize.

    The arithmetic must be value-identical to the public `qwen-vl-utils`
    package (the reference vendors it at omnivideo/utils/qwen_vl_utils.py:53)
    because the VLM was trained on exactly these target sizes: snap both
    sides to the patch factor, then — if the snapped area busts the budget —
    rescale by the square root of the area ratio, flooring to the factor when
    shrinking and ceiling when growing.
    """
    ratio = max(height, width) / min(height, width)
    if ratio > MAX_RATIO:
        raise ValueError(f"aspect ratio {ratio:.2f}:1 exceeds the {MAX_RATIO}:1 limit")
    h = max(factor, round_by_factor(height, factor))
    w = max(factor, round_by_factor(width, factor))
    if h * w > max_pixels:
        shrink = math.sqrt(height * width / max_pixels)
        h = floor_by_factor(height / shrink, factor)
        w = floor_by_factor(width / shrink, factor)
    elif h * w < min_pixels:
        grow = math.sqrt(min_pixels / (height * width))
        h = ceil_by_factor(height * grow, factor)
        w = ceil_by_factor(width * grow, factor)
    return h, w


def smart_nframes(ele: Dict, total_frames: int, video_fps: float) -> int:
    """How many frames to sample for VLM video input.

    Value-identical to `qwen-vl-utils` (reference qwen_vl_utils.py:132): an
    explicit `nframes` wins (rounded to the temporal-patch factor); otherwise
    the target fps is converted to a frame count and clamped to
    [min_frames, max_frames], all factor-aligned.
    """
    if "fps" in ele and "nframes" in ele:
        raise ValueError("give either `fps` or `nframes`, not both")
    if "nframes" in ele:
        n = round_by_factor(ele["nframes"], FRAME_FACTOR)
    else:
        lo = ceil_by_factor(ele.get("min_frames", FPS_MIN_FRAMES), FRAME_FACTOR)
        hi = floor_by_factor(
            ele.get("max_frames", min(FPS_MAX_FRAMES, total_frames)), FRAME_FACTOR
        )
        want = total_frames / video_fps * ele.get("fps", FPS)
        n = round_by_factor(min(max(want, lo), hi), FRAME_FACTOR)
    if not FRAME_FACTOR <= n <= total_frames:
        raise ValueError(
            f"sampled frame count {n} outside [{FRAME_FACTOR}, {total_frames}]"
        )
    return int(n)


def fetch_video(ele: Dict) -> Tuple[np.ndarray, float]:
    """Read + sample + resize a video for VLM input.

    Returns ([T, H, W, 3] uint8, sample_fps). Reader backends per
    utils/video.read_video_frames (npz/gif/png-dir/mp4-if-backend).
    """
    from .video import read_video_frames

    frames, video_fps = read_video_frames(ele["video"])
    total = len(frames)
    nframes = smart_nframes(ele, total, video_fps)
    idx = np.linspace(0, total - 1, nframes).round().astype(int)
    sel = frames[idx]

    h, w = sel.shape[1:3]
    min_pixels = ele.get("min_pixels", VIDEO_MIN_PIXELS)
    total_pixels = ele.get("total_pixels", VIDEO_TOTAL_PIXELS)
    max_pixels = max(
        min(VIDEO_MAX_PIXELS, int(total_pixels / nframes * FRAME_FACTOR)),
        int(min_pixels * 1.05),
    )
    rh, rw = smart_resize(
        h, w, factor=IMAGE_FACTOR, min_pixels=min_pixels, max_pixels=max_pixels
    )
    if (rh, rw) != (h, w):
        from PIL import Image

        sel = np.stack(
            [
                np.asarray(Image.fromarray(fr).resize((rw, rh), Image.BICUBIC))
                for fr in sel
            ]
        )
    sample_fps = nframes / max(total / video_fps, 1e-6)
    return sel, sample_fps


def process_vision_info(messages: List[Dict]):
    """Extract (images, videos) from chat messages (qwen_vl_utils.py:343)."""
    images, videos = [], []
    for msg in messages:
        content = msg.get("content", [])
        if isinstance(content, str):
            continue
        for ele in content:
            if "image" in ele or "image_url" in ele:
                from PIL import Image

                src = ele.get("image", ele.get("image_url"))
                img = src if isinstance(src, Image.Image) else Image.open(
                    src[7:] if str(src).startswith("file://") else src
                )
                img = img.convert("RGB")
                w, h = img.size
                rh, rw = smart_resize(
                    h, w,
                    min_pixels=ele.get("min_pixels", MIN_PIXELS),
                    max_pixels=ele.get("max_pixels", MAX_PIXELS),
                )
                images.append(img.resize((rw, rh)))
            elif "video" in ele:
                videos.append(fetch_video(ele)[0])
    return images or None, videos or None
