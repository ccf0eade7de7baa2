"""Video IO utilities.

Role of reference `omnivideo/utils/utils.py:160-227` (`cache_video` mp4 writer
with ×5 retry, `cache_image`) and the decord-based reader in
`tools/inference/generate_omni_v2v.py:306-397` (`read_video_frames`,
center-crop + resize + normalize to [-1, 1]).

This image has no ffmpeg/decord/pyav, so writers/readers dispatch across
backends: imageio-ffmpeg/pyav mp4 when importable, else MJPEG-in-AVI via the
pure-Python muxer in `avi.py` (playable in standard players), else GIF via
PIL, else raw .npz — and readers accept .mp4 (if a backend exists), .avi,
.gif, .npz/.npy, or a directory of PNG frames. The fallback formats keep the
full pipeline runnable (and benchable) in codec-less environments.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)


def _to_uint8(video: np.ndarray, value_range: Tuple[float, float] = (-1, 1)) -> np.ndarray:
    """[C, T, H, W] float in value_range → [T, H, W, C] uint8.

    uint8 input passes through (already-quantized frames, e.g. the pipeline's
    on-device output_uint8 path): [T, H, W, C] as-is, [C, T, H, W] transposed."""
    video = np.asarray(video)
    if video.dtype == np.uint8:
        if video.ndim == 4 and video.shape[0] in (1, 3) and video.shape[-1] not in (1, 3):
            return video.transpose(1, 2, 3, 0)
        return video
    video = np.asarray(video, np.float32)
    if video.ndim == 4 and video.shape[0] in (1, 3) and value_range == (-1, 1):
        # fused native path (single pass clip+scale+transpose)
        from .frame_native import chw_to_frames_u8

        return chw_to_frames_u8(video)
    lo, hi = value_range
    x = np.clip(video, lo, hi)
    x = (x - lo) / (hi - lo)
    x = (x * 255.0 + 0.5).astype(np.uint8)
    if x.ndim == 4 and x.shape[0] in (1, 3):  # CTHW → THWC
        x = x.transpose(1, 2, 3, 0)
    return x


_MP4_OK = None


def _mp4_available() -> bool:
    global _MP4_OK
    if _MP4_OK is None:
        try:
            import tempfile

            import imageio

            with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
                w = imageio.get_writer(f.name, fps=8)
                w.close()
            _MP4_OK = True
        except Exception:
            _MP4_OK = False
    return _MP4_OK


def save_video(
    path: str,
    video: np.ndarray,
    fps: int = 16,
    value_range: Tuple[float, float] = (-1, 1),
    retry: int = 5,
) -> str:
    """Write a video; returns the actual path written (extension may change
    when no mp4 backend exists). Retries like reference cache_video
    (utils.py:167-198)."""
    frames = _to_uint8(video, value_range)
    path = str(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    for attempt in range(retry):
        try:
            if path.endswith(".npz"):
                np.savez_compressed(path, frames=frames, fps=fps)
                return path
            if path.endswith(".mp4") and _mp4_available():
                import imageio

                with imageio.get_writer(path, fps=fps, codec="libx264") as w:
                    for fr in frames:
                        w.append_data(fr)
                return path
            if path.endswith(".avi") or (path.endswith(".mp4") and not _mp4_available()):
                # preferred codec-less fallback: MJPEG-in-AVI (pure-Python
                # muxer, frames are baseline JPEGs) — standard players open
                # it, unlike .npz; GIF remains only for explicit .gif
                from .avi import write_mjpeg_avi

                out = os.path.splitext(path)[0] + ".avi"
                if out != path:
                    log.warning("no mp4 backend; writing MJPEG AVI %s", out)
                return write_mjpeg_avi(out, frames, fps=fps)
            # GIF fallback via PIL (always available)
            out = path if path.endswith(".gif") else os.path.splitext(path)[0] + ".gif"
            if out != path:
                log.warning("no mp4 backend in this environment; writing %s", out)
            from PIL import Image

            imgs = [Image.fromarray(fr) for fr in frames]
            imgs[0].save(
                out,
                save_all=True,
                append_images=imgs[1:],
                duration=max(1, int(1000 / fps)),
                loop=0,
            )
            return out
        except Exception as e:  # pragma: no cover
            log.error("save_video attempt %d failed: %s", attempt, e)
            time.sleep(0.1)
    raise RuntimeError(f"failed to save video to {path} after {retry} attempts")


def save_image(path: str, image: np.ndarray, value_range=(-1, 1)) -> str:
    """[C, H, W] float → image file (reference cache_image, utils.py:201)."""
    from PIL import Image

    arr = _to_uint8(image[:, None], value_range)[0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)
    return path


def read_video_frames(
    path: str,
    max_frames: Optional[int] = None,
) -> Tuple[np.ndarray, float]:
    """Read a clip → ([T, H, W, 3] uint8, fps). Backends: npz/npy, gif, png
    dir, mp4 (if imageio backend present)."""
    p = Path(path)
    if p.suffix == ".npz":
        data = np.load(p)
        frames, fps = data["frames"], float(data.get("fps", 16))
    elif p.suffix == ".npy":
        frames, fps = np.load(p), 16.0
    elif p.is_dir():
        files = sorted(p.glob("*.png")) + sorted(p.glob("*.jpg"))
        from PIL import Image

        frames = np.stack([np.asarray(Image.open(f).convert("RGB")) for f in files])
        fps = 16.0
    elif p.suffix == ".avi":
        from .avi import read_mjpeg_avi

        frames, fps = read_mjpeg_avi(str(p))
    elif p.suffix == ".gif":
        from PIL import Image, ImageSequence

        im = Image.open(p)
        frames = np.stack(
            [np.asarray(f.convert("RGB")) for f in ImageSequence.Iterator(im)]
        )
        fps = 1000.0 / max(im.info.get("duration", 62), 1)
    else:
        import imageio

        reader = imageio.get_reader(str(p))
        meta = reader.get_meta_data()
        fps = float(meta.get("fps", 16))
        frames = np.stack([fr for fr in reader])
    if max_frames is not None:
        frames = frames[:max_frames]
    return frames, fps


def sample_and_transform_frames(
    frames: np.ndarray,
    num_frames: int,
    size: Tuple[int, int],
    src_fps: float = 16.0,
    target_fps: float = 16.0,
) -> np.ndarray:
    """Temporal sampling + center-crop/resize + normalize to [-1, 1]
    (reference transform_frames_to_tensor, generate_omni_v2v.py:306-344).

    frames: [T, H, W, 3] uint8; size: (width, height).
    Returns [3, num_frames, H, W] float32.
    """
    T = len(frames)
    rate = max(1, int(round(src_fps / target_fps)))
    idx = np.arange(0, T, rate)[:num_frames]
    if len(idx) < num_frames:  # pad by repeating last frame
        idx = np.concatenate([idx, np.full(num_frames - len(idx), idx[-1])])
    sel = frames[idx]

    W_t, H_t = size
    from PIL import Image

    out = []
    for fr in sel:
        img = Image.fromarray(fr)
        w, h = img.size
        # resize so the short side covers the target, then center crop
        scale = max(W_t / w, H_t / h)
        img = img.resize((int(round(w * scale)), int(round(h * scale))), Image.BICUBIC)
        w2, h2 = img.size
        left, top = (w2 - W_t) // 2, (h2 - H_t) // 2
        img = img.crop((left, top, left + W_t, top + H_t))
        out.append(np.asarray(img, np.float32))
    arr = np.stack(out).astype(np.uint8)  # [T, H, W, 3]
    from .frame_native import frames_to_chw_norm

    return frames_to_chw_norm(arr)
