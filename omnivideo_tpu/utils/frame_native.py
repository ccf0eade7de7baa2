"""Fused frame transforms: native (C++) fast path + numpy fallback."""

from __future__ import annotations

import numpy as np

from ..native import load_frame_ops

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = load_frame_ops()
        _TRIED = True
    return _LIB


def frames_to_chw_norm(frames: np.ndarray) -> np.ndarray:
    """[T, H, W, 3] uint8 → [3, T, H, W] float32 in [-1, 1] (single pass)."""
    assert frames.dtype == np.uint8 and frames.ndim == 4 and frames.shape[-1] == 3
    T, H, W, _ = frames.shape
    lib = _lib()
    if lib is not None:
        frames = np.ascontiguousarray(frames)
        out = np.empty((3, T, H, W), np.float32)
        lib.frames_to_chw_norm(
            frames.ctypes.data, out.ctypes.data, T, H, W
        )
        return out
    return (frames.astype(np.float32) / 127.5 - 1.0).transpose(3, 0, 1, 2)


def sample_frames_to_chw_norm(frames: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Gather frames[indices] fused with the normalize+transpose."""
    assert frames.dtype == np.uint8 and frames.shape[-1] == 3
    idx = np.ascontiguousarray(np.asarray(indices, np.int64))
    N = len(idx)
    _, H, W, _ = frames.shape
    lib = _lib()
    if lib is not None:
        frames = np.ascontiguousarray(frames)
        out = np.empty((3, N, H, W), np.float32)
        lib.sample_frames_to_chw_norm(
            frames.ctypes.data, idx.ctypes.data, out.ctypes.data, N, H, W
        )
        return out
    sel = frames[idx]
    return (sel.astype(np.float32) / 127.5 - 1.0).transpose(3, 0, 1, 2)


def chw_to_frames_u8(video: np.ndarray) -> np.ndarray:
    """[C, T, H, W] float32 in [-1, 1] → [T, H, W, C] uint8."""
    video = np.ascontiguousarray(np.asarray(video, np.float32))
    C, T, H, W = video.shape
    lib = _lib()
    if lib is not None:
        out = np.empty((T, H, W, C), np.uint8)
        lib.chw_to_frames_u8(video.ctypes.data, out.ctypes.data, C, T, H, W)
        return out
    x = np.clip(video, -1, 1)
    return ((x + 1.0) * 127.5 + 0.5).astype(np.uint8).transpose(1, 2, 3, 0)
