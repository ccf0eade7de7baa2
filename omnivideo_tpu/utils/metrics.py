"""Video generation quality metrics.

The reference ships only MLLM benchmark drivers (`.../llava/eval/`, P16) and
no automated video-generation metric harness (SURVEY.md §4.5). This module
provides first-class generation metrics:

- PSNR / SSIM between generated and reference clips (editing-fidelity checks
  for V2V: unedited regions should match the source);
- temporal consistency (mean adjacent-frame SSIM — flicker detector);
- temporal variance (motion presence — catches frozen-frame failure).

All numpy; driven by tools/eval_videos.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """a, b: [T, H, W, C] uint8/float."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(data_range**2 / mse))


def _ssim_frame(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Global-statistics SSIM per frame pair (grayscale), 8x8 block averaged."""
    a = a.astype(np.float64).mean(-1) if a.ndim == 3 else a.astype(np.float64)
    b = b.astype(np.float64).mean(-1) if b.ndim == 3 else b.astype(np.float64)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2

    def blocks(x):
        H, W = x.shape
        h, w = H // 8 * 8, W // 8 * 8
        return x[:h, :w].reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)

    xa, xb = blocks(a), blocks(b)
    mua, mub = xa.mean(1), xb.mean(1)
    va, vb = xa.var(1), xb.var(1)
    cov = ((xa - mua[:, None]) * (xb - mub[:, None])).mean(1)
    s = ((2 * mua * mub + c1) * (2 * cov + c2)) / (
        (mua**2 + mub**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Mean per-frame SSIM. a, b: [T, H, W, C]."""
    T = min(len(a), len(b))
    return float(np.mean([_ssim_frame(a[t], b[t], data_range) for t in range(T)]))


def temporal_consistency(v: np.ndarray) -> float:
    """Mean adjacent-frame SSIM — near 1.0 means no flicker. v: [T, H, W, C]."""
    if len(v) < 2:
        return 1.0
    return float(np.mean([_ssim_frame(v[t], v[t + 1]) for t in range(len(v) - 1)]))


def motion_magnitude(v: np.ndarray) -> float:
    """Mean absolute adjacent-frame difference (0 = frozen frame)."""
    if len(v) < 2:
        return 0.0
    d = np.abs(np.diff(v.astype(np.float64), axis=0))
    return float(d.mean())


def evaluate_pair(generated: np.ndarray, reference: np.ndarray) -> Dict[str, float]:
    return {
        "psnr": psnr(generated, reference),
        "ssim": ssim(generated, reference),
        "temporal_consistency": temporal_consistency(generated),
        "motion_magnitude": motion_magnitude(generated),
    }


def evaluate_single(generated: np.ndarray) -> Dict[str, float]:
    return {
        "temporal_consistency": temporal_consistency(generated),
        "motion_magnitude": motion_magnitude(generated),
    }
