"""Misc utilities (role of reference `omnivideo/utils/utils.py:78-158`)."""

from __future__ import annotations

import argparse
from typing import List, Tuple

import jax.numpy as jnp


def str2bool(v) -> bool:
    """argparse bool coercion (utils.py:78-92)."""
    if isinstance(v, bool):
        return v
    v = str(v).lower()
    if v in ("yes", "true", "t", "y", "1"):
        return True
    if v in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def masks_like(shape: Tuple[int, ...], zero_first_frame: bool = False) -> jnp.ndarray:
    """Ones mask over a latent [C, F, H, W], optionally zeroing frame 0
    (reference masks_like, utils.py:105-132 — used for first-frame
    conditioning in i2v-style tasks)."""
    m = jnp.ones(shape, jnp.float32)
    if zero_first_frame:
        m = m.at[:, 0].set(0.0)
    return m


def best_output_size(w: int, h: int, dw: int, dh: int, expected_area: int) -> Tuple[int, int]:
    """Aspect-fit output size under an area budget, divisor-aligned
    (reference best_output_size, utils.py:135-158)."""
    ratio = w / h
    ow = (expected_area * ratio) ** 0.5 // dw * dw
    oh = expected_area / ow // dh * dh
    ow2 = ow + dw
    oh2 = expected_area / ow2 // dh * dh
    if abs(ow / oh - ratio) < abs(ow2 / oh2 - ratio):
        return int(ow), int(oh)
    return int(ow2), int(oh2)
