"""Weight-only int8 quantization for host->HBM streamed block params.

Role: the reference ships full-precision weights and assumes a 1.5+ GB/s
PCIe link between host RAM and the accelerator
(/root/reference/omnivideo/x2x_gen_unified.py:261-540 keeps the whole A14B
stack device-resident on an 80 GB GPU, so it never streams at all). The
TPU-native layer-streaming executor (pipelines/streaming.py) moves ~0.7 GB
of bf16 per block across the host link every dispatch; on links where that
transfer does not hide behind compute, halving the bytes halves the stall.

Scheme: symmetric per-output-channel int8 on the large 2-D matmul kernels
only. For a kernel W[in, out] used as x @ W, each output column j gets
scale_j = max_i |W_ij| / 127 and q_ij = round(W_ij / scale_j); everything
else (biases, norm gains, AdaLN modulation tables — all tiny and
precision-critical) passes through untouched. Dequantization happens inside
the block's jit (one int8->bf16 cast + a per-column multiply, HBM-bound and
fused by XLA), so the matmuls themselves still run in bf16 on the MXU:
numerics match weight-only int8 inference as deployed elsewhere (max
per-weight relative error ~= 1/254 of the column amax).

Quantized leaves are represented structurally as {"q8": int8 W-shaped,
"scale": f32 [out]} dicts so the streaming BlockPacker's per-dtype flat
buffers pick them up with zero extra plumbing (int8 payload + tiny f32
scale vector -> still one transfer per dtype).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_Q8_KEY = "q8"

# dtypes eligible for quantization (matmul kernels); f32 leaves are norm
# gains / modulation tables in this codebase and stay exact.
_QUANT_DTYPES = ("bfloat16", "float16")


def is_q8_leaf(x: Any) -> bool:
    return isinstance(x, dict) and _Q8_KEY in x and "scale" in x


def quantize_leaf(w: np.ndarray) -> dict:
    """Symmetric per-output-channel int8 of a 2-D kernel [in, out].

    "dt" is a zero-size marker array carrying the SOURCE dtype (jit-safe:
    part of the abstract signature, zero payload) so dequantize_block can
    round-trip float16 kernels back to float16 instead of silently
    rebuilding them as bfloat16 (ADVICE r4)."""
    src = np.asarray(w)
    a = src.astype(np.float32)
    amax = np.max(np.abs(a), axis=0)
    scale = np.where(amax > 0, amax, 1.0).astype(np.float32) / 127.0
    q = np.clip(np.round(a / scale), -127, 127).astype(np.int8)
    return {_Q8_KEY: q, "scale": scale, "dt": np.zeros((0,), dtype=src.dtype)}


def quantize_block(block, min_size: int = 4096):
    """Host-side: replace every large 2-D low-precision kernel in a block
    param pytree with its {"q8", "scale"} form. Small/1-D/f32 leaves pass
    through unchanged (aliasing within the tree is irrelevant — each leaf is
    visited once)."""

    def q(leaf):
        a = np.asarray(leaf)
        if (a.ndim == 2 and a.size >= min_size
                and a.dtype.name in _QUANT_DTYPES):
            return quantize_leaf(a)
        return leaf

    return jax.tree_util.tree_map(q, block)


def dequantize_block(qblock, dtype=jnp.bfloat16):
    """jit-safe inverse: {"q8", "scale"} dicts -> dense kernels in their
    recorded source dtype (the "dt" marker; `dtype` is the fallback for
    legacy trees without one). The int8->f32 cast and per-column scale
    multiply fuse into one HBM pass under XLA; the surrounding matmul
    consumes the low-precision result on the MXU."""

    def deq(leaf):
        if is_q8_leaf(leaf):
            w = leaf[_Q8_KEY].astype(jnp.float32) * leaf["scale"][None, :]
            return w.astype(leaf["dt"].dtype if "dt" in leaf else dtype)
        return leaf

    return jax.tree_util.tree_map(deq, qblock, is_leaf=is_q8_leaf)


def quantize_block_jnp(block, min_size: int = 4096):
    """jit-safe (device-side) mirror of quantize_block — used to shrink
    d2h fetches (e.g. streamed-training gradients) to int8 + f32 scales
    before they cross a slow link. Same eligibility rules and the same
    "dt" source-dtype marker as the host version."""

    def q(leaf):
        if (leaf.ndim == 2 and leaf.size >= min_size
                and jnp.dtype(leaf.dtype).name in _QUANT_DTYPES):
            a = leaf.astype(jnp.float32)
            amax = jnp.max(jnp.abs(a), axis=0)
            scale = jnp.where(amax > 0, amax, 1.0) / 127.0
            q8 = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
            return {_Q8_KEY: q8, "scale": scale,
                    "dt": jnp.zeros((0,), leaf.dtype)}
        return leaf

    return jax.tree_util.tree_map(q, block)


def dequantize_block_np(qblock):
    """Host-side inverse (numpy): q8 dicts -> dense kernels in their source
    dtype; used by host-side optimizer updates on fetched q8 gradients."""

    def deq(leaf):
        if is_q8_leaf(leaf):
            w = np.asarray(leaf[_Q8_KEY], np.float32) * np.asarray(
                leaf["scale"], np.float32)[None, :]
            dt = leaf["dt"].dtype if "dt" in leaf else np.dtype("bfloat16")
            return w.astype(dt)
        return leaf

    return jax.tree_util.tree_map(deq, qblock, is_leaf=is_q8_leaf)


def quantized_bytes(qblock) -> int:
    """Total payload bytes of a (possibly partially) quantized block."""
    return sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(qblock))
