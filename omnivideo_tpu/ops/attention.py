"""Unified attention entry point.

Role-equivalent to the reference dispatcher `omnivideo/modules/attention.py:24-182`
(`flash_attention`: FA3 → FA2-varlen → SDPA fallback with cu_seqlens packing),
re-designed for XLA: instead of varlen packing (dynamic shapes), fixed-shape
tensors with *length masking* — padded KV positions get −inf logits, so results
match the reference's varlen semantics while keeping one compiled program per
shape bucket.

Implementations:
- "xla":    einsum attention with f32 softmax — the correctness oracle; XLA
            fuses it well enough for small shapes / CPU tests.
- "pallas": Pallas TPU flash-attention kernel (ops/pallas/flash_attention.py),
            online-softmax tiling over KV in VMEM.
- "auto":   pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _default_scale(head_dim: int) -> float:
    return head_dim**-0.5


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference einsum attention.

    q: [B, Lq, N, D]; k/v: [B, Lk, N, D]; kv_lens: [B] valid KV lengths or None.
    Softmax in f32; logits accumulated in f32 on the MXU.
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    scale = softmax_scale if softmax_scale is not None else _default_scale(D)
    logits = jnp.einsum(
        "bind,bjnd->bnij", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if kv_lens is not None:
        mask = jnp.arange(Lk)[None, :] < kv_lens[:, None]  # [B, Lk]
        logits = jnp.where(mask[:, None, None, :], logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnij,bjnd->bind", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    impl: str = "auto",
    assume_normalized: bool = False,
) -> jnp.ndarray:
    """Dispatching attention (role of reference `flash_attention`, attention.py:24).

    assume_normalized: q/k rows are qk-normed (O(sqrt(D)) norms) — lets the
    Pallas kernel use its bounded-softmax fast path (no running max).
    """
    if impl == "auto":
        platform = jax.default_backend()
        impl = "pallas" if platform == "tpu" else "xla"
    if impl == "xla":
        return attention_xla(q, k, v, kv_lens=kv_lens, softmax_scale=softmax_scale)
    if impl == "pallas":
        from .pallas.flash_attention import flash_attention as _flash

        return _flash(q, k, v, kv_lens=kv_lens, softmax_scale=softmax_scale,
                      assume_normalized=assume_normalized)
    if impl == "pallas_interpret":
        # CI impl: the real kernels (fwd + custom-vjp bwd) in interpret mode
        # on CPU, small blocks to keep the emulation cheap — lets the test
        # suite drive full model/training paths through the Pallas code
        from .pallas.flash_attention import flash_attention as _flash

        return _flash(q, k, v, kv_lens=kv_lens, softmax_scale=softmax_scale,
                      block_q=128, block_k=128, interpret=True,
                      assume_normalized=assume_normalized)
    raise ValueError(f"unknown attention impl: {impl}")
