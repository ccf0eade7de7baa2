"""Ulysses sequence-parallel attention (DeepSpeed-Ulysses style).

Role of reference `omnivideo/distributed/ulysses.py:8-56`
(distributed_attention: all_to_all scatter-heads/gather-sequence around full
flash attention) and the differentiable AllToAll autograd fn
(`distributed/util.py:95-121`) — TPU-native: `jax.shard_map` over the 'seq'
mesh axis with `lax.all_to_all` (XLA lowers it onto ICI); differentiability is
free (all_to_all has a registered transpose), no autograd wrappers needed.

Also covers the reference's sequence-sharded cross-attention
(full_sequence_parallel.py:204-232): context KV is sharded along its length
and all_to_all'd to full-length per head group.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import attention


def _a2a_scatter_heads(x, axis: str):
    """[B, L/n, N, D] → [B, L, N/n, D] (ulysses.py:41-43)."""
    return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)


def _a2a_gather_heads(x, axis: str):
    """[B, L, N/n, D] → [B, L/n, N, D] (ulysses.py:49-55)."""
    return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)


def ulysses_attention_local(
    q, k, v, axis: str = "seq", kv_lens=None, impl: str = "auto",
    assume_normalized: bool = False, comm_dtype=None,
):
    """Attention on sequence-sharded q/k/v; call inside shard_map.

    q: [B, Lq/n, N, D]; k/v: [B, Lk/n, N, D] (both sharded along length).
    Requires num_heads % n == 0 (reference guard ulysses.py:32-38, enforced
    statically here by the all_to_all shape check).

    comm_dtype: dtype the four all_to_alls ride ICI in (callers pass the
    param dtype — bf16 in production halves the wire bytes; the reference's
    flash-attn consumes/produces half precision anyway, attention.py:24).
    None keeps the incoming dtypes (f32 oracle/parity paths).
    """
    if comm_dtype is not None:
        q, k, v = q.astype(comm_dtype), k.astype(comm_dtype), v.astype(comm_dtype)
    q = _a2a_scatter_heads(q, axis)
    k = _a2a_scatter_heads(k, axis)
    v = _a2a_scatter_heads(v, axis)
    o = attention(q, k, v, kv_lens=kv_lens, impl=impl,
                  assume_normalized=assume_normalized)
    if comm_dtype is not None:
        o = o.astype(comm_dtype)
    return _a2a_gather_heads(o, axis)


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    kv_lens: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    assume_normalized: bool = False,
    comm_dtype=None,
) -> jnp.ndarray:
    """Global-view wrapper: shard q/k/v along L over `axis`, run Ulysses.

    q: [B, Lq, N, D]; k/v: [B, Lk, N, D]. Lq, Lk, and N must be divisible by
    the axis size (reference rounds seq_len up, x2x_gen_unified.py:332-334).
    """
    n = mesh.shape[axis]
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    assert Lq % n == 0 and Lk % n == 0 and N % n == 0, (Lq, Lk, N, n)

    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        functools.partial(ulysses_attention_local, axis=axis, kv_lens=kv_lens,
                          impl=impl, assume_normalized=assume_normalized,
                          comm_dtype=comm_dtype),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
