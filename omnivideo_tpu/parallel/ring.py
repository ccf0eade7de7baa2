"""Ring attention over the 'seq' mesh axis.

Role of reference ring flash-attention
(`previous_version/.../llava/train/sequence_parallel/ring/ring_flash_attn.py:26-73`
and the online LSE merge `ring/utils.py:29-40`): K/V blocks rotate around the
ring while each device accumulates attention for its local queries with a
numerically-stable online max/sum merge.

TPU-native: `jax.shard_map` + `lax.ppermute` (XLA maps the rotation onto ICI
neighbor links); the per-block partial attention uses f32 logits on the MXU.
The reference's P2P RingComm send/recv double-buffering is what ppermute
compiles to — overlap is the compiler's job (a fused Pallas ring kernel with
explicit RDMA double-buffering is the planned upgrade, see ops/pallas/).

Non-causal (video DiT attention is bidirectional); zigzag/stripe causal
load-balancing variants apply only to causal LLM training and are provided by
block masking in ring_attention_local(causal=True).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attn(q, k, v, scale, bias=None):
    """Partial attention for one K/V block.

    Returns (unnormalized out [B,Lq,N,D] f32, m [B,N,Lq,1], l [B,N,Lq,1]).
    bias: additive logit bias, broadcastable to [B, N, Lq, Lk].
    """
    s = jnp.einsum("bind,bjnd->bnij", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bnij,bjnd->bind", p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return o, m, l


def ring_attention_local(
    q, k, v, axis: str = "seq", causal=False, softmax_scale: Optional[float] = None,
    kv_mask=None,
):
    """Ring attention on sequence-sharded q/k/v; call inside shard_map.

    q/k/v: [B, L/n, N, D] local blocks. K/V rotate n−1 times via ppermute;
    online merge keeps a running (out, m, l) triple (ring/utils.py:29-40).

    causal: False, True/"block" (whole shards from ranks ≤ own — the
    reference ring step<=rank skip at shard granularity), or "token"
    (additionally a triangular mask inside the own-rank block — exact LM
    causality when shards are contiguous). Fully differentiable (ppermute
    has a transpose rule), so this is the training path for causal SP.

    kv_mask: optional [B, L/n] bool — validity of this device's OWN K/V rows
    (padded-sequence support: seq_len rounded up to an sp-multiple, reference
    x2x_gen_unified.py:332-334). The mask travels the ring with its K/V
    block, so it is layout-agnostic (works for contiguous, zigzag, stripe,
    or hybrid-gathered shard orders without any offset arithmetic).
    """
    n = jax.lax.psum(1, axis)
    my = jax.lax.axis_index(axis)
    B, Lq, N, D = q.shape
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    qf = q

    perm = [(i, (i + 1) % n) for i in range(n)]
    has_mask = kv_mask is not None  # static: unmasked path pays nothing
    if kv_mask is None:
        kv_mask = jnp.ones((B, k.shape[1]), bool)

    def step(carry, i):
        out, m, l, kk, vv, mk = carry
        src_rank = (my - i) % n  # which device's block we currently hold

        bias = None
        if has_mask:
            # invalid (padded) kv rows of the visiting block → -inf logits
            bias = jnp.where(mk, 0.0, NEG_INF)[:, None, None, :]  # [B,1,1,Lk]
        if causal == "token":
            # intra-shard triangle applies only when holding our own block
            qpos = jnp.arange(Lq)[:, None]
            kpos = jnp.arange(kk.shape[1])[None, :]
            own_mask = jnp.where(qpos >= kpos, 0.0, NEG_INF)  # [Lq, Lk]
            tri = jnp.where(src_rank == my, own_mask,
                            jnp.zeros_like(own_mask))[None, None]
            bias = tri if bias is None else bias + tri
        o_b, m_b, l_b = _block_attn(qf, kk, vv, scale, bias=bias)
        if has_mask:
            # a FULLY padded visiting block must contribute nothing: with
            # every logit at NEG_INF, m_b == NEG_INF and exp(s − m_b) ==
            # exp(0) == 1, which would add Lk phantom mass to l
            valid_b = jnp.any(mk, axis=-1).astype(jnp.float32)[:, None, None, None]
            m_b = jnp.where(valid_b > 0, m_b, NEG_INF)
            l_b = l_b * valid_b
            o_b = o_b * valid_b
        if causal:
            # keep only blocks from ranks ≤ own (block-causal across the ring)
            keep = (src_rank <= my).astype(jnp.float32)
            m_b = jnp.where(keep > 0, m_b, NEG_INF)
            l_b = l_b * keep
            o_b = o_b * keep

        m_new = jnp.maximum(m, m_b)
        a = jnp.exp(m - m_new)
        b = jnp.exp(m_b - m_new)
        l_new = l * a + l_b * b
        aq = jnp.moveaxis(a, 1, 2)  # [B,N,Lq,1] → [B,Lq,N,1]
        bq = jnp.moveaxis(b, 1, 2)
        out = out * aq + o_b * bq

        kk = jax.lax.ppermute(kk, axis, perm)
        vv = jax.lax.ppermute(vv, axis, perm)
        mk = jax.lax.ppermute(mk, axis, perm)
        return (out, m_new, l_new, kk, vv, mk), None

    out0 = jnp.zeros((B, Lq, N, D), jnp.float32)
    m0 = jnp.full((B, N, Lq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, N, Lq, 1), jnp.float32)
    (out, m, l, _, _, _), _ = jax.lax.scan(
        step, (out0, m0, l0, k, v, kv_mask), jnp.arange(n)
    )
    l = jnp.maximum(jnp.moveaxis(l, 1, 2), 1e-20)
    return (out / l).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    impl: str = "ppermute",
    interpret: Optional[bool] = None,
    kv_lens: Optional[jnp.ndarray] = None,
    comm_dtype=None,
) -> jnp.ndarray:
    """Global-view wrapper: shard along L over `axis`, run ring attention.

    impl="ppermute": XLA collective-permute K/V rotation (differentiable).
    impl="pallas": fused single-kernel ring flash attention — the remote DMA
    of K/V to the next device overlaps the flash tile pipeline inside one
    Pallas kernel (ops/pallas/ring_attention.py; forward-only).

    kv_lens: optional [B] valid global KV lengths (padded-sequence support —
    reference sp-multiple seq rounding, x2x_gen_unified.py:332-334). Assumes
    contiguous end-padding; padding must be < one shard (always true for
    round-up-to-sp-multiple padding)."""
    if comm_dtype is not None:
        # K/V ride the ring (n-1 ppermutes each) in this dtype — bf16 in
        # production halves the ICI bytes; reference flash-attn is half
        # precision anyway (attention.py:24). None = keep incoming dtypes.
        q, k, v = q.astype(comm_dtype), k.astype(comm_dtype), v.astype(comm_dtype)
    n = mesh.shape[axis]
    B, L, N, D = q.shape
    assert L % n == 0, (L, n)
    spec = P(None, axis, None, None)
    if impl == "pallas":
        assert not causal, "fused pallas ring kernel is non-causal (DiT path)"
        from ..ops.pallas.ring_attention import ring_flash_attention_trainable

        if interpret is None:  # Mosaic interpreter off-TPU (tests/virtual mesh)
            interpret = jax.default_backend() != "tpu"
        if kv_lens is not None:
            # varlen path: the fused kernel masks by GLOBAL position (origin
            # shard offset + local offset), so contiguous end-padding works.
            # Trainable variant — padded ring SP must survive jax.grad
            # (padded rows get zero output AND zero gradient).
            def local(q, k, v, lens):
                return ring_flash_attention_trainable(
                    q, k, v, axis_name=axis, softmax_scale=softmax_scale,
                    interpret=interpret, mesh_axes=tuple(mesh.axis_names),
                    kv_lens=lens)

            fn = jax.shard_map(
                local, mesh=mesh, in_specs=(spec, spec, spec, P(None)),
                out_specs=spec, check_vma=False)
            return fn(q, k, v, kv_lens.astype(jnp.int32))
        local = functools.partial(
            ring_flash_attention_trainable, axis_name=axis,
            softmax_scale=softmax_scale, interpret=interpret,
            mesh_axes=tuple(mesh.axis_names),
        )
    else:
        if kv_lens is not None:
            # mask of each device's OWN rows; rides the ring with its block
            def local(q, k, v, mask):
                return ring_attention_local(
                    q, k, v, axis=axis, causal=causal,
                    softmax_scale=softmax_scale, kv_mask=mask)

            mask = jnp.arange(L)[None, :] < kv_lens[:, None].astype(jnp.int32)
            fn = jax.shard_map(
                local, mesh=mesh,
                in_specs=(spec, spec, spec, P(None, axis)),
                out_specs=spec, check_vma=False)
            return fn(q, k, v, mask)
        local = functools.partial(
            ring_attention_local, axis=axis, causal=causal, softmax_scale=softmax_scale
        )
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def hybrid_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    ulysses_axis: str = "fsdp",
    ring_axis: str = "seq",
    causal: bool = False,
    ring_impl: str = "ppermute",
    interpret: Optional[bool] = None,
    kv_lens: Optional[jnp.ndarray] = None,
    comm_dtype=None,
) -> jnp.ndarray:
    """2-D hybrid Ulysses×Ring sequence parallelism.

    Role of reference HybridAttention
    (`.../sequence_parallel/hybrid_attn.py:93-190`): Ulysses all_to_all
    scatters heads across the inner axis, ring attention spans the outer
    axis — sp_degree = ulysses × ring (globals.py:40-152).

    kv_lens: optional [B] valid KV lengths (padded sequences). The validity
    mask is sharded like K, all_gather'd alongside the Ulysses head-scatter
    (same rank-order concat as all_to_all tiled), then travels the ring with
    its K/V block — no offset arithmetic, any shard order.
    """
    from .ulysses import _a2a_gather_heads, _a2a_scatter_heads

    if comm_dtype is not None:
        # both the ulysses a2a and the ring ppermutes ride ICI in this dtype
        q, k, v = q.astype(comm_dtype), k.astype(comm_dtype), v.astype(comm_dtype)
    nu = mesh.shape[ulysses_axis]
    nr = mesh.shape[ring_axis]
    B, L, N, D = q.shape
    assert L % (nu * nr) == 0 and N % nu == 0

    spec = P(None, (ulysses_axis, ring_axis), None, None)

    if ring_impl == "pallas" and interpret is None:
        interpret = jax.default_backend() != "tpu"

    def local(q, k, v, mask):
        # Ulysses: [B, L/(nu·nr), N, D] → [B, L/nr, N/nu, D]
        q2 = _a2a_scatter_heads(q, ulysses_axis)
        k2 = _a2a_scatter_heads(k, ulysses_axis)
        v2 = _a2a_scatter_heads(v, ulysses_axis)
        mask2 = None
        if mask is not None:
            # K's post-scatter sequence = rank-order concat over the ulysses
            # axis; gather the mask the same way
            mask2 = jax.lax.all_gather(mask, ulysses_axis, axis=1, tiled=True)
        if ring_impl == "pallas":
            assert not causal
            from ..ops.pallas.ring_attention import ring_flash_attention_trainable

            if mask2 is not None:
                # post-Ulysses K order is a rank-order concat, so global
                # end-padding is NOT contiguous in ring-local coordinates —
                # the fused kernel's offset arithmetic doesn't apply. Fall
                # back to the XLA ppermute ring (correct, but materializes
                # [B,N,Lq,Lk] logits per step) and say so.
                import warnings
                warnings.warn(
                    "hybrid_attention: ring_impl='pallas' with kv_lens falls "
                    "back to the unfused XLA ring (mask rides the ring; the "
                    "fused kernel only supports contiguous global padding)",
                    stacklevel=2)
                o = ring_attention_local(q2, k2, v2, axis=ring_axis,
                                         kv_mask=mask2)
            else:
                o = ring_flash_attention_trainable(
                    q2, k2, v2, ring_axis, None, 256, 256, interpret,
                    tuple(mesh.axis_names),
                )
        else:
            o = ring_attention_local(q2, k2, v2, axis=ring_axis, causal=causal,
                                     kv_mask=mask2)
        return _a2a_gather_heads(o, ulysses_axis)

    if kv_lens is not None:
        mask = jnp.arange(L)[None, :] < kv_lens[:, None].astype(jnp.int32)
        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec, P(None, (ulysses_axis, ring_axis))),
            out_specs=spec, check_vma=False)
        return fn(q, k, v, mask)
    fn = jax.shard_map(
        functools.partial(local, mask=None), mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )
    return fn(q, k, v)


def zigzag_ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    softmax_scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Load-balanced token-causal ring attention (zigzag_ring_flash_attn.py).

    The sequence is split into 2n chunks; device i holds chunks (i, 2n−1−i),
    so every device does the same causal work. Runs the fused Pallas ring
    kernel with zigzag chunk visibility; output is returned in the original
    sequence order.
    """
    from ..ops.pallas.ring_attention import ring_flash_attention_shard

    n = mesh.shape[axis]
    B, L, N, D = q.shape
    assert L % (2 * n) == 0, (L, n)
    Lc = L // (2 * n)
    chunk_order = []
    for i in range(n):
        chunk_order += [i, 2 * n - 1 - i]
    idx = jnp.concatenate(
        [jnp.arange(c * Lc, (c + 1) * Lc) for c in chunk_order]
    )
    inv = jnp.argsort(idx)

    qz, kz, vz = (jnp.take(x, idx, axis=1) for x in (q, k, v))
    spec = P(None, axis, None, None)
    out = jax.shard_map(
        functools.partial(
            ring_flash_attention_shard, axis_name=axis,
            softmax_scale=softmax_scale, block_q=block_q, block_k=block_k,
            interpret=interpret, causal="token", zigzag=True,
            mesh_axes=tuple(mesh.axis_names),
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(qz, kz, vz)
    return jnp.take(out, inv, axis=1)


def stripe_ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    softmax_scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stripe-balanced token-causal ring attention (stripe_flash_attn.py).

    Tokens are dealt round-robin: device i holds global positions {i + j·n},
    giving every device an identical causal workload. The fused kernel applies
    the shifted-triangle rule q_off ≥ k_off + (src > my). Output is returned
    in the original order.
    """
    from ..ops.pallas.ring_attention import ring_flash_attention_shard

    n = mesh.shape[axis]
    B, L, N, D = q.shape
    assert L % n == 0, (L, n)
    # stripe permutation: all positions ≡ 0 (mod n), then ≡ 1, ...
    idx = jnp.concatenate([jnp.arange(i, L, n) for i in range(n)])
    inv = jnp.argsort(idx)

    qz, kz, vz = (jnp.take(x, idx, axis=1) for x in (q, k, v))
    spec = P(None, axis, None, None)
    out = jax.shard_map(
        functools.partial(
            ring_flash_attention_shard, axis_name=axis,
            softmax_scale=softmax_scale, block_q=block_q, block_k=block_k,
            interpret=interpret, causal="stripe",
            mesh_axes=tuple(mesh.axis_names),
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(qz, kz, vz)
    return jnp.take(out, inv, axis=1)
