"""Fused ring flash-attention Pallas kernel (RDMA K/V rotation).

Role of reference `.../llava/train/sequence_parallel/ring/ring_flash_attn.py:
26-73` + `ring/utils.py:29-40` (RingComm P2P K/V rotation overlapping
send_recv with flash compute, online LSE merge). The TPU-native form fuses
both into ONE kernel per ring step: the remote DMA of this shard's K/V to the
right neighbor starts at the first grid cell, the full flash-attention tile
pipeline runs while the ICI transfer is in flight, and the semaphore waits
land at the last grid cell. The step loop (`lax.fori_loop` under `shard_map`)
double-buffers K/V through the loop carry.

Trainable: `ring_flash_attention_trainable` wraps the fused forward in a
`jax.custom_vjp` whose backward runs a per-step Pallas flash-backward driven
by the saved global row stats, accumulating dK/dV as they ride the ring home
(block- and token-causal variants included). The simpler differentiable
ppermute form also remains in `parallel/ring.py`. Runs on real TPUs
(interpret=False) and under the Mosaic TPU interpreter on a virtual CPU mesh
(interpret=True) — which is how the unit tests exercise the RDMA semantics
without multi-chip hardware.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _step_kernel(
    # blocked VMEM inputs (grid: heads, q blocks, kv blocks)
    step_ref,   # SMEM [1, 1] — ring step index s
    len_ref,    # SMEM [H, 1] — valid global KV length per head row
    q_ref,      # [1, bq, D]
    k_ref,      # [1, bk, D]
    v_ref,      # [1, bk, D]
    m_ref,      # [1, bq, 128]  carried max (value broadcast across lanes)
    l_ref,      # [1, bq, 128]  carried sum (broadcast across lanes)
    a_ref,      # [1, bq, D]  carried accumulator
    k_any,      # ANY [H, L, D] — same array as k_ref's source, for the send
    v_any,      # ANY [H, L, D]
    # outputs
    mo_ref, lo_ref, ao_ref,          # aliased carries
    k_next_any, v_next_any,          # ANY recv buffers (written by LEFT peer)
    # scratch
    ms, ls, accs,                    # VMEM [bq,128] [bq,128] [bq, D] f32
    send_k, recv_k, send_v, recv_v,  # DMA semaphores
    *,
    scale: float,
    kv_steps: int,
    axis_name: str,
    use_barrier: bool,
    causal: Optional[str],  # None | "block" | "token" | "stripe"
    block_q: int,
    block_k: int,
    zigzag_half: int,  # 0 = contiguous shards; >0 = zigzag chunk length Lc
    lk_local: int,     # K/V tokens per shard (for global position of a block)
    use_kv_lens: bool,
    mesh_axes: tuple,  # ALL mesh axis names (MESH device ids are full coords)
):
    h, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_dev = jax.lax.axis_size(axis_name)
    my_id = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my_id + 1, n_dev)
    left = jax.lax.rem(my_id + n_dev - 1, n_dev)

    # Device addressing: LOGICAL index on a 1-axis mesh (also what the
    # Mosaic interpreter supports); full MESH coordinates with only the ring
    # axis changed on multi-axis meshes (hybrid Ulysses×ring — hardware path).
    # The interpreter's remote-DMA emulation only implements single-named-axis
    # meshes (jax dma_start discharge all_gathers over ONE shard axis), so the
    # multi-axis composition is CI-covered by a per-group host shim
    # (tests/test_ring_pallas.py::test_hybrid_with_pallas_ring) and
    # chip-checked by tools/dev/tpu_ring_check.py.
    if len(mesh_axes) == 1:
        id_type = pltpu.DeviceIdType.LOGICAL
        coords = lambda target: target
    else:
        id_type = pltpu.DeviceIdType.MESH

        def coords(target):
            return tuple(
                target if a == axis_name else jax.lax.axis_index(a)
                for a in mesh_axes
            )

    if use_barrier:
        # sync kernel entry with both ring neighbors before any remote DMA
        # (standard collective-kernel prologue; needs collective_id)
        @pl.when((h == 0) & (qi == 0) & (ki == 0))
        def _barrier():
            sem = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(sem, device_id=coords(left),
                                   device_id_type=id_type)
            pltpu.semaphore_signal(sem, device_id=coords(right),
                                   device_id_type=id_type)
            pltpu.semaphore_wait(sem, 2)

    copy_k = pltpu.make_async_remote_copy(
        src_ref=k_any, dst_ref=k_next_any, send_sem=send_k, recv_sem=recv_k,
        device_id=coords(right), device_id_type=id_type,
    )
    copy_v = pltpu.make_async_remote_copy(
        src_ref=v_any, dst_ref=v_next_any, send_sem=send_v, recv_sem=recv_v,
        device_id=coords(right), device_id_type=id_type,
    )

    @pl.when((h == 0) & (qi == 0) & (ki == 0))
    def _start_ring_send():
        copy_k.start()
        copy_v.start()

    @pl.when(ki == 0)
    def _load_carry():
        ms[...] = m_ref[0]
        ls[...] = l_ref[0]
        accs[...] = a_ref[0]

    step = step_ref[0, 0]
    src = jax.lax.rem(my_id - step + n_dev, n_dev)  # origin shard of this K/V
    visible = jnp.asarray(True)
    if causal in ("block", "token") and not zigzag_half:
        # shard-block causality: only shards at or before our own contribute
        visible = src <= my_id
    elif zigzag_half:
        # zigzag layout (zigzag_ring_flash_attn.py): device d holds global
        # chunks (d, 2n-1-d) of length Lc each; causality at chunk level
        Lc = zigzag_half
        q2 = (qi * block_q) >= Lc
        k2 = (ki * block_k) >= Lc
        q_chunk = jnp.where(q2, 2 * n_dev - 1 - my_id, my_id)
        k_chunk = jnp.where(k2, 2 * n_dev - 1 - src, src)
        visible = k_chunk <= q_chunk

    @pl.when(visible)
    def _accumulate():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                   # [bq, bk]
        if use_kv_lens:
            # varlen: mask K/V tokens at or beyond this row's valid length
            # (global position = origin shard offset + local offset)
            kglob = (src * lk_local + ki * block_k
                     + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1))
            s = s + jnp.where(kglob < len_ref[h, 0], 0.0, NEG_INF)
        if causal == "token" and not zigzag_half:
            # intra-shard triangle when attending our own shard's K/V
            qpos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            kpos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            intra = jnp.where(qpos >= kpos, 0.0, NEG_INF)
            s = s + jnp.where(src == my_id, intra, jnp.zeros_like(intra))
        elif causal == "stripe":
            # stripe layout (stripe_flash_attn.py): device d holds global
            # tokens {d + j·n}; q(my, jq) sees k(src, jk) iff
            # jq > jk, or jq == jk and src ≤ my  ⇔  jq ≥ jk + (src > my)
            q_off = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_off = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            shift = jnp.where(src > my_id, 1, 0)
            s = s + jnp.where(q_off >= k_off + shift, 0.0, NEG_INF)
        elif zigzag_half:
            # triangle whenever q and k sit in the SAME global chunk
            Lc = zigzag_half
            q2 = (qi * block_q) >= Lc
            k2 = (ki * block_k) >= Lc
            q_chunk = jnp.where(q2, 2 * n_dev - 1 - my_id, my_id)
            k_chunk = jnp.where(k2, 2 * n_dev - 1 - src, src)
            q_off = (qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                     - jnp.where(q2, Lc, 0))
            k_off = (ki * block_k
                     + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                     - jnp.where(k2, Lc, 0))
            intra = jnp.where(q_off >= k_off, 0.0, NEG_INF)
            s = s + jnp.where(q_chunk == k_chunk, intra, jnp.zeros_like(intra))
        # row stats live broadcast across the 128-lane minor dim (mosaic tiling)
        m_blk = jnp.max(s, axis=1, keepdims=True)   # [bq, 1]
        m_new = jnp.maximum(ms[...], m_blk)         # [bq, 128], lanes equal
        p = jnp.exp(s - m_new[:, :1])
        corr = jnp.exp(ms[...] - m_new)             # [bq, 128]
        ls[...] = ls[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        accs[...] = accs[...] * corr[:, :1] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ms[...] = m_new

    @pl.when(ki == kv_steps - 1)
    def _store_carry():
        mo_ref[0] = ms[...]
        lo_ref[0] = ls[...]
        ao_ref[0] = accs[...]

    last = (
        (h == pl.num_programs(0) - 1)
        & (qi == pl.num_programs(1) - 1)
        & (ki == kv_steps - 1)
    )

    @pl.when(last)
    def _finish_ring():
        copy_k.wait()
        copy_v.wait()


def _ring_step(step_idx, q, k, v, m, l, acc, kv_lens, *, scale, block_q,
               block_k, axis_name, interpret, causal, zigzag_half=0,
               mesh_axes=None):
    """One fused step: flash(q, k, v) accumulated into (m, l, acc) while
    k/v stream to the right neighbor. Returns (m, l, acc, k_next, v_next)."""
    H, Lq, D = q.shape
    Lk = k.shape[1]
    bq = min(block_q, Lq)
    bk = min(block_k, Lk)
    assert Lq % bq == 0 and Lk % bk == 0, (Lq, bq, Lk, bk)
    kv_steps = Lk // bk
    grid = (H, Lq // bq, kv_steps)

    ANY = pltpu.MemorySpace.ANY

    use_kv_lens = kv_lens is not None
    if not use_kv_lens:
        kv_lens = jnp.zeros((H, 1), jnp.int32)
    kernel = functools.partial(
        _step_kernel, scale=scale, kv_steps=kv_steps, axis_name=axis_name,
        use_barrier=not interpret, causal=causal, block_q=bq, block_k=bk,
        zigzag_half=zigzag_half, lk_local=Lk, use_kv_lens=use_kv_lens,
        mesh_axes=tuple(mesh_axes) if mesh_axes else (axis_name,),
    )
    out_shapes = [
        jax.ShapeDtypeStruct((H, Lq, 128), jnp.float32),  # m (lane-broadcast)
        jax.ShapeDtypeStruct((H, Lq, 128), jnp.float32),  # l
        jax.ShapeDtypeStruct((H, Lq, D), jnp.float32),   # acc
        jax.ShapeDtypeStruct(k.shape, k.dtype),          # k_next
        jax.ShapeDtypeStruct(v.shape, v.dtype),          # v_next
    ]
    qs = lambda h, i, j: (h, i, 0)
    ks = lambda h, i, j: (h, j, 0)
    cs = lambda h, i, j: (h, i, 0)
    m2, l2, a2, k_next, v_next = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec((1, bq, D), qs),
            pl.BlockSpec((1, bk, D), ks),
            pl.BlockSpec((1, bk, D), ks),
            pl.BlockSpec((1, bq, 128), cs),
            pl.BlockSpec((1, bq, 128), cs),
            pl.BlockSpec((1, bq, D), qs),
            pl.BlockSpec(memory_space=ANY),
            pl.BlockSpec(memory_space=ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, 128), cs),
            pl.BlockSpec((1, bq, 128), cs),
            pl.BlockSpec((1, bq, D), qs),
            pl.BlockSpec(memory_space=ANY),
            pl.BlockSpec(memory_space=ANY),
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
        compiler_params=(
            None if interpret else pltpu.CompilerParams(collective_id=7)
        ),
    )(jnp.asarray(step_idx, jnp.int32).reshape(1, 1), kv_lens,
      q, k, v, m, l, acc, k, v)
    return m2, l2, a2, k_next, v_next


def ring_flash_attention_shard(
    q: jnp.ndarray,  # [B, Lq_loc, N, D] — this shard's queries
    k: jnp.ndarray,  # [B, Lk_loc, N, D]
    v: jnp.ndarray,
    axis_name: str = "seq",
    softmax_scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
    causal: Optional[str] = None,
    zigzag: bool = False,
    kv_lens: Optional[jnp.ndarray] = None,  # [B] valid global KV lengths
    return_lse: bool = False,
    mesh_axes: Optional[tuple] = None,  # all mesh axis names (default: 1-D)
) -> jnp.ndarray:
    """Call INSIDE shard_map with q/k/v sequence-sharded over `axis_name`.

    n_dev fused steps; step s attends this shard's Q against the K/V shard
    originating s hops left, K/V riding the ICI ring one hop per step.

    causal: None (full), "block" (shards ≤ own contribute fully — matches
    parallel/ring.py ring_attention_local(causal=True)), "token" (true
    causal: triangular mask within the own shard, like the reference
    ring_flash_attn.py's causal path at shard granularity), or "stripe"
    (round-robin token layout, stripe_flash_attn.py — combine with the
    stripe_ring_attention wrapper).
    """
    B, Lq, N, D = q.shape
    scale = float(softmax_scale) if softmax_scale else float(1.0 / np.sqrt(D))
    n_dev = jax.lax.psum(1, axis_name)

    # fold batch into heads; kernel layout [H, L, D]
    to_hld = lambda x: x.transpose(0, 2, 1, 3).reshape(B * N, x.shape[1], D)
    qh, kh, vh = to_hld(q), to_hld(k), to_hld(v)
    H = B * N

    lens_h = None
    if kv_lens is not None:
        # one length per folded (batch, head) row
        lens_h = jnp.repeat(kv_lens.astype(jnp.int32), N).reshape(H, 1)

    m0 = jnp.full((H, Lq, 128), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H, Lq, 128), jnp.float32)
    a0 = jnp.zeros((H, Lq, D), jnp.float32)

    zigzag_half = 0
    if zigzag:
        assert causal == "token", "zigzag implies token-causal"
        assert Lq % 2 == 0, Lq
        zigzag_half = Lq // 2
        assert zigzag_half % min(block_q, zigzag_half) == 0
    step = functools.partial(
        _ring_step, scale=scale,
        block_q=min(block_q, zigzag_half) if zigzag else block_q,
        block_k=min(block_k, zigzag_half) if zigzag else block_k,
        axis_name=axis_name, interpret=interpret, causal=causal,
        zigzag_half=zigzag_half, mesh_axes=mesh_axes,
    )

    def body(i, carry):
        m, l, acc, kc, vc = carry
        m, l, acc, kn, vn = step(i, qh, kc, vc, m, l, acc, lens_h)
        return (m, l, acc, kn, vn)

    m, l, acc, _, _ = jax.lax.fori_loop(
        0, n_dev, body, (m0, l0, a0, kh, vh)
    )
    out = acc / jnp.maximum(l[..., :1], 1e-30)
    out = out.reshape(B, N, Lq, D).transpose(0, 2, 1, 3).astype(q.dtype)
    if return_lse:
        # global logsumexp per row: m + log l, [B, N, Lq]
        lse = (m[..., 0] + jnp.log(jnp.maximum(l[..., 0], 1e-30))).reshape(B, N, Lq)
        return out, lse
    return out


# ---------------------------------------------------------------------------
# trainable wrapper: fused-RDMA forward + ring backward (per-step Pallas
# flash backward kernels with GLOBAL row stats; dK/dV ride the ring home)
# ---------------------------------------------------------------------------


def ring_flash_attention_trainable(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "seq",
    softmax_scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
    mesh_axes: Optional[tuple] = None,
    causal: Optional[str] = None,
    kv_lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Differentiable fused ring flash attention (call inside shard_map).

    Forward = ring_flash_attention_shard (remote-DMA overlapped kernel);
    backward = n ring steps of `flash_bwd_core` driven by the global
    (lse, delta) row stats — dq accumulates locally, the visiting K/V shard's
    dk/dv travel WITH it around the ring and arrive home after the full cycle
    (role of reference ring_flash_attn.py backward + RingComm).

    causal: None, "block" (whole-shard visibility — invisible steps get zero
    gradient), or "token" (own-shard step uses a dense triangular backward
    with the global row stats; other steps stay on the Pallas kernels).

    kv_lens: optional [B] valid GLOBAL lengths (contiguous end-padding —
    reference sp-multiple seq rounding, x2x_gen_unified.py:332-334).
    Non-causal only; padded rows get zero output and zero gradient."""
    if kv_lens is None:
        return _ring_trainable_nolens(
            q, k, v, axis_name, softmax_scale, block_q, block_k, interpret,
            mesh_axes, causal)
    assert causal is None, "kv_lens supports the non-causal (DiT) path only"
    return _ring_trainable_lens(
        q, k, v, kv_lens.astype(jnp.int32), axis_name, softmax_scale,
        block_q, block_k, interpret, mesh_axes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _ring_trainable_nolens(q, k, v, axis_name, softmax_scale, block_q,
                           block_k, interpret, mesh_axes, causal):
    return ring_flash_attention_shard(
        q, k, v, axis_name=axis_name, softmax_scale=softmax_scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
        mesh_axes=mesh_axes, causal=causal,
    )


def _ring_trainable_fwd(q, k, v, axis_name, softmax_scale, block_q, block_k,
                        interpret, mesh_axes, causal):
    out, lse = ring_flash_attention_shard(
        q, k, v, axis_name=axis_name, softmax_scale=softmax_scale,
        block_q=block_q, block_k=block_k, interpret=interpret, return_lse=True,
        mesh_axes=mesh_axes, causal=causal,
    )
    return out, (q, k, v, out, lse)


def _dense_causal_bwd_step(qt, kt, vt, do, lse_b, delta_b, scale):
    """Dense triangular backward for the own-shard ring step, driven by the
    GLOBAL row stats (p = exp(s − lse) with s masked by the causal triangle).
    O(Lq·Lk) scores per head — used only for one of the n ring steps."""
    BN, Lq, D = qt.shape
    Lk = kt.shape[1]
    s = jnp.einsum("bid,bjd->bij", qt.astype(jnp.float32),
                   kt.astype(jnp.float32)) * scale
    tri = jnp.tril(jnp.ones((Lq, Lk), bool))[None]
    p = jnp.where(tri, jnp.exp(s - lse_b[:, :, :1]), 0.0)
    dov = jnp.einsum("bid,bjd->bij", do.astype(jnp.float32),
                     vt.astype(jnp.float32))
    ds = p * (dov - delta_b[:, :, :1])
    dq = jnp.einsum("bij,bjd->bid", ds, kt.astype(jnp.float32)) * scale
    dk = jnp.einsum("bij,bid->bjd", ds, qt.astype(jnp.float32)) * scale
    dv = jnp.einsum("bij,bid->bjd", p, do.astype(jnp.float32))
    return dq, dk, dv


def _ring_trainable_bwd(axis_name, softmax_scale, block_q, block_k, interpret,
                        mesh_axes, causal, res, g, lens=None):
    from .flash_attention import flash_bwd_core

    q, k, v, out, lse = res
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    BN = B * N
    scale = float(softmax_scale) if softmax_scale else float(1.0 / np.sqrt(D))
    n_dev = jax.lax.psum(1, axis_name)

    to_t = lambda x: x.transpose(0, 2, 1, 3).reshape(BN, x.shape[1], D)
    qt, do = to_t(q), to_t(g)
    ot = to_t(out)
    delta = jnp.sum(do.astype(jnp.float32) * ot.astype(jnp.float32), axis=-1)
    lse_b = jnp.broadcast_to(lse.reshape(BN, Lq)[:, :, None], (BN, Lq, 128))
    delta_b = jnp.broadcast_to(delta[:, :, None], (BN, Lq, 128))
    kv_lens_bn = jnp.full((BN,), Lk, jnp.int32)

    my_off = jax.lax.axis_index(axis_name) * Lq
    lens_bn = None
    if lens is not None:
        # padded rows: fwd lse is ≈ -inf garbage (all columns masked); force
        # it to +BIG so p = exp(s − lse) underflows to exactly 0 in the
        # kernels — zero dq for padded rows, zero dk/dv contribution from
        # them, no overflow risk (cheaper + safer than masking dO).
        lens_bn = jnp.repeat(lens.astype(jnp.int32), N)  # [BN], b-major like to_t
        row_valid = (my_off + jnp.arange(Lq))[None, :] < lens_bn[:, None]
        lse_b = jnp.where(row_valid[:, :, None], lse_b, 1e9)

    perm_fn = lambda n: [(i, (i + 1) % n) for i in range(n)]

    my_id = jax.lax.axis_index(axis_name)

    def body(i, carry):
        dq_acc, kt_c, vt_c, dk_c, dv_c = carry
        src = jax.lax.rem(my_id - i + jax.lax.psum(1, axis_name),
                          jax.lax.psum(1, axis_name))
        if causal == "token":
            # own-shard step: dense triangular bwd; earlier shards: full
            # Pallas bwd; later shards: zero contribution
            full = flash_bwd_core(
                qt, kt_c, vt_c, do, lse_b, delta_b, kv_lens_bn, scale=scale,
                block_q=block_q, block_k=block_k, interpret=interpret,
            )
            tri = _dense_causal_bwd_step(qt, kt_c, vt_c, do, lse_b, delta_b,
                                         scale)
            own = src == my_id
            vis = (src < my_id).astype(jnp.float32)
            dq_p, dk_p, dv_p = (
                jnp.where(own, t, f.astype(jnp.float32) * vis)
                for f, t in zip(full, tri)
            )
        else:
            if lens_bn is not None:
                # the visiting chunk originates at shard `src` → its global
                # offset is src·Lk; valid LOCAL columns = lens − offset,
                # clipped to [0, Lk] (0 ⇒ the kernels skip every kv block)
                step_lens = jnp.clip(lens_bn - src * Lk, 0, Lk)
            else:
                step_lens = kv_lens_bn
            dq_p, dk_p, dv_p = flash_bwd_core(
                qt, kt_c, vt_c, do, lse_b, delta_b, step_lens, scale=scale,
                block_q=block_q, block_k=block_k, interpret=interpret,
            )
            if causal == "block":
                vis = (src <= my_id).astype(jnp.float32)
                dq_p, dk_p, dv_p = (x.astype(jnp.float32) * vis
                                    for x in (dq_p, dk_p, dv_p))
        dq_acc = dq_acc + dq_p.astype(jnp.float32)
        dk_c = dk_c + dk_p.astype(jnp.float32)
        dv_c = dv_c + dv_p.astype(jnp.float32)
        perm = perm_fn(jax.lax.psum(1, axis_name))
        kt_c = jax.lax.ppermute(kt_c, axis_name, perm)
        vt_c = jax.lax.ppermute(vt_c, axis_name, perm)
        dk_c = jax.lax.ppermute(dk_c, axis_name, perm)
        dv_c = jax.lax.ppermute(dv_c, axis_name, perm)
        return (dq_acc, kt_c, vt_c, dk_c, dv_c)

    kt0, vt0 = to_t(k), to_t(v)
    dq0 = jnp.zeros((BN, Lq, D), jnp.float32)
    dkv0 = jnp.zeros((BN, Lk, D), jnp.float32)
    dq_t, _, _, dk_t, dv_t = jax.lax.fori_loop(
        0, n_dev, body, (dq0, kt0, vt0, dkv0, dkv0)
    )

    back = lambda x, L: x.reshape(B, N, L, D).transpose(0, 2, 1, 3)
    return (back(dq_t, Lq).astype(q.dtype), back(dk_t, Lk).astype(k.dtype),
            back(dv_t, Lk).astype(v.dtype))


_ring_trainable_nolens.defvjp(_ring_trainable_fwd, _ring_trainable_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _ring_trainable_lens(q, k, v, kv_lens, axis_name, softmax_scale, block_q,
                         block_k, interpret, mesh_axes):
    return ring_flash_attention_shard(
        q, k, v, axis_name=axis_name, softmax_scale=softmax_scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
        mesh_axes=mesh_axes, kv_lens=kv_lens,
    )


def _ring_lens_fwd(q, k, v, kv_lens, axis_name, softmax_scale, block_q,
                   block_k, interpret, mesh_axes):
    out, lse = ring_flash_attention_shard(
        q, k, v, axis_name=axis_name, softmax_scale=softmax_scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
        return_lse=True, mesh_axes=mesh_axes, kv_lens=kv_lens,
    )
    return out, (q, k, v, out, lse, kv_lens)


def _ring_lens_bwd(axis_name, softmax_scale, block_q, block_k, interpret,
                   mesh_axes, res, g):
    q, k, v, out, lse, kv_lens = res
    dq, dk, dv = _ring_trainable_bwd(
        axis_name, softmax_scale, block_q, block_k, interpret, mesh_axes,
        None, (q, k, v, out, lse), g, lens=kv_lens)
    # integer primal → float0 cotangent (jax custom_vjp convention)
    dlens = np.zeros(kv_lens.shape, jax.dtypes.float0)
    return dq, dk, dv, dlens


_ring_trainable_lens.defvjp(_ring_lens_fwd, _ring_lens_bwd)
