"""Pallas TPU flash attention (online-softmax, KV-streamed).

Replaces the reference's vendored flash-attn CUDA kernels
(`omnivideo/modules/attention.py:10-14,115-130`) with a TPU-native kernel:

- grid (batch·heads, q_blocks, kv_blocks), kv innermost; running max / sum /
  f32 output accumulator live in VMEM scratch across kv grid steps (the
  canonical Mosaic flash-attention pattern);
- variable KV lengths are handled by masking (−inf logits past `kv_lens[b]`)
  instead of varlen cu_seqlens packing — fixed shapes, no recompiles; fully
  out-of-range KV blocks are skipped with `pl.when`;
- logits/accumulation in f32 on the MXU (`preferred_element_type`), inputs
  bf16; output cast back to the query dtype.

Backward: differentiable via `jax.custom_vjp` with dedicated Pallas dq and
dk/dv kernels (below) that recompute logits from the saved LSE residuals —
O(L) memory, matching the flash-attention-2 gradient schedule. The LSE output
is only materialized on the VJP path (`with_lse`); plain inference calls skip
it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omnivideo_tpu.ops import tuning

# tuned on v5e at seq≈32k, D=128 (tools/dev/bench_flash.py): 1024/2048 hits
# 78% MXU with boundary-only masking; s-tile [1024,2048] f32 = 8 MB VMEM
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 2048
NEG_INF = -1e30
LOG2E = 1.4426950408889634  # forward logits live in the log2 domain (exp2)


def _fa_kernel(
    kv_len_ref,  # scalar-prefetch SMEM [B*N] int32 — valid kv length per row
    *rest,  # (mbound_ref if static_max), q, k, v, o, (lse if with_lse), scratches
    scale: float,
    block_k: int,
    kv_steps: int,
    with_lse: bool,
    zero_oob_v: bool = False,
    grid4: bool = False,  # packed path: grid (B, N, q, kv); kv_lens is [B]
    static_max: bool = False,  # bounded softmax: no running max / rescale
    n_heads: int = 1,  # for indexing the flat [B*N] bound array on grid4
    causal: bool = False,  # token-causal (LM prefill): col <= row
    block_q: int = 0,  # q rows per block (causal diagonal arithmetic)
):
    if static_max:
        mbound_ref, q_ref, k_ref, v_ref, o_ref, *refs = rest
    else:
        mbound_ref = None
        q_ref, k_ref, v_ref, o_ref, *refs = rest
    if with_lse:
        lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        m_scr, l_scr, acc_scr = refs
    kv_i = pl.program_id(3 if grid4 else 2)
    kv_len = kv_len_ref[pl.program_id(0)]
    mb_val = None
    if static_max:
        # read at top level: pl.program_id inside a pl.when body is not
        # intercepted by the interpret-mode machinery
        idx = (pl.program_id(0) * n_heads + pl.program_id(1)
               if grid4 else pl.program_id(0))
        mb_val = mbound_ref[idx].astype(jnp.float32)

    @pl.when(kv_i == 0)
    def _init():
        if not static_max:
            m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    block_start = kv_i * block_k
    q_start = pl.program_id(2 if grid4 else 1) * block_q if causal else None

    def _compute(masked: bool):
        k = k_ref[0]  # [BK, D]
        v = v_ref[0]
        if masked and zero_oob_v:
            # unpadded path: rows of the boundary K/V block past kv_len are
            # out-of-range garbage (no jnp.pad zeros behind them). K garbage
            # dies in the col mask below; V garbage must be zeroed so
            # 0·garbage can't poison p@v.
            row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + block_start
            v = jnp.where(row < kv_len, v, jnp.zeros_like(v))
        # fold the softmax scale AND log2(e) into q once per [BQ, D] tile —
        # logits then live in the log2 domain so the softmax runs on exp2,
        # which lowers ~3% faster than exp on the VPU (measured: self-attn
        # 78.2% → 80.8% MXU at seq 32,760); cheaper than scaling the
        # [BQ, BK] logits every kv step
        q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(k.dtype)
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]

        if masked:  # mask kv positions past the valid length
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + block_start
            s = jnp.where(col < kv_len, s, NEG_INF)
            if causal:  # token causality: this block straddles the diagonal
                row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                       + q_start)
                s = jnp.where(col <= row, s, NEG_INF)

        if static_max:
            # bounded softmax (measured +MXU on v5e): the caller supplies a
            # PROVEN upper bound on the log2-domain logits (Cauchy-Schwarz
            # over q/k row norms — cheap HBM passes outside the kernel), so
            # the running max, its [BQ, BK] reduction, and the alpha rescale
            # of the accumulator all disappear. Subtracting a constant from
            # log2-domain logits only shifts f32 exponents (exact): the
            # final acc/l ratio is bit-identical to the max-tracked form as
            # long as the slack stays far inside f32's exponent range, which
            # |slack| ≤ |s|max + bound ≈ tens of log2 units guarantees.
            p = jnp.exp2(s - mb_val)  # [BQ, BK]
            l_scr[...] += jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_scr.shape)
            acc_scr[...] += jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            return

        m_prev = m_scr[:, :1]  # [BQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)  # [BQ, 1]
        p = jnp.exp2(s - m_new)  # [BQ, BK]  (log2-domain logits)

        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    # interior blocks skip the iota/where masking work entirely; only the
    # boundary block (straddling kv_len and, when causal, the diagonal)
    # pays for it. Causal additionally SKIPS blocks entirely above the
    # diagonal — at bq == bk that halves the executed kv steps.
    full_c = block_start + block_k <= kv_len
    live_c = block_start < kv_len
    if causal:
        full_c = jnp.logical_and(full_c, block_start + block_k <= q_start + 1)
        live_c = jnp.logical_and(live_c, block_start < q_start + block_q)

    @pl.when(full_c)
    def _full():
        _compute(masked=False)

    @pl.when(jnp.logical_and(live_c, jnp.logical_not(full_c)))
    def _boundary():
        _compute(masked=True)

    @pl.when(kv_i == kv_steps - 1)
    def _emit():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)  # fully-masked rows → 0
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)
        if with_lse:
            # m is in log2 units (see the q scaling above); l is domain-free
            # (sum of the same probabilities), so the natural-log LSE the
            # backward kernels expect is m·ln2 + ln(l)
            lse_ref[0] = (m_scr[:, :] * (1.0 / LOG2E)
                          + jnp.log(jnp.maximum(l_scr[:, :], 1e-30)))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block_k(Lk: int, block_k: int) -> int:
    """Pick bk (multiple of 128, ≤ block_k) minimizing modeled kernel cost.

    Each kv step costs ~bk rows of MXU work plus a fixed per-step overhead
    (l/m carry updates, pipeline bubble) worth ~128 rows, so the scan
    minimizes kv_steps·(bk+128). A zero-waste divisor wins when the shape
    offers one at useful size (Lk=6272 → bk=896, no padded columns at all);
    a fat boundary-masked tile wins when it doesn't (Lk_r=75,648 = 128·3·197
    has no divisor between 384 and 2048 — divisor-only choice collapsed
    720p self-attention to 197 skinny 384-row steps, 0.72 → 0.58 MXU on
    chip; one partially-masked 2048 block is far cheaper). Ascending scan +
    strict < keeps the smaller zero-waste tile on modeled ties."""
    target = _round_up(Lk, 128)
    m = min(block_k, target)
    m -= m % 128
    best, best_cost = 128, None
    bk = 128
    while bk <= m:
        steps = -(-target // bk)
        cost = steps * (bk + 128)
        if best_cost is None or cost < best_cost:
            best, best_cost = bk, cost
        bk += 128
    return best


def _flash_fwd_unpadded(q, k, v, kv_lens, scale, block_q, block_k, interpret,
                        static_max=False, qk_row_norms=None, causal=False):
    """Inference forward with NO layout work at all.

    The [B, L, N, D] inputs are viewed as packed [B, L, N·D] (a free,
    contiguity-preserving reshape — exactly the layout the q/k/v projection
    GEMMs produce) and the kernel tiles the head axis as 128-wide blocks of
    the minor dim: q blocks (1, bq, D) at block-index (b, qi, n) over a
    (B, N, q_steps, kv_steps) grid. No transpose, no jnp.pad: the direct
    per-head tiling of [B, L, N, D] is impossible (Mosaic requires the
    second-minor block dim to divide by 8 or equal the array dim) but the
    packed view sidesteps it — the head axis becomes part of the minor dim.
    Kills all pad/transpose copy fusions around every attention call
    (~0.18 s of the 4.4 s 1.3B DiT step).

    Partial boundary blocks replace padding: out-of-range K columns die in
    the kv_len mask, out-of-range V rows are zeroed in-kernel, out-of-range
    Q rows write nothing.

    Single-kv-step mode: when the whole 128-rounded KV length fits one block
    (cross-attention: 6,272-token context), bk spans it and the online-
    softmax carry collapses to one pass — no per-step alpha rescale or m/l
    broadcast updates, and K/V stay VMEM-resident across the q-block loop.

    Heads narrower than a 128-lane tile (D % 128 != 0) can't be a legal
    minor-dim block of the packed view, so they take the head-major
    [B·N, L, D] transpose path instead (one transpose each way; the hot DiT
    path is D=128 and never does).
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    Lk_r = _round_up(Lk, 128)
    packed = D % 128 == 0

    mb = None
    safe = None
    if static_max:
        # per-(batch, head) Cauchy-Schwarz bound on the log2-domain logits:
        # s·c = q·k·c ≤ max_row|q|·max_row|k|·c. Two cheap HBM passes here
        # buy the removal of the running-max reduction + alpha rescale from
        # every kv step of the kernel (see _fa_kernel static_max).
        # qk_row_norms: the fused qk-prep kernel (ops/pallas/qk_prep.py)
        # already reduced the row norms in its single pass — skip both reads.
        if qk_row_norms is not None:
            qn, kn = qk_row_norms  # [B, N] f32 upper bounds
        else:
            qn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(q.astype(jnp.float32)),
                                          axis=-1), axis=1))  # [B, N]
            kn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(k.astype(jnp.float32)),
                                          axis=-1), axis=1))
        bound_f = qn * kn * jnp.float32(scale * LOG2E)
        # ceil to int32 (scalar-prefetch arrays are int32): still a valid
        # upper bound, slack grows by < 1 log2 unit
        mb = jnp.ceil(bound_f).astype(jnp.int32)
        # underflow guard: every logit satisfies |s| ≤ bound, so the slack
        # (mb − s) never exceeds 2·bound (+2 for the int ceil and f32 mul
        # error). exp2 flushes to zero below −126; if all of a row's terms
        # flush, the denom==0→1 epilogue would silently emit a ZERO row
        # instead of a softmax. Today's qk-normed gains give bound ≈ 15-25,
        # but a finetune could grow them — so the bounded kernel only runs
        # when the worst-case slack stays well inside f32's exponent range,
        # falling back to the max-tracked kernel otherwise (lax.cond: one
        # scalar compare at run time, both kernels compiled once per shape).
        safe = (2.0 * jnp.max(bound_f) + 2.0) < 120.0

    xattn_single = Lk_r > block_k and Lk_r <= 8192 and not causal
    if xattn_single and static_max:
        # bounded softmax has NO per-step rescale, so multi-step KV costs
        # only l_scr updates — and a divisor bk frees VMEM for much wider q
        # tiles (6272-ctx cross-attn: single-step caps bq at 256 by the
        # [bq, 6272] f32 logits tile; multi-step runs bq=1024 at bk=896;
        # r3's multi-vs-single A/B predates divisor bk and wasted 23% of
        # the MXU work on kv padding). The default is the measured winner
        # from the persisted tuning table (ops/tuning.py, rewritten by the
        # on-chip A/Bs); FLASH_XATTN_MODE env is the sweep override.
        xattn_single = tuning.xattn_mode(N, Lk_r) == "single"
    if xattn_single:
        # single step: size bq so the f32 logits tile stays within the VMEM
        # budget (default ~8 MB of the 16 MB core VMEM; FLASH_XATTN_VMEM_MB
        # env / the tuning table override for on-chip sweeps)
        budget = int(tuning.xattn_vmem_mb() * 2**20)
        bk = Lk_r
        bq = min(block_q, max(128, budget // (4 * bk) // 128 * 128))
    else:
        bk = _pick_block_k(Lk, block_k)  # divisor: ≤1 boundary block
        bq = min(block_q, _round_up(Lq, 128))
    kv_steps = -(-Lk_r // bk)
    q_steps = -(-Lq // bq)

    if packed:
        grid = (B, N, q_steps, kv_steps)
        q3 = q.reshape(B, Lq, N * D)  # free: N, D adjacent and contiguous
        k3 = k.reshape(B, Lk, N * D)
        v3 = v.reshape(B, Lk, N * D)
        lens = kv_lens
        q_spec = pl.BlockSpec((1, bq, D), lambda b, n, qi, ki, *_: (b, qi, n),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, bk, D), lambda b, n, qi, ki, *_: (b, ki, n),
                               memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, Lq, N * D), q.dtype)
    else:
        grid = (B * N, q_steps, kv_steps)
        q3 = q.transpose(0, 2, 1, 3).reshape(B * N, Lq, D)
        k3 = k.transpose(0, 2, 1, 3).reshape(B * N, Lk, D)
        v3 = v.transpose(0, 2, 1, 3).reshape(B * N, Lk, D)
        lens = jnp.repeat(kv_lens, N)  # [B*N]
        q_spec = pl.BlockSpec((1, bq, D), lambda b, qi, ki, *_: (b, qi, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, bk, D), lambda b, qi, ki, *_: (b, ki, 0),
                               memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B * N, Lq, D), q.dtype)

    def _invoke(static, ops):
        kernel = functools.partial(
            _fa_kernel, scale=float(scale), block_k=bk, kv_steps=kv_steps,
            with_lse=False, zero_oob_v=True, grid4=packed, static_max=static,
            n_heads=N, causal=causal, block_q=bq,
        )
        # ops = (lens, mb?, q3, k3, v3); the max-tracked branch drops mb
        in_ops = ops if static or len(ops) == 4 else (ops[0],) + ops[2:]
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=len(in_ops) - 3,
                grid=grid,
                in_specs=[q_spec, kv_spec, kv_spec],
                out_specs=q_spec,
                scratch_shapes=[
                    pltpu.VMEM((bq, 128), jnp.float32),
                    pltpu.VMEM((bq, 128), jnp.float32),
                    pltpu.VMEM((bq, D), jnp.float32),
                ],
            ),
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=4 * B * N * Lq * Lk_r * D,
                bytes_accessed=B * N * (2 * Lq + 2 * Lk) * D * 2,
                transcendentals=B * N * Lq * Lk_r,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(("parallel",) * (len(grid) - 1)
                                     + ("arbitrary",)),
            ),
            interpret=interpret,
        )(*in_ops)

    if static_max:
        out = jax.lax.cond(
            safe,
            functools.partial(_invoke, True),
            functools.partial(_invoke, False),
            (lens, mb.reshape(B * N), q3, k3, v3),
        )
    else:
        out = _invoke(False, (lens, q3, k3, v3))
    if packed:
        return out.reshape(B, Lq, N, D)
    return out.reshape(B, N, Lq, D).transpose(0, 2, 1, 3)


def _flash_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray],
    softmax_scale: Optional[float],
    block_q: int,
    block_k: int,
    interpret: bool = False,
    return_residuals: bool = False,
    with_lse: bool = False,
    assume_normalized: bool = False,
    qk_row_norms=None,
    causal: bool = False,
):
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    with_lse = with_lse or return_residuals

    if kv_lens is None:
        kv_lens = jnp.full((B,), Lk, dtype=jnp.int32)
    kv_lens = kv_lens.astype(jnp.int32)

    if not with_lse:
        # inference: unpadded path (partial boundary blocks, single-step
        # small-KV mode); the padded form below stays for the VJP residuals.
        # assume_normalized (qk-normed q/k, e.g. the Wan DiT) additionally
        # enables the bounded-softmax kernel: no running max / alpha rescale.
        return _flash_fwd_unpadded(q, k, v, kv_lens, scale, block_q, block_k,
                                   interpret, static_max=assume_normalized,
                                   qk_row_norms=qk_row_norms, causal=causal)
    assert not causal, "causal is inference-only (no VJP path)"

    bq = min(block_q, _round_up(Lq, 128))
    bk = _pick_block_k(Lk, block_k)
    Lq_p = _round_up(Lq, bq)
    Lk_p = _round_up(Lk, bk)

    # [B, L, N, D] -> [B*N, L, D]
    qt = jnp.pad(q, ((0, 0), (0, Lq_p - Lq), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    kt = jnp.pad(k, ((0, 0), (0, Lk_p - Lk), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, ((0, 0), (0, Lk_p - Lk), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    qt = qt.reshape(B * N, Lq_p, D)
    kt = kt.reshape(B * N, Lk_p, D)
    vt = vt.reshape(B * N, Lk_p, D)
    kv_lens_bn = jnp.repeat(kv_lens, N)  # [B*N]

    kv_steps = Lk_p // bk
    grid = (B * N, Lq_p // bq, kv_steps)

    kernel = functools.partial(
        _fa_kernel, scale=float(scale), block_k=bk, kv_steps=kv_steps,
        with_lse=with_lse,
    )

    o_spec = pl.BlockSpec(
        (1, bq, D), lambda b, qi, ki, *_: (b, qi, 0), memory_space=pltpu.VMEM
    )
    lse_spec = pl.BlockSpec(
        (1, bq, 128), lambda b, qi, ki, *_: (b, qi, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, bq, D), lambda b, qi, ki, *_: (b, qi, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, bk, D), lambda b, qi, ki, *_: (b, ki, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, bk, D), lambda b, qi, ki, *_: (b, ki, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(o_spec, lse_spec) if with_lse else o_spec,
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=(
            (
                jax.ShapeDtypeStruct((B * N, Lq_p, D), q.dtype),
                jax.ShapeDtypeStruct((B * N, Lq_p, 128), jnp.float32),
            )
            if with_lse
            else jax.ShapeDtypeStruct((B * N, Lq_p, D), q.dtype)
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * Lq_p * Lk_p * D,
            bytes_accessed=(B * N * (Lq_p + 2 * Lk_p + Lq_p) * D * 2),
            transcendentals=B * N * Lq_p * Lk_p,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens_bn, qt, kt, vt)
    if with_lse:
        out, lse = out
    out = out.reshape(B, N, Lq_p, D).transpose(0, 2, 1, 3)[:, :Lq]
    if return_residuals:
        lse_r = lse[:, :, 0].reshape(B, N, Lq_p)[:, :, :Lq]  # [B, N, Lq]
        return out, (lse_r, qt, kt, vt, kv_lens_bn, Lq_p, Lk_p, bq, bk)
    return out


# ---------------------------------------------------------------------------
# backward kernels (flash attention gradient: O(L) memory via LSE residuals)
# ---------------------------------------------------------------------------


def _fa_bwd_dq_kernel(
    kv_len_ref,  # scalar prefetch [B*N]
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scr,
    *, scale: float, block_k: int, kv_steps: int,
):
    kv_i = pl.program_id(2)
    kv_len = kv_len_ref[pl.program_id(0)]

    @pl.when(kv_i == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    block_start = kv_i * block_k

    @pl.when(block_start < kv_len)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, :1]      # [BQ, 1]
        delta = delta_ref[0][:, :1]  # [BQ, 1]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + block_start
        s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)  # [BQ, BK]
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dq_scr[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(kv_i == kv_steps - 1)
    def _emit():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _fa_bwd_dkv_kernel(
    kv_len_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale: float, q_steps: int,
):
    q_i = pl.program_id(2)
    kv_len = kv_len_ref[pl.program_id(0)]
    block_start = pl.program_id(1) * k_ref.shape[1]

    @pl.when(q_i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when(block_start < kv_len)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, :1]
        delta = delta_ref[0][:, :1]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + block_start
        s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)  # [BQ, BK]
        # dv += pᵀ @ do
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(q_i == q_steps - 1)
    def _emit():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def flash_attention_infer(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    assume_normalized: bool = False,
    qk_row_norms=None,
    causal: bool = False,
) -> jnp.ndarray:
    """Inference-only flash attention (NOT differentiable — no custom_vjp):
    identical numerics to `flash_attention`, plus `qk_row_norms=(qn, kn)`
    [B, N] f32 upper bounds from the fused qk-prep kernel so the bounded-
    softmax dispatch skips its two full q/k HBM reads, and `causal=True`
    token causality (LM prefill: col <= row; blocks above the diagonal are
    skipped, the straddling block is masked — no [L, L] logits ever
    materialize, unlike the dense-softmax form)."""
    return _flash_fwd_impl(q, k, v, kv_lens, softmax_scale, block_q, block_k,
                           interpret, assume_normalized=assume_normalized,
                           qk_row_norms=qk_row_norms, causal=causal)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    assume_normalized: bool = False,
) -> jnp.ndarray:
    """Flash attention. q: [B, Lq, N, D]; k/v: [B, Lk, N, D]; kv_lens: [B].

    assume_normalized: caller guarantees q/k rows have O(sqrt(D)) norms
    (qk-norm models); enables the faster bounded-softmax inference kernel.
    """
    return _flash_fwd_impl(q, k, v, kv_lens, softmax_scale, block_q, block_k,
                           interpret, assume_normalized=assume_normalized)


def _fa_fwd(q, k, v, kv_lens, softmax_scale, block_q, block_k, interpret,
            assume_normalized):
    out, res = _flash_fwd_impl(
        q, k, v, kv_lens, softmax_scale, block_q, block_k, interpret,
        return_residuals=True,
    )
    lse, qt, kt, vt, kv_lens_bn, Lq_p, Lk_p, bq, bk = res
    # zero-size token carrying the ORIGINAL Lk (needed to slice dk/dv)
    lk_token = jnp.zeros((k.shape[1], 0), jnp.float32)
    return out, (out, lse, qt, kt, vt, kv_lens_bn, lk_token)


def flash_bwd_core(qt, kt, vt, do, lse_b, delta_b, kv_lens_bn, *, scale,
                   block_q, block_k, interpret):
    """Backward kernels on [BN, L, D]-layout operands with GLOBAL row stats.

    lse_b/delta_b: [BN, Lq, 128] lane-broadcast logsumexp and rowsum(dO·O).
    Factored out so ring attention's VJP can run it once per ring step with
    the visiting K/V shard (ops/pallas/ring_attention.py)."""
    BN, Lq_p, D = qt.shape
    Lk_p = kt.shape[1]
    # Blocks must DIVIDE the padded lengths: the fwd picks divisor blocks
    # (_pick_block_k can land on 128 for awkward Lk, e.g. 4680→4736=37·128),
    # so min(block, L_p) here could floor-drop whole blocks from the grid —
    # silently wrong dq/dk/dv. Also cap bq·bk: the kernels keep s, p, dp, ds
    # [bq, bk] live on the scoped-VMEM stack (~10 B/elem); 1024×2048 needs
    # ~19 MB against the 16 MB limit (compile-time OOM, found by
    # tools/dev/bench_train_step.py on chip).
    import os

    # 2^20 elems ≈ 10 MB of s/p/dp/ds stack — fits beside the operand tiles;
    # chip A/B at seq 14,040: 3.269 s/step (2^19) → 3.221 (2^20)
    cap = int(os.environ.get("FLASH_BWD_TILE_ELEMS", str(2**20)))
    bq = _pick_block_k(Lq_p, min(block_q, Lq_p))
    bk = _pick_block_k(Lk_p, min(block_k, Lk_p))
    while bq * bk > cap and bq > 128:
        bq = _pick_block_k(Lq_p, bq // 2)
    while bq * bk > cap and bk > 128:
        bk = _pick_block_k(Lk_p, bk // 2)
    kv_steps = Lk_p // bk
    q_steps = Lq_p // bq

    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, scale=scale, block_k=bk,
                          kv_steps=kv_steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BN, q_steps, kv_steps),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, qi, ki, *_: (b, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, qi, ki, *_: (b, ki, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, qi, ki, *_: (b, ki, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, D), lambda b, qi, ki, *_: (b, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 128), lambda b, qi, ki, *_: (b, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 128), lambda b, qi, ki, *_: (b, qi, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, qi, ki, *_: (b, qi, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((BN, Lq_p, D), qt.dtype),
        interpret=interpret,
    )(kv_lens_bn, qt, kt, vt, do, lse_b, delta_b)

    dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, scale=scale, q_steps=q_steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BN, kv_steps, q_steps),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, ki, qi, *_: (b, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, ki, qi, *_: (b, ki, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, ki, qi, *_: (b, ki, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, D), lambda b, ki, qi, *_: (b, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 128), lambda b, ki, qi, *_: (b, qi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 128), lambda b, ki, qi, *_: (b, qi, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, bk, D), lambda b, ki, qi, *_: (b, ki, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, ki, qi, *_: (b, ki, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((bk, D), jnp.float32),
                pltpu.VMEM((bk, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BN, Lk_p, D), kt.dtype),
            jax.ShapeDtypeStruct((BN, Lk_p, D), vt.dtype),
        ),
        interpret=interpret,
    )(kv_lens_bn, qt, kt, vt, do, lse_b, delta_b)
    return dq, dk, dv


def _fa_bwd(softmax_scale, block_q, block_k, interpret, assume_normalized,
            res, g):
    out, lse, qt, kt, vt, kv_lens_bn, lk_token = res
    BN, Lq_p, D = qt.shape
    Lk_p = kt.shape[1]
    Lk = lk_token.shape[0]
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    B, Lq, N, _ = g.shape

    do = jnp.pad(g, ((0, 0), (0, Lq_p - Lq), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    do = do.reshape(BN, Lq_p, D)
    o_p = jnp.pad(out, ((0, 0), (0, Lq_p - Lq), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    o_p = o_p.reshape(BN, Lq_p, D)
    delta = jnp.sum(do.astype(jnp.float32) * o_p.astype(jnp.float32), axis=-1)
    lse_p = jnp.pad(lse.reshape(BN, -1), ((0, 0), (0, Lq_p - Lq)))
    # broadcast row stats to 128 lanes for clean VMEM tiling
    lse_b = jnp.broadcast_to(lse_p[:, :, None], (BN, Lq_p, 128))
    delta_b = jnp.broadcast_to(delta[:, :, None], (BN, Lq_p, 128))

    dq, dk, dv = flash_bwd_core(
        qt, kt, vt, do, lse_b, delta_b, kv_lens_bn, scale=float(scale),
        block_q=block_q, block_k=block_k, interpret=interpret,
    )
    dq = dq.reshape(B, N, Lq_p, D).transpose(0, 2, 1, 3)[:, :Lq]
    dk = dk.reshape(B, N, Lk_p, D).transpose(0, 2, 1, 3)[:, :Lk]
    dv = dv.reshape(B, N, Lk_p, D).transpose(0, 2, 1, 3)[:, :Lk]
    return dq, dk, dv, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)
