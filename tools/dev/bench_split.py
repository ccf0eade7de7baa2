#!/usr/bin/env python
"""Split the 1.3B DiT step time into components on the real chip.

Times, at bench shapes (B=2, L=32760, d=1536, N=12, D=128, ffn=8960, 30 layers):
  - full DiT step (the bench number)
  - pallas self-attention alone x30
  - cross-attention alone x30
  - "no-attention" DiT (attention replaced by v-passthrough) = GEMMs+norms+rope
  - RoPE application alone x30

--a14b switches to a BLOCK-level decomposition at dim 5120 (the full 40-layer
model exceeds one chip's HBM; one block + component loops at identical
shapes locate where the a14b_block_mxu gap lives — r3 measured 0.774 vs a
0.90 weighted component ceiling, an unexplained ~84 ms/block).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def block_split():
    """Component decomposition of ONE A14B block (4-rep scans, b2 480p)."""
    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.models.wan_dit import (
        WanAuxInputs, apply_rope, init_wan_block, rope_3d_tables,
        wan_block_apply)
    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention

    full = WAN_CONFIGS["t2v-A14B"]
    cfg = full.dit
    d, f, Lc = cfg.dim, cfg.ffn_dim, full.max_context_len
    B, N, D = 2, cfg.num_heads, cfg.head_dim
    grid = (21, 30, 52)
    L = grid[0] * grid[1] * grid[2]
    reps = 1
    print(f"A14B block: L={L} d={d} N={N} ffn={f} Lc={Lc} "
          "(single-application jits x6 dispatches — the x4-scan variant "
          "exceeded the remote-compile service deadline at dim 5120)")

    key = jax.random.PRNGKey(0)
    params = init_wan_block(key, cfg, dtype=jnp.bfloat16)
    cos, sin = rope_3d_tables(grid, D, cfg.rope_max_seq_len, cfg.rope_theta)
    ctx = jax.random.normal(key, (B, Lc, d), jnp.bfloat16)
    e0 = jax.random.normal(key, (B, 1, 6, d), jnp.float32) * 0.02
    x = jax.random.normal(key, (B, L, d), jnp.float32)
    aux = WanAuxInputs(e0=e0, context=ctx, rope_cos=cos, rope_sin=sin,
                       kv_lens=None, sp=None)

    def scan4(body):
        # single application per dispatch (see banner); dispatch latency
        # adds the same small constant to every row — fine for locating
        # RELATIVE gaps, slightly understates absolute MXU
        def fn(c0, *rest):
            return jnp.sum(body(c0, *rest).astype(jnp.float32))
        return jax.jit(fn)

    t_blk = timed(scan4(lambda c: wan_block_apply(
        params, c, aux, cfg, attn_impl="auto")), x, n=6) / reps
    print(f"full block          : {t_blk*1e3:8.1f} ms")

    q = jax.random.normal(key, (B, L, N, D), jnp.bfloat16)
    t_self = timed(scan4(lambda c: flash_attention(
        c, c, c, assume_normalized=True)), q, n=6) / reps
    print(f"self-attn           : {t_self*1e3:8.1f} ms "
          f"({4*B*N*L*L*D/t_self/197e12:5.1%} MXU)")

    kx = jax.random.normal(key, (B, Lc, N, D), jnp.bfloat16)
    Lc_r = (Lc + 127) // 128 * 128
    t_cross = timed(scan4(lambda c, kx: flash_attention(
        c, kx, kx, assume_normalized=True)), q, kx, n=6) / reps
    print(f"cross-attn          : {t_cross*1e3:8.1f} ms "
          f"({4*B*N*L*Lc_r*D/t_cross/197e12:5.1%} MXU)")

    w1 = jax.random.normal(key, (d, f), jnp.bfloat16)
    w2 = jax.random.normal(key, (f, d), jnp.bfloat16)
    wq = jax.random.normal(key, (d, d), jnp.bfloat16)
    xm = jax.random.normal(key, (B * L, d), jnp.bfloat16)

    def gemms(c):
        h = c
        for _ in range(6):
            h = jnp.dot(h, wq, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        g = jnp.dot(h, w1, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
        return jnp.dot(g, w2, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    t_gemm = timed(scan4(gemms), xm, n=6) / reps
    gemm_fl = 6 * 2 * B * L * d * d + 2 * 2 * B * L * d * f
    print(f"gemm chain          : {t_gemm*1e3:8.1f} ms "
          f"({gemm_fl/t_gemm/197e12:5.1%} MXU)")

    t_rope = timed(scan4(lambda c: apply_rope(
        apply_rope(c, cos, sin), cos, sin)), q, n=2) / reps
    print(f"rope(q&k)           : {t_rope*1e3:8.1f} ms")

    # no-attention block: v-passthrough isolates GEMMs+norms+AdaLN+residuals
    import importlib
    attn_mod = importlib.import_module("omnivideo_tpu.ops.attention")
    real = attn_mod.attention
    attn_mod.attention = lambda q, k, v, kv_lens=None, impl="auto", **kw: (
        v if v.shape == q.shape else jnp.zeros_like(q))
    try:
        import omnivideo_tpu.models.wan_dit as wd
        importlib.reload(wd)
        t_noattn = timed(scan4(lambda c: wd.wan_block_apply(
            params, c, aux, cfg, attn_impl="xla")), x, n=6) / reps
        print(f"no-attn block       : {t_noattn*1e3:8.1f} ms")
    finally:
        attn_mod.attention = real
        import omnivideo_tpu.models.wan_dit as wd
        importlib.reload(wd)

    acct = t_self + t_cross + t_noattn
    print(f"\naccounted={acct*1e3:.1f} ms vs full={t_blk*1e3:.1f} ms "
          f"(gap {1e3*(t_blk-acct):+.1f} ms)")


def timed(fn, *args, n=3, warm=1):
    for _ in range(warm):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.models.wan_dit import (
        apply_rope, init_wan_dit, rope_3d_tables, wan_dit_apply,
    )
    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention

    cfg = T2V_1_3B
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    B, N, D, d = 2, dit_cfg.num_heads, dit_cfg.head_dim, dit_cfg.dim
    frames, lh, lw = 21, 60, 104
    L = frames * (lh // 2) * (lw // 2)
    Lc = cfg.max_context_len
    nl = dit_cfg.num_layers
    print(f"L={L} d={d} N={N} D={D} ffn={dit_cfg.ffn_dim} layers={nl}")

    key = jax.random.PRNGKey(0)
    params = init_wan_dit(key, dit_cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(key, (B, 16, frames, lh, lw), jnp.bfloat16)
    t = jnp.full((B,), 500.0, jnp.float32)
    ctx = jax.random.normal(key, (B, Lc, dit_cfg.text_dim), jnp.bfloat16)

    # 1. full step
    full = jax.jit(lambda p, x, t, c: jnp.sum(
        wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="auto").astype(jnp.float32)))
    t_full = timed(full, params, x, t, ctx)
    print(f"full step           : {t_full:.3f}s")

    # 2. self-attention alone x nl
    q = jax.random.normal(key, (B, L, N, D), jnp.bfloat16)

    def self_attn_loop(q):
        def body(c, _):
            o = flash_attention(c, c, c, assume_normalized=True)
            return o, None
        out, _ = jax.lax.scan(body, q, None, length=nl)
        return jnp.sum(out.astype(jnp.float32))

    t_self = timed(jax.jit(self_attn_loop), q)
    print(f"self-attn x{nl}      : {t_self:.3f}s")

    # 3. cross-attention alone x nl
    kx = jax.random.normal(key, (B, Lc, N, D), jnp.bfloat16)

    def cross_loop(q, kx):
        def body(c, _):
            o = flash_attention(c, kx, kx, assume_normalized=True)
            return o, None
        out, _ = jax.lax.scan(body, q, None, length=nl)
        return jnp.sum(out.astype(jnp.float32))

    t_cross = timed(jax.jit(cross_loop), q, kx)
    print(f"cross-attn x{nl}     : {t_cross:.3f}s")

    # 3b. pure GEMM chain at model shapes (the qkv/o/ffn ideal)
    w1 = jax.random.normal(key, (d, dit_cfg.ffn_dim), jnp.bfloat16)
    w2 = jax.random.normal(key, (dit_cfg.ffn_dim, d), jnp.bfloat16)
    wq = jax.random.normal(key, (d, d), jnp.bfloat16)
    xm = jax.random.normal(key, (B * L, d), jnp.bfloat16)

    def gemm_loop(xm):
        def body(c, _):
            h = c
            for _ in range(6):  # qkvo + 2 cross ≈ 6 d×d
                h = jnp.dot(h, wq, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            f = jnp.dot(h, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            h = jnp.dot(f, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return h, None
        out, _ = jax.lax.scan(body, xm, None, length=nl)
        return jnp.sum(out.astype(jnp.float32))

    t_gemm = timed(jax.jit(gemm_loop), xm)
    gemm_fl = nl * (6 * 2 * B * L * d * d + 2 * 2 * B * L * d * dit_cfg.ffn_dim)
    print(f"gemm chain x{nl}     : {t_gemm:.3f}s  ({gemm_fl/t_gemm/1e12:.0f} TF/s)")

    # 4. no-attention model (passthrough v): GEMMs + norms + rope etc.
    import importlib
    attn_mod = importlib.import_module("omnivideo_tpu.ops.attention")
    real = attn_mod.attention
    attn_mod.attention = lambda q, k, v, kv_lens=None, impl="auto", **kw: (
        v if v.shape == q.shape else jnp.zeros_like(q))
    try:
        import omnivideo_tpu.models.wan_dit as wd
        importlib.reload(wd)
        noattn = jax.jit(lambda p, x, t, c: jnp.sum(
            wd.wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="xla").astype(jnp.float32)))
        t_noattn = timed(noattn, params, x, t, ctx)
        print(f"no-attn step        : {t_noattn:.3f}s")
    finally:
        attn_mod.attention = real
        import omnivideo_tpu.models.wan_dit as wd
        importlib.reload(wd)

    # 5. rope alone x nl (q and k)
    cos, sin = rope_3d_tables((frames, lh // 2, lw // 2), D,
                              dit_cfg.rope_max_seq_len, dit_cfg.rope_theta)

    def rope_loop(q):
        def body(c, _):
            return apply_rope(apply_rope(c, cos, sin), cos, sin), None
        out, _ = jax.lax.scan(body, q, None, length=nl)
        return jnp.sum(out.astype(jnp.float32))

    t_rope = timed(jax.jit(rope_loop), q)
    print(f"rope(q&k) x{nl}      : {t_rope:.3f}s")

    print(f"\nattn total={t_self + t_cross:.3f}s  "
          f"accounted={t_self + t_cross + t_noattn:.3f}s vs full={t_full:.3f}s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--a14b", action="store_true",
                    help="block-level decomposition at dim 5120")
    if ap.parse_args().a14b:
        block_split()
    else:
        main()
