#!/usr/bin/env python
"""Sweep flash-attention dispatch modes/tiles at A14B shapes on the chip.

VERDICT r3 item 1: cross-attention measured ~75% MXU at A14B dims (the
single-kv-step path caps bq at 256 by the [bq, 6272] f32 logits tile) and
the self-attn tiles were tuned at 1.3B shapes. This sweeps:

  python tools/dev/bench_xattn_sweep.py --cross   # Lk=6272 single vs multi
  python tools/dev/bench_xattn_sweep.py --self    # Lq=Lk=32760 bq/bk retune
  python tools/dev/bench_xattn_sweep.py --self --l720   # 720p seq 75,600

Run on a QUIET chip; every candidate is VMEM-checked before launch (a
failed TPU op wedges the tunnel 10-40 min, CLAUDE.md).
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=5, warm=2):
    for _ in range(warm):
        float(jnp.sum(fn(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(fn(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def mk_normed(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.asarray(x * np.sqrt(shape[-1]), jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cross", action="store_true")
    ap.add_argument("--self", dest="self_", action="store_true")
    ap.add_argument("--l720", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention

    B, N, D = 2, 40, 128               # A14B heads
    Lq = 75600 if args.l720 else 32760
    Lk = 6272 if args.cross else Lq
    rng = np.random.default_rng(0)
    q = mk_normed(rng, (B, Lq, N, D))
    k = mk_normed(rng, (B, Lk, N, D))
    v = mk_normed(rng, (B, Lk, N, D))

    Lk_r = (Lk + 127) // 128 * 128
    flops = 4 * B * N * Lq * Lk_r * D
    peak = 197e12
    results = []

    def run(label, env, bq, bk):
        for kk, vv in env.items():
            os.environ[kk] = str(vv)
        try:
            fn = jax.jit(lambda q, k, v: flash_attention(
                q, k, v, block_q=bq, block_k=bk, assume_normalized=True))
            t = timed(fn, q, k, v, n=args.reps)
            mxu = flops / t / peak
            print(f"{label:42s} {t*1e3:8.2f} ms  {mxu:5.1%} MXU", flush=True)
            results.append((mxu, label))
        finally:
            for kk in env:
                os.environ.pop(kk, None)
        jax.clear_caches()

    if args.cross:
        # today's default path at each VMEM budget (bq = budget/(4*6272))
        for mb in (6, 8, 12):
            run(f"single-step vmem={mb}MB",
                {"FLASH_XATTN_MODE": "single", "FLASH_XATTN_VMEM_MB": mb},
                1024, 2048)
        # multi-step bounded: divisor bk, wide q tiles
        for bq in (512, 1024, 2048):
            for bk in (896, 6272):
                if bq * bk * 4 > 12 * 2**20:
                    continue
                run(f"multi-step bq={bq} bk={bk}",
                    {"FLASH_XATTN_MODE": "multi"}, bq, bk)
    if args.self_:
        for bq in (512, 1024, 2048):
            for bk in (1024, 2048, 4096):
                if bq * bk * 4 > 9 * 2**20:
                    continue
                run(f"self bq={bq} bk={bk}", {}, bq, bk)

    results.sort(reverse=True)
    print("\nbest:", results[0][1], f"{results[0][0]:.1%}")


if __name__ == "__main__":
    main()
