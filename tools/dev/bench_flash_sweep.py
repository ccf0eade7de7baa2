#!/usr/bin/env python
"""Sweep flash-attention block shapes on the real chip at DiT bench shapes.

  python tools/dev/bench_flash_sweep.py            # self-attn seq 32760
  python tools/dev/bench_flash_sweep.py --cross    # cross-attn Lk 512
"""
import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cross", action="store_true")
    args = ap.parse_args()

    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention

    B, N, D = 2, 12, 128
    Lq = 32760
    Lk = 512 if args.cross else 32760
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Lq, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Lk, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Lk, N, D)), jnp.bfloat16)

    flops = 4 * B * N * Lq * ((Lk + 127) // 128 * 128) * D
    peak = 197e12
    results = []
    for bq in (512, 1024, 2048):
        for bk in (1024, 2048, 4096):
            if 4 * bq * bk > 8 * 2**20:
                # logits tile would blow VMEM — and a failed TPU op wedges
                # the tunnel for 10-40 min (CLAUDE.md), so never try
                print(f"bq={bq:5d} bk={bk:5d}: skipped (VMEM)", flush=True)
                continue
            try:
                f = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                    q, k, v, None, block_q=bq, block_k=bk))
                t = timed(f, q, k, v)
                mxu = flops / t / peak
                results.append((t, bq, bk))
                print(f"bq={bq:5d} bk={bk:5d}: {t*1e3:8.2f} ms  {mxu*100:5.1f}% MXU",
                      flush=True)
            except Exception as e:
                print(f"bq={bq:5d} bk={bk:5d}: FAILED {type(e).__name__}", flush=True)
    results.sort()
    t, bq, bk = results[0]
    print(f"best: bq={bq} bk={bk} {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
