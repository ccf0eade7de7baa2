"""Measure a real 1.3B DiT training step (fwd+bwd+AdamW update) on the chip.

Training so far ran only on CPU (tests) and as virtual-mesh compiles; this
gives the measured single-chip number via the production path
(`training/trainer.py::make_train_step` + `make_optimizer`, remat on,
donated train state).

HBM ladder: starts at --frames, escalates through the ladder only while the
previous rung's peak leaves proportional headroom — an OOM'd chip op wedges
the axon tunnel for 10-60 min, so we never fire a step we can't bound.

Run on the chip:  python tools/dev/bench_train_step.py [--n 3]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

HBM_BUDGET = 15.0e9  # leave ~1 GB of the 16 GB to XLA workspace


def latent_frames(frames: int) -> int:
    return (frames - 1) // 4 + 1


def run_shape(frames: int, n: int):
    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.models.wan_dit import init_wan_dit
    from omnivideo_tpu.training.trainer import (
        TrainConfig, init_train_state, make_optimizer, make_train_step)

    cfg = T2V_1_3B
    tc = TrainConfig(cfg_dropout=0.0)
    F = latent_frames(frames)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg.dit, dtype=jnp.bfloat16)
    tx = make_optimizer(tc, params)
    state = init_train_state(params, tx)
    batch = {
        "latents": jax.random.normal(
            jax.random.PRNGKey(1), (1, 16, F, 60, 104), jnp.float32),
        "context": jax.random.normal(
            jax.random.PRNGKey(2), (1, cfg.max_context_len, cfg.dit.text_dim),
            jnp.bfloat16),
    }
    step = jax.jit(make_train_step(cfg, tc, tx), donate_argnums=(0,))
    rng = jax.random.PRNGKey(3)

    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    loss = float(m["loss"])  # forces execution (block_until_ready no-op)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch, rng)
        loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / n

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)
    seq = F * 30 * 52
    print(f"frames={frames} seq={seq}: {dt:.3f} s/step  loss {loss:.4f}  "
          f"grad_norm {float(m['grad_norm']):.3f}  compile {compile_s:.1f}s  "
          f"peak HBM {peak/1e9:.2f} GB", flush=True)
    return dt, peak, seq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--ladder", type=int, nargs="*", default=[9, 33, 49, 81])
    args = ap.parse_args()

    prev = None  # (peak, seq)
    for frames in args.ladder:
        seq = latent_frames(frames) * 30 * 52
        if prev is not None:
            peak, pseq = prev
            # linear-in-seq extrapolation of the activation share
            base = 2.6e9 + 2 * 2.6e9  # params + adamw m/v (bf16)
            pred = base + (peak - base) * seq / pseq
            if pred > HBM_BUDGET:
                print(f"frames={frames} seq={seq}: SKIPPED "
                      f"(predicted peak {pred/1e9:.1f} GB > budget)", flush=True)
                break
        dt, peak, seq = run_shape(frames, args.n)
        prev = (peak, seq)


if __name__ == "__main__":
    main()
