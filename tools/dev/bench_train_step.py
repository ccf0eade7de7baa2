"""Measure a real 1.3B DiT training step (fwd+bwd+optimizer update) on the chip.

Training so far ran only on CPU (tests) and as virtual-mesh compiles; this
gives the measured single-chip number via the production path
(`training/trainer.py::make_train_step` + `make_optimizer`, remat on,
donated train state).

HBM gating uses a STATIC model calibrated against the XLA compile-OOM
breakdown from the 49f AdamW/f32 attempt (arguments 7.99 GB + HLO temp
9.68 GB at seq 20,280, 59.8% fragmentation): axon's memory_stats() reports
nothing, and an OOM'd chip op wedges the tunnel for 10-60 min, so a rung is
only fired if the model predicts a fit. The AdamW/f32 ladder tops out at
33f on one chip; `--opt adafactor` (no m/v) and `--carry bf16` (bf16 remat
checkpoints, TrainConfig knobs) unlock 49f and 81f.

Run on the chip:
  python tools/dev/bench_train_step.py --n 2 --ladder 9 33
  python tools/dev/bench_train_step.py --n 2 --ladder 49 --carry bf16
  python tools/dev/bench_train_step.py --n 2 --ladder 81 --opt adafactor --carry bf16
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

HBM_BUDGET = 15.5e9  # of the 15.75 GB the XLA allocator reports on v5e


def latent_frames(frames: int) -> int:
    return (frames - 1) // 4 + 1


def predict_hbm(seq: int, opt: str, carry: str) -> float:
    # calibrated on the 49f AdamW/f32 compile-OOM: arguments 7.99 GB
    # (params 2.6 + m/v 5.2 + batch), HLO temp 9.68 GB = grads 2.6 +
    # ~1.9x the 30-checkpoint stack (fragmentation included)
    args = 2.6e9 + (2 * 2.6e9 if opt == "adamw" else 0.05e9) + 0.1e9
    ckpt = 30 * seq * 1536 * (4 if carry == "f32" else 2)
    temps = 2.6e9 + 1.9 * ckpt
    return args + temps


def run_shape(frames: int, n: int, opt: str = "adamw", carry: str = "f32"):
    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.models.wan_dit import init_wan_dit
    from omnivideo_tpu.training.trainer import (
        TrainConfig, init_train_state, make_optimizer, make_train_step)

    cfg = T2V_1_3B
    tc = TrainConfig(
        cfg_dropout=0.0,
        optimizer="adafactor" if opt == "adafactor" else "adamw",
        carry_dtype="bfloat16" if carry == "bf16" else "float32",
    )
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

    seq = F * 30 * 52
    print(f"frames={frames} seq={seq} opt={opt} carry={carry}: "
          f"{dt:.3f} s/step  loss {loss:.4f}  "
          f"grad_norm {float(m['grad_norm']):.3f}  compile {compile_s:.1f}s",
          flush=True)
    return dt, None, seq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--ladder", type=int, nargs="*", default=[9, 33])
    ap.add_argument("--opt", default="adamw", choices=["adamw", "adafactor"])
    ap.add_argument("--carry", default="f32", choices=["f32", "bf16"])
    args = ap.parse_args()

    for frames in args.ladder:
        seq = latent_frames(frames) * 30 * 52
        pred = predict_hbm(seq, args.opt, args.carry)
        if pred > HBM_BUDGET:
            print(f"frames={frames} seq={seq} opt={args.opt} "
                  f"carry={args.carry}: SKIPPED "
                  f"(predicted {pred/1e9:.1f} GB > budget)", flush=True)
            continue
        run_shape(frames, args.n, args.opt, args.carry)


if __name__ == "__main__":
    main()
