#!/usr/bin/env python
"""Measure a REAL full-depth A14B TRAIN step on one chip via layer streaming.

The reference fine-tunes A14B-scale models only with multi-GPU ZeRO
(finetune_model.py:725-732). training/streaming.py turns that into a
single-16GB-chip capability: block params/grads/optimizer state live in host
RAM (125 GB here) and stream per block. This drives ONE exact streamed
flow-matching step at TRUE A14B dims (5120 x 40 layers, bf16 params) on the
chip and reports step time + phase breakdown.

    python tools/dev/bench_stream_train.py [--frames 3] [--steps 1]

frames = LATENT frames (3 -> 9 video frames, seq 4,680; 21 -> 81f, 32,760).
Emits PHASE_JSON lines (mergeable via tools/dev/merge_phase_cache.py).
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def emit(frag):
    print("PHASE_JSON:" + json.dumps(frag), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3, help="latent frames")
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--task", default="t2v-A14B")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims on CPU: smoke the glue, not the chip")
    ap.add_argument("--fused", action="store_true",
                    help="grad_clip=0 fused-update mode (no grad host "
                         "roundtrip, no pass B — ~2x less h2d traffic)")
    ap.add_argument("--stream_quant", default=None, choices=[None, "int8"],
                    help="run the full-finetune q8 transfer diet")
    ap.add_argument("--lora", type=int, default=0, metavar="RANK",
                    help="streamed LoRA mode: frozen base streams, rank-R "
                         "adapters train device-resident (no grad/param "
                         "host roundtrips at all — training/streaming.py::"
                         "StreamedLoRATrainer)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.models.wan_dit import init_wan_block, init_wan_dit
    from omnivideo_tpu.training.streaming import (
        StreamedLoRAState,
        StreamedLoRATrainer,
        StreamedTrainer,
        StreamedTrainState,
        _to_host,
    )
    from omnivideo_tpu.training.trainer import TrainConfig

    cfg = WAN_CONFIGS[args.task]
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg = cfg.replace(
            dit=cfg.dit.replace(dim=64, ffn_dim=128, num_heads=4,
                                num_layers=3, freq_dim=32, text_dim=48),
            max_context_len=32)
    tc = TrainConfig(cfg_dropout=0.0, warmup_steps=1, total_steps=100,
                     learning_rate=1e-5, optimizer="adafactor",
                     grad_clip=0.0 if args.fused else 0.1)
    dit = cfg.dit.replace(text_len=cfg.max_context_len)
    nl = dit.num_layers
    F, H, W = args.frames, (8 if args.tiny else 60), (8 if args.tiny else 104)
    seq = F * (H // 2) * (W // 2)

    # host-side stack: one random bf16 block, copied nl times (~0.7 GB each;
    # copies are REAL — the step updates every block independently)
    t0 = time.time()
    shapes = jax.eval_shape(
        lambda k: init_wan_block(k, dit, jnp.bfloat16), jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def host_leaf(s):
        if s.ndim == 1 and s.dtype == np.float32:
            return np.ones(s.shape, np.float32)
        return (rng.standard_normal(s.shape, dtype=np.float32) * 0.02
                ).astype(s.dtype)

    block0 = jax.tree_util.tree_map(host_leaf, shapes)
    blk_gb = sum(l.size * l.dtype.itemsize
                 for l in jax.tree_util.tree_leaves(block0)) / 1e9

    # --- transfer pre-probe: a streamed step moves >=2*nl blocks h2d (fwd +
    # bwd recompute) plus d2h roundtrips in full mode. Over the axon tunnel
    # per-block transfer can be latency-bound (~17 s/block observed, vs
    # ~0.1 s at PCIe rates); projecting past the phase budget means the step
    # CANNOT finish and would be timeout-killed mid-op — which wedges the
    # tunnel for 10-40 min (CLAUDE.md). Bail gracefully instead, leaving the
    # measured bandwidth as the evidence.
    if not args.tiny:
        from omnivideo_tpu.pipelines.streaming import BlockPacker

        budget = float(os.environ.get("BENCH_STRAIN_BUDGET_S", "800"))
        dev = jax.devices()[0]
        # probe what the trainer actually transfers: PACKED buffers (one
        # per dtype — per-leaf puts are tunnel-latency-bound, ~30 s/block)
        pk = BlockPacker(block0)
        bufs = pk.pack(block0)
        tp0 = time.time()
        dev_bufs = {k: jax.device_put(v, dev) for k, v in bufs.items()}
        float(sum(jnp.sum(v[:8].astype(jnp.float32))
                  for v in dev_bufs.values()))
        t_blk = time.time() - tp0
        del dev_bufs, bufs
        passes = 2 if args.lora else 3   # lora: base fwd+bwd; full: +update
        proj = t_blk * nl * passes
        emit({"a14b_train_stream_h2d_block_s": round(t_blk, 2),
              "a14b_train_stream_step_projected_s": round(proj, 1)})

        # q8 transfer diet (stream_quant="int8", VERDICT r4 item 6): fwd +
        # bwd ride the q8 form h2d, grads come back int8 (~same bytes), and
        # the host-side update adds NO crossing — 3 q8-sized crossings vs
        # the full mode's 3 bf16-sized ones.
        from omnivideo_tpu.ops.quant import quantize_block, quantized_bytes

        q8b = quantize_block(block0)
        q8_gb = quantized_bytes(q8b) / 1e9
        pkq = BlockPacker(q8b)
        bufsq = pkq.pack(q8b)
        tq0 = time.time()
        dev_bufs = {k: jax.device_put(v, dev) for k, v in bufsq.items()}
        float(sum(jnp.sum(v[:8].astype(jnp.float32))
                  for v in dev_bufs.values()))
        t_q8 = time.time() - tq0
        del dev_bufs, bufsq, q8b
        proj_q8 = t_q8 * nl * 3
        emit({"a14b_train_stream_q8_h2d_block_s": round(t_q8, 2),
              "a14b_train_stream_q8_block_gb": round(q8_gb, 2),
              "a14b_train_stream_q8_step_projected_s": round(proj_q8, 1)})
        if proj > budget:
            print(f"# BAIL: projected streamed step {proj:.0f}s > budget "
                  f"{budget:.0f}s (packed block transfer {t_blk:.1f}s x "
                  f"{nl} x {passes} passes) — transfer-bound; not runnable "
                  f"without a timeout kill", flush=True)
            return

    host_blocks = [jax.tree_util.tree_map(np.copy, block0)
                   for _ in range(nl - 1)] + [block0]
    print(f"# host stack built: {nl} x {blk_gb:.2f} GB "
          f"in {time.time() - t0:.0f}s", flush=True)

    resident = init_wan_dit(jax.random.PRNGKey(1), dit, jnp.bfloat16,
                            with_blocks=False)
    if args.lora:
        from omnivideo_tpu.training.lora import extract_lora, inject_lora

        # the stock head init is zeros (fresh-model convention) which would
        # zero every adapter gradient; a finetune starts from a trained
        # checkpoint, so stand in with a random head
        hk = resident["head"]["head"]["kernel"]
        resident["head"]["head"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(6), hk.shape, hk.dtype)
            * 0.02)
        trainer = StreamedLoRATrainer(cfg, tc, attn_impl="auto",
                                      act_offload=True)
        # adapters for one block, replicated per layer (device-resident; a
        # rank-16 A14B adapter set is ~25 MB total — trivially HBM-resident)
        ad = extract_lora(inject_lora(block0, jax.random.PRNGKey(5),
                                      rank=args.lora))
        lora = [trainer._put({p: {k: site[k] for k in ("lora_a", "lora_b")}
                              for p, site in ad.items()}) for _ in range(nl)]
        scales = [trainer._put({p: {"lora_scale": site["lora_scale"]}
                                for p, site in ad.items()})] * nl
        state = StreamedLoRAState(
            resident=jax.device_put(resident),
            host_blocks=host_blocks,
            lora=lora,
            lora_scales=scales,
            lora_opt=trainer.inner.init(lora),
            step=0,
        )
    else:
        trainer = StreamedTrainer(cfg, tc, attn_impl="auto", act_offload=True,
                                  stream_quant=args.stream_quant)
        opt0 = _to_host(trainer.inner.init(block0))
        state = StreamedTrainState(
            resident=jax.device_put(resident),
            resident_opt=trainer.inner.init(jax.device_put(resident)),
            host_blocks=host_blocks,
            host_block_opts=[jax.tree_util.tree_map(np.copy, opt0)
                             for _ in range(nl)],
            step=0,
        )
    batch = {
        "latents": np.random.default_rng(1).standard_normal(
            (1, dit.in_dim, F, H, W), dtype=np.float32),
        "context": (np.random.default_rng(2).standard_normal(
            (1, cfg.max_context_len, dit.text_dim)) * 0.02
            ).astype(np.float32),
    }
    sfx = "_lora" if args.lora else ("_fused" if args.fused else "")
    out = {"a14b_train_stream_seq": seq,
           "a14b_train_stream_block_gb": round(blk_gb, 2)}

    t0 = time.time()
    state, m = trainer.train_step(state, batch, jax.random.PRNGKey(3))
    first = time.time() - t0
    out[f"a14b_train_stream{sfx}_first_step_s"] = round(first, 1)
    out[f"a14b_train_stream{sfx}_loss"] = round(float(m["loss"]), 4)
    emit(dict(out))
    print(f"# first (compile+exec) step: {first:.1f}s "
          f"loss={float(m['loss']):.4f} gnorm={float(m['grad_norm']):.3f}",
          flush=True)

    for s in range(args.steps):
        t0 = time.time()
        state, m = trainer.train_step(state, batch, jax.random.PRNGKey(4 + s))
        dt = time.time() - t0
        out[f"a14b_train_stream{sfx}_step_s"] = round(dt, 1)
        emit(dict(out))
        print(f"# steady step {s}: {dt:.1f}s loss={float(m['loss']):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
