#!/usr/bin/env python
"""Multi-task flow-matching fine-tuning CLI.

Role of reference `previous_version/Omni-Video1/finetune_model.py` +
`finetune.sh` (torchrun + DeepSpeed ZeRO-1): YAML config with CLI overrides
(finetune_model.py:87-213), per-task weighted datasets with a round-robin
all-tasks-per-step loop (:745-847), flow-matching loss, selective freezing
(:560-586), cosine warmup, checkpoint save/resume (:902-916) — TPU-native:
one jitted sharded train step on a (data, fsdp, seq) mesh; optimizer state
sharded by construction (ZeRO equivalent); orbax checkpoints; metrics to
metrics.jsonl (+ TensorBoard if available).

Example (smoke):
  python tools/finetune.py --dummy_data --tiny --total_steps 3 --platform cpu
"""

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from omnivideo_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()  # reuse TPU compiles across invocations


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="YAML training config")
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--data_dirs", nargs="*", default=[],
                   help="task=path pairs, e.g. t2v=/data/t2v i2i=/data/i2i")
    p.add_argument("--task_weights", nargs="*", default=[],
                   help="task=weight pairs")
    p.add_argument("--output_dir", default="outputs/finetune")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--total_steps", type=int, default=1000)
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--lr", type=float, default=3e-6)
    p.add_argument("--grad_clip", type=float, default=0.1)
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="accumulate grads over N micro-batches per update "
                        "(reference gradient_accumulation_steps)")
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adafactor"],
                   help="adafactor: factored 2nd moment, ~0 optimizer HBM "
                        "(single-chip large-shape finetunes)")
    p.add_argument("--carry_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="dtype of the inter-block residual carry (bfloat16 "
                        "halves the per-block remat checkpoint HBM)")
    p.add_argument("--timestep_sampling", default="uniform",
                   choices=["uniform", "logit_normal", "mode"],
                   help="timestep density (reference weighting_scheme)")
    p.add_argument("--logit_mean", type=float, default=0.0)
    p.add_argument("--logit_std", type=float, default=1.0)
    p.add_argument("--flow_shift", type=float, default=3.0)
    p.add_argument("--cfg_dropout", type=float, default=0.2)
    p.add_argument("--save_interval", type=int, default=500)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trainable", nargs="*", default=[],
                   help="path substrings to train (empty = all); e.g. wan companions")
    p.add_argument("--lora_rank", type=int, default=0,
                   help="LoRA adapter rank over the wan DiT projections "
                        "(0 = full finetune). Trains ONLY the adapters: "
                        "base weights frozen, optimizer state only for the "
                        "low-rank factors (training/lora.py)")
    p.add_argument("--lora_alpha", type=float, default=None,
                   help="LoRA alpha (scale = alpha/rank; default = rank)")
    p.add_argument("--lora_targets", nargs="*", default=None,
                   help="dense-site path substrings to adapt (default: the "
                        "wan attention + ffn projections)")
    p.add_argument("--lora_export", default=None,
                   help="after training, save the LoRA-merged wan params "
                        "(plain kernels, adapters folded in) to this .npz")
    p.add_argument("--lora_adapter_export", default=None,
                   help="after training, save the ADAPTER-ONLY state to "
                        "this .npz (portable; load at inference with "
                        "tools/generate.py --lora_adapters)")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor parallelism over attention heads / FFN hidden "
                        "(GSPMD param shardings; forces the XLA attention path)")
    p.add_argument("--ckpt_dir", default=None, help="init weights from checkpoint")
    p.add_argument("--walltime", type=float, default=None,
                   help="seconds; stop+checkpoint before this walltime")
    p.add_argument("--layer_stream", action="store_true",
                   help="stream DiT blocks host<->HBM per step (single-chip "
                        "training of stacks larger than device memory, e.g. "
                        "A14B on 16 GB; plain flow-match objective — "
                        "training/streaming.py)")
    p.add_argument("--stream_quant", default=None, choices=[None, "int8"],
                   help="with --layer_stream: int8 transfer diet. LoRA "
                        "mode streams the FROZEN base q8 (QLoRA recipe); "
                        "full-finetune mode additionally rides grads d2h "
                        "as int8 and updates on the host CPU — halves the "
                        "dominant per-block wire bytes (ops/quant.py)")
    p.add_argument("--dummy_data", action="store_true")
    p.add_argument("--with_aligned", action="store_true",
                   help="dummy data includes v1 aligned_emb features")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None)
    from omnivideo_tpu.parallel.distributed import add_distributed_args

    add_distributed_args(p)
    args = p.parse_args()
    from omnivideo_tpu.utils.run_config import apply_yaml_config

    return apply_yaml_config(args, p)


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from omnivideo_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed(args.coordinator, args.num_processes,
                                 args.process_id)
    import jax.numpy as jnp

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.models.unified import init_unified_companions
    from omnivideo_tpu.models.wan_dit import init_wan_dit
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.parallel.sharding import params_shardings
    from omnivideo_tpu.training.checkpoint import CheckpointManager
    from omnivideo_tpu.training.dataset import (
        OmniVideoDataset,
        PadSpec,
        data_loader,
        make_dummy_dataset,
    )
    from omnivideo_tpu.training.trainer import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_unified_train_step,
    )
    from omnivideo_tpu.utils.observability import (
        MetricsLogger,
        PreemptionGuard,
        TimeoutGuard,
    )

    from omnivideo_tpu.utils.run_config import dump_run_config

    dump_run_config(args, args.output_dir)  # provenance: what this run ran with
    cfg = WAN_CONFIGS[args.task]
    if args.tiny:
        cfg = cfg.replace(
            dit=cfg.dit.replace(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                                freq_dim=32, text_dim=48),
            max_context_len=64,
            vlm_in_dim=16,
        )

    tc = TrainConfig(
        learning_rate=args.lr,
        grad_clip=args.grad_clip,
        warmup_steps=args.warmup_steps,
        total_steps=args.total_steps,
        flow_shift=args.flow_shift,
        cfg_dropout=args.cfg_dropout,
        trainable_filters=tuple(args.trainable),
        grad_accum_steps=args.grad_accum_steps,
        optimizer=args.optimizer,
        carry_dtype=args.carry_dtype,
        timestep_sampling=args.timestep_sampling,
        logit_mean=args.logit_mean,
        logit_std=args.logit_std,
    )

    # ---- data: per-task loaders, weighted round-robin -----------------------
    pad = PadSpec(
        text_len=min(64, cfg.max_context_len) if args.tiny else 512,
        vlm_len=16 if args.tiny else 512,
        latent_frames=3 if args.tiny else 21,
        aligned_len=8 if args.tiny else 256,
    )
    tasks = {}
    if args.dummy_data:
        root = make_dummy_dataset(
            Path(args.output_dir) / "dummy_data",
            n=8,
            text_len=8,
            vlm_len=6,
            latent_shape=(cfg.dit.in_dim, 3, 8, 8),
            text_dim=cfg.dit.text_dim,
            vlm_dim=cfg.vlm_in_dim,
            with_aligned=args.with_aligned,
        )
        tasks["t2v"] = (OmniVideoDataset(str(root)), 1.0)
    else:
        weights = dict(w.split("=") for w in args.task_weights)
        for spec in args.data_dirs:
            name, path = spec.split("=")
            tasks[name] = (OmniVideoDataset(path), float(weights.get(name, 1.0)))
    assert tasks, "no datasets configured"

    n_mesh = args.dp * args.fsdp * args.sp * args.tp
    mesh = create_mesh(args.dp, args.fsdp, args.sp, args.tp) if n_mesh > 1 else None

    # ---- params --------------------------------------------------------------
    key = jax.random.PRNGKey(args.seed)
    if args.ckpt_dir:
        from omnivideo_tpu.pipelines.loading import load_expert

        expert = load_expert(cfg, args.ckpt_dir, cfg.low_noise_checkpoint, jnp.float32)
        params = {"wan": expert.wan, "companions": expert.companions}
        if not params["companions"]:
            params["companions"] = init_unified_companions(key, cfg)
    else:
        k1, k2 = jax.random.split(key)
        params = {
            "wan": init_wan_dit(k1, cfg.dit.replace(text_len=cfg.max_context_len),
                                dtype=jnp.float32),
            "companions": init_unified_companions(k2, cfg),
        }
    if args.lora_rank > 0:
        import dataclasses

        from omnivideo_tpu.training.lora import (
            DEFAULT_TARGETS,
            LORA_FILTERS,
            count_lora_params,
            inject_lora,
        )

        targets = tuple(args.lora_targets) if args.lora_targets else DEFAULT_TARGETS
        params["wan"] = inject_lora(
            params["wan"], jax.random.PRNGKey(args.seed + 7),
            args.lora_rank, alpha=args.lora_alpha, targets=targets)
        tc = dataclasses.replace(tc, trainable_filters=LORA_FILTERS)
        logging.info("LoRA rank %d over %s: %d adapter params trainable",
                     args.lora_rank, ",".join(targets),
                     count_lora_params(params["wan"]))
    if mesh is not None:
        sh = params_shardings(params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, params, sh)

    # tp>1 partitions the XLA-attention einsums via GSPMD; the Pallas kernel
    # is opaque to the partitioner, so TP forces the XLA path
    attn_impl = "xla" if (args.platform == "cpu" or args.tp > 1) else "auto"
    if args.layer_stream:
        # larger-than-HBM single-chip mode: the wan block stack (and its
        # grads/optimizer state) lives in HOST memory and streams per block;
        # plain flow-match objective over the wan DiT (the A14B finetune the
        # reference does with multi-GPU ZeRO, finetune_model.py:725-732)
        assert mesh is None, "--layer_stream is the single-device path"
        assert len(tasks) == 1, "--layer_stream: one dataset (plain t2v loss)"
        if args.lora_rank > 0:
            # frozen base streams host->HBM; adapters train device-resident
            # (A14B LoRA finetune on one 16 GB chip)
            from omnivideo_tpu.training.streaming import StreamedLoRATrainer

            streamer = StreamedLoRATrainer(cfg, tc, attn_impl=attn_impl,
                                           base_quant=args.stream_quant)
        else:
            from omnivideo_tpu.training.streaming import StreamedTrainer

            # stream_quant here = the full-finetune transfer diet: q8
            # fwd/bwd param streams, int8 grad fetch, host-side update
            # (training/streaming.py stream_quant docstring)
            streamer = StreamedTrainer(cfg, tc, attn_impl=attn_impl,
                                       stream_quant=args.stream_quant)
        state = streamer.init_state(params["wan"])
        train_step = streamer.train_step
    else:
        tx = make_optimizer(tc, params)
        state = init_train_state(params, tx)
        train_step = jax.jit(
            make_unified_train_step(cfg, tc, tx, mesh=mesh, attn_impl=attn_impl))

    ckpt = CheckpointManager(str(Path(args.output_dir) / "checkpoints"))
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        logging.info("resumed from step %d", int(state.step))

    from omnivideo_tpu.training.dataset import PrefetchLoader

    loaders = {
        name: PrefetchLoader(
            data_loader(ds, args.batch_size, pad, seed=args.seed,
                        host_id=jax.process_index(), num_hosts=jax.process_count())
        )
        for name, (ds, _) in tasks.items()
    }
    weights = {name: w for name, (_, w) in tasks.items()}

    metrics = MetricsLogger(args.output_dir)
    preempt = PreemptionGuard()
    timeout = TimeoutGuard(args.walltime)

    rng = jax.random.PRNGKey(args.seed + 1)
    step = int(state.step)
    t0 = time.time()
    while step < args.total_steps:
        if preempt.should_stop() or timeout.should_stop():
            ckpt.save(step, state, {"step": step, "preempted": True})
            logging.warning("preemption/walltime stop at step %d (checkpointed)", step)
            return
        # round-robin: every task contributes each step, weighted loss
        # (reference all-tasks-per-step loop, finetune_model.py:745-847)
        losses = {}
        for name, loader in loaders.items():
            batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
            rng, sub = jax.random.split(rng)
            state, m = train_step(state, batch, sub)
            losses[name] = float(m["loss"]) * weights[name]
        step = int(state.step)
        if step % args.log_interval == 0 or step == args.total_steps:
            metrics.log(step, **{f"loss/{k}": v for k, v in losses.items()})
            logging.info("step %d (%.1fs) %s", step, time.time() - t0, losses)
        if step % args.save_interval == 0 or step == args.total_steps:
            ckpt.save(step, state, {"step": step})
            logging.info("saved checkpoint at step %d", step)

    if args.lora_rank > 0 and (args.lora_export or args.lora_adapter_export):
        import numpy as np

        from omnivideo_tpu.training.lora import merge_lora, save_adapters_npz

        wan = (streamer.export_params(state) if args.layer_stream
               else state.params["wan"])
        if args.lora_adapter_export:
            Path(args.lora_adapter_export).parent.mkdir(parents=True,
                                                        exist_ok=True)
            n = save_adapters_npz(wan, args.lora_adapter_export)
            logging.info("LoRA adapters exported to %s (%d arrays)",
                         args.lora_adapter_export, n)
    if args.lora_rank > 0 and args.lora_export:
        merged = merge_lora(wan)
        flat = {
            "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(merged)
        }
        Path(args.lora_export).parent.mkdir(parents=True, exist_ok=True)
        np.savez(args.lora_export, **flat)
        logging.info("LoRA-merged wan params exported to %s (%d arrays)",
                     args.lora_export, len(flat))
    logging.info("done at step %d", step)


if __name__ == "__main__":
    main()
