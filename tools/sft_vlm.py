#!/usr/bin/env python
"""VLM (AR model) supervised fine-tuning CLI — LM loss + optional
vision-head/adapter alignment.

Role of reference `.../llava/train/train.py` (LLM SFT entry) and
`.../llava/train/train_vila_vh.py` (vision-head alignment trainer whose
compute_loss combines LM + alignment, vila_with_vh_trainer.py:645-686).

TPU-native: one jitted step (training/sft.py); data is pickled samples with
`ids`/`prompt_len` (+ `vlm`/`target` for alignment) or --dummy_data for
smoke runs.

Example (smoke):
  python tools/sft_vlm.py --dummy_data --tiny --total_steps 4 --platform cpu
"""

import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

log = logging.getLogger("sft_vlm")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None,
                   help="YAML training config (CLI flags typed explicitly win)")
    p.add_argument("--model_path", default=None, help="HF Qwen3 checkpoint dir")
    p.add_argument("--data_dir", default=None, help="pickled SFT samples")
    p.add_argument("--conversations", nargs="*", default=None,
                   help="conversation-format JSON/JSONL SFT data "
                        "(chat transcripts; per-turn loss masks); several "
                        "paths form a weighted mixture (--mixture_weights)")
    p.add_argument("--mixture_weights", nargs="*", type=float, default=None,
                   help="per-source sampling ratios for --conversations "
                        "(>1 repeats, <1 subsamples; default all 1.0)")
    p.add_argument("--tokenizer_path", default=None,
                   help="HF tokenizer dir for --conversations "
                        "(defaults to --model_path)")
    p.add_argument("--group_by_length", action="store_true",
                   help="length-grouped batch ordering (less padding waste)")
    p.add_argument("--group_by_modality_length", action="store_true",
                   help="length-grouped, multimodal and text-only batches "
                        "kept separate")
    p.add_argument("--output_dir", default="outputs/sft_vlm")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--total_steps", type=int, default=1000)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--lora_rank", type=int, default=0,
                   help="LoRA rank over the LLM attention q/k/v/o and dense "
                        "MLP projections (0 = full finetune) — the "
                        "reference's PEFT lora_enable role; trains ONLY "
                        "the adapters (training/lora.py)")
    p.add_argument("--lora_alpha", type=float, default=None,
                   help="LoRA alpha (scale = alpha/rank; default = rank)")
    p.add_argument("--align_weight", type=float, default=0.0,
                   help=">0 trains the vision-head/adapter chain too")
    p.add_argument("--cosine_weight", type=float, default=0.0)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--save_interval", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor parallelism over heads/FFN (GSPMD shardings)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel degree (ring token-causal attention)")
    p.add_argument("--dummy_data", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None)
    from omnivideo_tpu.parallel.distributed import add_distributed_args

    add_distributed_args(p)
    args = p.parse_args()
    from omnivideo_tpu.utils.run_config import apply_yaml_config

    return apply_yaml_config(args, p)


def _tiny_cfg():
    from omnivideo_tpu.models.qwen3vl.text_model import Qwen3TextConfig

    return Qwen3TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
    )


def _random_lm_params(key, cfg):
    import jax
    import jax.numpy as jnp

    D, V = cfg.hidden_size, cfg.vocab_size
    hd, N, K = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    ctr = [0]

    def nk():
        ctr[0] += 1
        return jax.random.fold_in(key, ctr[0])

    def lin(i, o):
        return jax.random.normal(nk(), (i, o)) * 0.05

    def layer():
        return {
            "attn": {
                "q": lin(D, N * hd), "k": lin(D, K * hd), "v": lin(D, K * hd),
                "o": lin(N * hd, D),
                "q_norm": jnp.ones((hd,)), "k_norm": jnp.ones((hd,)),
            },
            "ln1": jnp.ones((D,)), "ln2": jnp.ones((D,)),
            "mlp": {"gate": lin(D, cfg.intermediate_size),
                    "up": lin(D, cfg.intermediate_size),
                    "down": lin(cfg.intermediate_size, D)},
        }

    layers = [layer() for _ in range(cfg.num_hidden_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embed": jax.random.normal(nk(), (V, D)) * 0.05,
        "layers": stacked,
        "norm": jnp.ones((D,)),
        "lm_head": jax.random.normal(nk(), (D, V)) * 0.05,
    }


def _dummy_batch(key, cfg, args):
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.training.sft import build_sft_labels

    k1, k2, k3 = jax.random.split(key, 3)
    B, L = args.batch_size, min(args.seq_len, 32)
    ids = jax.random.randint(k1, (B, L), 0, cfg.vocab_size)
    labels = build_sft_labels(ids, jnp.full((B,), L // 3))
    batch = {"ids": ids, "labels": labels}
    if args.align_weight > 0:
        batch["vlm"] = jax.random.normal(k2, (B, 8, cfg.hidden_size))
        batch["target"] = jax.random.normal(k3, (B, 4, 32)) * 0.1
    return batch


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

    from omnivideo_tpu.utils.run_config import dump_run_config

    dump_run_config(args, args.output_dir)  # provenance: what this run ran with
    from omnivideo_tpu.training.sft import (
        SFTConfig,
        SFTDataset,
        init_sft_state,
        make_sft_optimizer,
        make_sft_step,
        sft_data_loader,
    )

    key = jax.random.PRNGKey(args.seed)
    if args.model_path:
        from omnivideo_tpu.io.hf_reader import (
            load_hf_safetensors,
            qwen3_text_config_from_hf,
        )
        from omnivideo_tpu.models.qwen3vl.text_model import hf_to_params

        cfg = qwen3_text_config_from_hf(args.model_path)
        sd = load_hf_safetensors(args.model_path)
        sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
        params = {"lm": hf_to_params(sd, cfg)}
        log.info("loaded HF checkpoint %s (%d tensors)", args.model_path, len(sd))
    else:
        cfg = _tiny_cfg()  # without --model_path only the smoke config applies
        params = {"lm": _random_lm_params(key, cfg)}
    if args.align_weight > 0:
        from omnivideo_tpu.models.adapters import init_dm_adapter, init_vision_head

        k1, k2 = jax.random.split(jax.random.fold_in(key, 99))
        params["chain"] = {
            "vision_head": init_vision_head(k1, in_dim=cfg.hidden_size,
                                            hidden_dim=32, out_dim=24,
                                            num_queries=4, num_layers=1),
            "adapter": init_dm_adapter(k2, in_dim=24, hidden_dim=32,
                                       out_dim=32, num_queries=4, num_layers=1),
        }

    mesh = None
    if args.dp * args.fsdp * args.sp * getattr(args, "tp", 1) > 1:
        from omnivideo_tpu.parallel.mesh import create_mesh
        from omnivideo_tpu.parallel.sharding import params_shardings

        mesh = create_mesh(args.dp, args.fsdp, args.sp, args.tp)
        sh = params_shardings(params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, params, sh)
        log.info("mesh dp=%d fsdp=%d sp=%d tp=%d", args.dp, args.fsdp,
                 args.sp, args.tp)

    tc = SFTConfig(
        learning_rate=args.lr, max_grad_norm=args.grad_clip,
        warmup_steps=args.warmup_steps, total_steps=args.total_steps,
        align_weight=args.align_weight, cosine_weight=args.cosine_weight,
    )
    tx = make_sft_optimizer(tc)
    if args.lora_rank > 0:
        from omnivideo_tpu.training.lora import (
            count_lora_params,
            inject_lora_bare,
            lora_masked,
        )

        params["lm"] = inject_lora_bare(
            params["lm"], jax.random.PRNGKey(args.seed + 7),
            args.lora_rank, alpha=args.lora_alpha)
        # the tiny alignment chain (when present) keeps training — only
        # the LLM base freezes
        tx = lora_masked(tx, params, extra_filters=("chain",))
        log.info("LoRA rank %d over LLM q/k/v/o + dense MLP: %d adapter "
                 "params trainable", args.lora_rank,
                 count_lora_params(params["lm"]))
    step = jax.jit(make_sft_step(cfg, tc, tx,
                                 sp_mesh=mesh if args.sp > 1 else None))
    state = init_sft_state(params, tx)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    metrics_f = (out / "metrics.jsonl").open("a")

    from omnivideo_tpu.training.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(out / "checkpoints"))
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log.info("resumed from step %d", int(state.step))

    loader = None
    if args.conversations:
        from transformers import AutoTokenizer

        from omnivideo_tpu.training.conversation import ConversationDataset

        tok_dir = args.tokenizer_path or args.model_path
        assert tok_dir, "--conversations needs --tokenizer_path or --model_path"
        tok = AutoTokenizer.from_pretrained(tok_dir)
        srcs = [ConversationDataset(p, tok) for p in args.conversations]
        if len(srcs) == 1 and not args.mixture_weights:
            ds = srcs[0]
        else:
            from omnivideo_tpu.training.sft import MixtureDataset

            ds = MixtureDataset(srcs, args.mixture_weights, seed=args.seed)
        loader = sft_data_loader(
            ds, args.batch_size, args.seq_len, seed=args.seed,
            group_by_length=args.group_by_length,
            group_by_modality=args.group_by_modality_length,
            world_size=max(args.dp, 1),
        )
    elif args.data_dir:
        loader = sft_data_loader(SFTDataset(args.data_dir), args.batch_size,
                                 args.seq_len, seed=args.seed)

    for i in range(int(state.step), args.total_steps):
        if loader is not None:
            batch = next(loader)
        else:
            bkey = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), i)
            batch = _dummy_batch(bkey, cfg, args)
        if mesh is not None:
            from omnivideo_tpu.parallel.sharding import batch_sharding

            batch = {kk: jax.device_put(vv, batch_sharding(mesh, vv.ndim))
                     for kk, vv in batch.items()}
        t0 = time.perf_counter()
        state, m = step(state, batch)
        loss = float(m["loss"])
        if i % args.log_interval == 0 or i == args.total_steps - 1:
            rec = {"step": i, "loss": loss,
                   "lm_loss": float(m["lm_loss"]),
                   "grad_norm": float(m["grad_norm"]),
                   "sec": round(time.perf_counter() - t0, 4)}
            if "align_loss" in m:
                rec["align_loss"] = float(m["align_loss"])
            log.info("%s", rec)
            metrics_f.write(json.dumps(rec) + "\n")
            metrics_f.flush()
        if args.save_interval and (i + 1) % args.save_interval == 0:
            ckpt.save(i + 1, state)
            log.info("saved checkpoint at step %d", i + 1)
    ckpt.save(args.total_steps, state)
    log.info("done: %d steps, final loss %.4f", args.total_steps, loss)


if __name__ == "__main__":
    main()
