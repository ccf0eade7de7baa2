#!/usr/bin/env python
"""Unified x2x generation CLI.

Role of reference `tools/inference/generate_omni_{t2v,v2v}.py` (argparse flags
mirroring generate_omni_v2v.py:92-281): JSONL input, T2V rows
`{"sample_id", "prompt"}` and V2V rows `{"id", "source_clip_path",
"edit_prompt"}` (samples/*.jsonl), video outputs to --output_dir.

TPU-native differences: no torchrun/NCCL bring-up — multi-host data
parallelism shards the JSONL by host id (`--dp_rank/--dp_world_size` or
jax.process_index), and every host computes identical conditioning
deterministically instead of broadcasting tensors.

Smoke mode: `--random_weights` runs the full pipeline with random params (no
checkpoints needed), optionally with `--tiny` to shrink the DiT/VAE.
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
    p = argparse.ArgumentParser(description="omnivideo_tpu unified x2x generation")
    p.add_argument("--task", default="t2v-1.3B", help="config key from WAN_CONFIGS")
    p.add_argument("--size", default=None,
                   help="W*H or a SIZE_CONFIGS key (default 832*480; "
                        "--tiny defaults to 64*32)")
    p.add_argument("--frame_num", type=int, default=None)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--input", required=True, help="JSONL input file")
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--sample_solver", default="unipc", choices=["unipc", "dpm++"])
    p.add_argument("--sample_steps", type=int, default=None)
    p.add_argument("--sample_shift", type=float, default=None)
    p.add_argument("--sample_guide_scale", type=float, default=None)
    p.add_argument("--base_seed", type=int, default=42)
    p.add_argument("--max_context_len", type=int, default=None)
    p.add_argument("--dp_rank", type=int, default=None)
    p.add_argument("--dp_world_size", type=int, default=None)
    p.add_argument("--attn_impl", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--qk_impl", default="auto", choices=["auto", "xla", "pallas"],
                   help="pallas: fused rms-norm+rope+bound attention prologue "
                        "(ops/pallas/qk_prep.py; single-device inference); "
                        "auto: measured winner from ops/tuning.py")
    p.add_argument("--ew_impl", default="auto", choices=["auto", "xla", "pallas"],
                   help="pallas: fused AdaLN sandwich (ops/pallas/adaln.py); "
                        "auto: measured winner from ops/tuning.py")
    p.add_argument("--lora_adapters", default=None,
                   help="adapter-only .npz from tools/finetune.py "
                        "--lora_adapter_export; grafted AND merged into the "
                        "wan weights at load (zero inference overhead)")
    p.add_argument("--layer_stream", action="store_true",
                   help="stream DiT blocks host->HBM per step (single-chip "
                        "deployment for experts larger than device memory, "
                        "e.g. A14B on 16 GB; pipelines/streaming.py)")
    p.add_argument("--stream_quant", default=None, choices=[None, "int8"],
                   help="with --layer_stream: weight-only int8 on the "
                        "streamed block kernels (ops/quant.py) — halves the "
                        "host->HBM bytes per block on transfer-bound links")
    p.add_argument("--stream_group", type=int, default=1,
                   help="with --layer_stream: blocks per jitted dispatch "
                        "(amortizes per-dispatch latency; numerics identical)")
    p.add_argument("--residual_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="DiT residual-stream storage dtype. bfloat16 "
                        "(default) halves the in-block norm/residual HBM "
                        "traffic — adds still compute f32; quality A/B vs "
                        "the f32 stream: PSNR 35.3 dB / SSIM 0.998 at "
                        "480p·81f (tools/dev/bench_residual_quality.py). "
                        "float32 is the strict reference-parity stream")
    p.add_argument("--vae_dtype", default=None, choices=[None, "float32", "bfloat16"],
                   help="decoder compute dtype (bfloat16 ~2x decode throughput)")
    p.add_argument("--max_steps_per_call", type=int, default=None,
                   help="chunk the denoise scan into calls of <= N steps "
                        "(bounds single-dispatch walltime; exact split)")
    p.add_argument("--sp_size", type=int, default=1,
                   help="Ulysses sequence-parallel degree (devices along 'seq')")
    p.add_argument("--sp_mode", default="ulysses", choices=["ulysses", "ring", "hybrid"])
    p.add_argument("--ring_impl", default="ppermute", choices=["ppermute", "pallas"],
                   help="ring K/V rotation: XLA collective-permute or the fused RDMA Pallas kernel")
    p.add_argument("--tp_size", type=int, default=1,
                   help="tensor parallelism over heads/FFN (GSPMD; forces "
                        "attn_impl=xla — the Pallas kernel is opaque to the "
                        "partitioner)")
    p.add_argument("--fsdp_size", type=int, default=1,
                   help="parameter-shard degree (devices along 'fsdp')")
    p.add_argument("--fps", type=int, default=None)
    # VLM caption-expansion stage (reference generate_omni_v2v.py:641-729)
    p.add_argument("--vlm_path", default=None,
                   help="Qwen3-VL checkpoint; enables caption expansion + feature extraction")
    p.add_argument("--vlm_backend", default="hf", choices=["hf", "jax"])
    p.add_argument("--vlm_fsdp", type=int, default=1,
                   help="shard VLM params over this many devices (30B > 1-chip HBM)")
    p.add_argument("--features_dir", default=None,
                   help="precomputed VLM feature .npz dir (offline escape hatch)")
    # smoke / dev
    p.add_argument("--random_weights", action="store_true",
                   help="random-init params (no checkpoint load)")
    p.add_argument("--tiny", action="store_true", help="shrink model for smoke runs")
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace of generation into this dir")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--condition_mode", default="auto",
                   choices=["auto", "full", "text_only", "aligned_emb_with_text",
                            "aligned_emb_only", "visual_with_aligned_emb"],
                   help="v1 condition modes (reference generate.py:453)")
    p.add_argument("--token_order", default="v2", choices=["v2", "v1"],
                   help="mixed-context assembly order (v1 = omni_video_model.py:337)")
    from omnivideo_tpu.parallel.distributed import add_distributed_args

    add_distributed_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # multi-host bring-up BEFORE any backend touch (reference torchrun
    # rendezvous, generate_omni_v2v.py:408-412); single-process = no-op
    from omnivideo_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed(args.coordinator, args.num_processes,
                                 args.process_id)
    import jax.numpy as jnp
    import numpy as np

    from omnivideo_tpu.configs import SIZE_CONFIGS, WAN_CONFIGS
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified
    from omnivideo_tpu.utils.video import save_video

    cfg = WAN_CONFIGS[args.task]
    if args.max_context_len:
        cfg = cfg.replace(max_context_len=args.max_context_len)
    if args.tiny:
        cfg = cfg.replace(
            dit=cfg.dit.replace(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                                freq_dim=32, text_dim=48),
            vae=cfg.vae.__class__(dim=8, z_dim=16, num_res_blocks=1),
            max_context_len=64,
        )
        # bare `--tiny` must be a usable smoke: shrink the workload too,
        # unless the user explicitly asked for specific sizes (a tiny model
        # at full 832*480·81f seq 32,760 takes >7 min of XLA attention on CPU)
        args.size = args.size or "64*32"
        args.frame_num = args.frame_num or 9
        args.sample_steps = args.sample_steps or 2
    args.size = args.size or "832*480"
    size = SIZE_CONFIGS[args.size] if args.size in SIZE_CONFIGS else tuple(
        int(v) for v in args.size.split("*")
    )
    frame_num = args.frame_num or cfg.frame_num
    steps = args.sample_steps or cfg.sample_steps
    shift = args.sample_shift or cfg.sample_shift
    guide = (
        (args.sample_guide_scale, args.sample_guide_scale)
        if args.sample_guide_scale
        else cfg.sample_guide_scale
    )

    sp = None
    mesh = None
    if args.sp_size > 1 or args.fsdp_size > 1 or args.tp_size > 1:
        from omnivideo_tpu.models.wan_dit import SPConfig
        from omnivideo_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(dp=1, fsdp=args.fsdp_size, sp=args.sp_size,
                           tp=args.tp_size)
        if args.sp_size > 1:
            sp = SPConfig(mesh=mesh, mode=args.sp_mode, ring_impl=args.ring_impl)
            if args.tp_size > 1 and args.attn_impl != "xla":
                # SP already shards heads across 'seq'; composing a second
                # head split over 'tensor' is not wired — only then fall
                # back to the GSPMD-partitionable XLA path
                logging.info("sp_size>1 with tp_size>1: forcing attn_impl=xla")
                args.attn_impl = "xla"
        elif args.tp_size > 1:
            # head-sharded shard_map keeps the Pallas flash kernel usable
            # under tensor parallelism (parallel/tp.py)
            sp = SPConfig(mesh=mesh, mode="tp")

    if args.layer_stream:
        assert sp is None and mesh is None, \
            "--layer_stream is the single-device path (no sp/fsdp/tp)"
    if args.stream_quant:
        assert args.layer_stream, "--stream_quant requires --layer_stream"
    if args.stream_group != 1:
        assert args.layer_stream, "--stream_group requires --layer_stream"
    impl_kw = dict(layer_stream=args.layer_stream, qk_impl=args.qk_impl,
                   ew_impl=args.ew_impl, stream_quant=args.stream_quant,
                   stream_group=args.stream_group,
                   residual_dtype=args.residual_dtype)
    if args.random_weights:
        pipe = OmniVideoX2XUnified.random_init(
            cfg, attn_impl=args.attn_impl, **impl_kw)
        pipe.sp = sp
    else:
        assert args.ckpt_dir, "--ckpt_dir required without --random_weights"
        from omnivideo_tpu.pipelines.loading import load_pipeline

        pipe = load_pipeline(cfg, args.ckpt_dir, attn_impl=args.attn_impl,
                             mesh=mesh, sp=sp, **impl_kw)
    if args.lora_adapters:
        from omnivideo_tpu.training.lora import (
            apply_lora_state,
            load_adapters_npz,
            merge_lora,
        )

        adapters = load_adapters_npz(args.lora_adapters)
        for expert in {id(pipe.low_noise): pipe.low_noise,
                       id(pipe.high_noise): pipe.high_noise}.values():
            expert.wan = merge_lora(apply_lora_state(expert.wan, adapters))
        logging.info("LoRA adapters merged from %s (%d sites)",
                     args.lora_adapters, len(adapters))
    if mesh is not None:
        from omnivideo_tpu.parallel.sharding import shard_params

        for expert in {id(pipe.low_noise): pipe.low_noise,
                       id(pipe.high_noise): pipe.high_noise}.values():
            expert.wan = shard_params(expert.wan, mesh)

    vlm = None
    if args.vlm_path:
        from omnivideo_tpu.models.qwen3vl.engine import Qwen3VLEngine, VLMConfig

        vlm = Qwen3VLEngine(VLMConfig(model_path=args.vlm_path, backend=args.vlm_backend, fsdp=args.vlm_fsdp))

    # data-parallel JSONL sharding (reference generate_omni_v2v.py:573-574)
    dp_rank = args.dp_rank if args.dp_rank is not None else jax.process_index()
    dp_ws = args.dp_world_size if args.dp_world_size is not None else jax.process_count()

    rows = [json.loads(l) for l in open(args.input) if l.strip()]
    outdir = Path(args.output_dir)
    outdir.mkdir(parents=True, exist_ok=True)

    for idx, row in enumerate(rows):
        if idx % dp_ws != dp_rank:
            continue
        sample_id = row.get("sample_id", row.get("id", idx))
        prompt = row.get("prompt", row.get("edit_prompt", ""))
        visual_emb = None
        if "source_clip_path" in row and pipe.vae is not None:
            from omnivideo_tpu.utils.video import (
                read_video_frames,
                sample_and_transform_frames,
            )

            frames, src_fps = read_video_frames(row["source_clip_path"])
            clip = sample_and_transform_frames(
                frames, frame_num, size, src_fps, cfg.sample_fps
            )
            visual_emb = pipe.vae.encode(jnp.asarray(clip)[None])[0]
            # slice to DiT latent frames (generate_omni_v2v.py:603-638)
            lat_f = (frame_num - 1) // cfg.vae.vae_stride[0] + 1
            visual_emb = visual_emb[:, :lat_f]

        ar_vision = None
        if vlm is not None:
            # online VLM stage: source caption -> target caption -> features
            # (reference generate_omni_v2v.py:641-710); then T5 re-encodes
            # [target_caption ; edit_prompt] as the text context (:712-729)
            feats = vlm.generate_caption_and_extract_features(
                row.get("source_clip_path"), prompt
            )
            ar_vision = jnp.asarray(feats["vlm_last_hidden_states"])
            prompt = (feats["target_caption"] + " " + prompt).strip()
            logging.info("sample %s target caption: %.120s", sample_id,
                         feats["target_caption"])
        elif args.features_dir:
            f = Path(args.features_dir) / f"sample_{sample_id}.npz"
            if f.exists():
                data = np.load(f, allow_pickle=True)
                if "vlm_last_hidden_states" in data:
                    v = np.asarray(data["vlm_last_hidden_states"], np.float32)
                    ar_vision = jnp.asarray(v[0] if v.ndim == 3 else v)
                if "target_caption" in data:
                    prompt = (str(data["target_caption"]) + " " + prompt).strip()

        if args.random_weights:
            # smoke path: deterministic pseudo-context instead of T5/VLM
            ctx = jnp.asarray(
                np.random.default_rng(abs(hash(prompt)) % 2**31)
                .standard_normal((16, cfg.dit.text_dim))
                .astype(np.float32)
            )
            kw = dict(precomputed_context=ctx,
                      precomputed_context_null=jnp.zeros_like(ctx),
                      ar_vision_input=ar_vision)
        else:
            kw = dict(input_prompt=prompt, ar_vision_input=ar_vision)

        t0 = time.time()
        if args.profile:
            from omnivideo_tpu.utils.observability import profile_trace

            prof_cm = profile_trace(args.profile)
        else:
            import contextlib

            prof_cm = contextlib.nullcontext()
        with prof_cm:
            aligned_emb = None
            if args.features_dir:
                f = Path(args.features_dir) / f"sample_{sample_id}.npz"
                if f.exists():
                    data = np.load(f, allow_pickle=True)
                    if "aligned_emb" in data:
                        a = np.asarray(data["aligned_emb"], np.float32)
                        aligned_emb = jnp.asarray(a[0] if a.ndim == 3 else a)
            video = pipe.generate(
                visual_emb=visual_emb,
                aligned_emb=aligned_emb,
                condition_mode=args.condition_mode,
                token_order=args.token_order,
                size=size,
                frame_num=frame_num,
                shift=shift,
                sample_solver=args.sample_solver,
                sampling_steps=steps,
                guide_scale=guide,
                seed=args.base_seed + idx,
                max_steps_per_call=args.max_steps_per_call,
                vae_dtype=(None if args.vae_dtype is None
                           else getattr(jnp, args.vae_dtype)),
                output_uint8=(frame_num > 1),  # quantize on device: 4x
                # smaller host fetch (the f32 fetch dominated e2e variance)
                **kw,
            )
        dt = time.time() - t0
        if frame_num == 1:  # t2i: save a still image
            from omnivideo_tpu.utils.video import save_image

            out = save_image(str(outdir / f"{sample_id}.png"), video[:, 0])
        else:
            out = save_video(
                str(outdir / f"{sample_id}.mp4"), video, fps=args.fps or cfg.sample_fps
            )
        logging.info("sample %s -> %s  (%.1fs)", sample_id, out, dt)


if __name__ == "__main__":
    main()
