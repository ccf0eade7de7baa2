#!/usr/bin/env python
"""MLLM benchmark evaluation over the JAX Qwen3-VL decode path.

Role of the reference's llava/eval benchmark drivers
(previous_version/.../llava/eval/model_vqa_videomme.py, eval_mmmu.py,
eval_pope.py, eval_science_qa.py, eval_textvqa.py, ...): one engine over
the benchmark adapters in omnivideo_tpu/eval/vqa.py.

    python tools/eval_vlm.py --model_path <hf-qwen3vl-dir> \
        --questions pope.jsonl --format pope --report out.json

--format selects the native record shape + scoring + aggregates:
  generic    MME/POPE-shaped JSONL (open answers; MC if "options" present)
  pope       label yes/no; adds precision/recall/F1/yes-ratio
  mme        paired yes/no per image; adds per-category MME scores
  videomme   multiple-choice over videos (options list, letter answer)
  mmmu / scienceqa   multiple-choice over images
  textvqa    open answers scored by VQAv2 consensus min(matches/3, 1)

Preprocessing is native (models/qwen3vl/preprocess.py — no HF processor);
decoding is qwen3vl_greedy_decode (static-KV-cache lax.scan).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from omnivideo_tpu.eval.vqa import (  # noqa: E402
    ADAPTERS,
    adapt_rows,
    aggregate,
    build_prompt,
    evaluate,
    normalize_answer,
    score_open as score_answer,  # back-compat name
)


def make_jax_answer_fn(model_path: str, max_new_tokens: int = 8,
                       min_pixels: int = 4 * 28 * 28,
                       max_pixels: int = 16384 * 28 * 28):
    """Answer function over the JAX Qwen3-VL stack with native preprocessing."""
    import jax.numpy as jnp
    import numpy as np
    from transformers import AutoConfig, AutoTokenizer

    from omnivideo_tpu.io.hf_reader import load_hf_safetensors
    from omnivideo_tpu.models.qwen3vl.engine import Qwen3VLEngine
    from omnivideo_tpu.models.qwen3vl.full_model import (
        qwen3vl_greedy_decode,
        qwen3vl_hf_to_params,
    )
    from omnivideo_tpu.models.qwen3vl.preprocess import (
        build_vqa_ids,
        preprocess_image,
        preprocess_video,
    )

    tokenizer = AutoTokenizer.from_pretrained(model_path)
    hf_cfg = AutoConfig.from_pretrained(model_path)
    jax_cfg = Qwen3VLEngine.jax_cfg_from_hf(hf_cfg)
    sd = load_hf_safetensors(model_path)
    params = qwen3vl_hf_to_params(sd, jax_cfg)
    vc = hf_cfg.vision_config
    eos = tokenizer.eos_token_id

    def answer(row):
        q = build_prompt(row)
        patches = grid = None
        is_video = False
        if row.get("image"):
            patches, grid = preprocess_image(
                row["image"], patch_size=vc.patch_size,
                temporal_patch_size=vc.temporal_patch_size,
                merge_size=vc.spatial_merge_size,
                min_pixels=min_pixels, max_pixels=max_pixels)
        elif row.get("video"):
            patches, grid = preprocess_video(
                row["video"], patch_size=vc.patch_size,
                temporal_patch_size=vc.temporal_patch_size,
                merge_size=vc.spatial_merge_size)
            is_video = True
        n_vis = 0
        if patches is not None:
            n_vis = (grid[0] * grid[1] * grid[2]) // (vc.spatial_merge_size ** 2)
        ids = build_vqa_ids(tokenizer, q, n_vis, is_video=is_video)
        toks = qwen3vl_greedy_decode(
            params, jax_cfg, ids,
            jnp.asarray(patches) if patches is not None else None,
            grid, max_new_tokens=max_new_tokens, eos_token_id=eos,
            is_video=is_video,
        )
        return tokenizer.decode([t for t in np.asarray(toks).tolist() if t != eos],
                                skip_special_tokens=True).strip()

    return answer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True, help="HF Qwen3-VL checkpoint dir")
    ap.add_argument("--questions", required=True, help="benchmark JSONL")
    ap.add_argument("--format", default="generic", choices=sorted(ADAPTERS),
                    help="benchmark record shape / scoring / aggregates")
    ap.add_argument("--report", default=None, help="write results+summary JSON here")
    ap.add_argument("--max_new_tokens", type=int, default=8)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    rows = [json.loads(l) for l in open(args.questions) if l.strip()]
    if args.limit:
        rows = rows[: args.limit]
    rows = adapt_rows(rows, args.format)
    # media paths are relative to the questions file
    base = Path(args.questions).parent
    for r in rows:
        for k in ("image", "video"):
            if r.get(k) and not Path(r[k]).is_absolute():
                r[k] = str(base / r[k])

    # MC answers need room for "The answer is B." phrasings
    mnt = max(args.max_new_tokens, 12) if any(
        r.get("mode") == "mc" for r in rows) else args.max_new_tokens
    answer_fn = make_jax_answer_fn(args.model_path, mnt)
    results, summary = evaluate(rows, answer_fn, fmt=args.format)

    print(json.dumps(summary))
    if args.report:
        Path(args.report).write_text(
            json.dumps({"summary": summary, "results": results}, indent=1)
        )


if __name__ == "__main__":
    main()
