#!/usr/bin/env python
"""Pre-convert a reference torch checkpoint bundle into torch-free .npz packs.

pipelines/loading.py ingests the reference layout directly (using torch CPU to
read pickles at load time); this tool converts once so serving hosts never
need torch: each component becomes an .npz of flattened param leaves that
to_jnp-style loaders can restore.

Usage:
  python tools/convert_checkpoint.py --ckpt_dir <reference-ckpts> \
      --task t2v-A14B --output_dir converted/
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _flatten(tree, prefix=""):
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(
            str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--task", default="t2v-A14B")
    p.add_argument("--output_dir", required=True)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.pipelines.loading import load_pipeline

    cfg = WAN_CONFIGS[args.task]
    pipe = load_pipeline(cfg, args.ckpt_dir, dtype=jnp.bfloat16)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    packs = {"low_noise.wan": pipe.low_noise.wan,
             "low_noise.companions": pipe.low_noise.companions}
    if pipe.high_noise is not pipe.low_noise:
        packs["high_noise.wan"] = pipe.high_noise.wan
        packs["high_noise.companions"] = pipe.high_noise.companions
    if pipe.vae is not None:
        packs["vae"] = pipe.vae.params
    if pipe.text_encoder is not None:
        packs["t5"] = pipe.text_encoder.params
    if pipe.special_tokens:
        packs["special_tokens"] = pipe.special_tokens

    for name, tree in packs.items():
        flat = _flatten(tree)
        np.savez_compressed(out / f"{name}.npz", **flat)
        n_params = sum(v.size for v in flat.values())
        logging.info("wrote %s.npz (%d leaves, %.1fM params)", name, len(flat), n_params / 1e6)


if __name__ == "__main__":
    main()
