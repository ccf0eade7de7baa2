#!/usr/bin/env python
"""Stage-1 offline feature extraction: VAE latents + T5 text embeddings.

Role of reference
`previous_version/Omni-Video1/tools/data_prepare/vae_feature_extract.py:246`
(and DATA_PREPARE.md): reads a JSON/JSONL manifest of {video, caption} (and
optionally {source_video} for editing pairs), encodes videos with the causal
3D VAE and captions with umT5, and writes per-sample .npz feature files
consumable by training/dataset.py.

Manifest rows:
  {"id": ..., "video": path, "caption": str[, "source_video": path]}

Usage:
  python tools/data_prepare/vae_feature_extract.py \
      --manifest data.jsonl --ckpt_dir <ckpts> --output_dir features/ \
      --size 832*480 --frame_num 81
"""

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--size", default="832*480")
    p.add_argument("--frame_num", type=int, default=81)
    p.add_argument("--host_id", type=int, default=0)
    p.add_argument("--num_hosts", type=int, default=1)
    p.add_argument("--random_weights", action="store_true",
                   help="random VAE/T5 (pipeline smoke testing)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from omnivideo_tpu.configs import SIZE_CONFIGS, WAN_CONFIGS
    from omnivideo_tpu.models.vae2_1 import Wan21VAE, init_vae
    from omnivideo_tpu.utils.video import read_video_frames, sample_and_transform_frames

    cfg = WAN_CONFIGS[args.task]
    size = SIZE_CONFIGS.get(args.size) or tuple(int(v) for v in args.size.split("*"))

    if args.random_weights:
        vae = Wan21VAE.create(init_vae(jax.random.PRNGKey(0), cfg.vae), cfg.vae)
        text_encoder = None
    else:
        from omnivideo_tpu.pipelines.loading import load_pipeline

        pipe = load_pipeline(cfg, args.ckpt_dir)
        vae, text_encoder = pipe.vae, pipe.text_encoder

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows = [json.loads(l) for l in open(args.manifest) if l.strip()]

    for idx, row in enumerate(rows):
        if idx % args.num_hosts != args.host_id:
            continue
        sid = row.get("id", idx)
        frames, fps = read_video_frames(row["video"])
        clip = sample_and_transform_frames(frames, args.frame_num, size, fps,
                                           cfg.sample_fps)
        lat = np.asarray(vae.encode(jnp.asarray(clip)[None])[0])
        sample = {"latent_feature_tgt": lat, "prompt": row.get("caption", "")}
        if "source_video" in row:
            sframes, sfps = read_video_frames(row["source_video"])
            sclip = sample_and_transform_frames(sframes, args.frame_num, size,
                                                sfps, cfg.sample_fps)
            sample["latent_feature"] = np.asarray(vae.encode(jnp.asarray(sclip)[None])[0])
        else:
            sample["latent_feature"] = lat
        if text_encoder is not None and row.get("caption"):
            sample["text_emb"] = np.asarray(text_encoder([row["caption"]])[0])
        np.savez_compressed(out / f"sample_{sid}.npz", **sample)
        logging.info("wrote sample_%s.npz  latent %s", sid, lat.shape)


if __name__ == "__main__":
    main()
