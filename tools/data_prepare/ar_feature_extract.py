#!/usr/bin/env python
"""Stage-2 offline feature extraction: VLM (AR model) conditioning features.

Role of reference
`previous_version/Omni-Video1/tools/data_prepare/ar_feature_extract.py:123`:
appends `vlm_last_hidden_states` (and captions) to the stage-1 feature files,
running the Qwen3-VL engine per sample.

Usage:
  python tools/data_prepare/ar_feature_extract.py \
      --features_dir features/ --manifest data.jsonl --vlm_path <qwen3-vl>
"""

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--features_dir", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--vlm_path", required=True)
    p.add_argument("--backend", default="hf", choices=["hf", "jax"])
    p.add_argument("--host_id", type=int, default=0)
    p.add_argument("--num_hosts", type=int, default=1)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import numpy as np

    from omnivideo_tpu.models.qwen3vl.engine import Qwen3VLEngine, VLMConfig

    engine = Qwen3VLEngine(VLMConfig(model_path=args.vlm_path, backend=args.backend))
    rows = [json.loads(l) for l in open(args.manifest) if l.strip()]
    fdir = Path(args.features_dir)

    for idx, row in enumerate(rows):
        if idx % args.num_hosts != args.host_id:
            continue
        sid = row.get("id", idx)
        path = fdir / f"sample_{sid}.npz"
        if not path.exists():
            logging.warning("missing stage-1 features for %s; skipping", sid)
            continue
        feats = engine.generate_caption_and_extract_features(
            row.get("source_video"), row.get("caption", row.get("edit_prompt", ""))
        )
        data = dict(np.load(path, allow_pickle=True))
        data["vlm_last_hidden_states"] = feats["vlm_last_hidden_states"]
        data["source_caption"] = feats["source_caption"]
        data["target_caption"] = feats["target_caption"]
        np.savez_compressed(path, **data)
        logging.info("updated %s (vlm seq_len %d)", path.name, feats["seq_len"])


if __name__ == "__main__":
    main()
