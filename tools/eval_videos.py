#!/usr/bin/env python
"""Video generation evaluation harness.

Role of the reference's eval layer (P16 — which only covers MLLM benchmarks;
the reference has *no* video-generation metric harness, SURVEY.md §4.5):
computes PSNR/SSIM vs references (editing fidelity), temporal consistency
(flicker), and motion magnitude (frozen-frame detection) over directories of
generated clips, emitting a JSON report.

Usage:
  python tools/eval_videos.py --generated outputs/ [--reference refs/] \
      --report report.json
"""

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from omnivideo_tpu.utils.metrics import evaluate_pair, evaluate_single
from omnivideo_tpu.utils.video import read_video_frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--generated", required=True)
    p.add_argument("--reference", default=None)
    p.add_argument("--report", default="eval_report.json")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    gen_dir = Path(args.generated)
    exts = (".mp4", ".gif", ".npz")
    files = sorted(f for f in gen_dir.iterdir() if f.suffix in exts)
    assert files, f"no videos in {gen_dir}"

    per_sample = {}
    for f in files:
        frames, _ = read_video_frames(str(f))
        if args.reference:
            ref_f = None
            for ext in exts:
                cand = Path(args.reference) / (f.stem + ext)
                if cand.exists():
                    ref_f = cand
                    break
            if ref_f is None:
                logging.warning("no reference for %s; no-reference metrics only", f.name)
                per_sample[f.name] = evaluate_single(frames)
                continue
            ref, _ = read_video_frames(str(ref_f))
            per_sample[f.name] = evaluate_pair(frames, ref)
        else:
            per_sample[f.name] = evaluate_single(frames)

    keys = sorted({k for m in per_sample.values() for k in m})
    summary = {
        k: float(np.mean([m[k] for m in per_sample.values() if k in m and np.isfinite(m[k])]))
        for k in keys
    }
    report = {"summary": summary, "per_sample": per_sample, "n": len(per_sample)}
    json.dump(report, open(args.report, "w"), indent=2)
    logging.info("summary: %s", summary)
    logging.info("report -> %s", args.report)


if __name__ == "__main__":
    main()
