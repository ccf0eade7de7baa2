#!/usr/bin/env python
"""Offline conversation tokenization: chat-transcript JSON/JSONL → a directory
of per-sample .npz files (`ids`, `labels`) that training/sft.py::SFTDataset
consumes directly.

Role of the reference's on-the-fly LazySupervisedDataset tokenization
(llava/data/dataset.py:327-440) moved offline — the same split the framework
already uses for VAE/AR features (tools/data_prepare/*_feature_extract.py):
tokenize once on host, train from fixed arrays.

  python tools/data_prepare/sft_tokenize.py \
      --input conversations.jsonl --tokenizer <hf dir> --output_dir out/
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="conversation JSON/JSONL")
    p.add_argument("--tokenizer", required=True, help="HF tokenizer dir")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_len", type=int, default=0,
                   help="drop samples longer than this (0 = keep all)")
    args = p.parse_args()

    from transformers import AutoTokenizer

    from omnivideo_tpu.training.conversation import ConversationDataset

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    ds = ConversationDataset(args.input, tok)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    kept = 0
    for i in range(len(ds)):
        s = ds[i]
        if args.max_len and len(s["ids"]) > args.max_len:
            continue
        np.savez(out / f"sample_{i:06d}.npz", ids=s["ids"], labels=s["labels"])
        kept += 1
    print(f"wrote {kept}/{len(ds)} samples to {out}")


if __name__ == "__main__":
    main()
