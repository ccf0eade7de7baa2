#!/usr/bin/env python
"""Export a fast tokenizer.json from a sentencepiece spiece.model — offline,
without the sentencepiece runtime (utils/spm_convert.py).

A reference checkpoint dir (google/umt5-xxl layout: spiece.model only,
reference omnivideo/modules/tokenizers.py:36) becomes loadable by this
repo's HuggingfaceTokenizer after one run:

    python tools/export_tokenizer.py --dir /path/to/umt5-xxl
    python tools/export_tokenizer.py --spiece sp.model --out tok.json
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=None, help="checkpoint dir with spiece.model")
    ap.add_argument("--spiece", default=None, help="explicit spiece.model path")
    ap.add_argument("--out", default=None, help="output tokenizer.json path")
    ap.add_argument("--extra_ids", type=int, default=0,
                    help="number of <extra_id_N> sentinel tokens to append "
                         "(T5 uses 100; umT5 bakes them into the vocab: 0)")
    ap.add_argument("--check", action="store_true",
                    help="round-trip a sample string through the exported "
                         "tokenizer and print the ids")
    args = ap.parse_args()

    from omnivideo_tpu.utils.spm_convert import convert_spiece_to_fast

    sp = Path(args.spiece) if args.spiece else Path(args.dir) / "spiece.model"
    assert sp.exists(), f"{sp} not found"
    out = convert_spiece_to_fast(sp, args.out, extra_ids=args.extra_ids)
    print(f"wrote {out}")

    if args.check:
        from transformers import PreTrainedTokenizerFast

        tok = PreTrainedTokenizerFast(tokenizer_file=str(out), unk_token="<unk>",
                                      eos_token="</s>", pad_token="<pad>")
        sample = "A cinematic shot of a corgi surfing at sunset."
        print("ids:", tok(sample)["input_ids"])


if __name__ == "__main__":
    main()
