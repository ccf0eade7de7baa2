"""HuggingFace checkpoint directory reader — no torch model instantiation.

Role of reference `omnivideo/vllm_model.py:24-103` (AutoModel load) and
`.../llava/train/train.py` (from_pretrained): they materialize a full torch
module just to get weights. Here we stream tensors straight from the
`*.safetensors` shards (bf16 preserved via ml_dtypes), which matters at 30B
scale — no 2× host-memory spike, no torch graph.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def load_hf_safetensors(
    model_dir: str, prefix_filter: Optional[str] = None
) -> Dict[str, np.ndarray]:
    """Read all tensors from a HF checkpoint dir (sharded or single file).

    prefix_filter: only load keys starting with this prefix (e.g.
    "model.language_model." to skip the vision tower of a VL checkpoint).
    """
    from safetensors import safe_open

    d = Path(model_dir)
    index = d / "model.safetensors.index.json"
    if index.exists():
        weight_map = json.loads(index.read_text())["weight_map"]
        files = sorted({d / f for f in weight_map.values()})
    else:
        files = sorted(d.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {model_dir}")

    sd: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(str(f), framework="np") as st:
            for k in st.keys():
                if prefix_filter and not k.startswith(prefix_filter):
                    continue
                sd[k] = st.get_tensor(k)
    return sd


def load_hf_config(model_dir: str) -> dict:
    return json.loads((Path(model_dir) / "config.json").read_text())


class FastTokenizer:
    """Minimal tokenizer over a checkpoint's tokenizer.json — `tokenizers`
    only, because in this image `import transformers` eagerly imports torch,
    which the TPU deployment path must never load. API subset used by the
    engine/preprocess stack: __call__(text, add_special_tokens)["input_ids"],
    decode(ids, skip_special_tokens), eos_token_id."""

    def __init__(self, model_dir: str):
        from tokenizers import Tokenizer

        d = Path(model_dir)
        self._tk = Tokenizer.from_file(str(d / "tokenizer.json"))
        self.eos_token_id = None
        tc = d / "tokenizer_config.json"
        if tc.exists():
            cfg = json.loads(tc.read_text())
            eos = cfg.get("eos_token")
            if isinstance(eos, dict):
                eos = eos.get("content")
            if eos is not None:
                self.eos_token_id = self._tk.token_to_id(eos)

    def __call__(self, text: str, add_special_tokens: bool = True):
        enc = self._tk.encode(text, add_special_tokens=add_special_tokens)
        return {"input_ids": enc.ids}

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self._tk.decode(list(int(i) for i in ids),
                               skip_special_tokens=skip_special_tokens)


def load_fast_tokenizer(model_dir: str) -> FastTokenizer:
    return FastTokenizer(model_dir)


def qwen3_text_config_from_hf(model_dir: str):
    """Build a Qwen3TextConfig from a HF config.json (plain Qwen3/Qwen3Moe or
    the text_config of a Qwen3-VL checkpoint)."""
    from ..models.qwen3vl.text_model import Qwen3TextConfig

    cfg = load_hf_config(model_dir)
    tc = cfg.get("text_config", cfg)
    return Qwen3TextConfig(
        vocab_size=tc["vocab_size"],
        hidden_size=tc["hidden_size"],
        intermediate_size=tc.get("intermediate_size", 0),
        num_hidden_layers=tc["num_hidden_layers"],
        num_attention_heads=tc["num_attention_heads"],
        num_key_value_heads=tc["num_key_value_heads"],
        head_dim=tc.get("head_dim", tc["hidden_size"] // tc["num_attention_heads"]),
        rope_theta=tc.get("rope_theta", 1e6),
        rms_norm_eps=tc.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=tc.get("tie_word_embeddings", False),
        num_experts=tc.get("num_experts"),
        num_experts_per_tok=tc.get("num_experts_per_tok", 8),
        moe_intermediate_size=tc.get("moe_intermediate_size", 768),
        norm_topk_prob=tc.get("norm_topk_prob", True),
    )
