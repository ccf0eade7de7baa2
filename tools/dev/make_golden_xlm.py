"""Golden fixture for the XLM-Roberta text tower (reference
wan/modules/xlm_roberta.py + XLMRobertaWithHead from wan/modules/clip.py).

Run from repo root:  python tools/dev/make_golden_xlm.py
"""

import importlib.machinery
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

REF = Path("/root/reference/previous_version/Omni-Video1/nets/third_party/wan/modules")
OUT = Path(__file__).resolve().parents[2] / "tests" / "golden"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def main():
    tv = _stub("torchvision")
    _stub("torchvision.transforms", Compose=lambda *a, **k: None,
          Resize=lambda *a, **k: None, ToTensor=lambda *a, **k: None,
          Normalize=lambda *a, **k: None,
          InterpolationMode=types.SimpleNamespace(BICUBIC=3))
    tv.transforms = sys.modules["torchvision.transforms"]
    _stub("ftfy", fix_text=lambda s: s)

    pkg = types.ModuleType("wanmods")
    pkg.__path__ = [str(REF)]
    sys.modules["wanmods"] = pkg
    for name in ("attention", "tokenizers", "xlm_roberta", "clip"):
        spec = importlib.util.spec_from_file_location(f"wanmods.{name}", REF / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"wanmods.{name}"] = mod
        spec.loader.exec_module(mod)
    clip = sys.modules["wanmods.clip"]

    torch.manual_seed(0)
    model = clip.XLMRobertaWithHead(
        vocab_size=64, max_seq_len=32, type_size=1, pad_id=1,
        dim=48, out_dim=24, num_heads=4, num_layers=3,
        post_norm=True, dropout=0.0,
    ).eval().float()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    # two samples with different pad patterns (pad_id=1)
    ids = torch.tensor([
        [0, 5, 9, 13, 21, 34, 2, 1, 1, 1],
        [0, 7, 8, 2, 1, 1, 1, 1, 1, 1],
    ], dtype=torch.long)
    with torch.no_grad():
        hidden = super(clip.XLMRobertaWithHead, model).forward(ids)
        pooled = model(ids)

    arrays = {"ids": ids.numpy(), "hidden": hidden.numpy(), "pooled": pooled.numpy()}
    for k, v in model.state_dict().items():
        arrays[f"sd::{k}"] = v.numpy()
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "xlm_tiny.npz", **arrays)
    print("wrote xlm_tiny.npz hidden:", hidden.shape, "pooled:", pooled.shape)


if __name__ == "__main__":
    main()
