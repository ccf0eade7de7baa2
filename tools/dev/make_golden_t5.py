"""Golden fixture for the umT5 encoder from the reference torch implementation
(/root/reference/omnivideo/modules/t5.py — needs only torch; ftfy/transformers
in its tokenizers import are stubbed since we only exercise the encoder).

Run from repo root:  python tools/dev/make_golden_t5.py
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference/omnivideo/modules")
OUT = Path(__file__).resolve().parents[2] / "tests" / "golden"


def _stub_tokenizer_deps():
    import importlib.machinery

    for name in ("ftfy",):
        m = types.ModuleType(name)
        m.fix_text = lambda s: s
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
    # tokenizers.py also imports transformers (present) and regex (present)


def main():
    _stub_tokenizer_deps()
    # t5.py evaluates torch.cuda.current_device() in a default arg at import
    torch.cuda.current_device = lambda: "cpu"
    pkg = types.ModuleType("reft5pkg")
    pkg.__path__ = [str(REF)]
    sys.modules["reft5pkg"] = pkg
    for name in ("tokenizers", "t5"):
        spec = importlib.util.spec_from_file_location(f"reft5pkg.{name}", REF / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"reft5pkg.{name}"] = mod
        spec.loader.exec_module(mod)
    t5 = sys.modules["reft5pkg.t5"]

    torch.manual_seed(0)
    enc = t5.T5Encoder(
        vocab=100, dim=32, dim_attn=32, dim_ffn=64, num_heads=4, num_layers=3,
        num_buckets=8, shared_pos=False, dropout=0.0,
    ).eval().float()

    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in enc.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    ids = torch.randint(0, 100, (2, 16), generator=g)
    mask = torch.ones(2, 16, dtype=torch.long)
    mask[1, 9:] = 0
    with torch.no_grad():
        out = enc(ids, mask)

    arrays = {"ids": ids.numpy(), "mask": mask.numpy(), "out": out.numpy()}
    for k, v in enc.state_dict().items():
        arrays[f"sd::{k}"] = v.numpy()
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "t5_tiny.npz", **arrays)
    print("wrote t5_tiny.npz out:", out.shape, "mean|out|:", float(out.abs().mean()))


if __name__ == "__main__":
    main()
