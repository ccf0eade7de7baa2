"""Golden fixture for the i2v WanModel (v1 vanilla Wan,
wan/modules/model.py: i2v cross-attention + MLPProj clip conditioning).

Run from repo root:  python tools/dev/make_golden_i2v.py
"""

import importlib.machinery
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_golden_dit import _cpu_sdpa_flash_attention, _stub_diffusers

REF = Path("/root/reference/previous_version/Omni-Video1/nets/third_party/wan/modules")
OUT = Path(__file__).resolve().parents[2] / "tests" / "golden"


def main():
    _stub_diffusers()
    pkg = types.ModuleType("wanv1mods")
    pkg.__path__ = [str(REF)]
    sys.modules["wanv1mods"] = pkg
    for name in ("attention", "model"):
        spec = importlib.util.spec_from_file_location(f"wanv1mods.{name}", REF / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"wanv1mods.{name}"] = mod
        spec.loader.exec_module(mod)
    m = sys.modules["wanv1mods.model"]
    m.flash_attention = _cpu_sdpa_flash_attention

    torch.manual_seed(0)
    model = m.WanModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=16, in_dim=12,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=48, out_dim=4,
        num_heads=4, num_layers=2, qk_norm=True, cross_attn_norm=True, eps=1e-6,
    ).eval().float()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    B = 1
    x = torch.randn(B, 4, 3, 8, 8, generator=g)
    y = torch.randn(B, 8, 3, 8, 8, generator=g)  # 4 msk + 4 latent channels
    t = torch.tensor([250.0])
    ctx = [torch.randn(12, 48, generator=g)]
    clip_fea = torch.randn(B, 257, 1280, generator=g)

    with torch.no_grad():
        out = model([x[0]], t=t, context=ctx, seq_len=3 * 4 * 4,
                    clip_fea=clip_fea, y=[y[0]])

    arrays = {
        "x": x.numpy(), "y": y.numpy(), "t": t.numpy(), "ctx": ctx[0].numpy(),
        "clip_fea": clip_fea.numpy(), "out": torch.stack(out).numpy(),
    }
    for k, v in model.state_dict().items():
        arrays[f"sd::{k}"] = v.numpy()
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "i2v_tiny.npz", **arrays)
    print("wrote i2v_tiny.npz out:", arrays["out"].shape,
          "mean|out|:", float(np.abs(arrays["out"]).mean()))


if __name__ == "__main__":
    main()
