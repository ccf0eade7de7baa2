"""Golden fixture for the CLIP VisionTransformer from the reference
(wan/modules/clip.py; torchvision/flash-attn stubbed, SDPA substituted).

Run from repo root:  python tools/dev/make_golden_clip.py
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
          Normalize=lambda *a, **k: None, InterpolationMode=types.SimpleNamespace(BICUBIC=3))
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

    def sdpa_flash(q, k, v, q_lens=None, k_lens=None, dropout_p=0.0,
                   softmax_scale=None, causal=False, version=None, **kw):
        qt, kt, vt = (t.transpose(1, 2).float() for t in (q, k, v))
        o = F.scaled_dot_product_attention(qt, kt, vt, is_causal=causal,
                                           scale=softmax_scale)
        return o.transpose(1, 2).to(q.dtype)

    clip.flash_attention = sdpa_flash

    torch.manual_seed(0)
    vit = clip.VisionTransformer(
        image_size=32, patch_size=8, dim=64, mlp_ratio=4, out_dim=32,
        num_heads=4, num_layers=3, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu", norm_eps=1e-5,
    ).eval().float()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in vit.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    x = torch.randn(2, 3, 32, 32, generator=g)
    with torch.no_grad():
        out31 = vit(x, use_31_block=True)

    arrays = {"x": x.numpy(), "out31": out31.numpy()}
    for k, v in vit.state_dict().items():
        arrays[f"sd::{k}"] = v.numpy()
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "clip_tiny.npz", **arrays)
    print("wrote clip_tiny.npz out31:", out31.shape)


if __name__ == "__main__":
    main()
