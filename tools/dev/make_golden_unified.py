"""Golden fixture for the unified mixed-condition model (reference
omnivideo/modules/unified_model.py) — validates tight concatenation order,
special-token sandwiching, truncation, vlm_norm/vlm_proj, and the
VisualContextAdapter end-to-end against the torch implementation.

Run from repo root:  python tools/dev/make_golden_unified.py
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_golden_dit import _cpu_sdpa_flash_attention, _load_reference_model_module

REF = Path("/root/reference/omnivideo/modules")
OUT = Path(__file__).resolve().parents[2] / "tests" / "golden"


def main():
    model_mod = _load_reference_model_module()
    model_mod.flash_attention = _cpu_sdpa_flash_attention

    for name in ("visual_context_adapter", "unified_model"):
        spec = importlib.util.spec_from_file_location(
            f"refmodules.{name}", REF / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodules.{name}"] = mod
        spec.loader.exec_module(mod)
    um = sys.modules["refmodules.unified_model"]

    torch.manual_seed(0)
    wan_cfg = dict(
        patch_size=(1, 2, 2), text_len=512, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
        qk_norm=True, cross_attn_norm=True, eps=1e-6,
    )
    model = um.UnifiedWanWithMixedConditionModel(
        wan_config=wan_cfg,
        vlm_in_dim=24,
        use_visual_context_adapter=True,
        visual_context_adapter_patch_size=(1, 4, 4),
        max_context_len=40,  # small → exercises truncation
    ).eval().float()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    B = 1
    x = torch.randn(B, 4, 3, 8, 8, generator=g)
    t = torch.tensor([250.0])
    ctx = [torch.randn(10, 48, generator=g)]
    ar_vision = [torch.randn(7, 24, generator=g)]
    visual_emb = [torch.randn(4, 3, 8, 8, generator=g)]  # [C,F,H,W] latents
    special = {
        k: torch.randn(1, 48, generator=g) * 0.05
        for k in ("<img_st>", "<img_ed>", "<prp_st>", "<prp_ed>")
    }

    with torch.no_grad():
        out = model(
            [x[0]],
            t=t,
            context=ctx,
            ar_vision_input=ar_vision,
            visual_emb=visual_emb,
            seq_len=3 * 4 * 4,
            special_token_dict=special,
            classifier_free_ratio=0.0,
            condition_mode="full",
        )

    arrays = {
        "x": x.numpy(),
        "t": t.numpy(),
        "ctx": ctx[0].numpy(),
        "ar_vision": ar_vision[0].numpy(),
        "visual_emb": visual_emb[0].numpy(),
        "out": torch.stack(out).numpy(),
    }
    for k, v in special.items():
        arrays[f"st::{k}"] = v.numpy()
    for k, v in model.state_dict().items():
        arrays[f"sd::{k}"] = v.numpy()
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "unified_tiny.npz", **arrays)
    print("wrote unified_tiny.npz out:", arrays["out"].shape,
          "mean |out|:", float(np.abs(arrays["out"]).mean()))


if __name__ == "__main__":
    main()
