"""Generate golden parity fixtures for the Wan DiT from the reference model.

Runs the *reference* torch implementation (/root/reference/omnivideo/modules/
model.py) on CPU with a tiny config and random weights, and records inputs,
the raw torch state_dict, and outputs into tests/golden/wan_dit_tiny.npz.
Tests then convert the state_dict with omnivideo_tpu.io.torch_convert and
assert the JAX forward matches.

Requires torch (CPU). diffusers is stubbed (only ConfigMixin/ModelMixin/
register_to_config are touched); the reference's CUDA-only flash_attention is
monkeypatched with a semantically-equal torch SDPA (k_lens → key mask).

Run from repo root:  python tools/dev/make_golden_dit.py
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

REF = Path("/root/reference/omnivideo/modules")
OUT = Path(__file__).resolve().parents[2] / "tests" / "golden"


def _stub_diffusers():
    diffusers = types.ModuleType("diffusers")
    cu = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        return fn

    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config

    models = types.ModuleType("diffusers.models")
    mu = types.ModuleType("diffusers.models.modeling_utils")

    class ModelMixin(torch.nn.Module):
        pass

    mu.ModelMixin = ModelMixin
    diffusers.configuration_utils = cu
    diffusers.models = models
    models.modeling_utils = mu
    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.configuration_utils"] = cu
    sys.modules["diffusers.models"] = models
    sys.modules["diffusers.models.modeling_utils"] = mu


def _load_reference_model_module():
    _stub_diffusers()
    pkg = types.ModuleType("refmodules")
    pkg.__path__ = [str(REF)]
    sys.modules["refmodules"] = pkg
    for name in ("attention", "model"):
        spec = importlib.util.spec_from_file_location(
            f"refmodules.{name}", REF / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodules.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refmodules.model"]


def _cpu_sdpa_flash_attention(q, k, v, q_lens=None, k_lens=None, softmax_scale=None,
                              window_size=(-1, -1), **kw):
    """Semantic equivalent of reference flash_attention on CPU.

    q:[B,Lq,N,D] k,v:[B,Lk,N,D]; keys past k_lens[b] are masked out.
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    qt = q.transpose(1, 2).float()
    kt = k.transpose(1, 2).float()
    vt = v.transpose(1, 2).float()
    mask = None
    if k_lens is not None:
        ar = torch.arange(Lk)[None, :] < k_lens[:, None]
        mask = ar[:, None, None, :].expand(B, 1, Lq, Lk)
    out = F.scaled_dot_product_attention(qt, kt, vt, attn_mask=mask,
                                         scale=softmax_scale)
    return out.transpose(1, 2).to(q.dtype)


def main():
    torch.manual_seed(0)
    m = _load_reference_model_module()
    m.flash_attention = _cpu_sdpa_flash_attention

    cfg = dict(
        model_type="t2v",
        patch_size=(1, 2, 2),
        text_len=16,
        in_dim=4,
        dim=64,
        ffn_dim=128,
        freq_dim=32,
        text_dim=48,
        out_dim=4,
        num_heads=4,
        num_layers=2,
        qk_norm=True,
        cross_attn_norm=True,
        eps=1e-6,
    )
    model = m.WanModel(**cfg).eval().float()
    # randomize all weights (incl. the zero-initialized head) for a nontrivial fixture
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    B, C, Fr, H, W = 2, 4, 3, 8, 8
    x = torch.randn(B, C, Fr, H, W, generator=g)
    t = torch.tensor([250.0, 250.0])
    ctx_lens = [16, 9]  # second sample shorter: exercises zero-pad path
    ctx = [torch.randn(l, 48, generator=g) for l in ctx_lens]

    with torch.no_grad():
        out = model([x[i] for i in range(B)], t=t, context=ctx, seq_len=Fr * (H // 2) * (W // 2))
        out_padded = model([x[i] for i in range(B)], t=t, context=ctx, seq_len=100)

    arrays = {
        "x": x.numpy(),
        "t": t.numpy(),
        "ctx0": ctx[0].numpy(),
        "ctx1": ctx[1].numpy(),
        "out": torch.stack(out).numpy(),
        "out_padded": torch.stack(out_padded).numpy(),
    }
    for k, v in model.state_dict().items():
        arrays[f"sd::{k}"] = v.numpy()

    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "wan_dit_tiny.npz", **arrays)
    print("wrote", OUT / "wan_dit_tiny.npz", "out mean abs:", float(np.abs(arrays["out"]).mean()))


if __name__ == "__main__":
    main()
