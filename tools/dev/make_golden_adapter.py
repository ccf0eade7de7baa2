"""Golden fixture for DM_Adapter from the reference torch implementation
(imports standalone: torch + torch.distributed only; cuda device creation in
__init__ is patched out).

Run from repo root:  python tools/dev/make_golden_adapter.py
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference/previous_version/Omni-Video1/nets/omni/modules/adapter.py")
OUT = Path(__file__).resolve().parents[2] / "tests" / "golden"


def main():
    torch.device_orig = torch.device
    spec = importlib.util.spec_from_file_location("refadapter", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    torch.manual_seed(0)
    # patch cuda device in __init__ by building on cpu
    cls = m.DM_Adapter
    orig_init = cls.__init__

    def patched_init(self, *a, **kw):
        dev = torch.device
        torch.device = lambda *aa, **kk: dev("cpu")
        try:
            orig_init(self, *a, **kw)
        finally:
            torch.device = dev

    cls.__init__ = patched_init
    ad = cls(in_channels=24, out_channels=32, learnable_query_length=8).eval().float()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ad.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    x = torch.randn(2, 10, 24, generator=g)
    with torch.no_grad():
        out = ad(x)
    arrays = {"x": x.numpy(), "out": out.numpy()}
    for k, v in ad.state_dict().items():
        arrays[f"sd::{k}"] = v.numpy()
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "adapter_tiny.npz", **arrays)
    print("wrote adapter_tiny.npz out:", out.shape, "mean|out|:", float(out.abs().mean()))


if __name__ == "__main__":
    main()
