"""Golden fixture for the Wan2.2 VAE from the reference torch implementation
(/root/reference/omnivideo/modules/vae2_2.py — torch + einops only).

Run from repo root:  python tools/dev/make_golden_vae22.py
"""

import importlib.util
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference/omnivideo/modules/vae2_2.py")
OUT = Path(__file__).resolve().parents[2] / "tests" / "golden"


def main():
    spec = importlib.util.spec_from_file_location("refvae22", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    torch.manual_seed(0)
    vae = m.WanVAE_(
        dim=8, dec_dim=12, z_dim=6, dim_mult=[1, 2, 4, 4], num_res_blocks=2,
        attn_scales=[], temperal_downsample=[False, True, True],
    ).eval().float()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in vae.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    x = torch.randn(1, 3, 9, 32, 32, generator=g)
    with torch.no_grad():
        z = vae.encode(x, [0.0, 1.0])
        z_in = torch.randn(1, 6, 3, 2, 2, generator=g)
        rec = vae.decode(z_in, [0.0, 1.0])

    arrays = {"x": x.numpy(), "z": z.numpy(), "z_in": z_in.numpy(), "rec": rec.numpy()}
    for k, v in vae.state_dict().items():
        arrays[f"sd::{k}"] = v.numpy()
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "vae22_tiny.npz", **arrays)
    print("wrote vae22_tiny.npz  z:", z.shape, " rec:", rec.shape)


if __name__ == "__main__":
    main()
