"""Generate golden parity fixtures for the causal 3D VAE from the reference.

Runs the reference torch implementation (/root/reference/omnivideo/modules/
vae2_1.py — imports standalone: torch + einops only) with a shrunken but
structurally-identical config (same dim_mult / temporal schedule as
Wan2.1_VAE) on CPU, recording the state_dict, an encode and a decode.

Run from repo root:  python tools/dev/make_golden_vae.py
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference/omnivideo/modules/vae2_1.py")
OUT = Path(__file__).resolve().parents[2] / "tests" / "golden"


def main():
    spec = importlib.util.spec_from_file_location("refvae", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    torch.manual_seed(0)
    cfg = dict(
        dim=8,
        z_dim=4,
        dim_mult=[1, 2, 4, 4],
        num_res_blocks=2,
        attn_scales=[],
        temperal_downsample=[False, True, True],
    )
    vae = m.WanVAE_(**cfg).eval().float()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in vae.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    x = torch.randn(1, 3, 9, 16, 16, generator=g)  # T = 1+4k with k=2
    with torch.no_grad():
        z = vae.encode(x, [0.0, 1.0])
        z_in = torch.randn(1, 4, 3, 2, 2, generator=g)
        rec = vae.decode(z_in, [0.0, 1.0])

    arrays = {
        "x": x.numpy(),
        "z": z.numpy(),
        "z_in": z_in.numpy(),
        "rec": rec.numpy(),
    }
    for k, v in vae.state_dict().items():
        arrays[f"sd::{k}"] = v.numpy()
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / "vae_tiny.npz", **arrays)
    print("wrote vae_tiny.npz  z:", z.shape, " rec:", rec.shape)


if __name__ == "__main__":
    main()
