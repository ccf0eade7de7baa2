"""Pipeline checkpoint loading from the reference's on-disk layout.

Layout (reference README.md:353-362 and loading code
tools/inference/generate_omni_v2v.py:495-557, x2x_gen_unified.py:214-226,
modules/t5.py:495, modules/vae2_1.py:611-613):

    ckpt_dir/
      high_noise_model/model.pt        # fine-tuned unified expert (or
      low_noise_model/model.pt         #   diffusers subfolder with config.json)
      special_tokens.pkl
      models_t5_umt5-xxl-enc-bf16.pth
      Wan2.1_VAE.pth
      google/umt5-xxl/                 # tokenizer files

Reading is TORCH-FREE by default: io/torch_reader.py parses the torch zip
pickle format directly (numpy + ml_dtypes, incl. bf16); torch (CPU) is only a
fallback for exotic pickles. safetensors subfolders are read via
safetensors.numpy.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..configs.base import PipelineConfig
from ..io.torch_convert import (
    split_unified_state_dict,
    to_jnp,
    unified_companions_to_params,
    wan_state_dict_to_params,
)
from ..models.t5 import T5EncoderModel, t5_state_dict_to_params
from ..models.vae2_1 import Wan21VAE, vae_state_dict_to_params
from ..models.wan_dit import cast_wan_params

log = logging.getLogger(__name__)


def _torch_load(path):
    """Torch-free by default; torch-based fallback for exotic pickles."""
    from ..io.torch_reader import read_torch_checkpoint

    try:
        return read_torch_checkpoint(str(path))
    except Exception as e:
        log.warning("torch-free reader failed on %s (%s); falling back to torch", path, e)
        import torch

        return torch.load(path, map_location="cpu", weights_only=False)


def _sd_to_numpy(sd):
    from ..io.torch_reader import to_float_numpy

    out = {}
    for k, v in sd.items():
        if type(v).__module__.startswith("torch"):
            out[k] = v.float().numpy()
        else:
            out[k] = to_float_numpy(v)
    return out


def load_expert(
    cfg: PipelineConfig, ckpt_dir: str, subfolder: str, dtype=jnp.bfloat16
):
    """Load one expert: fine-tuned `model.pt` (unified state dict) or a
    diffusers subfolder (config.json + weights)."""
    from .x2x import ExpertParams

    sub = Path(ckpt_dir) / subfolder
    pt = sub / "model.pt"
    if pt.exists():
        sd = _sd_to_numpy(_torch_load(pt))
        wan_sd, comp_sd = split_unified_state_dict(sd)
        wan = wan_state_dict_to_params(wan_sd, cfg.dit.num_layers, cfg.dit.cross_attn_norm)
        comp = unified_companions_to_params(comp_sd)
    else:
        # diffusers layout: wan_model/ inside the subfolder or flat
        wan_dir = sub / "wan_model" if (sub / "wan_model").exists() else sub
        wan_sd = _load_diffusers_weights(wan_dir)
        wan = wan_state_dict_to_params(wan_sd, cfg.dit.num_layers, cfg.dit.cross_attn_norm)
        comp = {}
        for name in ("vlm_norm", "vlm_proj", "visual_context_adapter"):
            f = sub / f"{name}_pytorch_model.bin"
            if f.exists():
                comp.update(
                    unified_companions_to_params(
                        {f"{name}.{k}" if not k.startswith(name) else k: v
                         for k, v in _sd_to_numpy(_torch_load(f)).items()}
                    )
                )
    wan = cast_wan_params(to_jnp(wan), dtype)
    return ExpertParams(wan=wan, companions=to_jnp(comp, dtype=jnp.float32))


def _load_diffusers_weights(folder: Path):
    st = list(folder.glob("*.safetensors"))
    if st:
        from safetensors.numpy import load_file

        sd = {}
        for f in st:
            sd.update(load_file(str(f)))
        return sd
    bins = list(folder.glob("*.bin")) + list(folder.glob("*.pth")) + list(folder.glob("*.pt"))
    assert bins, f"no weights found in {folder}"
    sd = {}
    for f in bins:
        sd.update(_sd_to_numpy(_torch_load(f)))
    return sd


def load_pipeline(
    cfg: PipelineConfig,
    ckpt_dir: str,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    load_t5: bool = True,
    load_vae: bool = True,
    mesh=None,
    sp=None,
    **pipe_kwargs,
):
    """Assemble the full OmniVideoX2XUnified from a reference checkpoint dir.

    mesh: shard expert DiT params over the 'fsdp' axis at load time — required
    for A14B (14B bf16 params exceed one chip's HBM; role of reference
    dit_fsdp, x2x_gen_unified.py:184-187). sp: SPConfig for sequence-parallel
    denoising.
    """
    from ..models.unified import load_special_tokens_pkl
    from .x2x import OmniVideoX2XUnified

    low = load_expert(cfg, ckpt_dir, cfg.low_noise_checkpoint, dtype)
    high = low
    if cfg.dual_expert:
        high = load_expert(cfg, ckpt_dir, cfg.high_noise_checkpoint, dtype)
    if mesh is not None:
        from ..parallel.sharding import shard_params

        low.wan = shard_params(low.wan, mesh)
        if high is not low:
            high.wan = shard_params(high.wan, mesh)

    vae = None
    if load_vae:
        vae_path = Path(ckpt_dir) / cfg.vae_checkpoint
        if vae_path.exists():
            vsd = _sd_to_numpy(_torch_load(vae_path))
            vae = Wan21VAE.create(to_jnp(vae_state_dict_to_params(vsd, cfg.vae)), cfg.vae)
        else:
            log.warning("VAE checkpoint %s missing", vae_path)

    text_encoder = None
    if load_t5:
        t5_path = Path(ckpt_dir) / cfg.t5_checkpoint
        tok_path = Path(ckpt_dir) / cfg.t5_tokenizer
        if t5_path.exists():
            tsd = _sd_to_numpy(_torch_load(t5_path))
            t5_params = to_jnp(t5_state_dict_to_params(tsd, cfg.t5), dtype=dtype)
            # norms stay f32
            t5_params["norm"] = t5_params["norm"].astype(jnp.float32)
            text_encoder = T5EncoderModel(
                t5_params,
                cfg.t5,
                tokenizer_path=str(tok_path) if tok_path.exists() else None,
            )
        else:
            log.warning("T5 checkpoint %s missing; text encoding disabled", t5_path)

    special = None
    st_path = Path(ckpt_dir) / "special_tokens.pkl"
    if st_path.exists():
        special = load_special_tokens_pkl(str(st_path))
        log.info("loaded special tokens: %s", list(special))

    return OmniVideoX2XUnified(
        cfg, low, high, vae=vae, special_tokens=special,
        text_encoder=text_encoder, attn_impl=attn_impl, sp=sp,
        **pipe_kwargs,  # layer_stream / qk_impl / ew_impl
    )
