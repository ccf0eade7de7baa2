"""Emit a COMPLETE tiny checkpoint bundle in the reference's documented
on-disk layout, with every artifact produced by the TORCH REFERENCE modules
themselves (state_dicts of /root/reference/omnivideo/modules/{unified_model,
vae2_1,t5}.py instances) — the adversarial loading fixture VERDICT r2
item 10 asks for:

    tests/golden/bundle_tiny/
      high_noise_model/model.pt        # {"module": sd}  (trainer DDP wrap)
      low_noise_model/model.pt         # {"model": sd}   (trainer save wrap)
      special_tokens.pkl
      models_t5_umt5-xxl-enc-bf16.pth  # bf16, like the real file
      Wan2.1_VAE.pth

The two .pt wrappers exercise BOTH unwrap branches of the reference loader
(generate_omni_v2v.py:501-513: 'module' elif 'model') through our
io/torch_convert.unwrap_state_dict; the bf16 T5 .pth exercises the
torch-free bf16 zip reader (io/torch_reader.py + ml_dtypes).

Run from repo root:  python tools/dev/make_golden_bundle.py
"""

import importlib.machinery
import importlib.util
import sys
import types
from pathlib import Path

import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_golden_dit import _cpu_sdpa_flash_attention, _load_reference_model_module

REF = Path("/root/reference/omnivideo/modules")
OUT = Path(__file__).resolve().parents[2] / "tests" / "golden" / "bundle_tiny"

# tiny dims — must match tests/test_loading.py::BUNDLE_CFG
WAN_CFG = dict(
    patch_size=(1, 2, 2), text_len=512, in_dim=4, dim=64, ffn_dim=128,
    freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
    qk_norm=True, cross_attn_norm=True, eps=1e-6,
)
VAE_CFG = dict(dim=8, z_dim=4, dim_mult=[1, 2, 4, 4], num_res_blocks=2,
               attn_scales=[], temperal_downsample=[False, True, True])
T5_CFG = dict(vocab=64, dim=48, dim_attn=48, dim_ffn=96, num_heads=4,
              num_layers=2, num_buckets=8, shared_pos=False, dropout=0.0)


def _ref_module(name: str):
    spec = importlib.util.spec_from_file_location(f"refbundle.{name}",
                                                  REF / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refbundle.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


def main():
    # --- unified experts (reference UnifiedWanWithMixedConditionModel) -----
    model_mod = _load_reference_model_module()
    model_mod.flash_attention = _cpu_sdpa_flash_attention
    for name in ("visual_context_adapter", "unified_model"):
        spec = importlib.util.spec_from_file_location(f"refmodules.{name}",
                                                      REF / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodules.{name}"] = mod
        spec.loader.exec_module(mod)
    um = sys.modules["refmodules.unified_model"]

    def expert(seed):
        torch.manual_seed(seed)
        m = um.UnifiedWanWithMixedConditionModel(
            wan_config=WAN_CFG, vlm_in_dim=24,
            use_visual_context_adapter=True,
            visual_context_adapter_patch_size=(1, 4, 4),
            max_context_len=40,
        ).eval().float()
        return _randomize(m, seed)

    sd_low = expert(1).state_dict()
    sd_high = expert(2).state_dict()

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "low_noise_model").mkdir(exist_ok=True)
    (OUT / "high_noise_model").mkdir(exist_ok=True)
    torch.save({"model": sd_low}, OUT / "low_noise_model" / "model.pt")
    torch.save({"module": sd_high}, OUT / "high_noise_model" / "model.pt")

    # --- special tokens (reference special_tokens.pkl, torch-pickled) ------
    g = torch.Generator().manual_seed(5)
    special = {k: torch.randn(1, WAN_CFG["text_dim"], generator=g) * 0.05
               for k in ("<img_st>", "<img_ed>", "<prp_st>", "<prp_ed>")}
    torch.save(special, OUT / "special_tokens.pkl")

    # --- VAE (reference WanVAE_) -------------------------------------------
    vae_mod = _ref_module("vae2_1")
    torch.manual_seed(3)
    vae = _randomize(vae_mod.WanVAE_(**VAE_CFG).eval().float(), 3)
    torch.save(vae.state_dict(), OUT / "Wan2.1_VAE.pth")

    # --- T5 (reference T5Encoder), saved bf16 like the real artifact -------
    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", None)
    sys.modules["ftfy"] = ftfy
    torch.cuda.current_device = lambda: "cpu"
    pkg = types.ModuleType("refbundle")
    pkg.__path__ = [str(REF)]
    sys.modules["refbundle"] = pkg
    _ref_module("tokenizers")
    t5_mod = _ref_module("t5")
    torch.manual_seed(4)
    t5 = _randomize(t5_mod.T5Encoder(**T5_CFG).eval().float(), 4)
    t5_sd = {k: v.to(torch.bfloat16) for k, v in t5.state_dict().items()}
    torch.save(t5_sd, OUT / "models_t5_umt5-xxl-enc-bf16.pth")

    n = sum(p.numel() for p in t5.parameters())
    print(f"wrote {OUT} (experts {len(sd_low)} keys, vae "
          f"{len(vae.state_dict())} keys, t5 {n} params bf16)")


if __name__ == "__main__":
    main()
