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

--mid (VERDICT r4 item 7): emit a ~80M-param single-expert bundle at real-ish
WIDTH (dim 768, 12 heads, 8 layers, head_dim 64) plus a reference unified-
forward golden npz, into --out (a scratch dir — too big to commit; the slow
test tests/test_loading.py::test_midsize_bundle_parity regenerates it on
demand). Weights are rounded through bf16 BEFORE the reference forward so
the bf16 on-disk bundle and the golden output agree exactly.
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


# mid-size dims — must match tests/test_loading.py::MID_CFG
WAN_MID = dict(
    patch_size=(1, 2, 2), text_len=512, in_dim=16, dim=768, ffn_dim=3072,
    freq_dim=256, text_dim=512, out_dim=16, num_heads=12, num_layers=8,
    qk_norm=True, cross_attn_norm=True, eps=1e-6,
)
VAE_MID = dict(dim=32, z_dim=16, dim_mult=[1, 2, 4, 4], num_res_blocks=2,
               attn_scales=[], temperal_downsample=[False, True, True])
T5_MID = dict(vocab=1024, dim=256, dim_attn=256, dim_ffn=512, num_heads=8,
              num_layers=4, num_buckets=32, shared_pos=False, dropout=0.0)


def _load_unified_module():
    model_mod = _load_reference_model_module()
    model_mod.flash_attention = _cpu_sdpa_flash_attention
    for name in ("visual_context_adapter", "unified_model"):
        spec = importlib.util.spec_from_file_location(f"refmodules.{name}",
                                                      REF / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodules.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refmodules.unified_model"]


def main_mid(out_dir: str):
    """~80M-param single-expert bundle + reference-forward golden (bf16)."""
    import numpy as np

    out = Path(out_dir)
    um = _load_unified_module()

    torch.manual_seed(11)
    model = um.UnifiedWanWithMixedConditionModel(
        wan_config=WAN_MID, vlm_in_dim=512,
        use_visual_context_adapter=True,
        visual_context_adapter_patch_size=(1, 4, 4),
        max_context_len=128,
    ).eval().float()
    _randomize(model, 11)
    with torch.no_grad():  # bf16-representable weights: disk == compute
        for p in model.parameters():
            p.copy_(p.to(torch.bfloat16).to(torch.float32))
    n_params = sum(p.numel() for p in model.parameters())

    g = torch.Generator().manual_seed(12)
    x = torch.randn(1, 16, 5, 16, 16, generator=g)          # L = 5*8*8 = 320
    t = torch.tensor([250.0])
    ctx = [torch.randn(20, 512, generator=g)]
    ar_vision = [torch.randn(9, 512, generator=g)]
    visual_emb = [torch.randn(16, 5, 16, 16, generator=g)]
    special = {k: torch.randn(1, 512, generator=g) * 0.05
               for k in ("<img_st>", "<img_ed>", "<prp_st>", "<prp_ed>")}
    with torch.no_grad():
        y = model([x[0]], t=t, context=ctx, ar_vision_input=ar_vision,
                  visual_emb=visual_emb, seq_len=320,
                  special_token_dict=special, classifier_free_ratio=0.0,
                  condition_mode="full")

    out.mkdir(parents=True, exist_ok=True)
    (out / "low_noise_model").mkdir(exist_ok=True)
    sd_bf16 = {k: v.to(torch.bfloat16) for k, v in model.state_dict().items()}
    torch.save({"model": sd_bf16}, out / "low_noise_model" / "model.pt")
    torch.save({k: v.to(torch.bfloat16) for k, v in special.items()},
               out / "special_tokens.pkl")

    vae_mod = _ref_module("vae2_1")
    torch.manual_seed(13)
    vae = _randomize(vae_mod.WanVAE_(**VAE_MID).eval().float(), 13)
    torch.save(vae.state_dict(), out / "Wan2.1_VAE.pth")

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
    torch.manual_seed(14)
    t5 = _randomize(t5_mod.T5Encoder(**T5_MID).eval().float(), 14)
    torch.save({k: v.to(torch.bfloat16) for k, v in t5.state_dict().items()},
               out / "models_t5_umt5-xxl-enc-bf16.pth")

    arrays = {"x": x.numpy(), "t": t.numpy(), "ctx": ctx[0].numpy(),
              "ar_vision": ar_vision[0].numpy(),
              "visual_emb": visual_emb[0].numpy(),
              "out": torch.stack(y).numpy()}
    np.savez_compressed(out / "unified_mid_golden.npz", **arrays)
    print(f"wrote mid bundle to {out} ({n_params/1e6:.1f}M params, "
          f"out mean |y| {float(torch.stack(y).abs().mean()):.4f})")


def main():
    # --- unified experts (reference UnifiedWanWithMixedConditionModel) -----
    um = _load_unified_module()

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
    if "--mid" in sys.argv:
        main_mid(sys.argv[sys.argv.index("--out") + 1]
                 if "--out" in sys.argv else "/tmp/bundle_mid")
    else:
        main()
