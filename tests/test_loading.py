"""Checkpoint ingestion tests: reference on-disk layout → running pipeline.

Builds a synthetic checkpoint directory in the reference's exact layout
(README.md:353-362: {low,high}_noise_model/model.pt, special_tokens.pkl,
Wan2.1_VAE.pth, models_t5_umt5-xxl-enc-bf16.pth) from the golden-fixture
state dicts, then loads it with pipelines.loading.load_pipeline and runs a
few-step generation end-to-end.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from omnivideo_tpu.configs.base import PipelineConfig, T5Config, VAEConfig, WanDiTConfig
from omnivideo_tpu.pipelines.loading import load_pipeline

GOLDEN = Path(__file__).parent / "golden"

CFG = PipelineConfig(
    name="tiny-ckpt",
    dit=WanDiTConfig(
        patch_size=(1, 2, 2), text_len=512, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
    ),
    vae=VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=2,
                  temperal_downsample=(False, True, True)),
    t5=T5Config(vocab_size=64, dim=48, dim_attn=48, dim_ffn=96, num_heads=4,
                num_layers=2, num_buckets=8, text_len=16),
    vlm_in_dim=24,
    max_context_len=40,
    dual_expert=False,
)


def _synthetic_t5_sd(cfg: T5Config, rng):
    sd = {"token_embedding.weight": rng.standard_normal((cfg.vocab_size, cfg.dim)).astype(np.float32),
          "norm.weight": np.ones(cfg.dim, np.float32)}
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = np.ones(cfg.dim, np.float32)
        sd[f"{p}.norm2.weight"] = np.ones(cfg.dim, np.float32)
        for n in "qkv":
            sd[f"{p}.attn.{n}.weight"] = (rng.standard_normal((cfg.dim_attn, cfg.dim)) * 0.05).astype(np.float32)
        sd[f"{p}.attn.o.weight"] = (rng.standard_normal((cfg.dim, cfg.dim_attn)) * 0.05).astype(np.float32)
        sd[f"{p}.ffn.gate.0.weight"] = (rng.standard_normal((cfg.dim_ffn, cfg.dim)) * 0.05).astype(np.float32)
        sd[f"{p}.ffn.fc1.weight"] = (rng.standard_normal((cfg.dim_ffn, cfg.dim)) * 0.05).astype(np.float32)
        sd[f"{p}.ffn.fc2.weight"] = (rng.standard_normal((cfg.dim, cfg.dim_ffn)) * 0.05).astype(np.float32)
        sd[f"{p}.pos_embedding.embedding.weight"] = (rng.standard_normal((cfg.num_buckets, cfg.num_heads)) * 0.05).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    uni = np.load(GOLDEN / "unified_tiny.npz")
    vae = np.load(GOLDEN / "vae_tiny.npz")

    # fine-tuned unified expert .pt (reference wraps in 'model' sometimes)
    sd = {k[len("sd::"):]: torch.from_numpy(uni[k]) for k in uni.files if k.startswith("sd::")}
    (d / "low_noise_model").mkdir()
    torch.save({"model": sd}, d / "low_noise_model" / "model.pt")

    vsd = {k[len("sd::"):]: torch.from_numpy(vae[k]) for k in vae.files if k.startswith("sd::")}
    torch.save(vsd, d / "Wan2.1_VAE.pth")

    rng = np.random.default_rng(0)
    tsd = {k: torch.from_numpy(v) for k, v in _synthetic_t5_sd(CFG.t5, rng).items()}
    torch.save(tsd, d / "models_t5_umt5-xxl-enc-bf16.pth")

    special = {k[len("st::"):]: torch.from_numpy(uni[k]) for k in uni.files if k.startswith("st::")}
    torch.save(special, d / "special_tokens.pkl")
    return d


@pytest.mark.slow
def test_load_pipeline_and_generate(ckpt_dir):
    pipe = load_pipeline(CFG, str(ckpt_dir), dtype=jnp.float32, attn_impl="xla")
    assert pipe.vae is not None
    assert pipe.text_encoder is not None  # loaded (tokenizer absent)
    assert pipe.special_tokens and "<img_st>" in pipe.special_tokens

    uni = np.load(GOLDEN / "unified_tiny.npz")
    video = pipe.generate(
        precomputed_context=jnp.asarray(uni["ctx"]),
        precomputed_context_null=jnp.zeros_like(jnp.asarray(uni["ctx"])),
        ar_vision_input=jnp.asarray(uni["ar_vision"]),
        visual_emb=jnp.asarray(uni["visual_emb"]),
        size=(16, 16),
        frame_num=5,
        sampling_steps=2,
        guide_scale=3.0,
        seed=0,
    )
    assert video.shape == (3, 5, 16, 16)
    assert np.isfinite(video).all()


def test_loaded_t5_encodes(ckpt_dir):
    pipe = load_pipeline(CFG, str(ckpt_dir), dtype=jnp.float32)
    from omnivideo_tpu.models.t5 import t5_encode

    ids = jnp.arange(8, dtype=jnp.int32)[None] % CFG.t5.vocab_size
    mask = jnp.ones((1, 8), jnp.int32)
    out = t5_encode(pipe.text_encoder.params, CFG.t5, ids, mask)
    assert out.shape == (1, 8, 48)
    assert bool(jnp.isfinite(out).all())


def test_torch_free_reader_roundtrip(tmp_path):
    """io/torch_reader loads torch-saved state dicts without torch
    (SURVEY hard-part #4)."""
    from omnivideo_tpu.io.torch_reader import read_torch_checkpoint, to_float_numpy

    sd = {
        "w": torch.randn(3, 4),
        "bf": torch.randn(2, 5).to(torch.bfloat16),
        "view": torch.randn(4, 4).t(),
        "nested": {"i": torch.arange(6).reshape(2, 3)},
    }
    p = tmp_path / "m.pt"
    torch.save(sd, p)
    obj = to_float_numpy(read_torch_checkpoint(str(p)))
    np.testing.assert_allclose(obj["w"], sd["w"].numpy())
    np.testing.assert_allclose(obj["bf"], sd["bf"].float().numpy(), rtol=1e-2)
    np.testing.assert_allclose(obj["view"], sd["view"].numpy())
    np.testing.assert_array_equal(obj["nested"]["i"], sd["nested"]["i"].numpy())


def test_omni_video_generator_t2v(ckpt_dir):
    """v1-style OmniVideoGenerator orchestrator over a checkpoint bundle."""
    from omnivideo_tpu.pipelines.generator import OmniVideoGenerator

    gen = OmniVideoGenerator(str(ckpt_dir), config=CFG.replace(param_dtype="float32"))
    # no AR model in the bundle -> text-only; T5 has no tokenizer here, so use
    # the precomputed-context path through the underlying pipeline
    uni = np.load(GOLDEN / "unified_tiny.npz")
    video = gen.pipe.generate(
        precomputed_context=jnp.asarray(uni["ctx"]),
        precomputed_context_null=jnp.zeros_like(jnp.asarray(uni["ctx"])),
        size=(16, 16), frame_num=5, sampling_steps=2, guide_scale=3.0, seed=0,
    )
    assert video.shape == (3, 5, 16, 16)


@pytest.mark.slow
def test_hf_safetensors_reader_roundtrip(tmp_path):
    """io/hf_reader: direct safetensors read == torch state_dict, and the
    derived config drives a working forward."""
    import jax.numpy as jnp
    import numpy as np
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    from omnivideo_tpu.io.hf_reader import (
        load_hf_safetensors,
        qwen3_text_config_from_hf,
    )
    from omnivideo_tpu.models.qwen3vl.text_model import hf_to_params, qwen3_forward

    hf_cfg = Qwen3MoeConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=1, head_dim=16,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
        decoder_sparse_step=1, rope_theta=10000.0, norm_topk_prob=True,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = Qwen3MoeForCausalLM(hf_cfg).eval()
    m.save_pretrained(tmp_path)

    sd = load_hf_safetensors(str(tmp_path))
    ref_sd = m.state_dict()
    assert set(sd) == set(ref_sd)
    for k in sd:
        np.testing.assert_array_equal(sd[k], ref_sd[k].float().numpy())

    cfg = qwen3_text_config_from_hf(str(tmp_path))
    assert cfg.num_experts == 4 and cfg.head_dim == 16
    params = hf_to_params({k: np.asarray(v, np.float32) for k, v in sd.items()}, cfg)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    _, logits = qwen3_forward(params, cfg, ids)
    with torch.no_grad():
        ref = m(torch.tensor([[1, 5, 9, 2]])).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=3e-3, atol=3e-3)


def test_aot_export_roundtrip(tmp_path):
    """jax.export artifact of the denoise step: serialize → deserialize →
    call matches the live forward."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply

    cfg = WanDiTConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
        qk_norm=True, cross_attn_norm=True, eps=1e-6,
    )
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    def f(params, x, t, ctx):
        return wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 8, 8))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))
    shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (params, x, t, ctx)
    )
    blob = jexport.export(jax.jit(f))(*shapes).serialize()
    (tmp_path / "dit.aot").write_bytes(blob)

    art = jexport.deserialize((tmp_path / "dit.aot").read_bytes())
    out = art.call(params, x, t, ctx)
    ref = f(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_dual_expert_boundary_split():
    """A14B-style dual-expert pipeline: high-noise expert runs steps with
    t ≥ boundary·T, low-noise the rest (x2x_gen_unified.py:228-258,407)."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified
    from omnivideo_tpu.schedulers.unipc import FlowUniPC

    cfg = CFG.replace(dual_expert=True, boundary=0.5, param_dtype="float32")
    pipe = OmniVideoX2XUnified.random_init(cfg, seed=0, with_vae=False)
    assert pipe.high_noise is not pipe.low_noise

    # un-zero both heads DIFFERENTLY so each expert leaves a signature
    for expert, seed in ((pipe.low_noise, 1), (pipe.high_noise, 2)):
        hk = expert.wan["head"]["head"]["kernel"]
        expert.wan["head"]["head"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(seed), hk.shape) * 0.05
        )

    # boundary math: with shift=5, check the static split the pipeline uses
    solver = FlowUniPC.create(6, shift=5.0, num_train_timesteps=1000)
    n_high = int((solver.timesteps >= 500).sum())
    assert 0 < n_high < 6  # both experts actually execute

    ctx = jax.random.normal(jax.random.PRNGKey(3), (8, cfg.dit.text_dim))
    kw = dict(precomputed_context=ctx, precomputed_context_null=ctx * 0,
              size=(32, 32), frame_num=1, sampling_steps=6, shift=5.0,
              seed=11, decode=False)
    lat = pipe.generate(**kw)

    # swapping the experts must change the result (each segment's expert
    # matters); a single-expert pipeline would be invariant
    pipe.low_noise, pipe.high_noise = pipe.high_noise, pipe.low_noise
    pipe._denoise_cache.clear()
    lat_sw = pipe.generate(**kw)
    assert float(jnp.max(jnp.abs(lat - lat_sw))) > 1e-6

    # per-segment guide scales: tuple (low, high) accepted
    pipe.low_noise, pipe.high_noise = pipe.high_noise, pipe.low_noise
    pipe._denoise_cache.clear()
    lat_g = pipe.generate(**{**kw, "guide_scale": (3.0, 4.0)})
    assert bool(jnp.isfinite(lat_g).all())


def test_generate_chunked_scan_exact():
    """max_steps_per_call chunking is an exact split of the denoise scan
    (solver state carries all cross-step memory)."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = PipelineConfig(
        name="tiny-chunk",
        dit=WanDiTConfig(patch_size=(1, 2, 2), in_dim=8, out_dim=8, dim=64,
                         ffn_dim=128, freq_dim=32, text_dim=48, num_heads=4,
                         num_layers=2),
        vae=VAEConfig(dim=8, z_dim=8),
        max_context_len=32, dual_expert=False, vlm_in_dim=16,
        param_dtype="float32",
    )
    ctx = jnp.ones((5, 48), jnp.float32) * 0.1
    kw = dict(precomputed_context=ctx, precomputed_context_null=jnp.zeros_like(ctx),
              size=(64, 32), frame_num=9, sampling_steps=7, guide_scale=3.0,
              seed=11, decode=False)
    pipe = OmniVideoX2XUnified.random_init(cfg, attn_impl="xla", with_vae=False)
    ref = pipe.generate(**kw)
    out = pipe.generate(**kw, max_steps_per_call=3)  # 7 -> 3+2+2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_serve_handler_generates(tmp_path):
    """tools/serve.py request handler: context in -> clip written + JSON out
    (the serving frontend the reference lacks)."""
    import sys
    from pathlib import Path as P

    sys.path.insert(0, str(P(__file__).resolve().parents[1] / "tools"))
    import serve as serve_mod

    # build args without touching argv
    import argparse
    ns = argparse.Namespace(
        task="t2v-1.3B", ckpt_dir=None, random_weights=True,
        output_dir=str(tmp_path), port=0, host="127.0.0.1", attn_impl="xla",
        max_steps_per_call=2, vae_dtype=None, tiny=True, platform=None,
        once=None, residual_dtype="bfloat16",
    )
    srv = serve_mod.Server(ns)
    out = srv.handle_generate({
        "id": "t1", "context": [[0.1] * 48], "size": [64, 32],
        "frame_num": 9, "sampling_steps": 2, "seed": 5,
    })
    assert out["id"] == "t1" and P(out["path"]).exists()
    assert out["latency_s"] > 0

    # a hostile request id must not escape --output_dir (ADVICE r2: path
    # traversal); the written file gets a server-generated id instead
    evil = srv.handle_generate({
        "id": "../../evil", "context": [[0.1] * 48], "size": [64, 32],
        "frame_num": 9, "sampling_steps": 2, "seed": 5,
    })
    written = P(evil["path"]).resolve()
    assert str(written).startswith(str(P(str(tmp_path)).resolve()))
    assert evil["file_id"] != "../../evil"


def test_reference_bundle_roundtrip():
    """A COMPLETE bundle emitted by the torch reference itself
    (tools/dev/make_golden_bundle.py: reference unified experts, VAE, T5
    state_dicts in the documented layout) loads end-to-end and generates
    across the dual-expert boundary. Exercises BOTH .pt unwrap wrappings
    ('module' for high, 'model' for low — generate_omni_v2v.py:501-513) and
    the bf16 T5 .pth through the torch-free reader (VERDICT r2 item 10)."""
    bundle = GOLDEN / "bundle_tiny"
    cfg = CFG.replace(dual_expert=True, boundary=0.9)
    pipe = load_pipeline(cfg, str(bundle), dtype=jnp.float32, attn_impl="xla")
    assert pipe.vae is not None and pipe.text_encoder is not None
    assert pipe.high_noise is not pipe.low_noise  # both experts loaded
    assert set(pipe.special_tokens) == {"<img_st>", "<img_ed>",
                                        "<prp_st>", "<prp_ed>"}

    # bf16 round trip: T5 weights arrived via the torch-free bf16 zip reader
    from omnivideo_tpu.models.t5 import t5_encode

    ids = jnp.arange(8, dtype=jnp.int32)[None] % cfg.t5.vocab_size
    enc = t5_encode(pipe.text_encoder.params, cfg.t5, ids,
                    jnp.ones((1, 8), jnp.int32))
    assert enc.shape == (1, 8, 48) and bool(jnp.isfinite(enc).all())

    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((10, 48)), jnp.float32) * 0.1
    video = pipe.generate(
        precomputed_context=ctx,
        precomputed_context_null=jnp.zeros_like(ctx),
        size=(16, 16), frame_num=5, sampling_steps=4,  # crosses boundary:
        guide_scale=(3.0, 4.0),                        # both experts run
        seed=0,
    )
    assert video.shape == (3, 5, 16, 16)
    assert np.isfinite(video).all()


@pytest.mark.slow
def test_load_pipeline_layer_stream_matches(ckpt_dir):
    """load_pipeline(layer_stream=True) — the CLI --layer_stream checkpoint
    path (generate.py passes it through load_pipeline's pipe_kwargs) — must
    produce the same video as the scanned pipeline."""
    uni = np.load(GOLDEN / "unified_tiny.npz")
    kw = dict(
        precomputed_context=jnp.asarray(uni["ctx"]),
        precomputed_context_null=jnp.zeros_like(jnp.asarray(uni["ctx"])),
        ar_vision_input=jnp.asarray(uni["ar_vision"]),
        visual_emb=jnp.asarray(uni["visual_emb"]),
        size=(16, 16), frame_num=5, sampling_steps=2, guide_scale=3.0, seed=0,
    )
    ref = load_pipeline(CFG, str(ckpt_dir), dtype=jnp.float32,
                        attn_impl="xla").generate(**kw)
    out = load_pipeline(CFG, str(ckpt_dir), dtype=jnp.float32,
                        attn_impl="xla", layer_stream=True).generate(**kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_midsize_bundle_parity(tmp_path_factory):
    """VERDICT r4 item 7: a ~80M-param bundle (real-ish WIDTH: dim 768, 12
    heads, head_dim 64, 8 layers) generated by the TORCH REFERENCE itself
    round-trips through load_pipeline -> unified forward with output-tensor
    parity against the reference forward, then runs generate() end-to-end —
    parity evidence is no longer tiny-config-only. The bundle is too big to
    commit (~220 MB), so it is regenerated into a scratch dir on demand."""
    import subprocess
    import sys as _sys

    from omnivideo_tpu.models.unified import build_mixed_context
    from omnivideo_tpu.models.wan_dit import wan_dit_apply

    repo = Path(__file__).resolve().parents[1]
    out = tmp_path_factory.mktemp("bundle_mid")
    r = subprocess.run(
        [_sys.executable, str(repo / "tools/dev/make_golden_bundle.py"),
         "--mid", "--out", str(out)],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])

    mid_cfg = PipelineConfig(
        name="mid-ckpt",
        dit=WanDiTConfig(
            patch_size=(1, 2, 2), text_len=512, in_dim=16, dim=768,
            ffn_dim=3072, freq_dim=256, text_dim=512, out_dim=16,
            num_heads=12, num_layers=8, qk_norm=True, cross_attn_norm=True,
            eps=1e-6,
        ),
        vae=VAEConfig(dim=32, z_dim=16, dim_mult=(1, 2, 4, 4),
                      num_res_blocks=2,
                      temperal_downsample=(False, True, True)),
        t5=T5Config(vocab_size=1024, dim=256, dim_attn=256, dim_ffn=512,
                    num_heads=8, num_layers=4, num_buckets=32, text_len=32),
        vlm_in_dim=512,
        use_visual_context_adapter=True,
        visual_context_adapter_patch_size=(1, 4, 4),
        max_context_len=128,
        dual_expert=False,
    )
    pipe = load_pipeline(mid_cfg, str(out), dtype=jnp.float32,
                         attn_impl="xla")
    golden = np.load(out / "unified_mid_golden.npz")

    mixed = build_mixed_context(
        pipe.low_noise.companions, mid_cfg,
        context=jnp.asarray(golden["ctx"]),
        ar_vision=jnp.asarray(golden["ar_vision"]),
        visual_emb=jnp.asarray(golden["visual_emb"]),
        special_tokens={k: jnp.asarray(v, jnp.float32)
                        for k, v in pipe.special_tokens.items()},
        condition_mode="full",
    )
    y = wan_dit_apply(
        pipe.low_noise.wan, mid_cfg.dit.replace(text_len=128),
        jnp.asarray(golden["x"]), jnp.asarray(golden["t"]), mixed[None],
        seq_len=320, attn_impl="xla")
    ref = golden["out"]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-3, atol=2e-3)

    # end-to-end: few-step generation through the loaded mid pipeline
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((20, 512)), jnp.float32) * 0.1
    video = pipe.generate(
        precomputed_context=ctx,
        precomputed_context_null=jnp.zeros_like(ctx),
        size=(32, 32), frame_num=5, sampling_steps=2, guide_scale=3.0,
        seed=0)
    assert video.shape == (3, 5, 32, 32)
    assert np.isfinite(np.asarray(video)).all()
