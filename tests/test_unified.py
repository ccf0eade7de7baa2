"""Unified mixed-condition model parity against the reference implementation.

Fixture from tools/dev/make_golden_unified.py (reference torch forward with
VLM features + text + visual context, special tokens, truncation at
max_context_len=40).
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
from omnivideo_tpu.io.torch_convert import (
    split_unified_state_dict,
    to_jnp,
    unified_companions_to_params,
    wan_state_dict_to_params,
)
from omnivideo_tpu.models.unified import build_mixed_context, null_ar_vision
from omnivideo_tpu.models.wan_dit import wan_dit_apply

GOLDEN = Path(__file__).parent / "golden" / "unified_tiny.npz"

CFG = PipelineConfig(
    name="tiny",
    dit=WanDiTConfig(
        patch_size=(1, 2, 2), text_len=512, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
        qk_norm=True, cross_attn_norm=True, eps=1e-6,
    ),
    vae=VAEConfig(z_dim=4),
    vlm_in_dim=24,
    use_visual_context_adapter=True,
    visual_context_adapter_patch_size=(1, 4, 4),
    max_context_len=40,
)


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "run tools/dev/make_golden_unified.py"
    return np.load(GOLDEN)


def test_unified_forward_parity(golden):
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    wan_sd, comp_sd = split_unified_state_dict(sd)
    wan_params = to_jnp(wan_state_dict_to_params(wan_sd, CFG.dit.num_layers))
    companions = to_jnp(unified_companions_to_params(comp_sd))
    special = {
        k[len("st::"):]: jnp.asarray(golden[k])
        for k in golden.files
        if k.startswith("st::")
    }

    # the DiT's context budget becomes max_context_len (unified_model.py:73-75)
    dit_cfg = CFG.dit.replace(text_len=CFG.max_context_len)

    mixed = build_mixed_context(
        companions,
        CFG,
        context=jnp.asarray(golden["ctx"]),
        ar_vision=jnp.asarray(golden["ar_vision"]),
        visual_emb=jnp.asarray(golden["visual_emb"]),
        special_tokens=special,
        condition_mode="full",
    )
    assert mixed.shape == (40, 48)  # truncated: 7 + 1+10+1 + 1+12+1 = 33 → pad 40
    out = wan_dit_apply(
        wan_params,
        dit_cfg,
        jnp.asarray(golden["x"]),
        jnp.asarray(golden["t"]),
        mixed[None],
        seq_len=3 * 4 * 4,
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), golden["out"], rtol=3e-4, atol=3e-4)


def test_null_ar_vision():
    n = null_ar_vision(24)
    assert n.shape == (2, 24)
    np.testing.assert_allclose(np.asarray(n), np.full((2, 24), 1e-6, np.float32), rtol=1e-6)


def test_mixed_context_text_only(golden):
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    _, comp_sd = split_unified_state_dict(sd)
    companions = to_jnp(unified_companions_to_params(comp_sd))
    ctx = jnp.asarray(golden["ctx"])
    mixed = build_mixed_context(companions, CFG, context=ctx, condition_mode="full")
    # no special tokens, no vlm/visual: just the context, padded
    np.testing.assert_allclose(np.asarray(mixed[:10]), np.asarray(ctx), rtol=1e-6)
    assert float(jnp.abs(mixed[10:]).max()) == 0.0


def test_v1_condition_modes(golden):
    """v1 condition modes (reference omni_video_unified_gen.py): aligned_emb
    routing and exclusions."""
    import jax

    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    _, comp_sd = split_unified_state_dict(sd)
    companions = to_jnp(unified_companions_to_params(comp_sd))
    ctx = jnp.asarray(golden["ctx"])
    aligned = jnp.ones((4, 48), jnp.float32) * 0.2

    m_only = build_mixed_context(
        companions, CFG, context=ctx, aligned_emb=aligned,
        condition_mode="aligned_emb_only",
    )
    np.testing.assert_allclose(np.asarray(m_only[:4]), np.asarray(aligned))
    assert float(jnp.abs(m_only[4:]).max()) == 0.0

    m_wt = build_mixed_context(
        companions, CFG, context=ctx, aligned_emb=aligned,
        condition_mode="aligned_emb_with_text",
    )
    np.testing.assert_allclose(np.asarray(m_wt[:4]), np.asarray(aligned))
    np.testing.assert_allclose(np.asarray(m_wt[4:14]), np.asarray(ctx))


def test_v1_token_order_and_ref_images(golden):
    """v1 assembly order (omni_video_model.py:337-377): visual and ref_images
    each <img>-sandwiched first, then <ipl> aligned, then <prp> text."""
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    _, comp_sd = split_unified_state_dict(sd)
    companions = to_jnp(unified_companions_to_params(comp_sd))
    ctx = jnp.asarray(golden["ctx"])  # [10, 48]
    aligned = jnp.full((4, 48), 0.2, jnp.float32)
    st = {
        "<img_st>": jnp.full((1, 48), 1.0), "<img_ed>": jnp.full((1, 48), 2.0),
        "<ipl_st>": jnp.full((1, 48), 3.0), "<ipl_ed>": jnp.full((1, 48), 4.0),
        "<prp_st>": jnp.full((1, 48), 5.0), "<prp_ed>": jnp.full((1, 48), 6.0),
    }
    vis = jnp.asarray(golden["visual_emb"])  # [C, F, h, w]
    from omnivideo_tpu.models.visual_context_adapter import vca_apply

    vis_tok = vca_apply(
        companions["visual_context_adapter"], vis,
        CFG.visual_context_adapter_patch_size, CFG.dit.eps,
    )[0]
    n_vis = vis_tok.shape[0]

    cfg_wide = CFG.replace(max_context_len=64)  # v1 layout needs 46 tokens
    m = build_mixed_context(
        companions, cfg_wide, context=ctx, aligned_emb=aligned, visual_emb=vis,
        ref_images=vis, special_tokens=st, order="v1",
    )
    # layout: <img> vis <img> | <img> ref <img> | <ipl> a <ipl> | <prp> t <prp>
    i = 0
    for item in (vis_tok, vis_tok):
        np.testing.assert_allclose(np.asarray(m[i]), np.asarray(st["<img_st>"][0]))
        np.testing.assert_allclose(
            np.asarray(m[i + 1:i + 1 + n_vis]), np.asarray(vis_tok), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m[i + 1 + n_vis]), np.asarray(st["<img_ed>"][0]))
        i += n_vis + 2
    np.testing.assert_allclose(np.asarray(m[i]), np.asarray(st["<ipl_st>"][0]))
    np.testing.assert_allclose(np.asarray(m[i + 1:i + 5]), np.asarray(aligned))
    np.testing.assert_allclose(np.asarray(m[i + 5]), np.asarray(st["<ipl_ed>"][0]))
    i += 6
    np.testing.assert_allclose(np.asarray(m[i]), np.asarray(st["<prp_st>"][0]))
    np.testing.assert_allclose(np.asarray(m[i + 1:i + 11]), np.asarray(ctx), rtol=1e-6)


def test_i2v_y_conditioning():
    """y channel-concat doubles in_dim (reference model.py:451-452)."""
    import jax

    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply

    cfg = CFG.dit.replace(in_dim=8)  # 4 latent + 4 conditional channels
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 8, 8))
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 3, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 48))
    out = wan_dit_apply(params, cfg, x, jnp.array([500.0]), ctx, y=y, attn_impl="xla")
    assert out.shape == (1, 4, 3, 8, 8)


def test_batched_aligned_emb(golden):
    """Training-path batched assembly places <ipl> aligned features between
    VLM and text (v2 order), matching the per-sample builder."""
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    _, comp_sd = split_unified_state_dict(sd)
    companions = to_jnp(unified_companions_to_params(comp_sd))
    from omnivideo_tpu.models.unified import build_mixed_context_batch

    ctx = jnp.asarray(golden["ctx"])[None]  # [1, 10, 48]
    aligned = jnp.full((1, 4, 48), 0.3, jnp.float32)
    st = {
        "<ipl_st>": jnp.full((1, 48), 3.0), "<ipl_ed>": jnp.full((1, 48), 4.0),
        "<prp_st>": jnp.full((1, 48), 5.0), "<prp_ed>": jnp.full((1, 48), 6.0),
        "<img_st>": jnp.full((1, 48), 1.0), "<img_ed>": jnp.full((1, 48), 2.0),
    }
    mb = build_mixed_context_batch(
        companions, CFG, text_ctx=ctx, aligned_emb=aligned, special_tokens=st
    )
    ms = build_mixed_context(
        companions, CFG, context=ctx[0], aligned_emb=aligned[0],
        special_tokens=st, condition_mode="full",
    )
    np.testing.assert_allclose(np.asarray(mb[0]), np.asarray(ms), rtol=1e-6)


@pytest.mark.slow
def test_unified_train_step_with_aligned_emb():
    """make_unified_train_step accepts the v1 dataset's aligned_emb key."""
    import jax

    from omnivideo_tpu.models.unified import init_unified_companions
    from omnivideo_tpu.models.wan_dit import init_wan_dit
    from omnivideo_tpu.training.trainer import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_unified_train_step,
    )

    cfg = CFG.replace(param_dtype="float32")
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "wan": init_wan_dit(k1, dit_cfg, dtype=jnp.float32),
        "companions": init_unified_companions(k2, cfg),
    }
    tc = TrainConfig(total_steps=4, warmup_steps=1, cfg_dropout=0.5, remat=False)
    tx = make_optimizer(tc)
    step = jax.jit(make_unified_train_step(cfg, tc, tx, attn_impl="xla"))
    state = init_train_state(params, tx)
    batch = {
        "latents": jnp.zeros((2, 4, 3, 8, 8), jnp.float32),
        "context": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 48)),
        "aligned_emb": jax.random.normal(jax.random.PRNGKey(2), (2, 4, 48)),
    }
    state, m = step(state, batch, jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(m["loss"]))
