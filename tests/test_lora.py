"""LoRA adapter finetuning (training/lora.py).

Role of the reference's PEFT LoRA in its VILA trainer (reference
previous_version/Omni-Video1/nets/third_party/llava/train/train.py:81-130),
here over functional pytrees: inject → identical forward (B=0); train →
only adapters move; merge → identical forward with plain kernels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
from omnivideo_tpu.models.unified import init_unified_companions
from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply
from omnivideo_tpu.training.dataset import (
    OmniVideoDataset,
    PadSpec,
    collate,
    make_dummy_dataset,
)
from omnivideo_tpu.training.lora import (
    LORA_FILTERS,
    apply_lora_state,
    count_lora_params,
    extract_lora,
    inject_lora,
    merge_lora,
    strip_lora,
)
from omnivideo_tpu.training.trainer import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_unified_train_step,
)

CFG = PipelineConfig(
    name="tiny-lora",
    dit=WanDiTConfig(patch_size=(1, 2, 2), in_dim=16, out_dim=16, dim=64,
                     ffn_dim=128, freq_dim=32, text_dim=48, num_heads=4,
                     num_layers=2),
    vae=VAEConfig(),
    vlm_in_dim=16,
    max_context_len=48,
    param_dtype="float32",
)
DIT = CFG.dit.replace(text_len=CFG.max_context_len)


def _init_dit(key):
    """init_wan_dit with a NON-zero head: the real head init is zeros (a
    from-scratch convention), which would make every output — and every
    gradient into the body's adapters — identically zero. A finetune starts
    from a trained checkpoint, which this stands in for."""
    params = init_wan_dit(jax.random.PRNGKey(key), DIT, dtype=jnp.float32)
    hk = params["head"]["head"]["kernel"]
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(key + 100), hk.shape, hk.dtype)
        * 0.02)
    return params


def _dit_forward(params, key=0):
    k = jax.random.PRNGKey(key)
    x = jax.random.normal(k, (1, 16, 3, 8, 8), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(key + 1),
                            (1, CFG.max_context_len, 48), jnp.float32)
    return wan_dit_apply(params, DIT, x, t, ctx, attn_impl="xla")


def test_inject_preserves_forward_and_merge_strip_roundtrip():
    base = _init_dit(0)
    y0 = _dit_forward(base)
    lp = inject_lora(base, jax.random.PRNGKey(1), rank=4)
    assert count_lora_params(lp) > 0
    # B = 0 -> bit-identical forward
    np.testing.assert_array_equal(np.asarray(_dit_forward(lp)), np.asarray(y0))
    # strip recovers the exact base tree
    stripped = strip_lora(lp)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        stripped, base)
    # perturb an adapter, then merged kernels reproduce the adapter forward
    lp = jax.tree_util.tree_map(lambda x: x, lp)

    def bump(node):
        if isinstance(node, dict):
            if "lora_b" in node:
                node["lora_b"] = node["lora_b"] + 0.02
            for v in node.values():
                bump(v)

    bump(lp)
    y_ad = _dit_forward(lp)
    assert not np.allclose(np.asarray(y_ad), np.asarray(y0))
    merged = merge_lora(lp)
    flat = jax.tree_util.tree_leaves_with_path(merged)
    assert not any("lora" in "/".join(map(str, p)) for p, _ in flat)
    np.testing.assert_allclose(np.asarray(_dit_forward(merged)),
                               np.asarray(y_ad), rtol=2e-5, atol=2e-5)
    # extract/apply roundtrip grafts the same adapters back
    state = extract_lora(lp)
    re = apply_lora_state(strip_lora(lp), state)
    np.testing.assert_array_equal(np.asarray(_dit_forward(re)),
                                  np.asarray(y_ad))


def test_lora_training_moves_only_adapters(tmp_path):
    make_dummy_dataset(tmp_path, n=4, text_len=8, vlm_len=6,
                       latent_shape=(16, 3, 8, 8), text_dim=48, vlm_dim=16)
    ds = OmniVideoDataset(str(tmp_path))
    pad = PadSpec(text_len=12, vlm_len=8, latent_frames=3)
    batch = {k: jnp.asarray(v)
             for k, v in collate([ds[i] for i in range(4)], pad).items()}

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "wan": inject_lora(_init_dit(0), k3, rank=4),
        "companions": init_unified_companions(k2, CFG),
    }
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=20,
                     cfg_dropout=0.0, grad_clip=1.0, remat=True,
                     trainable_filters=LORA_FILTERS)
    tx = make_optimizer(tc, params)
    state = init_train_state(params, tx)
    step = jax.jit(make_unified_train_step(CFG, tc, tx, attn_impl="xla"))
    losses = []
    for i in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])

    # base weights (and companions) bit-identical; adapters moved
    def paths_equal(a, b, pred):
        for (pa, la), (_, lb) in zip(
                jax.tree_util.tree_leaves_with_path(a),
                jax.tree_util.tree_leaves_with_path(b)):
            name = "/".join(str(getattr(p, "key", p)) for p in pa)
            if pred(name):
                yield name, np.array_equal(np.asarray(la), np.asarray(lb))

    frozen = dict(paths_equal(params, state.params,
                              lambda n: "lora_a" not in n and "lora_b" not in n))
    assert all(frozen.values()), [n for n, ok in frozen.items() if not ok][:5]
    moved = dict(paths_equal(params, state.params, lambda n: "lora_b" in n))
    assert moved and not all(moved.values()), "no adapter moved"
    assert losses[-1] < losses[0] * 1.05  # training is sane (same fixed batch)


def test_inject_requires_matching_targets():
    base = init_wan_dit(jax.random.PRNGKey(0), DIT, dtype=jnp.float32)
    with pytest.raises(ValueError):
        inject_lora(base, jax.random.PRNGKey(1), rank=2,
                    targets=("no/such/site",))


# ---------------------------------------------------------------------------
# bare-tensor scheme (Qwen3 LLM — the reference's actual LoRA target)
# ---------------------------------------------------------------------------


def _tiny_qwen3():
    from omnivideo_tpu.models.qwen3vl.text_model import Qwen3TextConfig

    cfg = Qwen3TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16)
    ks = jax.random.split(jax.random.PRNGKey(0), 24)
    D, V, hd = cfg.hidden_size, cfg.vocab_size, cfg.head_dim

    def lin(k, i, o):
        return jax.random.normal(k, (i, o)) * 0.05

    def layer(i):
        return {
            "attn": {
                "q": lin(ks[i], D, 2 * hd), "k": lin(ks[i + 1], D, hd),
                "v": lin(ks[i + 2], D, hd), "o": lin(ks[i + 3], 2 * hd, D),
                "q_norm": jnp.ones((hd,)), "k_norm": jnp.ones((hd,)),
            },
            "ln1": jnp.ones((D,)), "ln2": jnp.ones((D,)),
            "mlp": {"gate": lin(ks[i + 4], D, 64), "up": lin(ks[i + 5], D, 64),
                    "down": lin(ks[i + 6], 64, D)},
        }

    layers = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    layer(0), layer(7))
    params = {
        "embed": jax.random.normal(ks[14], (V, D)) * 0.05,
        "layers": layers,
        "norm": jnp.ones((D,)),
        "lm_head": jax.random.normal(ks[15], (D, V)) * 0.05,
    }
    return cfg, params


def test_bare_lora_qwen3_forward_decode_and_merge():
    from omnivideo_tpu.models.qwen3vl.text_model import (
        qwen3_forward,
        qwen3_greedy_decode,
    )
    from omnivideo_tpu.training.lora import (
        count_lora_params,
        inject_lora_bare,
        merge_lora,
        strip_lora,
    )

    cfg, base = _tiny_qwen3()
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, cfg.vocab_size)
    _, logits0 = qwen3_forward(base, cfg, ids)

    lp = inject_lora_bare(base, jax.random.PRNGKey(1), rank=4)
    assert count_lora_params(lp) > 0
    # q_norm/k_norm (2-D when stacked) must NOT be adapted; router-less
    # names only
    flat = ["/".join(str(getattr(p, "key", p)) for p in path)
            for path, _ in jax.tree_util.tree_leaves_with_path(lp)]
    assert not any("q_norm_lora" in n or "k_norm_lora" in n for n in flat)
    # B = 0 -> identical forward AND identical greedy decode (cached path)
    _, logits1 = qwen3_forward(lp, cfg, ids)
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits0))
    toks0 = qwen3_greedy_decode(base, cfg, ids[:1, :6], 4)
    toks1 = qwen3_greedy_decode(lp, cfg, ids[:1, :6], 4)
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks0))

    # strip recovers base exactly
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        strip_lora(lp), base)

    # perturb B, merged kernels reproduce the adapter forward
    def bump(node):
        if isinstance(node, dict):
            for k in list(node):
                if k.endswith("_lora_b"):
                    node[k] = node[k] + 0.02
                else:
                    bump(node[k])

    bump(lp)
    _, logits_ad = qwen3_forward(lp, cfg, ids)
    assert not np.allclose(np.asarray(logits_ad), np.asarray(logits0))
    merged = merge_lora(lp)
    assert not any(
        "lora" in "/".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_leaves_with_path(merged))
    _, logits_m = qwen3_forward(merged, cfg, ids)
    np.testing.assert_allclose(np.asarray(logits_m), np.asarray(logits_ad),
                               rtol=2e-5, atol=2e-5)


def test_bare_lora_sft_moves_only_adapters():
    from omnivideo_tpu.training.sft import (
        SFTConfig,
        build_sft_labels,
        init_sft_state,
        make_sft_optimizer,
        make_sft_step,
    )
    from omnivideo_tpu.training.lora import inject_lora_bare, lora_masked

    cfg, base = _tiny_qwen3()
    params = {"lm": inject_lora_bare(base, jax.random.PRNGKey(1), rank=4)}
    tc = SFTConfig(learning_rate=1e-3, max_grad_norm=1.0, warmup_steps=1,
                   total_steps=10)
    tx = lora_masked(make_sft_optimizer(tc), params)
    state = init_sft_state(params, tx)
    step = jax.jit(make_sft_step(cfg, tc, tx))
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0,
                             cfg.vocab_size)
    batch = {"ids": ids, "labels": build_sft_labels(ids, jnp.array([2, 3]))}
    for _ in range(2):
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))

    changed = unchanged = 0
    for (pa, la), (_, lb) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(state.params)):
        name = "/".join(str(getattr(p, "key", p)) for p in pa)
        same = np.array_equal(np.asarray(la), np.asarray(lb))
        if "_lora_a" in name or "_lora_b" in name:
            changed += 0 if same else 1
        else:
            assert same, f"frozen leaf moved: {name}"
            unchanged += 1
    assert changed > 0 and unchanged > 0


def _tiny_vision():
    from omnivideo_tpu.models.qwen3vl.vision_model import Qwen3VLVisionConfig

    cfg = Qwen3VLVisionConfig(
        hidden_size=32, intermediate_size=64, depth=3, num_heads=4,
        in_channels=3, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, out_hidden_size=48,
        num_position_embeddings=36, deepstack_visual_indexes=(0, 1))
    D, M, P = cfg.hidden_size, cfg.intermediate_size, 36
    ks = iter(jax.random.split(jax.random.PRNGKey(0), 32))
    r = lambda *sh: jax.random.normal(next(ks), sh) * 0.05

    def merger(post):
        # postshuffle (deepstack) mergers LN over u*D; the final merger
        # LNs over D before the shuffle
        u = cfg.spatial_merge_size ** 2
        nd = u * D if post else D
        return {"norm": {"weight": jnp.ones((nd,)), "bias": jnp.zeros((nd,))},
                "fc1_w": r(u * D, M), "fc1_b": jnp.zeros((M,)),
                "fc2_w": r(M, cfg.out_hidden_size),
                "fc2_b": jnp.zeros((cfg.out_hidden_size,))}

    def block():
        return {
            "norm1": {"weight": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "norm2": {"weight": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            "qkv_w": r(D, 3 * D), "qkv_b": jnp.zeros((3 * D,)),
            "proj_w": r(D, D), "proj_b": jnp.zeros((D,)),
            "mlp_fc1_w": r(D, M), "mlp_fc1_b": jnp.zeros((M,)),
            "mlp_fc2_w": r(M, D), "mlp_fc2_b": jnp.zeros((D,)),
        }

    in_patch = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    params = {
        "patch_embed": {"kernel": r(in_patch, D), "bias": jnp.zeros((D,))},
        "pos_embed": r(P, D),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                         block(), block(), block()),
        "merger": merger(False),
        "deepstack": [merger(True), merger(True)],
    }
    t, h, w = 2, 4, 4
    pixels = jax.random.normal(next(ks), (t * h * w, in_patch)) * 0.1
    return cfg, params, pixels, (t, h, w)


def test_bare_lora_vision_tower():
    """Vision-tower adapters (reference lora_vt role): inject over
    qkv/proj/mlp linears, init-forward identical, merged == adapter."""
    from omnivideo_tpu.training.lora import (
        VISION_BARE_NAMES,
        inject_lora_bare,
        merge_lora,
    )

    cfg, params, pixels, grid = _tiny_vision()
    from omnivideo_tpu.models.qwen3vl.vision_model import vision_forward

    y0, ds0 = vision_forward(params, cfg, pixels, grid)
    lp = inject_lora_bare(params, jax.random.PRNGKey(1), rank=2,
                          names=VISION_BARE_NAMES)
    y1, _ = vision_forward(lp, cfg, pixels, grid)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))

    def bump(node):
        if isinstance(node, dict):
            for k in list(node):
                if k.endswith("_lora_b"):
                    node[k] = node[k] + 0.02
                else:
                    bump(node[k])

    bump(lp)
    y_ad, _ = vision_forward(lp, cfg, pixels, grid)
    assert not np.allclose(np.asarray(y_ad), np.asarray(y0))
    y_m, _ = vision_forward(merge_lora(lp), cfg, pixels, grid)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_ad),
                               rtol=2e-5, atol=2e-5)


def test_adapter_npz_roundtrip(tmp_path):
    from omnivideo_tpu.training.lora import (
        apply_lora_state,
        load_adapters_npz,
        save_adapters_npz,
        strip_lora,
    )

    base = _init_dit(0)
    lp = inject_lora(base, jax.random.PRNGKey(1), rank=4)

    def bump(node):
        if isinstance(node, dict):
            if "lora_b" in node:
                node["lora_b"] = node["lora_b"] + 0.01
            for v in node.values():
                bump(v)

    bump(lp)
    path = str(tmp_path / "ad.npz")
    n = save_adapters_npz(lp, path)
    assert n > 0
    re = apply_lora_state(strip_lora(lp), load_adapters_npz(path))
    np.testing.assert_array_equal(np.asarray(_dit_forward(re)),
                                  np.asarray(_dit_forward(lp)))


@pytest.mark.slow
def test_lora_composes_with_fsdp_sharded_trainer(tmp_path):
    """LoRA x FSDP: the sharded unified train step over a (fsdp=2, seq=2)
    mesh accepts lora-injected params (adapters get default shardings),
    trains only adapters, and matches the single-device LoRA loss."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.parallel.sharding import params_shardings

    make_dummy_dataset(tmp_path, n=4, text_len=8, vlm_len=6,
                       latent_shape=(16, 4, 8, 8), text_dim=48, vlm_dim=16)
    ds = OmniVideoDataset(str(tmp_path))
    pad = PadSpec(text_len=12, vlm_len=8, latent_frames=4)
    batch = {k: jnp.asarray(v)
             for k, v in collate([ds[i] for i in range(4)], pad).items()}

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "wan": inject_lora(_init_dit(0), k3, rank=4),
        "companions": init_unified_companions(k2, CFG),
    }
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=20,
                     cfg_dropout=0.0, grad_clip=1.0, remat=True,
                     trainable_filters=LORA_FILTERS)

    # single-device reference step
    tx = make_optimizer(tc, params)
    sd_state = init_train_state(params, tx)
    sd_step = jax.jit(make_unified_train_step(CFG, tc, tx, attn_impl="xla"))
    sd_state, sd_m = sd_step(sd_state, batch, jax.random.PRNGKey(42))

    mesh = create_mesh(1, 2, 2)
    sharded = jax.tree_util.tree_map(
        jax.device_put, params, params_shardings(params, mesh))
    tx2 = make_optimizer(tc, sharded)
    state = init_train_state(sharded, tx2)
    step = jax.jit(make_unified_train_step(CFG, tc, tx2, mesh=mesh,
                                           attn_impl="xla"))
    state, m = step(state, batch, jax.random.PRNGKey(42))
    np.testing.assert_allclose(float(m["loss"]), float(sd_m["loss"]),
                               rtol=1e-5)
    # frozen base bit-identical on the mesh too
    for (pa, la), (_, lb) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(state.params)):
        name = "/".join(str(getattr(p, "key", p)) for p in pa)
        if "lora_a" not in name and "lora_b" not in name:
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=name)


def test_bare_lora_sp_forward_matches_single_device():
    """LLM adapters ride the ring-SP forward: qwen3_forward_sp over a
    4-device mesh == qwen3_forward, with non-zero adapters active."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from omnivideo_tpu.models.qwen3vl.text_model import (
        qwen3_forward,
        qwen3_forward_sp,
    )
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.training.lora import inject_lora_bare

    cfg, base = _tiny_qwen3()
    lp = inject_lora_bare(base, jax.random.PRNGKey(1), rank=4)

    def bump(node):
        if isinstance(node, dict):
            for k in list(node):
                if k.endswith("_lora_b"):
                    node[k] = node[k] + 0.02
                else:
                    bump(node[k])

    bump(lp)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 32), 0,
                             cfg.vocab_size)
    _, ref = qwen3_forward(lp, cfg, ids)
    mesh = create_mesh(1, 1, 4)
    _, sp = qwen3_forward_sp(lp, cfg, ids, mesh)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # and the adapters actually matter
    _, ref_base = qwen3_forward(base, cfg, ids)
    assert not np.allclose(np.asarray(ref), np.asarray(ref_base))
