"""Training stack tests: dataset, unified train step, freeze masks, resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
from omnivideo_tpu.models.unified import init_unified_companions
from omnivideo_tpu.models.wan_dit import init_wan_dit
from omnivideo_tpu.training.dataset import (
    OmniVideoDataset,
    PadSpec,
    collate,
    data_loader,
    make_dummy_dataset,
)
from omnivideo_tpu.training.trainer import (
    TrainConfig,
    _trainable_mask,
    init_train_state,
    make_optimizer,
    make_unified_train_step,
)

CFG = PipelineConfig(
    name="tiny-train",
    dit=WanDiTConfig(patch_size=(1, 2, 2), in_dim=16, out_dim=16, dim=64,
                     ffn_dim=128, freq_dim=32, text_dim=48, num_heads=4,
                     num_layers=2),
    vae=VAEConfig(),
    vlm_in_dim=16,
    max_context_len=48,
    param_dtype="float32",
)

PAD = PadSpec(text_len=12, vlm_len=8, latent_frames=3)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_dummy_dataset(root, n=6, text_len=8, vlm_len=6,
                       latent_shape=(16, 3, 8, 8), text_dim=48, vlm_dim=16)
    return root


def test_dataset_and_collate(data_root):
    ds = OmniVideoDataset(str(data_root))
    assert len(ds) == 6
    s = ds[0]
    assert s["text_emb"].shape == (8, 48)
    batch = collate([ds[0], ds[1]], PAD)
    assert batch["context"].shape == (2, 12, 48)
    assert batch["vlm"].shape == (2, 8, 16)
    assert batch["latents"].shape == (2, 16, 3, 8, 8)
    assert batch["visual_emb"].shape == (2, 16, 3, 8, 8)


def test_loader_host_sharding(data_root):
    ds = OmniVideoDataset(str(data_root))
    got0 = next(data_loader(ds, 2, PAD, seed=1, host_id=0, num_hosts=2, epochs=1))
    got1 = next(data_loader(ds, 2, PAD, seed=1, host_id=1, num_hosts=2, epochs=1))
    assert not np.allclose(got0["latents"], got1["latents"])


@pytest.mark.slow
def test_unified_train_step_decreases_loss(data_root):
    ds = OmniVideoDataset(str(data_root))
    batch = {k: jnp.asarray(v) for k, v in collate([ds[i] for i in range(4)], PAD).items()}

    tc = TrainConfig(learning_rate=2e-3, warmup_steps=1, total_steps=50,
                     cfg_dropout=0.2, grad_clip=1.0, remat=True)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "wan": init_wan_dit(k1, CFG.dit.replace(text_len=CFG.max_context_len),
                            dtype=jnp.float32),
        "companions": init_unified_companions(k2, CFG),
    }
    tx = make_optimizer(tc, params)
    state = init_train_state(params, tx)
    step = jax.jit(make_unified_train_step(CFG, tc, tx, attn_impl="xla"))

    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(8):
        # same batch, same rng -> optimizer must reduce this fixed loss
        state, m = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_trainable_mask_freezing():
    params = {"wan": {"blocks": {"k": jnp.zeros(3)}}, "companions": {"vlm_proj": jnp.zeros(3)}}
    mask = _trainable_mask(params, ("companions",))
    assert mask["companions"]["vlm_proj"] is True
    assert mask["wan"]["blocks"]["k"] is False


def test_trainable_filters_actually_freeze():
    """Regression: optax.masked passes masked-OUT updates through UNCHANGED
    (raw gradients), so without the set_to_zero complement stage every
    frozen param drifted by +grad each step."""
    import optax

    tc = TrainConfig(learning_rate=1e-2, warmup_steps=0, total_steps=10,
                     grad_clip=0.0, trainable_filters=("companions",))
    params = {"wan": jnp.ones(3), "companions": jnp.ones(3)}
    tx = make_optimizer(tc, params)
    st = tx.init(params)
    grads = {"wan": jnp.full(3, 5.0), "companions": jnp.full(3, 5.0)}
    for _ in range(2):
        up, st = tx.update(grads, st, params)
        params = optax.apply_updates(params, up)
    np.testing.assert_array_equal(np.asarray(params["wan"]), 1.0)
    assert not np.allclose(np.asarray(params["companions"]), 1.0)


def test_checkpoint_save_restore(tmp_path, data_root):
    from omnivideo_tpu.training.checkpoint import CheckpointManager

    tc = TrainConfig(total_steps=10, warmup_steps=1)
    params = {"w": jnp.arange(4.0)}
    tx = make_optimizer(tc)
    state = init_train_state(params, tx)
    state = state._replace(step=jnp.asarray(7, jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(7, state)
    restored = mgr.restore(init_train_state(params, tx))
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(4.0))


def test_tar_shard_dataset(tmp_path, data_root):
    """Indexed tar shards (role of reference webdataset wids)."""
    import tarfile

    shard = tmp_path / "shard-000.tar"
    with tarfile.open(shard, "w") as tf:
        for f in sorted(data_root.iterdir())[:4]:
            tf.add(f, arcname=f.name)
    ds = OmniVideoDataset(str(tmp_path))
    assert len(ds) == 4
    s = ds[0]
    assert s["text_emb"].shape == (8, 48)


@pytest.mark.slow
def test_alignment_training_decreases_loss():
    """VisionHead+DM_Adapter alignment step (role of train_vila_vh)."""
    import optax

    from omnivideo_tpu.models.adapters import (
        dm_adapter_from_state_dict,
        vision_head_from_state_dict,
    )
    from omnivideo_tpu.training.align import (
        init_align_state,
        make_align_step,
    )

    g = np.load(__import__("pathlib").Path(__file__).parent / "golden" / "adapter_tiny.npz")
    sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
    sd2 = dict(sd)
    w = np.asarray(sd["fc.0.weight"])
    sd2["fc.0.weight"] = np.concatenate([w, w[:, :8]], axis=1)
    params = {
        "adapter": dm_adapter_from_state_dict(sd2),
        "vision_head": vision_head_from_state_dict(
            {k.replace("adapter.", "visionHeadAdapter."): v for k, v in sd.items()}
        ),
    }
    rng = np.random.default_rng(0)
    batch = {
        "vlm": jnp.asarray(rng.standard_normal((2, 10, 24)), jnp.float32),
        "target": jnp.asarray(rng.standard_normal((2, 8, 32)) * 0.1, jnp.float32),
    }
    tx = optax.adam(1e-3)
    state = init_align_state(params, tx)
    step = jax.jit(make_align_step(tx, cosine_weight=0.1))
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_prefetch_loader(data_root):
    from omnivideo_tpu.training.dataset import PrefetchLoader

    ds = OmniVideoDataset(str(data_root))
    base = data_loader(ds, 2, PAD, seed=3, epochs=1)
    pre = PrefetchLoader(data_loader(ds, 2, PAD, seed=3, epochs=1), depth=2)
    a = list(base)
    b = list(pre)
    assert len(a) == len(b) > 0
    np.testing.assert_allclose(a[0]["latents"], b[0]["latents"])


@pytest.mark.slow
def test_sft_step_lm_and_combined():
    """SFT step: loss decreases on a repeated batch; -100 masking honored;
    combined mode trains the alignment chain too."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.models.adapters import init_dm_adapter, init_vision_head
    from omnivideo_tpu.models.qwen3vl.text_model import Qwen3TextConfig
    from omnivideo_tpu.training.sft import (
        SFTConfig,
        build_sft_labels,
        init_sft_state,
        lm_loss,
        make_sft_optimizer,
        make_sft_step,
    )

    cfg = Qwen3TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=16,
    )
    key = jax.random.PRNGKey(0)

    def lin(k, i, o):
        return jax.random.normal(k, (i, o)) * 0.05

    ks = jax.random.split(key, 24)
    D, V = cfg.hidden_size, cfg.vocab_size
    layer = lambda i: {
        "attn": {
            "q": lin(ks[i], D, 2 * 16), "k": lin(ks[i + 1], D, 16),
            "v": lin(ks[i + 2], D, 16), "o": lin(ks[i + 3], 2 * 16, D),
            "q_norm": jnp.ones((16,)), "k_norm": jnp.ones((16,)),
        },
        "ln1": jnp.ones((D,)), "ln2": jnp.ones((D,)),
        "mlp": {"gate": lin(ks[i + 4], D, 64), "up": lin(ks[i + 5], D, 64),
                "down": lin(ks[i + 6], 64, D)},
    }
    import jax.tree_util as jtu

    layers = jtu.tree_map(lambda *xs: jnp.stack(xs), layer(0), layer(7))
    params = {
        "lm": {
            "embed": jax.random.normal(ks[14], (V, D)) * 0.05,
            "layers": layers,
            "norm": jnp.ones((D,)),
            "lm_head": jax.random.normal(ks[15], (D, V)) * 0.05,
        }
    }

    ids = jax.random.randint(ks[16], (2, 12), 0, V)
    labels = build_sft_labels(ids, jnp.array([4, 6]))
    assert int((labels[0, :4] == -100).sum()) == 4
    assert int((labels[1, :6] == -100).sum()) == 6

    # masking honored: corrupting a masked position doesn't change the loss
    l0, _ = lm_loss(params["lm"], cfg, ids, labels)
    ids2 = ids.at[0, 1].set((ids[0, 1] + 1) % V)  # only affects masked target
    labels2 = build_sft_labels(ids2, jnp.array([4, 6]))
    # note ids change DOES alter the forward; instead corrupt labels only:
    labels3 = labels.at[0, 1].set(-100)  # already masked → no-op
    l1, _ = lm_loss(params["lm"], cfg, ids, labels3)
    assert float(jnp.abs(l0 - l1)) < 1e-6

    tc = SFTConfig(learning_rate=5e-3, warmup_steps=1, total_steps=50)
    tx = make_sft_optimizer(tc)
    step = jax.jit(make_sft_step(cfg, tc, tx))
    state = init_sft_state(params, tx)
    batch = {"ids": ids, "labels": labels}
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses

    # combined LM + alignment (train_vila_vh role)
    k2 = jax.random.split(ks[17], 2)
    params2 = dict(params)
    params2["chain"] = {
        "vision_head": init_vision_head(k2[0], in_dim=D, hidden_dim=16,
                                        out_dim=24, num_queries=4,
                                        num_layers=1, num_heads=2),
        "adapter": init_dm_adapter(k2[1], in_dim=24, hidden_dim=16,
                                   out_dim=16, num_queries=6,
                                   num_layers=1, num_heads=2),
    }
    tc2 = SFTConfig(learning_rate=5e-3, warmup_steps=1, total_steps=50,
                    align_weight=0.5)
    tx2 = make_sft_optimizer(tc2)
    step2 = jax.jit(make_sft_step(cfg, tc2, tx2))
    state2 = init_sft_state(params2, tx2)
    batch2 = dict(batch)
    batch2["vlm"] = jax.random.normal(ks[18], (2, 9, D))
    batch2["target"] = jax.random.normal(ks[19], (2, 6, 16)) * 0.1
    state2, m2 = step2(state2, batch2)
    state2, m2 = step2(state2, batch2)  # step 1 has lr=0 (warmup from zero)
    assert "align_loss" in m2 and float(m2["loss"]) > 0
    # chain params actually updated
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b,
                               state2.params["chain"], params2["chain"]),
        0.0,
    )
    assert delta > 0


def test_sft_step_sharded_mesh():
    """SFT step under dp×fsdp sharding: params FSDP-sharded, batch
    data-sharded, one jitted step runs and the loss is finite."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    from omnivideo_tpu.models.qwen3vl.text_model import Qwen3TextConfig
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.parallel.sharding import batch_sharding, params_shardings
    from omnivideo_tpu.training.sft import (
        SFTConfig,
        build_sft_labels,
        init_sft_state,
        make_sft_optimizer,
        make_sft_step,
    )

    cfg = Qwen3TextConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    )
    mesh = create_mesh(2, 2, 1)

    def lin(k, i, o):
        return jax.random.normal(k, (i, o)) * 0.05

    D, V, hd = 64, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 20)
    layer = lambda i: {
        "attn": {
            "q": lin(ks[i], D, 4 * hd), "k": lin(ks[i + 1], D, 2 * hd),
            "v": lin(ks[i + 2], D, 2 * hd), "o": lin(ks[i + 3], 4 * hd, D),
            "q_norm": jnp.ones((hd,)), "k_norm": jnp.ones((hd,)),
        },
        "ln1": jnp.ones((D,)), "ln2": jnp.ones((D,)),
        "mlp": {"gate": lin(ks[i + 4], D, 128), "up": lin(ks[i + 5], D, 128),
                "down": lin(ks[i + 6], 128, D)},
    }
    import jax.tree_util as jtu

    params = {"lm": {
        "embed": jax.random.normal(ks[14], (V, D)) * 0.05,
        "layers": jtu.tree_map(lambda *xs: jnp.stack(xs), layer(0), layer(7)),
        "norm": jnp.ones((D,)),
        "lm_head": jax.random.normal(ks[15], (D, V)) * 0.05,
    }}
    with mesh:
        sh = params_shardings(params, mesh)
        params = jtu.tree_map(jax.device_put, params, sh)
        tc = SFTConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
        tx = make_sft_optimizer(tc)
        step = jax.jit(make_sft_step(cfg, tc, tx))
        state = init_sft_state(params, tx)
        ids = jax.random.randint(ks[16], (4, 16), 0, V)
        batch = {
            "ids": jax.device_put(ids, batch_sharding(mesh, 2)),
            "labels": jax.device_put(
                build_sft_labels(ids, jnp.full((4,), 5)), batch_sharding(mesh, 2)
            ),
        }
        state, m = step(state, batch)
        state, m = step(state, batch)
        assert bool(jnp.isfinite(m["loss"])) and float(m["grad_norm"]) > 0


def test_sft_collate_masks():
    """sft_collate: prompt + padding masked to -100; attn_mask marks real."""
    import numpy as np

    from omnivideo_tpu.training.sft import IGNORE_INDEX, sft_collate

    samples = [
        {"ids": np.arange(1, 11), "prompt_len": 4},
        {"ids": np.arange(1, 7), "prompt_len": 2},
    ]
    b = sft_collate(samples, seq_len=12)
    assert b["ids"].shape == (2, 12)
    lab = np.asarray(b["labels"])
    assert (lab[0, :4] == IGNORE_INDEX).all() and (lab[0, 10:] == IGNORE_INDEX).all()
    assert (lab[0, 4:10] == np.arange(5, 11)).all()
    assert (lab[1, :2] == IGNORE_INDEX).all() and (lab[1, 6:] == IGNORE_INDEX).all()
    am = np.asarray(b["attn_mask"])
    assert am[0].sum() == 10 and am[1].sum() == 6


def test_sft_step_sequence_parallel():
    """SFT with the sequence-parallel LM forward (ring token-causal) gives
    the same loss and updates as single-device."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    import jax.tree_util as jtu

    from omnivideo_tpu.models.qwen3vl.text_model import Qwen3TextConfig
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.training.sft import (
        SFTConfig,
        build_sft_labels,
        init_sft_state,
        make_sft_optimizer,
        make_sft_step,
    )

    cfg = Qwen3TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=1, head_dim=16,
    )
    mesh = create_mesh(1, 1, 4)

    def lin(k, i, o):
        return jax.random.normal(k, (i, o)) * 0.05

    D, V, hd = 32, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    layer = {
        "attn": {"q": lin(ks[0], D, 2 * hd), "k": lin(ks[1], D, hd),
                 "v": lin(ks[2], D, hd), "o": lin(ks[3], 2 * hd, D),
                 "q_norm": jnp.ones((hd,)), "k_norm": jnp.ones((hd,))},
        "ln1": jnp.ones((D,)), "ln2": jnp.ones((D,)),
        "mlp": {"gate": lin(ks[4], D, 64), "up": lin(ks[5], D, 64),
                "down": lin(ks[6], 64, D)},
    }
    params = {"lm": {
        "embed": jax.random.normal(ks[7], (V, D)) * 0.05,
        "layers": jtu.tree_map(lambda x: x[None], layer),
        "norm": jnp.ones((D,)),
        "lm_head": jax.random.normal(ks[8], (D, V)) * 0.05,
    }}
    ids = jax.random.randint(ks[9], (2, 16), 0, V)
    batch = {"ids": ids, "labels": build_sft_labels(ids, jnp.array([4, 6]))}

    tc = SFTConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    tx = make_sft_optimizer(tc)
    with mesh:
        step_sp = jax.jit(make_sft_step(cfg, tc, tx, sp_mesh=mesh))
        st_sp, m_sp = step_sp(init_sft_state(params, tx), batch)
    step_1d = jax.jit(make_sft_step(cfg, tc, tx))
    st_1d, m_1d = step_1d(init_sft_state(params, tx), batch)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_1d["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(m_sp["grad_norm"]), float(m_1d["grad_norm"]), rtol=1e-3
    )


# ---------------------------------------------------------------------------
# Conversation-format SFT data (training/conversation.py)
# ---------------------------------------------------------------------------


def _tiny_chat_tokenizer():
    """In-memory whitespace WordLevel tokenizer with ChatML specials — enough
    to exercise chat templating + per-turn masking without any checkpoint."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import WhitespaceSplit
    from transformers import PreTrainedTokenizerFast

    words = ("system user assistant you are helpful describe the image "
             "a cat on mat and also what color is it black thanks "
             "<image> <video> q1 a1 q2 a2").split()
    vocab = {"<unk>": 0, "<pad>": 1}
    for w in words:
        vocab.setdefault(w, len(vocab))
    t = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = WhitespaceSplit()
    t.add_special_tokens(["<|im_start|>", "<|im_end|>"])
    return PreTrainedTokenizerFast(
        tokenizer_object=t, unk_token="<unk>", pad_token="<pad>",
        additional_special_tokens=["<|im_start|>", "<|im_end|>"],
    )


def test_preprocess_conversation_multi_turn_masks():
    """Only assistant responses (+ stop token) carry labels; system/user
    turns and assistant headers are IGNORE_INDEX — reference
    preprocess_conversation (llava/utils/tokenizer.py:116-153)."""
    from omnivideo_tpu.training.conversation import (
        IGNORE_INDEX,
        preprocess_conversation,
    )

    tok = _tiny_chat_tokenizer()
    conv = [
        {"from": "system", "value": "you are helpful"},
        {"from": "human", "value": "q1"},
        {"from": "gpt", "value": "a1"},
        {"from": "human", "value": "q2"},
        {"from": "gpt", "value": "a2 thanks"},
    ]
    s = preprocess_conversation(conv, tok)
    ids, labels = s["ids"], s["labels"]
    assert ids.shape == labels.shape and ids.ndim == 1

    dec = {i: w for w, i in tok.get_vocab().items()}
    kept = [dec[int(t)] for t, l in zip(ids, labels) if l != IGNORE_INDEX]
    # exactly the two responses, each followed by its <|im_end|> stop token
    assert kept == ["a1", "<|im_end|>", "a2", "thanks", "<|im_end|>"]
    # the masked side still contains the question tokens
    masked = [dec[int(t)] for t, l in zip(ids, labels) if l == IGNORE_INDEX]
    assert "q1" in masked and "q2" in masked and "system" in masked
    # label positions agree with ids where unmasked
    import numpy as np

    live = labels != IGNORE_INDEX
    assert (labels[live] == ids[live]).all()


def test_preprocess_multimodal_placeholders():
    from omnivideo_tpu.training.conversation import preprocess_multimodal

    # media attached, no token anywhere -> prepended to the first turn
    msgs = preprocess_multimodal(
        [{"from": "human", "value": "describe"}, {"from": "gpt", "value": "a cat"}],
        has_media=True,
    )
    assert msgs[0]["content"].startswith("<image>\n")
    # token already present -> kept, single trailing newline enforced
    msgs = preprocess_multimodal(
        [{"from": "human", "value": "look <image>\n\n here"}], has_media=True)
    assert "<image>\n\n" not in msgs[0]["content"]
    assert "<image>\n" in msgs[0]["content"]
    # no media -> untouched
    msgs = preprocess_multimodal(
        [{"from": "human", "value": "describe"}], has_media=False)
    assert msgs[0]["content"] == "describe"


def test_conversation_dataset_and_collate(tmp_path):
    import json

    import numpy as np

    from omnivideo_tpu.training.conversation import ConversationDataset
    from omnivideo_tpu.training.sft import IGNORE_INDEX, sft_collate

    recs = [
        {"conversations": [{"from": "human", "value": "q1"},
                           {"from": "gpt", "value": "a1"}],
         "image": "img.png"},
        {"conversations": [{"from": "human", "value": "q2"},
                           {"from": "gpt", "value": "a2 thanks"}]},
    ]
    f = tmp_path / "conv.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in recs))
    ds = ConversationDataset(str(f), _tiny_chat_tokenizer(), media_token_len=7)

    assert len(ds) == 2
    # multimodal positive / text-only negative, media estimate added
    ml = ds.modality_lengths
    assert ml[0] > 0 and ml[1] < 0 and ml[0] == ds.lengths[0]

    s0 = ds[0]
    assert s0["image"] == "img.png"
    assert (s0["labels"] != IGNORE_INDEX).sum() > 0

    b = sft_collate([ds[0], ds[1]], seq_len=32)
    assert b["ids"].shape == (2, 32)
    lab = np.asarray(b["labels"])
    n_live0 = int((np.asarray(ds[0]["labels"]) != IGNORE_INDEX).sum())
    assert int((lab[0] != IGNORE_INDEX).sum()) == n_live0
    # padding fully masked
    t0 = len(ds[0]["ids"])
    assert (lab[0, t0:] == IGNORE_INDEX).all()


def test_length_grouped_indices():
    import numpy as np

    from omnivideo_tpu.training.conversation import (
        get_length_grouped_indices,
        get_modality_length_grouped_indices,
        split_to_even_chunks,
    )

    lengths = [3, 30, 5, 50, 7, 70, 9, 90, 11, 110, 13, 130, 15, 150, 17, 170]
    order = get_length_grouped_indices(lengths, batch_size=2, world_size=2,
                                       rng=np.random.default_rng(0))
    assert sorted(order) == list(range(16))  # a permutation
    # each megabatch (bs*world=4) spans a narrower length range than random:
    # its internal ordering is length-sorted into balanced world chunks
    mbs = [order[i:i + 4] for i in range(0, 16, 4)]
    spread = max(lengths) - min(lengths)
    assert all(max(lengths[i] for i in m) - min(lengths[i] for i in m) < spread
               for m in mbs)

    # greedy balance expects desc-sorted input (how the megabatches arrive)
    chunks = split_to_even_chunks(list(range(4)), [10, 8, 1, 1], 2)
    assert sorted(sum(chunks, [])) == [0, 1, 2, 3]
    loads = [sum([10, 8, 1, 1][i] for i in c) for c in chunks]
    assert max(loads) - min(loads) <= 2  # greedy balance

    # modality grouping: no mixed batches except the merged leftover
    mlens = [10, -12, 14, -16, 18, -20, 22, -24]
    order = get_modality_length_grouped_indices(
        mlens, batch_size=2, world_size=1, rng=np.random.default_rng(1))
    assert sorted(order) == list(range(8))
    full_batches = [order[i:i + 2] for i in range(0, 6, 2)]
    for b in full_batches[:-1]:
        signs = {mlens[i] > 0 for i in b}
        assert len(signs) == 1, f"mixed-modality batch {b}"


def test_sft_loader_group_by_length(tmp_path):
    import json

    from omnivideo_tpu.training.conversation import ConversationDataset
    from omnivideo_tpu.training.sft import sft_data_loader

    recs = [{"conversations": [{"from": "human", "value": "q1 " * (i + 1)},
                               {"from": "gpt", "value": "a1"}]}
            for i in range(6)]
    f = tmp_path / "conv.json"
    f.write_text(json.dumps(recs))
    ds = ConversationDataset(str(f), _tiny_chat_tokenizer())
    loader = sft_data_loader(ds, batch_size=2, seq_len=32,
                             group_by_length=True)
    b = next(loader)
    assert b["ids"].shape == (2, 32) and b["labels"].shape == (2, 32)


def test_run_config_yaml_tier(tmp_path):
    """YAML config tier: CLI-explicit > YAML > defaults, typo protection,
    and run_config.yaml provenance (ref finetune_model.py:87-213)."""
    import argparse

    from omnivideo_tpu.utils.run_config import (
        apply_yaml_config,
        dump_run_config,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--lr", type=float, default=3e-6)
    p.add_argument("--total_steps", type=int, default=1000)
    p.add_argument("--task", default="t2v-1.3B")

    cfgf = tmp_path / "train.yaml"
    cfgf.write_text("lr: 1.0e-4\ntotal_steps: 50\n")
    argv = ["--config", str(cfgf), "--lr", "2e-5"]
    args = p.parse_args(argv)
    args = apply_yaml_config(args, p, argv)
    assert args.lr == 2e-5          # explicitly typed flag beats YAML
    assert args.total_steps == 50   # YAML beats default
    assert args.task == "t2v-1.3B"  # untouched default survives

    out = dump_run_config(args, tmp_path / "run")
    import yaml

    resolved = yaml.safe_load(out.read_text())
    assert resolved["lr"] == 2e-5 and resolved["total_steps"] == 50

    bad = tmp_path / "bad.yaml"
    bad.write_text("learning_rate: 1.0\n")  # not a flag name
    args2 = p.parse_args(["--config", str(bad)])
    with pytest.raises(SystemExit):
        apply_yaml_config(args2, p, ["--config", str(bad)])

    # argparse prefix abbreviations count as explicitly typed (ADVICE r2):
    # `--total 77` abbreviates --total_steps, so YAML must not clobber it
    argv3 = ["--config", str(cfgf), "--total", "77"]
    args3 = p.parse_args(argv3)
    args3 = apply_yaml_config(args3, p, argv3)
    assert args3.total_steps == 77
    assert args3.lr == 1e-4  # YAML still applies to untyped flags


def test_mixture_dataset_weights(tmp_path):
    """MixtureDataset: weight>1 repeats a source, weight<1 subsamples, and
    lengths pass through for length-grouped batching (role of the reference
    data-mixture recipes, llava/data/datasets_mixture.py)."""
    import json

    from omnivideo_tpu.training.conversation import ConversationDataset
    from omnivideo_tpu.training.sft import MixtureDataset, sft_data_loader

    def write(name, n):
        recs = [{"conversations": [{"from": "human", "value": f"q{i} " + "x " * i},
                                   {"from": "gpt", "value": f"a{i}"}]}
                for i in range(n)]
        f = tmp_path / name
        f.write_text("\n".join(json.dumps(r) for r in recs))
        return str(f)

    tok = _tiny_chat_tokenizer()
    a = ConversationDataset(write("a.jsonl", 4), tok)
    b = ConversationDataset(write("b.jsonl", 8), tok)

    mix = MixtureDataset([a, b], [2.0, 0.5], seed=0)
    assert len(mix) == 2 * 4 + 4  # a twice, half of b
    assert len(mix.lengths) == len(mix)
    s = mix[0]
    assert "ids" in s and "labels" in s

    # grouped loader composes with the mixture
    loader = sft_data_loader(mix, batch_size=2, seq_len=32, group_by_length=True)
    batch = next(loader)
    assert batch["ids"].shape == (2, 32)


def test_grad_accumulation_matches_large_batch():
    """grad_accum_steps=k over k micro-batches equals one k-sized batch
    update (MultiSteps mean-accumulation; role of the reference's DeepSpeed
    gradient_accumulation_steps, omnivideo_mixed_task_1_3B.yaml:61)."""
    import optax

    from omnivideo_tpu.training.trainer import TrainConfig, make_optimizer

    params = {"w": jnp.ones((4,))}

    def grad_of(batch):  # fake per-batch gradient: the batch mean
        return {"w": jnp.full((4,), float(np.mean(batch)))}

    # accumulated: two micro-batches
    tc = TrainConfig(learning_rate=1e-2, grad_clip=10.0, warmup_steps=0,
                     total_steps=10, grad_accum_steps=2)
    tx = make_optimizer(tc)
    st = tx.init(params)
    p_acc = params
    for mb in ([1.0, 3.0], [5.0, 7.0]):
        g = grad_of(np.asarray(mb))
        up, st = tx.update(g, st, p_acc)
        p_acc = optax.apply_updates(p_acc, up)

    # reference: one update with the mean gradient of the combined batch
    tc1 = TrainConfig(learning_rate=1e-2, grad_clip=10.0, warmup_steps=0,
                      total_steps=10, grad_accum_steps=1)
    tx1 = make_optimizer(tc1)
    st1 = tx1.init(params)
    g = grad_of(np.asarray([1.0, 3.0, 5.0, 7.0]))
    up1, st1 = tx1.update(g, st1, params)
    p_ref = optax.apply_updates(params, up1)

    np.testing.assert_allclose(np.asarray(p_acc["w"]), np.asarray(p_ref["w"]),
                               rtol=1e-6)


def test_adafactor_weight_decay_is_lr_scaled():
    """optax.adafactor's own weight_decay_rate applies UNSCALED by lr (it
    runs after the internal lr multiply): a raw 0.01 would decay params
    ~1%/step, ~lr/wd times stronger than adamw's decoupled lr·wd and enough
    to destroy a finetune in a few hundred steps. make_optimizer must emit
    a decay of ~lr·wd·param per step instead (ADVICE r3, medium)."""
    import jax
    import jax.numpy as jnp
    import optax

    from omnivideo_tpu.training.trainer import TrainConfig, make_optimizer

    lr, wd = 3e-4, 0.01
    tc = TrainConfig(learning_rate=lr, weight_decay=wd, optimizer="adafactor",
                     warmup_steps=0, total_steps=100, grad_clip=1e9)
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    tx = make_optimizer(tc, params)
    state = tx.init(params)
    # near-zero gradient: the update is ~pure weight decay
    grads = {"w": jnp.full((4, 4), 1e-30, jnp.float32)}
    updates, state = tx.update(grads, state, params)
    params2 = optax.apply_updates(params, updates)
    per_step = float(jnp.mean(jnp.abs(params2["w"] - params["w"])))
    # decoupled lr-scaled decay: |Δw| ≈ lr·wd·|w| = 3e-6 (adafactor's own
    # epsilons perturb this by <2x); the broken form gives ~1e-2
    assert per_step < 5e-5, per_step
    assert per_step > 1e-7, per_step


def test_logit_normal_timestep_sampling():
    """SD3-style logit-normal density (reference weighting_scheme,
    omnivideo_mixed_task_1_3B.yaml:54-57): mid-noise concentration, valid
    index range, and the train step runs under it."""
    from omnivideo_tpu.training.trainer import TrainConfig, _sample_timestep_ids

    tc = TrainConfig(timestep_sampling="logit_normal", logit_mean=0.0,
                     logit_std=1.0, num_train_timesteps=1000)
    ids = np.asarray(_sample_timestep_ids(jax.random.PRNGKey(0), 4096, tc))
    assert ids.min() >= 0 and ids.max() < 1000
    # sigmoid(N(0,1)) concentrates mass at the middle: the central half
    # [250, 750) must hold well over its uniform share (50%)
    frac_mid = np.mean((ids >= 250) & (ids < 750))
    assert frac_mid > 0.6, frac_mid

    tcu = TrainConfig(timestep_sampling="uniform", num_train_timesteps=1000)
    idu = np.asarray(_sample_timestep_ids(jax.random.PRNGKey(0), 4096, tcu))
    assert 0.45 < np.mean((idu >= 250) & (idu < 750)) < 0.55


def test_mode_timestep_sampling_valid():
    from omnivideo_tpu.training.trainer import TrainConfig, _sample_timestep_ids

    tc = TrainConfig(timestep_sampling="mode", mode_scale=1.29,
                     num_train_timesteps=1000)
    ids = np.asarray(_sample_timestep_ids(jax.random.PRNGKey(1), 4096, tc))
    assert ids.min() >= 0 and ids.max() < 1000
    # mode sampling also concentrates away from the uniform edges
    assert np.mean((ids >= 250) & (ids < 750)) > 0.5


@pytest.mark.slow
def test_dit_train_step_pallas_interpret_matches_xla():
    """The plain DiT train step (make_train_step — the path the on-chip
    training bench drives) through the REAL Pallas flash fwd+bwd kernels
    (interpret mode) must match the XLA-attention step: loss, grad norm, and
    the updated params. Guards the flash custom-vjp integration that CPU-only
    suites previously never exercised in a training context."""
    from omnivideo_tpu.training.trainer import make_train_step

    tc = TrainConfig(cfg_dropout=0.0, remat=True, warmup_steps=1,
                     learning_rate=1e-3)
    params = init_wan_dit(jax.random.PRNGKey(0), CFG.dit, dtype=jnp.float32)
    tx = make_optimizer(tc, params)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (2, 16, 3, 8, 8),
                                     jnp.float32),
        "context": jax.random.normal(jax.random.PRNGKey(2),
                                     (2, CFG.max_context_len, CFG.dit.text_dim),
                                     jnp.float32),
    }
    rng = jax.random.PRNGKey(3)

    results = {}
    for impl in ("xla", "pallas_interpret"):
        state = init_train_state(params, tx)
        step = make_train_step(CFG, tc, tx, attn_impl=impl)
        state, m = step(state, batch, rng)
        results[impl] = (float(m["loss"]), float(m["grad_norm"]), state.params)

    lx, gx, px = results["xla"]
    lp, gp, pp = results["pallas_interpret"]
    np.testing.assert_allclose(lp, lx, rtol=1e-4)
    np.testing.assert_allclose(gp, gx, rtol=1e-3)
    flat_x = jax.tree_util.tree_leaves(px)
    flat_p = jax.tree_util.tree_leaves(pp)
    for a, b in zip(flat_p, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_train_step_memory_knobs():
    """adafactor optimizer + bf16 scan-carry (the single-chip HBM knobs for
    large shapes — 480p·49f AdamW/f32-carry needs 17.7 GB vs the 16 GB chip):
    the step runs, and since the forward only rounds the residual stream at
    block boundaries, the step-1 loss stays close to the f32/adamw step."""
    from omnivideo_tpu.training.trainer import make_train_step

    params = init_wan_dit(jax.random.PRNGKey(0), CFG.dit, dtype=jnp.float32)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (2, 16, 3, 8, 8),
                                     jnp.float32),
        "context": jax.random.normal(jax.random.PRNGKey(2),
                                     (2, CFG.max_context_len, CFG.dit.text_dim),
                                     jnp.float32),
    }
    rng = jax.random.PRNGKey(3)

    losses = {}
    for name, tc in {
        "f32_adamw": TrainConfig(cfg_dropout=0.0, remat=True,
                                 warmup_steps=0, learning_rate=1e-3),
        "bf16_adafactor": TrainConfig(cfg_dropout=0.0, remat=True,
                                      warmup_steps=0, learning_rate=1e-3,
                                      optimizer="adafactor",
                                      carry_dtype="bfloat16"),
    }.items():
        tx = make_optimizer(tc, params)
        state = init_train_state(params, tx)
        step = make_train_step(CFG, tc, tx)
        state, m = step(state, batch, rng)
        losses[name] = float(m["loss"])
        assert np.isfinite(losses[name])
        state, _ = step(state, batch, rng)
        # params actually moved (summed across the whole tree: individual
        # leaves — e.g. the stacked cross-attn k bias — can sit at zero)
        delta = sum(
            float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            for a, b in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(params)))
        assert delta > 0.0, name

    np.testing.assert_allclose(losses["bf16_adafactor"], losses["f32_adamw"],
                               rtol=2e-2)
