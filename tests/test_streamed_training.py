"""Streamed (larger-than-HBM) training parity: training/streaming.py.

The StreamedTrainer replaces make_train_step's lax.scan over blocks with
per-block host↔device streamed dispatches (forward save, vjp-recompute
backward, exact global-norm clip via two passes, per-block optax updates).
Everything here asserts it is numerically the SAME training step as the
scanned trainer (reference role: multi-GPU ZeRO fine-tuning,
finetune_model.py:725-732 — here one chip + host memory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
from omnivideo_tpu.models.wan_dit import init_wan_dit
from omnivideo_tpu.training.streaming import StreamedTrainer
from omnivideo_tpu.training.trainer import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)

CFG = PipelineConfig(
    name="tiny-stream-train",
    dit=WanDiTConfig(patch_size=(1, 2, 2), in_dim=16, out_dim=16, dim=64,
                     ffn_dim=128, freq_dim=32, text_dim=48, num_heads=4,
                     num_layers=3),
    vae=VAEConfig(),
    vlm_in_dim=16,
    max_context_len=48,
    param_dtype="float32",
)


def _batch(with_uncond=False):
    b = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (2, 16, 3, 8, 8),
                                     jnp.float32),
        "context": jax.random.normal(
            jax.random.PRNGKey(2), (2, CFG.max_context_len, CFG.dit.text_dim),
            jnp.float32),
    }
    if with_uncond:
        b["uncond_context"] = jnp.zeros_like(b["context"])
    return b


def _scanned_step(tc, params, batch, rng, steps=1):
    tx = make_optimizer(tc, params)
    state = init_train_state(params, tx)
    step = make_train_step(CFG, tc, tx, attn_impl="xla")
    for _ in range(steps):
        state, m = step(state, batch, rng)
    return state, m


def _assert_tree_close(a, b, rtol, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("opt", ["adamw", "adafactor"])
@pytest.mark.parametrize("offload", [False, True])
def test_streamed_step_matches_scanned(opt, offload):
    """One streamed step == one scanned step: loss, grad norm (global,
    pre-clip), updated resident AND block params — for both optimizers and
    with activations offloaded to host (the A14B memory mode)."""
    if opt == "adafactor" and offload:
        pytest.skip("covered by the two single-axis cases")  # keep CI fast
    tc = TrainConfig(cfg_dropout=0.0, remat=True, warmup_steps=1,
                     learning_rate=1e-3, grad_clip=0.1, optimizer=opt)
    params = init_wan_dit(jax.random.PRNGKey(0), CFG.dit, dtype=jnp.float32)
    batch = _batch()
    rng = jax.random.PRNGKey(3)

    ref_state, ref_m = _scanned_step(tc, params, batch, rng)

    st = StreamedTrainer(CFG, tc, attn_impl="xla", act_offload=offload)
    s0 = st.init_state(params)
    s1, m = st.train_step(s0, batch, rng)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m["grad_norm"]),
                               float(ref_m["grad_norm"]), rtol=1e-4)
    ref_p = ref_state.params
    ref_resident = {k: v for k, v in ref_p.items() if k != "blocks"}
    _assert_tree_close(s1.resident, ref_resident, rtol=2e-4, atol=1e-7)
    for i, blk in enumerate(s1.host_blocks):
        ref_blk = jax.tree_util.tree_map(lambda a: a[i], ref_p["blocks"])
        _assert_tree_close(blk, ref_blk, rtol=2e-4, atol=1e-7)


def test_streamed_multi_step_with_cfg_dropout():
    """Three steps with CFG dropout active: the per-block optimizer counts,
    lr schedule, weight decay, and rng threading all stay in lockstep with
    the monolithic trainer."""
    tc = TrainConfig(cfg_dropout=0.5, remat=True, warmup_steps=1,
                     total_steps=10, learning_rate=1e-3, grad_clip=0.1,
                     optimizer="adafactor", weight_decay=0.01)
    params = init_wan_dit(jax.random.PRNGKey(0), CFG.dit, dtype=jnp.float32)
    batch = _batch(with_uncond=True)

    tx = make_optimizer(tc, params)
    ref_state = init_train_state(params, tx)
    step = make_train_step(CFG, tc, tx, attn_impl="xla")
    st = StreamedTrainer(CFG, tc, attn_impl="xla", act_offload=True)
    s = st.init_state(params)
    for k in range(3):
        rng = jax.random.PRNGKey(100 + k)
        ref_state, ref_m = step(ref_state, batch, rng)
        s, m = st.train_step(s, batch, rng)
        np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                                   rtol=1e-5)

    # 3 steps of adafactor's nonlinear factored stats amplify f32
    # accumulation-order differences; observed worst leaf rel err ~2e-3
    ref_p = ref_state.params
    for i, blk in enumerate(s.host_blocks):
        ref_blk = jax.tree_util.tree_map(lambda a: a[i], ref_p["blocks"])
        _assert_tree_close(blk, ref_blk, rtol=3e-3, atol=1e-5)
    _assert_tree_close(s.resident,
                       {k: v for k, v in ref_p.items() if k != "blocks"},
                       rtol=3e-3, atol=1e-5)


def test_streamed_clip_engages_globally():
    """With a tiny clip threshold the trim ratio depends on the GLOBAL norm;
    a per-block clip would diverge from the scanned step. grad_norm must
    exceed the clip so the scale < 1 branch is actually exercised."""
    tc = TrainConfig(cfg_dropout=0.0, remat=True, warmup_steps=1,
                     learning_rate=1e-3, grad_clip=1e-3)
    params = init_wan_dit(jax.random.PRNGKey(0), CFG.dit, dtype=jnp.float32)
    batch = _batch()
    rng = jax.random.PRNGKey(3)

    ref_state, ref_m = _scanned_step(tc, params, batch, rng)
    assert float(ref_m["grad_norm"]) > tc.grad_clip  # clip engaged

    st = StreamedTrainer(CFG, tc, attn_impl="xla", act_offload=False)
    s1, m = st.train_step(st.init_state(params), batch, rng)
    ref_p = ref_state.params
    for i, blk in enumerate(s1.host_blocks):
        ref_blk = jax.tree_util.tree_map(lambda a: a[i], ref_p["blocks"])
        _assert_tree_close(blk, ref_blk, rtol=2e-4, atol=1e-7)


def test_streamed_fused_update_no_clip_matches():
    """grad_clip=0 (clipping disabled — make_optimizer now skips the clip
    transform instead of zeroing updates) fuses the optimizer update into
    the backward pass: no gradient d2h/h2d roundtrip, no pass B. Must still
    equal the monolithic no-clip step."""
    tc = TrainConfig(cfg_dropout=0.0, remat=True, warmup_steps=1,
                     learning_rate=1e-3, grad_clip=0.0, optimizer="adafactor")
    params = init_wan_dit(jax.random.PRNGKey(0), CFG.dit, dtype=jnp.float32)
    batch = _batch()
    rng = jax.random.PRNGKey(3)

    ref_state, ref_m = _scanned_step(tc, params, batch, rng)

    st = StreamedTrainer(CFG, tc, attn_impl="xla", act_offload=True)
    s1, m = st.train_step(st.init_state(params), batch, rng)
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    ref_p = ref_state.params
    for i, blk in enumerate(s1.host_blocks):
        ref_blk = jax.tree_util.tree_map(lambda a: a[i], ref_p["blocks"])
        _assert_tree_close(blk, ref_blk, rtol=2e-4, atol=1e-7)
    _assert_tree_close(s1.resident,
                       {k: v for k, v in ref_p.items() if k != "blocks"},
                       rtol=2e-4, atol=1e-7)


def test_streamed_lora_matches_monolithic_lora():
    """StreamedLoRATrainer == make_train_step over lora-injected params with
    trainable_filters=LORA_FILTERS: same loss, same updated adapters, base
    untouched. (grad_norm is NOT compared: the monolithic metric reports the
    norm over ALL grads while the clip itself — like the streamed trainer —
    uses the trainable-only norm.)"""
    from omnivideo_tpu.training.lora import (
        LORA_FILTERS,
        extract_lora,
        inject_lora,
        strip_lora,
    )
    from omnivideo_tpu.training.streaming import StreamedLoRATrainer

    tc = TrainConfig(cfg_dropout=0.0, remat=True, warmup_steps=1,
                     total_steps=10, learning_rate=1e-3, grad_clip=0.1,
                     optimizer="adamw", trainable_filters=LORA_FILTERS)
    params = init_wan_dit(jax.random.PRNGKey(0), CFG.dit, dtype=jnp.float32)
    # de-zero the head: the zero init would zero every adapter gradient
    hk = params["head"]["head"]["kernel"]
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), hk.shape, hk.dtype) * 0.02)
    params = inject_lora(params, jax.random.PRNGKey(7), rank=4)
    batch = _batch()

    tx = make_optimizer(tc, params)
    ref_state = init_train_state(params, tx)
    step = make_train_step(CFG, tc, tx, attn_impl="xla")
    st = StreamedLoRATrainer(CFG, tc, attn_impl="xla", act_offload=True)
    s = st.init_state(params)
    for k in range(2):
        rng = jax.random.PRNGKey(100 + k)
        ref_state, ref_m = step(ref_state, batch, rng)
        s, m = st.train_step(s, batch, rng)
        np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                                   rtol=1e-5)

    # adapters track the monolithic ones; base blocks bit-identical frozen
    ref_blocks = ref_state.params["blocks"]
    base_blocks = params["blocks"]
    for i in range(CFG.dit.num_layers):
        ref_blk = jax.tree_util.tree_map(lambda a: a[i], ref_blocks)
        ref_ad = extract_lora(ref_blk)
        for path, site in ref_ad.items():
            for kname in ("lora_a", "lora_b"):
                np.testing.assert_allclose(
                    np.asarray(s.lora[i][path][kname]),
                    np.asarray(site[kname]), rtol=2e-4, atol=1e-7,
                    err_msg=f"block {i} {path}/{kname}")
        base_blk = strip_lora(
            jax.tree_util.tree_map(lambda a: a[i], base_blocks))
        for (pa, la), (_, lb) in zip(
                jax.tree_util.tree_leaves_with_path(s.host_blocks[i]),
                jax.tree_util.tree_leaves_with_path(base_blk)):
            name = "/".join(str(getattr(p, "key", p)) for p in pa)
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=name)

    # export reassembles a full pytree usable by merge_lora
    full = st.export_params(s)
    assert "blocks" in full and full["blocks"]["self_attn"]["q"][
        "lora_a"].shape[0] == CFG.dit.num_layers


def test_streamed_lora_int8_base_quant():
    """base_quant="int8" (the QLoRA recipe: frozen base streams as int8 +
    per-column scales, adapters train full-precision): the step runs, the
    loss tracks the full-precision streamed LoRA step to weight-quantization
    accuracy, adapters actually move, and the stored host base is untouched
    (quantization lives only in the transfer path)."""
    from omnivideo_tpu.training.lora import LORA_FILTERS, inject_lora
    from omnivideo_tpu.training.streaming import StreamedLoRATrainer

    tc = TrainConfig(cfg_dropout=0.0, remat=True, warmup_steps=1,
                     total_steps=10, learning_rate=1e-3, grad_clip=0.1,
                     optimizer="adamw", trainable_filters=LORA_FILTERS)
    params = init_wan_dit(jax.random.PRNGKey(0), CFG.dit, dtype=jnp.bfloat16)
    hk = params["head"]["head"]["kernel"]
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), hk.shape, jnp.float32) * 0.02
    ).astype(hk.dtype)
    params = inject_lora(params, jax.random.PRNGKey(7), rank=4)
    batch = _batch()

    ref = StreamedLoRATrainer(CFG, tc, attn_impl="xla", act_offload=True)
    qt = StreamedLoRATrainer(CFG, tc, attn_impl="xla", act_offload=True,
                             base_quant="int8")
    sr, sq = ref.init_state(params), qt.init_state(params)
    lora0 = jax.tree_util.tree_map(np.asarray, sq.lora)
    for k in range(2):
        rng = jax.random.PRNGKey(100 + k)
        sr, mr = ref.train_step(sr, batch, rng)
        sq, mq = qt.train_step(sq, batch, rng)
        assert np.isfinite(float(mq["loss"]))
        np.testing.assert_allclose(float(mq["loss"]), float(mr["loss"]),
                                   rtol=0.1)
    # adapters moved
    moved = [np.abs(np.asarray(a) - b).max()
             for a, b in zip(jax.tree_util.tree_leaves(sq.lora),
                             jax.tree_util.tree_leaves(lora0))]
    assert max(moved) > 0
    # host base untouched by the quantized transfer path
    for (a, b) in zip(jax.tree_util.tree_leaves(sq.host_blocks),
                      jax.tree_util.tree_leaves(sr.host_blocks)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # int8 payload actually streams (~half bytes)
    from omnivideo_tpu.ops.quant import quantized_bytes
    assert qt._base_packed and (
        sum(v.nbytes for v in qt._base_packed[0].values())
        < 0.65 * quantized_bytes(sq.host_blocks[0]))


def test_streamed_q8_plumbing_exact_when_nothing_quantizes():
    """stream_quant='int8' with f32 params (no leaf is q8-eligible) must be
    bit-identical to the exact streamed step: proves the q8 code path —
    dequantizing block fns, device-side grad fetch, HOST-side optimizer
    pass B — is the same math, with quantization as the only difference."""
    tc = TrainConfig(learning_rate=1e-3, grad_clip=0.5, optimizer="adamw",
                     cfg_dropout=0.0)
    params = init_wan_dit(jax.random.PRNGKey(0), CFG.dit, dtype=jnp.float32)
    batch, rng = _batch(), jax.random.PRNGKey(3)

    ref = StreamedTrainer(CFG, tc, attn_impl="xla", act_offload=False)
    s_ref, m_ref = ref.train_step(ref.init_state(params), batch, rng)
    q8 = StreamedTrainer(CFG, tc, attn_impl="xla", act_offload=False,
                         stream_quant="int8")
    s_q8, m_q8 = q8.train_step(q8.init_state(params), batch, rng)

    assert float(m_ref["loss"]) == float(m_q8["loss"])
    _assert_tree_close(s_ref.host_blocks, s_q8.host_blocks, 1e-6, 1e-7)
    _assert_tree_close(s_ref.resident, s_q8.resident, 1e-6, 1e-7)


def test_streamed_q8_step_close_to_exact_bf16():
    """With bf16 params (kernels q8-eligible) the transfer-diet step is no
    longer bit-exact — grads are taken at the dequantized-q8 weights and
    ride int8 — but it must stay a small perturbation of the exact step:
    same loss to ~1%, updates within a tight relative bound."""
    cfg = PipelineConfig(
        name="tiny-stream-train-bf16",
        dit=CFG.dit, vae=VAEConfig(), vlm_in_dim=16, max_context_len=48,
        param_dtype="bfloat16",
    )
    tc = TrainConfig(learning_rate=1e-3, grad_clip=0.5, optimizer="adamw",
                     cfg_dropout=0.0, warmup_steps=0)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg.dit, dtype=jnp.bfloat16)
    batch, rng = _batch(), jax.random.PRNGKey(3)

    ref = StreamedTrainer(cfg, tc, attn_impl="xla", act_offload=False)
    s_ref, m_ref = ref.train_step(ref.init_state(params), batch, rng)
    q8 = StreamedTrainer(cfg, tc, attn_impl="xla", act_offload=False,
                         stream_quant="int8")
    s_q8, m_q8 = q8.train_step(q8.init_state(params), batch, rng)

    assert abs(float(m_ref["loss"]) - float(m_q8["loss"])) <= (
        0.02 * abs(float(m_ref["loss"])))
    # updates point the same way: compare (new - old) flattened
    ur = np.concatenate([np.ravel(np.asarray(l, np.float32))
                         for l in jax.tree_util.tree_leaves(s_ref.host_blocks)])
    uq = np.concatenate([np.ravel(np.asarray(l, np.float32))
                         for l in jax.tree_util.tree_leaves(s_q8.host_blocks)])
    p0 = np.concatenate([np.ravel(np.asarray(l, np.float32)) for l in
                         jax.tree_util.tree_leaves(
                             [jax.tree_util.tree_map(
                                 lambda a: np.asarray(a)[i], params["blocks"])
                              for i in range(cfg.dit.num_layers)])])
    dr, dq = ur - p0, uq - p0
    assert np.linalg.norm(dr) > 0  # the step moved params
    cos = float(np.dot(dr, dq) / (np.linalg.norm(dr) * np.linalg.norm(dq)))
    assert cos > 0.98, f"q8 update diverged from exact (cosine {cos:.4f})"
