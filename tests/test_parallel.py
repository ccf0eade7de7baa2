"""Sequence-parallel attention tests on a virtual 8-device CPU mesh —
multi-chip behavior the reference can only test with real NCCL ranks
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.ops.attention import attention_xla
from omnivideo_tpu.parallel.mesh import create_mesh
from omnivideo_tpu.parallel.ring import hybrid_attention, ring_attention
from omnivideo_tpu.parallel.sharding import params_shardings
from omnivideo_tpu.parallel.ulysses import ulysses_attention


def _qkv(B=1, L=64, N=8, D=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    return mk(0), mk(1), mk(2)


def test_ulysses_matches_full_attention():
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    q, k, v = _qkv()
    ref = attention_xla(q, k, v)
    with mesh:
        out = ulysses_attention(q, k, v, mesh, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ulysses_cross_attention_shapes():
    """Different q and kv lengths (cross-attn under SP shards context too,
    full_sequence_parallel.py:204-232)."""
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 64, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 32, 8, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 32, 8, 16)), jnp.float32)
    ref = attention_xla(q, k, v)
    with mesh:
        out = ulysses_attention(q, k, v, mesh, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_matches_full_attention():
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    q, k, v = _qkv(seed=2)
    ref = attention_xla(q, k, v)
    with mesh:
        out = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_causal_matches_masked_attention():
    """Block-causal ring == attention masked at ring-block granularity."""
    mesh = create_mesh(dp=1, fsdp=1, sp=4)
    q, k, v = _qkv(L=32, seed=3)
    n, L = 4, 32
    blk = L // n
    # block-causal mask: query block i attends to key blocks ≤ i
    qi = np.arange(L)[:, None] // blk
    ki = np.arange(L)[None, :] // blk
    mask = (ki <= qi)[None, None]
    logits = np.einsum("bind,bjnd->bnij", np.asarray(q, np.float64), np.asarray(k, np.float64)) / 4.0
    logits = np.where(mask, logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bnij,bjnd->bind", w, np.asarray(v, np.float64))
    with mesh:
        out = ring_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_hybrid_ulysses_ring_matches_full_attention():
    mesh = create_mesh(dp=1, fsdp=2, sp=4)  # ulysses=2 × ring=4
    q, k, v = _qkv(L=64, N=8, seed=4)
    ref = attention_xla(q, k, v)
    with mesh:
        out = hybrid_attention(q, k, v, mesh, ulysses_axis="fsdp", ring_axis="seq")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ulysses_gradients():
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    q, k, v = _qkv(seed=5)

    def loss_sp(q, k, v):
        with mesh:
            return jnp.sum(ulysses_attention(q, k, v, mesh, impl="xla") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v) ** 2)

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_fsdp_param_sharding_rules():
    mesh = create_mesh(dp=2, fsdp=4, sp=1)
    params = {
        "blocks": {"ffn": {"kernel": jnp.zeros((4, 256, 512))}},
        "small": jnp.zeros((7,)),
        "embed": {"kernel": jnp.zeros((1000, 256))},
    }
    sh = params_shardings(params, mesh)
    assert "fsdp" in str(sh["blocks"]["ffn"]["kernel"].spec)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    # stacked block leaves never shard the layer axis
    assert sh["blocks"]["ffn"]["kernel"].spec[0] is None


def test_sp_dit_forward_matches_single_device():
    """The sequence-parallel DiT forward equals the single-device forward —
    parity target of reference full_sequence_parallel.py (C15)."""
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.models.wan_dit import SPConfig, init_wan_dit, wan_dit_apply

    cfg = WanDiTConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
    )
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # make the output nontrivial (zero-init head)
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["head"]["kernel"].shape
    ) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8, 8))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))
    # L = 4*4*4 = 64, divisible by sp 4; heads 4 divisible
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")

    mesh = create_mesh(dp=1, fsdp=1, sp=4)
    for mode in ("ulysses", "ring"):
        with mesh:
            out = wan_dit_apply(
                params, cfg, x, t, ctx, attn_impl="xla",
                sp=SPConfig(mesh=mesh, mode=mode),
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-5, err_msg=mode
        )


def test_sp_dit_hybrid_matches():
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.models.wan_dit import SPConfig, init_wan_dit, wan_dit_apply

    cfg = WanDiTConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
    )
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["head"]["kernel"].shape
    ) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8, 8))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")
    mesh = create_mesh(dp=1, fsdp=2, sp=4)
    with mesh:
        out = wan_dit_apply(
            params, cfg, x, t, ctx, attn_impl="xla",
            sp=SPConfig(mesh=mesh, mode="hybrid"),
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-5)


def test_sp_dit_padded_seq_matches():
    """Ring/hybrid SP with a seq_len that REQUIRES padding (L_nat=45 rounded
    to 48 for sp=4) equals the natural-length single-device forward — the
    reference's sp-multiple seq rounding (x2x_gen_unified.py:332-334). The
    padding validity mask travels the ring with its K/V block."""
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.models.wan_dit import SPConfig, init_wan_dit, wan_dit_apply

    cfg = WanDiTConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
    )
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["head"]["kernel"].shape
    ) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 5, 6, 6))  # L_nat=45
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")

    mesh = create_mesh(dp=1, fsdp=1, sp=4)
    for mode in ("ulysses", "ring"):
        with mesh:
            out = wan_dit_apply(
                params, cfg, x, t, ctx, attn_impl="xla", seq_len=48,
                sp=SPConfig(mesh=mesh, mode=mode),
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-5, err_msg=mode
        )

    mesh = create_mesh(dp=1, fsdp=2, sp=2)
    with mesh:
        out = wan_dit_apply(
            params, cfg, x, t, ctx, attn_impl="xla", seq_len=48,
            sp=SPConfig(mesh=mesh, mode="hybrid"),
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-5, err_msg="hybrid")


def test_ring_padded_kv_mask_matches_masked_attention():
    """ring_attention(kv_lens=...) — both impls' mask handling — equals full
    attention with -inf-masked padded keys, including a FULLY padded shard
    (the phantom-mass guard)."""
    import jax.numpy as jnp

    from omnivideo_tpu.parallel.ring import ring_attention

    rng = np.random.default_rng(4)
    B, L, N, D = 1, 32, 2, 16
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    # kv_len=20 with 4 shards of 8: shard 2 is PARTIALLY padded (rows 20-23),
    # shard 3 FULLY padded
    lens = jnp.asarray([20], jnp.int32)

    from omnivideo_tpu.ops.attention import attention_xla

    ref = attention_xla(q, k, v, kv_lens=lens)
    mesh = create_mesh(dp=1, fsdp=1, sp=4)
    out = ring_attention(q, k, v, mesh, axis="seq", kv_lens=lens)
    np.testing.assert_allclose(np.asarray(out[:, :20]), np.asarray(ref[:, :20]),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_generate_with_sequence_parallel():
    """Full generate() under Ulysses SP on the virtual mesh equals the
    single-device generate (reference BASELINE config 5 parity)."""
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
    from omnivideo_tpu.models.wan_dit import SPConfig
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = PipelineConfig(
        name="tiny-sp",
        dit=WanDiTConfig(patch_size=(1, 2, 2), in_dim=8, out_dim=8, dim=64,
                         ffn_dim=128, freq_dim=32, text_dim=48, num_heads=4,
                         num_layers=2),
        vae=VAEConfig(dim=8, z_dim=8, dim_mult=(1, 2, 4, 4), num_res_blocks=1,
                      temperal_downsample=(False, True, True)),
        max_context_len=32, dual_expert=False, vlm_in_dim=16,
        param_dtype="float32",
    )
    ctx = jnp.ones((5, 48), jnp.float32) * 0.1
    kw = dict(precomputed_context=ctx, precomputed_context_null=jnp.zeros_like(ctx),
              size=(64, 32), frame_num=9, sampling_steps=3, guide_scale=3.0,
              seed=7, decode=False)

    pipe = OmniVideoX2XUnified.random_init(cfg, attn_impl="xla", with_vae=False)
    ref = pipe.generate(**kw)

    mesh = create_mesh(dp=1, fsdp=1, sp=4)
    pipe_sp = OmniVideoX2XUnified(
        cfg, pipe.low_noise, pipe.high_noise, attn_impl="xla",
        sp=SPConfig(mesh=mesh, mode="ulysses"),
    )
    with mesh:
        out = pipe_sp.generate(**kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_pipeline_generate_fsdp_plus_sp():
    """Combined fsdp(2) x seq(4) mesh: sharded params + Ulysses SP generate
    equals single-device (BASELINE config 5 at full parallelism)."""
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
    from omnivideo_tpu.models.wan_dit import SPConfig
    from omnivideo_tpu.parallel.sharding import shard_params
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = PipelineConfig(
        name="tiny-fsdp-sp",
        dit=WanDiTConfig(patch_size=(1, 2, 2), in_dim=8, out_dim=8, dim=64,
                         ffn_dim=128, freq_dim=32, text_dim=48, num_heads=4,
                         num_layers=2),
        vae=VAEConfig(dim=8, z_dim=8),
        max_context_len=32, dual_expert=False, vlm_in_dim=16,
        param_dtype="float32",
    )
    ctx = jnp.ones((5, 48), jnp.float32) * 0.1
    kw = dict(precomputed_context=ctx, precomputed_context_null=jnp.zeros_like(ctx),
              size=(64, 32), frame_num=9, sampling_steps=2, guide_scale=3.0,
              seed=11, decode=False)
    pipe = OmniVideoX2XUnified.random_init(cfg, attn_impl="xla", with_vae=False)
    ref = pipe.generate(**kw)

    mesh = create_mesh(dp=1, fsdp=2, sp=4)
    low = pipe.low_noise
    low.wan = shard_params(low.wan, mesh)
    pipe_sp = OmniVideoX2XUnified(cfg, low, attn_impl="xla",
                                  sp=SPConfig(mesh=mesh, mode="ulysses"))
    with mesh:
        out = pipe_sp.generate(**kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_tp_param_sharding_rules():
    """Megatron-style TP specs: qkv/fc1 column-parallel, o/fc2 row-parallel,
    fsdp composing on the complementary matmul dim."""
    mesh = create_mesh(dp=1, fsdp=2, sp=1, tp=2)
    params = {
        "blocks": {
            "self_attn": {
                "q": {"kernel": jnp.zeros((2, 64, 64)), "bias": jnp.zeros((2, 64))},
                "o": {"kernel": jnp.zeros((2, 64, 64)), "bias": jnp.zeros((2, 64))},
            },
            "ffn": {
                "fc1": {"kernel": jnp.zeros((2, 64, 128))},
                "fc2": {"kernel": jnp.zeros((2, 128, 64))},
            },
        },
        "embed": {"kernel": jnp.zeros((1000, 256))},
    }
    sh = params_shardings(params, mesh)
    sa = sh["blocks"]["self_attn"]
    assert sa["q"]["kernel"].spec == jax.sharding.PartitionSpec(None, "fsdp", "tensor")
    assert sa["q"]["bias"].spec == jax.sharding.PartitionSpec(None, "tensor")
    assert sa["o"]["kernel"].spec == jax.sharding.PartitionSpec(None, "tensor", "fsdp")
    assert sa["o"]["bias"].spec == jax.sharding.PartitionSpec()
    assert sh["blocks"]["ffn"]["fc1"]["kernel"].spec == jax.sharding.PartitionSpec(None, "fsdp", "tensor")
    assert sh["blocks"]["ffn"]["fc2"]["kernel"].spec == jax.sharding.PartitionSpec(None, "tensor", "fsdp")
    # non-block leaves keep the plain fsdp rule
    assert "tensor" not in str(sh["embed"]["kernel"].spec)


def test_tp_dit_forward_matches_single_device():
    """Tensor-parallel DiT forward (params sharded on 'tensor', XLA-attention
    einsums partitioned by GSPMD) equals the single-device forward. The
    reference has no TP (SURVEY §2.3); this is the TPU-native free win."""
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply
    from omnivideo_tpu.parallel.sharding import shard_params

    cfg = WanDiTConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
    )
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["head"]["kernel"].shape
    ) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8, 8))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")

    mesh = create_mesh(dp=1, fsdp=2, sp=1, tp=2)  # heads 4 / tp 2
    sharded = shard_params(params, mesh)
    fwd = jax.jit(lambda p, x, t, c: wan_dit_apply(p, cfg, x, t, c, attn_impl="xla"))
    with mesh:
        out = fwd(sharded, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_tp_head_attention_matches_full():
    """Head-sharded shard_map attention over the 'tensor' axis == full
    attention (parallel/tp.py — lets TP keep the Pallas kernel)."""
    from omnivideo_tpu.parallel.tp import tp_head_attention

    mesh = create_mesh(dp=1, fsdp=1, sp=1, tp=4)
    q, k, v = _qkv(L=32, N=8, seed=7)
    ref = attention_xla(q, k, v)
    with mesh:
        out = tp_head_attention(q, k, v, mesh, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    # cross-attention shape (Lk != Lq)
    k2, v2 = k[:, :16], v[:, :16]
    ref = attention_xla(q, k2, v2)
    with mesh:
        out = tp_head_attention(q, k2, v2, mesh, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_tp_head_attention_pallas_interpret():
    """The ACTUAL Pallas flash kernel runs under the head-sharded shard_map
    (interpret mode on CPU) and matches the oracle — pins the TP x pallas
    composition VERDICT r2 item 5 asks for."""
    import functools

    from jax.sharding import PartitionSpec as P

    from omnivideo_tpu.ops.pallas.flash_attention import flash_attention

    mesh = create_mesh(dp=1, fsdp=1, sp=1, tp=4)
    rng = np.random.default_rng(8)
    # D=128 so the packed fast path of the kernel is exercised
    q, k, v = (jnp.asarray(rng.standard_normal((1, 32, 4, 128)), jnp.float32)
               for _ in range(3))
    ref = attention_xla(q, k, v)
    spec = P(None, None, "tensor", None)
    fn = jax.shard_map(
        functools.partial(flash_attention, interpret=True),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    with mesh:
        out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-3, atol=2e-3)


def test_tp_mode_dit_forward_matches_single_device():
    """DiT forward with SPConfig(mode='tp') — head-sharded attention via
    shard_map instead of GSPMD-partitioned einsums — equals single-device."""
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.models.wan_dit import SPConfig, init_wan_dit, wan_dit_apply
    from omnivideo_tpu.parallel.sharding import shard_params

    cfg = WanDiTConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=2,
    )
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["head"]["kernel"].shape
    ) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8, 8))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")

    mesh = create_mesh(dp=1, fsdp=2, sp=1, tp=2)  # heads 4 / tp 2
    sp = SPConfig(mesh=mesh, mode="tp")
    sharded = shard_params(params, mesh)
    fwd = jax.jit(lambda p, x, t, c: wan_dit_apply(
        p, cfg, x, t, c, attn_impl="xla", mesh=mesh, sp=sp))
    with mesh:
        out = fwd(sharded, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pipeline_generate_tp():
    """Tensor-parallel generate (fsdp 2 x tp 2 mesh, params TP-sharded, XLA
    attention partitioned by GSPMD) equals single-device — the inference face
    of the TP axis (tools/generate.py --tp_size)."""
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
    from omnivideo_tpu.parallel.sharding import shard_params
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = PipelineConfig(
        name="tiny-tp",
        dit=WanDiTConfig(patch_size=(1, 2, 2), in_dim=8, out_dim=8, dim=64,
                         ffn_dim=128, freq_dim=32, text_dim=48, num_heads=4,
                         num_layers=2),
        vae=VAEConfig(dim=8, z_dim=8),
        max_context_len=32, dual_expert=False, vlm_in_dim=16,
        param_dtype="float32",
    )
    ctx = jnp.ones((5, 48), jnp.float32) * 0.1
    kw = dict(precomputed_context=ctx, precomputed_context_null=jnp.zeros_like(ctx),
              size=(64, 32), frame_num=9, sampling_steps=2, guide_scale=3.0,
              seed=11, decode=False)
    pipe = OmniVideoX2XUnified.random_init(cfg, attn_impl="xla", with_vae=False)
    ref = pipe.generate(**kw)

    mesh = create_mesh(dp=1, fsdp=2, sp=1, tp=2)
    low = pipe.low_noise
    low.wan = shard_params(low.wan, mesh)
    pipe_tp = OmniVideoX2XUnified(cfg, low, attn_impl="xla")
    with mesh:
        out = pipe_tp.generate(**kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_ulysses_comm_dtype_rides_bf16():
    """comm_dtype=bf16 must put the all_to_alls themselves on bf16 wires
    (half the ICI bytes), not just cast somewhere nearby — asserted on the
    jaxpr — and stay within bf16 rounding of the f32-comm result."""
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 8, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 8, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 8, 16))

    import jax.numpy as jnp

    with mesh:
        ref = ulysses_attention(q, k, v, mesh, impl="xla")
        out = ulysses_attention(q, k, v, mesh, impl="xla",
                                comm_dtype=jnp.bfloat16)
        jaxpr = jax.make_jaxpr(
            lambda a, b, c: ulysses_attention(a, b, c, mesh, impl="xla",
                                              comm_dtype=jnp.bfloat16)
        )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    a2a_dtypes = []

    def walk(jp):
        if hasattr(jp, "jaxpr"):  # ClosedJaxpr
            jp = jp.jaxpr
        if not hasattr(jp, "eqns"):
            return
        for eq in jp.eqns:
            if eq.primitive.name == "all_to_all":
                a2a_dtypes.append(eq.invars[0].aval.dtype)
            for sub in eq.params.values():
                if hasattr(sub, "eqns") or hasattr(sub, "jaxpr"):
                    walk(sub)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "eqns") or hasattr(s, "jaxpr"):
                            walk(s)
    walk(jaxpr.jaxpr)
    assert a2a_dtypes, "no all_to_all found in the jaxpr"
    assert all(dt == jnp.bfloat16 for dt in a2a_dtypes), a2a_dtypes
