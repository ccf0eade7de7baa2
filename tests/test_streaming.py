"""Layer-streaming executor: parity with the scanned forward + HBM bounding.

The streamed schedule (pipelines/streaming.py) exists to run the A14B DiT on
a chip whose HBM cannot hold all 40 blocks (reference runs it whole on one
80 GB GPU, x2x_gen_unified.py:261-540). Its numerics must be IDENTICAL to
wan_dit_apply's lax.scan — the chip run only adds the performance evidence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from omnivideo_tpu.configs.base import WanDiTConfig
from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply
from omnivideo_tpu.pipelines.streaming import (
    BlockStreamingExecutor,
    split_host_params,
    wan_dit_stream_apply,
)


def _tiny():
    cfg = WanDiTConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=3,
    )
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["head"]["kernel"].shape) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8, 8))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))
    return cfg, params, x, t, ctx


def test_streamed_forward_matches_scanned():
    cfg, params, x, t, ctx = _tiny()
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")
    resident, blocks = split_host_params(params)
    for window in (1, 2, 3):
        ex = BlockStreamingExecutor(cfg, blocks, window=window,
                                    attn_impl="xla")
        out = wan_dit_stream_apply(resident, ex, cfg, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"window={window}")


def test_streamed_forward_padded_seq():
    cfg, params, x, t, ctx = _tiny()
    # L_nat = 4*4*4 = 64; pad to 80 — the kv_lens mask path
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla", seq_len=80)
    resident, blocks = split_host_params(params)
    ex = BlockStreamingExecutor(cfg, blocks, window=2, attn_impl="xla")
    out = wan_dit_stream_apply(resident, ex, cfg, x, t, ctx, seq_len=80)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_layer_stream_generate_matches_scanned():
    """Full generate() with layer_stream=True (host-resident block stacks,
    per-step executor dispatches) equals the jit-scanned denoise — the
    single-chip deployment path for larger-than-HBM experts (reference runs
    A14B whole on an 80 GB GPU, x2x_gen_unified.py:261-540)."""
    from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = PipelineConfig(
        name="tiny-stream",
        dit=WanDiTConfig(patch_size=(1, 2, 2), in_dim=8, out_dim=8, dim=64,
                         ffn_dim=128, freq_dim=32, text_dim=48, num_heads=4,
                         num_layers=2),
        vae=VAEConfig(dim=8, z_dim=8, dim_mult=(1, 2, 4, 4), num_res_blocks=1,
                      temperal_downsample=(False, True, True)),
        max_context_len=32, dual_expert=True, vlm_in_dim=16,
        param_dtype="float32",
    )
    ctx = jnp.ones((5, 48), jnp.float32) * 0.1
    kw = dict(precomputed_context=ctx,
              precomputed_context_null=jnp.zeros_like(ctx),
              size=(64, 32), frame_num=9, sampling_steps=3, guide_scale=3.0,
              seed=7, decode=False)

    pipe = OmniVideoX2XUnified.random_init(cfg, attn_impl="xla",
                                           with_vae=False)
    ref = pipe.generate(**kw)
    pipe_s = OmniVideoX2XUnified(cfg, pipe.low_noise, pipe.high_noise,
                                 attn_impl="xla", layer_stream=True)
    out = pipe_s.generate(**kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_packer_roundtrip_mixed_dtypes():
    """BlockPacker: flat per-dtype buffers reconstruct the pytree exactly."""
    from omnivideo_tpu.pipelines.streaming import BlockPacker

    block = {
        "w": np.arange(12, dtype=np.float32).reshape(3, 4),
        "g": np.ones((5,), jnp.bfloat16),
        "nested": {"b": np.full((2, 2), 7, np.float32)},
    }
    packer = BlockPacker(block)
    bufs = packer.pack(block)
    assert set(bufs) == {"float32", "bfloat16"}
    back = packer.unpack({k: jnp.asarray(v) for k, v in bufs.items()})
    for a, b in zip(jax.tree_util.tree_leaves(block),
                    jax.tree_util.tree_leaves(back)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streamed_packed_matches_scanned():
    """packed=True (one flat host buffer per dtype per block, unpacked by
    static slicing inside the block jit) is numerics-identical to the
    per-leaf schedule and to the scanned forward."""
    cfg, params, x, t, ctx = _tiny()
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")
    resident, blocks = split_host_params(params)
    ex = BlockStreamingExecutor(cfg, blocks, window=2, attn_impl="xla",
                                packed=True)
    out = wan_dit_stream_apply(resident, ex, cfg, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # aliased schedule entries pack ONCE (bench schedules reuse one block)
    ex2 = BlockStreamingExecutor(cfg, [blocks[0]] * 4, window=1,
                                 attn_impl="xla", packed=True)
    assert ex2.host_blocks[0] is ex2.host_blocks[3]
    out2 = wan_dit_stream_apply(resident, ex2, cfg, x, t, ctx)
    assert np.isfinite(np.asarray(out2)).all()


def test_streamed_aliased_blocks_single_compile():
    """Benchmark schedules alias one host block for all layer indices; the
    executor must reuse ONE jit entry across blocks (shape-identical). The
    block fn is shared process-wide per (cfg, attn_impl), so start from a
    clean cache."""
    from omnivideo_tpu.pipelines import streaming

    streaming._block_fn_for.cache_clear()
    cfg, params, x, t, ctx = _tiny()
    resident, blocks = split_host_params(params)
    ex = BlockStreamingExecutor(cfg, [blocks[0]] * 5, window=2,
                                attn_impl="xla")
    out = wan_dit_stream_apply(resident, ex, cfg, x, t, ctx)
    assert np.isfinite(np.asarray(out)).all()
    assert ex._block_fn._cache_size() == 1
    # a second executor over the same cfg shares the jitted fn (no recompile)
    ex2 = BlockStreamingExecutor(cfg, [blocks[1]] * 2, window=1,
                                 attn_impl="xla")
    assert ex2._block_fn is ex._block_fn


def test_int8_quant_error_bound():
    """Symmetric per-output-channel int8: max abs error per weight is
    bounded by scale/2 = column_amax/254 (ops/quant.py)."""
    from omnivideo_tpu.ops.quant import (dequantize_block, is_q8_leaf,
                                         quantize_block, quantized_bytes)

    rng = np.random.default_rng(0)
    w = (rng.standard_normal((128, 96)) * 0.04).astype(jnp.bfloat16)
    block = {"attn": {"kernel": w}, "gain": np.ones((96,), np.float32)}
    qb = quantize_block(block, min_size=1024)
    assert is_q8_leaf(qb["attn"]["kernel"])
    assert qb["gain"] is block["gain"]  # small f32 leaves pass through
    # int8 payload + f32 scales ~= 0.5x the bf16 kernel bytes
    assert quantized_bytes(qb) < 0.75 * quantized_bytes(block)
    back = np.asarray(dequantize_block(qb)["attn"]["kernel"], np.float32)
    ref = np.asarray(w, np.float32)
    amax = np.abs(ref).max(axis=0)
    # bound: quant step/2 plus the bf16 rounding of the dequantized product
    bound = amax / 254.0 + np.abs(ref) * 2 ** -8
    assert (np.abs(back - ref) <= bound + 1e-9).all()


def test_streamed_int8_quant_close_to_exact():
    """quant="int8" executor: output tracks the full-precision forward to
    weight-quantization accuracy, with ~half the streamed bytes; packed and
    per-leaf quantized schedules agree exactly."""
    from omnivideo_tpu.ops.quant import quantized_bytes

    cfg = WanDiTConfig(
        patch_size=(1, 2, 2), text_len=16, in_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=48, out_dim=4, num_heads=4, num_layers=3,
    )
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["head"]["kernel"].shape) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8, 8))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 48))
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")
    resident, blocks = split_host_params(params)

    ex_q = BlockStreamingExecutor(cfg, blocks, window=2, attn_impl="xla",
                                  quant="int8")
    out_q = wan_dit_stream_apply(resident, ex_q, cfg, x, t, ctx)
    r, o = np.asarray(ref, np.float32), np.asarray(out_q, np.float32)
    # weight-only int8 deviation stays small but nonzero (quant engaged)
    assert np.abs(o - r).max() > 0
    assert np.abs(o - r).max() <= 0.05 * max(np.abs(r).max(), 1.0)
    # payload halves (int8 kernels + f32 scales vs bf16 kernels)
    assert (quantized_bytes(ex_q.host_blocks[0])
            < 0.65 * quantized_bytes(blocks[0]))

    ex_qp = BlockStreamingExecutor(cfg, blocks, window=2, attn_impl="xla",
                                   quant="int8", packed=True)
    out_qp = wan_dit_stream_apply(resident, ex_qp, cfg, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(out_qp), np.asarray(out_q))


def test_streamed_grouped_dispatch_matches_scanned():
    """group>1 (multi-block jitted dispatches, amortizing per-dispatch
    latency): numerics identical to the scanned forward for group sizes
    that divide, exceed, and leave a remainder vs num_layers; composes
    with packed transfers and int8 quant."""
    cfg, params, x, t, ctx = _tiny()  # num_layers = 3
    ref = wan_dit_apply(params, cfg, x, t, ctx, attn_impl="xla")
    resident, blocks = split_host_params(params)
    for group, packed in ((2, False), (3, False), (5, True)):
        ex = BlockStreamingExecutor(cfg, blocks, window=2, attn_impl="xla",
                                    group=group, packed=packed)
        out = wan_dit_stream_apply(resident, ex, cfg, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"group={group} packed={packed}")
    # group + quant: equals the group=1 quantized output exactly
    ex_q1 = BlockStreamingExecutor(cfg, blocks, window=1, attn_impl="xla",
                                   quant="int8")
    ex_qg = BlockStreamingExecutor(cfg, blocks, window=1, attn_impl="xla",
                                   quant="int8", group=2)
    out_q1 = wan_dit_stream_apply(resident, ex_q1, cfg, x, t, ctx)
    out_qg = wan_dit_stream_apply(resident, ex_qg, cfg, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(out_q1), np.asarray(out_qg))


def test_quant_round_trips_source_dtype():
    """ADVICE r4: a float16 kernel must dequantize back to float16 (the
    "dt" marker records the source dtype), incl. through a jit boundary."""
    from omnivideo_tpu.ops.quant import dequantize_block, quantize_block

    rng = np.random.default_rng(1)
    block = {
        "f16": (rng.standard_normal((64, 64)) * 0.1).astype(np.float16),
        "bf16": (rng.standard_normal((64, 64)) * 0.1).astype(jnp.bfloat16),
    }
    qb = quantize_block(block, min_size=1024)
    back = jax.jit(dequantize_block)(qb)
    assert back["f16"].dtype == jnp.float16
    assert back["bf16"].dtype == jnp.bfloat16
