#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Primary metric (stable across rounds): the 1.3B DiT denoising step (CFG
batch-2, 832x480 81f latent — the reference's default T2V config,
inference_omni_t2v.sh:44-55) on the available chip.

detail adds the north-star numbers from BASELINE.md:
  - e2e_480p81f_50steps_s: MEASURED end-to-end seconds/video through the real
    pipeline (50 UniPC steps + VAE decode);
  - dit_720p_step_s / e2e_720p_50steps_s: measured 720p step and measured
    full 50-step 720p denoise (chunked 5 steps/dispatch to fit the tunnel's
    ~60-120 s single-dispatch deadline);
  - a14b_block_step_s: ONE A14B DiT block (dim 5120, ffn 13824) measured on
    the chip — basis for a14b_step_derived = 40*block + head;
  - a14b_fsdp8_compile_s: the dual-expert A14B denoise step COMPILED at real
    480p shapes over a virtual 8-device fsdp x sp mesh;
  - train_step_*: measured 1.3B training steps (fwd+bwd+update) — produced by
    the MANUAL `--phase train` (cold compiles ~10 min; not in the default
    orchestration) and carried in the cache.

vs_baseline semantics: the reference publishes no benchmark numbers
(BASELINE.md), so vs_baseline is the achieved fraction of the chip's bf16
matmul roofline for the primary metric (1.0 = speed of light).

Robustness contract (the driver runs `timeout N python bench.py` and records
whatever JSON line appears — see VERDICT round 2 item 1):
  - BENCH_LOCAL.json caches the last good result; if the tunnel is wedged or
    the driver kills us early, we emit the cache marked "stale": true.
  - A SIGTERM/SIGINT/atexit handler emits the best-known result, so a timeout
    kill still produces a parseable line.
  - Total tunnel-wait across ALL phases is capped (~5 min), and a global
    wall-clock deadline (BENCH_DEADLINE_S, default 1500 s) skips detail
    phases rather than risk dying silently.
  - Phase subprocesses STREAM partial `PHASE_JSON:` lines, so a phase killed
    by its timeout still contributes everything it measured.
  - The run ends with a tiny-op probe so the chip is left unwedged.
"""

import atexit
import json
import os
import signal
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# virtual CPU devices for the sharded-A14B compile check (must precede jax
# backend init; harmless for the TPU path)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent XLA compile cache: phase subprocesses inherit the env var, so
# repeated runs of the same phase (and the driver's own bench run after the
# chip queue warmed the cache) skip the 20-40 s TPU compiles. Inlined (not
# utils.compile_cache) so the orchestrator process stays jax-free.
if os.environ.get("OMNIVIDEO_COMPILE_CACHE", "1").lower() not in ("0", "false"):
    # repo-side dir: /tmp is wiped on VM restarts (observed mid-round-4),
    # which would cold-start every compile in the driver's bench window
    _cache_default = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  ".jax_cache")
    os.makedirs(os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                                      _cache_default), exist_ok=True)

import numpy as np

CACHE_PATH = Path(__file__).resolve().parent / "BENCH_LOCAL.json"
_START = time.monotonic()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1500"))

# bf16 peak matmul throughput by device kind (TPU generations)
_PEAK_BY_KIND = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _remaining() -> float:
    return _DEADLINE_S - (time.monotonic() - _START)


def _peak_flops(dev) -> float:
    kind = getattr(dev, "device_kind", "") or ""
    for k, v in _PEAK_BY_KIND.items():
        if kind.lower().startswith(k.lower()):
            return v
    return 197e12  # default to v5e if unrecognized


def _dit_flops(cfg, seq_len, ctx_len, batch):
    """FLOPs per DiT forward (matmuls only, 2·M·N·K)."""
    d, f, L, Lc, nl = cfg.dim, cfg.ffn_dim, seq_len, ctx_len, cfg.num_layers
    per_block = (
        2 * L * d * d * 4          # self-attn qkvo
        + 2 * 2 * L * L * d        # attention scores + values
        + 2 * L * d * d * 2        # cross-attn q,o
        + 2 * Lc * d * d * 2       # cross-attn k,v
        + 2 * 2 * L * Lc * d       # cross attention
        + 2 * L * d * f * 2        # ffn
    )
    embed = 2 * L * 64 * d + 2 * Lc * cfg.text_dim * d + 2 * Lc * d * d
    return batch * (nl * per_block + embed)


def _timed(fn, *args, n=3, warm=1):
    for _ in range(warm):
        fn(*args)
    t0 = time.perf_counter()
    for _ in range(n):
        fn(*args)
    return (time.perf_counter() - t0) / n


def _free():
    """Release freed device buffers before the next memory-heavy phase."""
    import gc

    import jax

    gc.collect()
    jax.clear_caches()


def _phase_emit(fragment: dict):
    """Stream a partial result to the orchestrator (parsed even if this
    phase process is later killed by its timeout)."""
    print("PHASE_JSON:" + json.dumps(fragment), flush=True)


# --------------------------------------------------------------------------
# measurement phases (each runs in its own subprocess on the TPU path)
# --------------------------------------------------------------------------

def bench_t5_encode():
    """umT5-XXL (5.3B) encode of the 2x512-token CFG prompt pair, bf16.

    Params are zeros allocated at exact bf16 size (eval_shape + zeros) —
    random init would transiently double HBM (f32 normals) and timing on the
    MXU is data-independent."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.models.t5 import T5Config, init_t5, t5_encode

    cfg = T5Config()
    shapes = jax.eval_shape(
        lambda k: init_t5(k, cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    ids = jnp.ones((2, cfg.text_len), jnp.int32)
    mask = jnp.ones((2, cfg.text_len), jnp.int32)
    f = jax.jit(lambda p, i, m: jnp.sum(t5_encode(p, cfg, i, m).astype(jnp.float32)))
    t = _timed(lambda p, i, m: float(f(p, i, m)), params, ids, mask, n=2)
    del params
    return t


def bench_e2e_480p(steps=50):
    """Measured end-to-end: 832x480, 81 frames, 50 UniPC steps, CFG batch-2,
    VAE decode — the reference's default T2V configuration.

    Staged like the reference's model-offload ping-pong
    (generate_omni_v2v.py:641-710): the denoise phase runs with no VAE
    resident, then the DiT is freed and the decode runs — holding both plus
    decode transients risks HBM exhaustion on one chip."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.models.vae2_1 import init_vae, vae_decode
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = T2V_1_3B
    pipe = OmniVideoX2XUnified.random_init(cfg, with_vae=False, attn_impl="auto",
                                       residual_dtype="bfloat16")
    ctx = jax.random.normal(jax.random.PRNGKey(1), (24, cfg.dit.text_dim), jnp.float32)
    kwargs = dict(
        precomputed_context=ctx,
        precomputed_context_null=jnp.zeros_like(ctx),
        size=(832, 480),
        frame_num=81,
        sampling_steps=steps,
        guide_scale=3.0,
        seed=7,
        decode=False,
        max_steps_per_call=10,  # bound single-dispatch walltime (tunnel
                                # drops executions running for minutes)
    )
    latents = pipe.generate(**kwargs)  # compile + warm
    t0 = time.perf_counter()
    latents = pipe.generate(**kwargs)
    t_denoise = time.perf_counter() - t0
    _phase_emit({"e2e_480p81f_denoise_s": round(t_denoise, 2)})
    z = jnp.asarray(latents)[None] if jnp.ndim(latents) == 4 else jnp.asarray(latents)
    del pipe, latents
    _free()

    from omnivideo_tpu.pipelines.x2x import video_to_uint8_frames

    vae_params = init_vae(jax.random.PRNGKey(3), cfg.vae)

    # quantize to uint8 ON DEVICE: the f32 [3,81,480,832] host fetch
    # (~390 MB over the tunnel) caused a 9% e2e run-to-run spread; the
    # uint8 frames are what the save path consumes anyway
    def _dec(p, z):
        vid = vae_decode(p, cfg.vae, z, dtype=jnp.float32)
        return video_to_uint8_frames(vid[0]), jnp.isfinite(vid).all()

    fd = jax.jit(_dec)
    video, finite = (np.asarray(a) for a in fd(vae_params, z))  # compile+run
    t0 = time.perf_counter()
    video, finite = (np.asarray(a) for a in fd(vae_params, z))
    t_decode = time.perf_counter() - t0
    if not bool(finite):
        raise RuntimeError("non-finite video from VAE decode")
    del vae_params, video
    return t_denoise + t_decode


def bench_e2e_720p(steps=50):
    """Measured full 50-step 720p·81f denoise loop (VERDICT r2 item 3a).

    max_steps_per_call=3 keeps each dispatch at ~46 s: 5-step chunks
    (~77 s/dispatch) CRASHED the TPU worker — the tunnel's single-dispatch
    deadline starts biting anywhere past ~60 s, not 120."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = T2V_1_3B
    pipe = OmniVideoX2XUnified.random_init(cfg, with_vae=False, attn_impl="auto",
                                       residual_dtype="bfloat16")
    ctx = jax.random.normal(jax.random.PRNGKey(1), (24, cfg.dit.text_dim), jnp.float32)
    kwargs = dict(
        precomputed_context=ctx,
        precomputed_context_null=jnp.zeros_like(ctx),
        size=(1280, 720),
        frame_num=81,
        sampling_steps=steps,
        guide_scale=3.0,
        seed=7,
        decode=False,
        max_steps_per_call=3,
    )
    # warm only 3 steps = ONE chunk (a full warm loop would double a ~15 min
    # phase); the denoise cache keys on (solver, seg_len, seq_len). 50 steps
    # split into 17 near-equal chunks of 3/2 steps — warm both lengths so the
    # timed run reuses compiled chunks only
    pipe.generate(**dict(kwargs, sampling_steps=3, max_steps_per_call=3))
    warm = dict(kwargs, sampling_steps=2, max_steps_per_call=2)
    pipe.generate(**warm)
    t0 = time.perf_counter()
    pipe.generate(**kwargs)
    return time.perf_counter() - t0


def bench_720p_step():
    """Measured 1.3B DiT step at 1280x720 81f (seq 75,600) + 720p VAE decode."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply
    from omnivideo_tpu.models.vae2_1 import init_vae, vae_decode

    cfg = T2V_1_3B
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    params = init_wan_dit(jax.random.PRNGKey(0), dit_cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 21, 90, 160), jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.max_context_len, dit_cfg.text_dim), jnp.bfloat16)
    fwd = jax.jit(lambda p, x, t, c: jnp.sum(
        wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="auto",
                      qk_impl="auto", ew_impl="auto").astype(jnp.float32)))
    step_s = _timed(lambda *a: float(fwd(*a)), params, x, t, ctx, n=2)
    _phase_emit({"dit_720p_step_s": round(step_s, 3)})
    del params, x, ctx, fwd
    _free()

    vae_params = init_vae(jax.random.PRNGKey(3), cfg.vae)
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 21, 90, 160), jnp.float32)
    fd = jax.jit(lambda p, z: jnp.sum(vae_decode(p, cfg.vae, z, dtype=jnp.float32)))
    dec_s = _timed(lambda *a: float(fd(*a)), vae_params, z, n=1)
    del vae_params, z
    return step_s, dec_s


def bench_a14b_block():
    """ONE A14B DiT block (dim 5120, ffn 13824, 40 heads) measured on the
    chip at 480p and 720p sequence lengths (VERDICT r2 item 3b). A block is
    ~0.6 GB bf16 so it fits one chip even though the full model does not;
    a14b_step_derived ≈ num_layers·block (embed/head are <1% of step FLOPs).

    480p runs the real CFG batch-2; 720p runs batch-1 (batch-2 activations
    at seq 75,600 × dim 5120 risk HBM OOM, which would wedge the tunnel) and
    derives the CFG step as 2× — per-token block cost is batch-linear."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.models.wan_dit import (
        WanAuxInputs, init_wan_block, wan_block_apply)
    from omnivideo_tpu.ops.rope import rope_3d_tables

    full = WAN_CONFIGS["t2v-A14B"]
    cfg = full.dit
    d, f, Lc = cfg.dim, cfg.ffn_dim, full.max_context_len
    params = init_wan_block(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    peak = _peak_flops(jax.devices()[0])
    out = {}
    for tag, grid, batch in (("480p", (21, 30, 52), 2), ("720p", (21, 45, 80), 1)):
        L = grid[0] * grid[1] * grid[2]
        cos, sin = rope_3d_tables(grid, cfg.head_dim, cfg.rope_max_seq_len,
                                  cfg.rope_theta)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, Lc, d), jnp.bfloat16)
        e0 = jax.random.normal(jax.random.PRNGKey(3), (batch, 1, 6, d),
                               jnp.float32) * 0.02
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, L, d), jnp.float32)
        aux = WanAuxInputs(e0=e0, context=ctx, rope_cos=cos, rope_sin=sin,
                           kv_lens=None, sp=None)

        # scan the block 4x per dispatch: amortizes the per-dispatch host
        # sync + output materialization like the real 40-layer scan does
        # (a single-block call under-reports MXU by ~20%)
        reps = 4
        fwd = jax.jit(lambda p, xx, aux: jnp.sum(
            jax.lax.scan(lambda c, _: (wan_block_apply(p, c, aux, cfg,
                                                       attn_impl="auto",
                                                       qk_impl="auto",
                                                       ew_impl="auto"), None),
                         xx, None, length=reps)[0].astype(jnp.float32)))
        t = _timed(lambda *a: float(fwd(*a)), params, x, aux, n=2) / reps
        flops = batch * (2 * L * d * d * 4 + 4 * L * L * d + 2 * L * d * d * 2
                         + 2 * Lc * d * d * 2 + 4 * L * Lc * d + 2 * L * d * f * 2)
        out[f"a14b_block_b{batch}_{tag}_s"] = round(t, 3)
        out[f"a14b_block_mxu_{tag}"] = round(flops / t / peak, 3)
        out[f"a14b_step_derived_{tag}_s"] = round(
            cfg.num_layers * t * (2 // batch), 2)
        _phase_emit(dict(out))
        del x, fwd, aux
        _free()
    return out


def bench_a14b_stream(budget_s: float = 700.0):
    """A REAL full-depth A14B DiT step on the chip (VERDICT r3 item 3 — the
    reference runs this model whole on an 80 GB GPU,
    x2x_gen_unified.py:261-540; our 16 GB chip cannot hold 40 blocks).

    Two passes over the SAME 40-dispatch schedule (pipelines/streaming.py):

    - on-device: 8 distinct dim-5120 blocks resident in HBM (~5.6 GB),
      cycled through all 40 layer positions + the real patchify/embed/head —
      `a14b_step_measured_480p_s`. Every dispatch is real dim-5120 compute;
      this is the number the 40x-block extrapolation always derived, now
      actually executed end-to-end (does the chained full-depth program hit
      an XLA/VMEM cliff? this run is the proof either way).
    - streamed: the same schedule with blocks device_put from HOST per
      dispatch — measures achieved h2d bandwidth and the overlap quality of
      the double-buffered schedule on THIS tunnel-attached chip. On a
      production PCIe host (>=10 GB/s h2d vs ~0.6 s/block compute) the
      transfer hides entirely; over the tunnel it may dominate, so the
      streamed pass adapts its block count to the measured bandwidth and
      reports an extrapolated full-step time when it runs <40 blocks.
    """
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.models.wan_dit import init_wan_dit, init_wan_block
    from omnivideo_tpu.pipelines.streaming import (
        BlockPacker, BlockStreamingExecutor, wan_dit_stream_apply)

    t_start = time.perf_counter()
    left = lambda: budget_s - (time.perf_counter() - t_start)
    cfg_name = os.environ.get("BENCH_STREAM_CFG", "t2v-A14B")
    full = WAN_CONFIGS[cfg_name]
    cfg = full.dit
    nl, Lc = cfg.num_layers, full.max_context_len
    if os.environ.get("BENCH_STREAM_TINY"):     # CPU smoke of the full path
        batch, frames, hh, ww = 1, 2, 8, 8
    else:
        batch, frames, hh, ww = 2, 21, 60, 104   # 480p latent, CFG batch-2
    out = {}

    # --- host-side random block (eval_shape structure; no device init) ---
    shapes = jax.eval_shape(
        lambda k: init_wan_block(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def host_leaf(s):
        if s.ndim == 1 and s.dtype == np.float32:
            return np.ones(s.shape, np.float32)         # rms/ln gains
        return (rng.standard_normal(s.shape, dtype=np.float32) * 0.02
                ).astype(s.dtype)

    host_block = jax.tree_util.tree_map(host_leaf, shapes)
    blk_bytes = sum(l.size * l.dtype.itemsize
                    for l in jax.tree_util.tree_leaves(host_block))

    # --- h2d bandwidth: one full block host->HBM, forced ---
    dev = jax.devices()[0]
    total = jax.jit(lambda b: sum(jnp.sum(l.astype(jnp.float32))
                                  for l in jax.tree_util.tree_leaves(b)))
    t0 = time.perf_counter()
    dev_block = jax.tree_util.tree_map(lambda a: jax.device_put(a, dev),
                                       host_block)
    float(total(dev_block))
    t_h2d = time.perf_counter() - t0
    out["a14b_stream_h2d_gbps"] = round(blk_bytes / t_h2d / 1e9, 2)
    out["a14b_stream_block_gb"] = round(blk_bytes / 1e9, 2)
    _phase_emit(dict(out))

    # packed: per-leaf device_put pays ~30 tunnel round trips per block —
    # one flat buffer per dtype (BlockPacker) measures the wire rate instead
    packer = BlockPacker(host_block)
    pk_bufs = packer.pack(host_block)
    t0 = time.perf_counter()
    dev_bufs = {k: jax.device_put(v, dev) for k, v in pk_bufs.items()}
    float(sum(jnp.sum(v[:8].astype(jnp.float32)) for v in dev_bufs.values()))
    t_h2d_pk = time.perf_counter() - t0
    out["a14b_stream_h2d_packed_gbps"] = round(blk_bytes / t_h2d_pk / 1e9, 2)
    _phase_emit(dict(out))
    del dev_bufs

    # --- inputs + resident params ---
    resident = init_wan_dit(jax.random.PRNGKey(1), cfg, jnp.bfloat16,
                            with_blocks=False)
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (batch, cfg.in_dim, frames, hh, ww), jnp.float32)
    t_in = jnp.full((batch,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (batch, Lc, cfg.dim),
                            jnp.bfloat16)  # pre-embedded context

    # --- on-device pass: 8 distinct resident blocks cycled to 40 ---
    scale = jax.jit(lambda b, s: jax.tree_util.tree_map(
        lambda a: (a.astype(jnp.float32) * s).astype(a.dtype), b))
    n_var = 2 if os.environ.get("BENCH_STREAM_ONLY720") else 8
    variants = [scale(dev_block, jnp.float32(1.0 + 0.01 * i))
                for i in range(n_var)]  # jnp scalar: ONE compile for all
    float(total(variants[-1]))
    del dev_block  # keep HBM headroom: 8 variants + activations only
    sched = [variants[i % len(variants)] for i in range(nl)]
    # group: blocks per jitted dispatch. Measured on chip (2026-08-19):
    # group=4 is SLOWER than group=1 (22.48 vs 21.98 s @480p) — dispatch is
    # async, so the per-block tunnel latency was already hidden, and the
    # 4-block jit only adds fusion-boundary cost. Default 1; knob kept for
    # A/Bs on hosts with different dispatch overheads.
    grp = int(os.environ.get("BENCH_STREAM_GROUP", "1"))

    def ondevice(tag, sched_t, batch_t, x_t, t_t, ctx_t, first=False):
        g = grp
        while True:
            ex = BlockStreamingExecutor(cfg, sched_t, window=1, device=dev,
                                        group=g)

            def step():
                y = wan_dit_stream_apply(resident, ex, cfg, x_t, t_t, ctx_t,
                                         context_embedded=True,
                                         residual_dtype=jnp.bfloat16)
                return float(jnp.sum(y))

            t0 = time.perf_counter()
            try:
                step()                        # compile + first execution
                break
            except Exception as e:            # a grouped jit at dim 5120 can
                if g == 1 or left() < 240:    # trip the remote-compile
                    raise                     # deadline; single-block is the
                # a failed chip op can wedge the tunnel 10-40 min — probe in
                # a throwaway subprocess before burning the retry (ADVICE r4)
                if not _tunnel_alive(timeout_s=min(120, int(left()) - 120)):
                    out["a14b_stream_group_failed"] = g
                    _phase_emit(dict(out))
                    raise
                print(f"# stream {tag}: group={g} failed "
                      f"({type(e).__name__}); retrying group=1",
                      file=sys.stderr, flush=True)
                g = 1                         # proven-good fallback
        out["a14b_stream_group"] = g
        if first:
            out["a14b_stream_compile_s"] = round(time.perf_counter() - t0, 1)
        _phase_emit(dict(out))
        rp = 2 if left() > 180 else 1
        t_step = _timed(step, n=rp, warm=0)
        # 720p runs batch-1 (b2 activations at seq 75,600 risk OOM-wedge);
        # CFG step = 2x, per-token cost is batch-linear (bench_a14b_block)
        key_s = f"a14b_step_measured_{tag}_s"
        out[key_s] = round(t_step * (2 // batch_t), 2)
        fls = _dit_flops(cfg, x_t.shape[2] * (x_t.shape[3] // 2)
                         * (x_t.shape[4] // 2), Lc, batch_t)
        out[f"a14b_step_mxu_{tag}"] = round(
            fls / t_step / _peak_flops(dev), 3)
        _phase_emit(dict(out))
        return t_step

    if os.environ.get("BENCH_STREAM_ONLY720"):
        # isolation mode: measure the 720p full-depth pass in a process
        # that never ran the 480p pass / 8-variant ring (HBM-state control)
        sched = [variants[i % len(variants)] for i in range(nl)]
        x7 = jax.random.normal(jax.random.PRNGKey(5),
                               (1, cfg.in_dim, 21, 90, 160), jnp.float32)
        ondevice("720p", sched, 1, x7, t_in[:1], ctx[:1], first=True)
        return out
    t_step = ondevice("480p", sched, batch, x, t_in, ctx, first=True)
    # (the full-depth 720p pass is its own phase, "a14b_stream720": run
    # in-process after this pass it measures ~1.4x slower from HBM
    # fragmentation — see _phase_main)
    del variants, sched

    # --- streamed pass: real host->HBM transfer per dispatch (packed:
    # one flat buffer per dtype, not ~30 latency-bound per-leaf puts) ---
    t_block = t_step / nl
    per = max(t_h2d_pk, t_block)
    n_stream = int(max(4, min(nl, (left() - 30.0) / max(per, 1e-3))))
    host_sched = [host_block] * n_stream
    ex = BlockStreamingExecutor(cfg, host_sched, window=2, device=dev,
                                packed=True, residentize=False)
    L = frames * (hh // 2) * (ww // 2)
    h0 = jax.random.normal(jax.random.PRNGKey(4), (batch, L, cfg.dim),
                           jnp.float32)
    aux = _stream_aux(resident, cfg, (frames, hh // 2, ww // 2), t_in, ctx)
    float(jnp.sum(h0))  # force inputs before the timed region
    t_sub = _timed(lambda: float(jnp.sum(ex.run_blocks(h0, aux))), n=1, warm=0)
    out["a14b_stream_n_blocks"] = n_stream
    key = ("a14b_stream_step_s" if n_stream == nl
           else "a14b_stream_step_extrap_s")
    out[key] = round(t_sub * nl / n_stream, 2)
    # overlap quality: 1.0 = transfer fully hidden behind compute (or
    # vice-versa); <1 = the schedule serializes part of the two streams
    out["a14b_stream_overlap"] = round(
        n_stream * per / t_sub, 3) if t_sub > 0 else None
    _phase_emit(dict(out))
    del ex

    # --- int8 streamed pass: weight-only quantized blocks (ops/quant.py,
    # --stream_quant int8) — ~0.5x the h2d payload per dispatch; dequant
    # rides inside the block jit. On the transfer-bound tunnel this nearly
    # halves the streamed step; on a PCIe host it halves the bandwidth
    # needed to hide the transfer entirely.
    if left() > 90:
        # warm the quantized block jit outside the timed region (1 block)
        ex_w = BlockStreamingExecutor(cfg, [host_block], window=1,
                                      device=dev, packed=True,
                                      residentize=False, quant="int8")
        q8_bytes = sum(v.nbytes for v in ex_w.host_blocks[0].values())
        out["a14b_stream_q8_block_gb"] = round(q8_bytes / 1e9, 2)
        float(jnp.sum(ex_w.run_blocks(h0, aux)))
        _phase_emit(dict(out))
        per_q = max(t_h2d_pk * q8_bytes / blk_bytes, t_block)
        n_q = int(max(4, min(nl, (left() - 30.0) / max(per_q, 1e-3))))
        ex_q = BlockStreamingExecutor(cfg, [host_block] * n_q, window=2,
                                      device=dev, packed=True,
                                      residentize=False, quant="int8")
        t_q = _timed(lambda: float(jnp.sum(ex_q.run_blocks(h0, aux))),
                     n=1, warm=0)
        out["a14b_stream_q8_n_blocks"] = n_q
        key_q = ("a14b_stream_q8_step_s" if n_q == nl
                 else "a14b_stream_q8_step_extrap_s")
        out[key_q] = round(t_q * nl / n_q, 2)
        out["a14b_stream_q8_overlap"] = round(
            n_q * per_q / t_q, 3) if t_q > 0 else None
        _phase_emit(dict(out))
    return out


def _stream_aux(resident, cfg, grid, t_in, ctx):
    """Aux inputs for a bare run_blocks pass (bench-only helper)."""
    import jax.numpy as jnp

    from omnivideo_tpu.models.wan_dit import WanAuxInputs, time_embeddings
    from omnivideo_tpu.ops.rope import rope_3d_tables

    _, e0 = time_embeddings(resident, cfg, t_in)
    cos, sin = rope_3d_tables(grid, cfg.head_dim, cfg.rope_max_seq_len,
                              cfg.rope_theta)
    return WanAuxInputs(e0=e0, context=ctx.astype(jnp.bfloat16),
                        rope_cos=cos, rope_sin=sin, kv_lens=None, sp=None)


def bench_a14b_compile():
    """Compile (not run) the dual-expert A14B CFG batch-2 denoise forward at
    real 832x480 shapes over a virtual 8-device (fsdp=4, seq=2) CPU mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.models.wan_dit import SPConfig, wan_dit_apply, init_wan_dit
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.parallel.sharding import params_shardings

    cfg = WAN_CONFIGS["t2v-A14B"]
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    cpus = jax.devices("cpu")
    mesh = create_mesh(dp=1, fsdp=4, sp=2, devices=cpus[:8])
    sp = SPConfig(mesh=mesh, mode="ulysses", seq_axis="seq")

    t0 = time.perf_counter()
    # abstract params — nothing is materialized, just shapes + shardings
    p_shapes = jax.eval_shape(
        lambda k: init_wan_dit(k, dit_cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    p_sh = params_shardings(p_shapes, mesh)
    # pixel-latent input replicated; tokens get seq-sharded inside the model
    # (seq_constraint on [B, L, D] after patchify)
    x_sh = NamedSharding(mesh, P())
    r_sh = NamedSharding(mesh, P())

    def fwd(params, x, t, ctx):
        return wan_dit_apply(params, dit_cfg, x, t, ctx, attn_impl="xla",
                             mesh=mesh, sp=sp, seq_len=32760)

    lowered = jax.jit(fwd, in_shardings=(p_sh, x_sh, r_sh, r_sh)).lower(
        p_shapes,
        jax.ShapeDtypeStruct((2, 16, 21, 60, 104), jnp.bfloat16),
        jax.ShapeDtypeStruct((2,), jnp.float32),
        jax.ShapeDtypeStruct((2, cfg.max_context_len, dit_cfg.text_dim), jnp.bfloat16),
    )
    compiled = lowered.compile()
    assert compiled is not None
    return time.perf_counter() - t0


def bench_a14b_train_compile():
    """Lower + compile the UNIFIED train step (fwd+bwd+update, remat on) at
    REAL A14B dims — dim 5120, ffn 13824, 40 layers — over a virtual
    8-device fsdp×seq CPU mesh (VERDICT r3 item 9: prove the L7 training
    story isn't 1.3B-only; reference v1 trainer ZeRO-1 multi-GPU,
    finetune_model.py:725-732). Abstract params only — nothing materializes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.models.unified import init_unified_companions
    from omnivideo_tpu.models.wan_dit import init_wan_dit
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.parallel.sharding import batch_sharding, params_shardings
    from omnivideo_tpu.training.trainer import (
        TrainConfig, TrainState, make_optimizer, make_unified_train_step)

    cfg = WAN_CONFIGS["t2v-A14B"].replace(param_dtype="bfloat16")
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    cpus = jax.devices("cpu")
    mesh = create_mesh(dp=1, fsdp=4, sp=2, devices=cpus[:8])

    tc = TrainConfig(total_steps=100, warmup_steps=10, remat=True,
                     optimizer="adafactor", carry_dtype="bfloat16")
    tx = make_optimizer(tc)
    train_step = make_unified_train_step(cfg, tc, tx, mesh=mesh,
                                         attn_impl="xla")

    t0 = time.perf_counter()

    def abstract_state(k):
        k1, k2 = jax.random.split(k)
        params = {
            "wan": init_wan_dit(k1, dit_cfg, dtype=jnp.bfloat16),
            "companions": init_unified_companions(k2, cfg),
        }
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros([], jnp.int32))

    s_shapes = jax.eval_shape(abstract_state, jax.random.PRNGKey(0))
    # pin the fsdp NamedShardings on params; opt_state/step shardings are
    # GSPMD-propagated from them (exactly how the real trainer gets its
    # ZeRO layout)
    p_structs = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        s_shapes.params, params_shardings(s_shapes.params, mesh))
    state_structs = TrainState(params=p_structs, opt_state=s_shapes.opt_state,
                               step=s_shapes.step)
    # 480p·81f latents at CFG-train batch 1: [1, 16, 21, 60, 104]
    batch_structs = {
        "latents": jax.ShapeDtypeStruct((1, 16, 21, 60, 104), jnp.float32,
                                        sharding=batch_sharding(mesh, 5)),
        "context": jax.ShapeDtypeStruct((1, 512, dit_cfg.text_dim), jnp.float32,
                                        sharding=batch_sharding(mesh, 3)),
    }
    compiled = jax.jit(train_step, donate_argnums=(0,)).lower(
        state_structs, batch_structs,
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    ).compile()
    assert compiled is not None
    return time.perf_counter() - t0


def bench_qwen30b_compile():
    """Compile (not run) the REAL Qwen3-VL-30B-A3B text config — 48 layers,
    128 experts / top-8, vocab 151936 — sharded over a virtual 8-device fsdp
    mesh: proof the serving-scale sharded program builds (VERDICT r2 item 6;
    reference serves this via vLLM GPU sharding, vllm_model.py:24-103)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omnivideo_tpu.models.qwen3vl.text_model import (
        Qwen3TextConfig, abstract_params, qwen3_forward, qwen3_greedy_decode)
    from omnivideo_tpu.parallel.mesh import create_mesh
    from omnivideo_tpu.parallel.sharding import params_shardings

    cfg = Qwen3TextConfig(
        hidden_size=2048, intermediate_size=6144, num_hidden_layers=48,
        num_attention_heads=32, num_key_value_heads=4, head_dim=128,
        num_experts=128, num_experts_per_tok=8, moe_intermediate_size=768,
    )
    cpus = jax.devices("cpu")
    mesh = create_mesh(dp=1, fsdp=8, sp=1, devices=cpus[:8])

    t0 = time.perf_counter()
    p_shapes = abstract_params(cfg, dtype=jnp.bfloat16)
    p_sh = params_shardings(p_shapes, mesh)
    ids_sh = NamedSharding(mesh, P())

    def prefill(params, ids):
        hidden, logits = qwen3_forward(params, cfg, ids)
        return logits[:, -1]

    compiled = jax.jit(prefill, in_shardings=(p_sh, ids_sh)).lower(
        p_shapes, jax.ShapeDtypeStruct((1, 512), jnp.int32)).compile()
    assert compiled is not None
    prefill_s = time.perf_counter() - t0
    _phase_emit({"qwen30b_fsdp8_compile_s": round(prefill_s, 1)})

    # the full prefill+decode loop (layers + tokens both lax.scan'd) also
    # compiles at 48-layer scale — the serving program, not just one forward
    t0 = time.perf_counter()
    dec = jax.jit(
        lambda p, ids: qwen3_greedy_decode(p, cfg, ids, 16),
        in_shardings=(p_sh, ids_sh),
    ).lower(p_shapes, jax.ShapeDtypeStruct((1, 512), jnp.int32)).compile()
    assert dec is not None
    _phase_emit({"qwen30b_fsdp8_decode_compile_s":
                 round(time.perf_counter() - t0, 1)})
    return prefill_s


def bench_primary(quick: bool):
    """Primary metric + base detail dict (runs in ONE process's jax client).

    Streams the DiT step the moment it is measured (so a later VAE failure
    or timeout cannot lose the primary number)."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs import T2V_1_3B
    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply
    from omnivideo_tpu.models.vae2_1 import init_vae, vae_decode

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    cfg = T2V_1_3B
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    if not on_tpu:  # CPU sanity fallback: shrink
        dit_cfg = dit_cfg.replace(dim=128, ffn_dim=256, num_heads=4, num_layers=2,
                                  freq_dim=32, text_dim=64)

    # 832x480, 21 latent frames (81 pixel frames) → seq = 21*60*104/4 = 32,760
    frames_lat, lh, lw = (21, 60, 104) if on_tpu else (3, 16, 16)
    params = init_wan_dit(jax.random.PRNGKey(0), dit_cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, frames_lat, lh, lw), jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2), (2, cfg.max_context_len, dit_cfg.text_dim), jnp.bfloat16
    )

    # NOTE: under the axon TPU platform block_until_ready() is a no-op; force
    # execution by fetching a scalar reduction of the output.
    # residual_dtype=bf16 is the round-5 inference default (quality A/B:
    # PSNR 35.3 dB / SSIM 0.998 vs the f32 stream at 480p·81f·10 UniPC
    # steps on RANDOM weights — tools/dev/bench_residual_quality.py)
    fwd = jax.jit(
        lambda p, x, t, c: jnp.sum(
            wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="auto",
                          qk_impl="auto", ew_impl="auto",
                          residual_dtype=jnp.bfloat16).astype(jnp.float32)
        )
    )
    dit_step_s = _timed(lambda *a: float(fwd(*a)), params, x, t, ctx,
                        n=3 if on_tpu else 2)
    del params

    pt, ph, pw = dit_cfg.patch_size
    seq_len = frames_lat * (lh // ph) * (lw // pw)
    flops = _dit_flops(dit_cfg, seq_len, cfg.max_context_len, 2)
    peak = _peak_flops(jax.devices()[0]) if on_tpu else 1e11
    mxu_util = flops / dit_step_s / peak

    detail = {
        "backend": backend,
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "peak_bf16_flops": peak,
        "seq_len": seq_len,
        "dit_tflops_per_step": round(flops / 1e12, 2),
        "mxu_utilization": round(mxu_util, 4),
        "vs_baseline_semantics": "fraction of bf16 roofline (reference publishes no numbers)",
    }
    _phase_emit({"value": dit_step_s, "vs_baseline": mxu_util, "detail": detail})

    # VAE decode throughput (BASELINE.json: "VAE decode fps")
    if on_tpu:
        try:
            vae_params = init_vae(jax.random.PRNGKey(3), cfg.vae)
            z = jax.random.normal(jax.random.PRNGKey(4), (1, 16, frames_lat, lh, lw), jnp.float32)
            fd = jax.jit(
                lambda p, z: jnp.sum(vae_decode(p, cfg.vae, z, dtype=jnp.float32))
            )
            dec_s = _timed(lambda *a: float(fd(*a)), vae_params, z, n=1)
            n_frames = (frames_lat - 1) * 4 + 1
            detail["vae_decode_fps_480p"] = round(n_frames / dec_s, 1)
            fdb = jax.jit(lambda p, z: jnp.sum(
                vae_decode(p, cfg.vae, z, dtype=jnp.bfloat16).astype(jnp.float32)))
            dec_bf16_s = _timed(lambda *a: float(fdb(*a)), vae_params, z, n=1)
            detail["vae_decode_fps_480p_bf16"] = round(n_frames / dec_bf16_s, 1)
            del vae_params
            _phase_emit({"value": dit_step_s, "vs_baseline": mxu_util, "detail": detail})
        except Exception as e:  # pragma: no cover
            print(f"# vae bench failed: {e}", file=sys.stderr)

    if not on_tpu:
        try:
            detail["a14b_fsdp8_compile_s"] = round(bench_a14b_compile(), 1)
        except Exception as e:
            print(f"# a14b compile check failed: {e}", file=sys.stderr)

    return dit_step_s, mxu_util, detail


def _phase_main(name: str):
    """Run one detail phase and print its JSON fragment(s) (subprocess entry).

    Each heavy phase runs in a fresh process: the axon tunnel wedges for
    minutes after an OOM or a killed op, so phase failures must not share a
    client with the primary metric (observed: e2e UNAVAILABLE cascading into
    every later phase of the same process)."""
    out = {}
    if name == "primary":
        bench_primary(quick=True)  # streams its own PHASE_JSON lines
        return
    if name == "e2e":
        out["e2e_480p81f_50steps_s"] = round(bench_e2e_480p(steps=50), 2)
    elif name == "e2e720":
        out["e2e_720p_50steps_denoise_s"] = round(bench_e2e_720p(steps=50), 2)
    elif name == "720p":
        step720, dec720 = bench_720p_step()
        out["dit_720p_step_s"] = round(step720, 3)
        out["vae_decode_720p_s"] = round(dec720, 2)
    elif name == "a14b_block":
        out = bench_a14b_block()
    elif name == "a14b_stream":
        out = bench_a14b_stream(
            budget_s=float(os.environ.get("BENCH_STREAM_BUDGET_S", "700")))
    elif name == "a14b_stream720":
        # full-depth 720p step in ITS OWN process: after the 480p pass +
        # 8-variant ring, the same program measures ~1.4x slower (HBM
        # fragmentation stalls between the 40 dispatches — 110.1 s vs
        # 79.2 s isolated, 2026-08-19); isolation is the measurement fix
        os.environ["BENCH_STREAM_ONLY720"] = "1"
        out = bench_a14b_stream(
            budget_s=float(os.environ.get("BENCH_STREAM_BUDGET_S", "700")))
        out.pop("a14b_stream_h2d_gbps", None)       # 0.7 GB single-shot
        out.pop("a14b_stream_h2d_packed_gbps", None)  # rates: the 480p
        out.pop("a14b_stream_compile_s", None)        # phase owns these
    elif name == "t5":
        out["t5_xxl_encode_s"] = round(bench_t5_encode(), 3)
    elif name == "a14b":
        # pure compile check over virtual CPU devices — force the cpu
        # platform so a wedged axon tunnel can't hang backend init
        import jax

        jax.config.update("jax_platforms", "cpu")
        out["a14b_fsdp8_compile_s"] = round(bench_a14b_compile(), 1)
    elif name == "qwen30b":
        import jax

        jax.config.update("jax_platforms", "cpu")
        out["qwen30b_fsdp8_compile_s"] = round(bench_qwen30b_compile(), 1)
    elif name == "a14b_train":
        import jax

        jax.config.update("jax_platforms", "cpu")
        out["a14b_train_fsdp8_compile_s"] = round(bench_a14b_train_compile(), 1)
    elif name == "v5e8":
        # v5e-8 north-star projection: measured single-chip 720p step +
        # comm volume from the COMPILED seq=8 ulysses HLO (virtual CPU mesh)
        # + the stated ICI model — tools/dev/project_v5e8.py prints the
        # PHASE_JSON itself (it needs XLA_FLAGS set before jax import, so
        # it must own its process).
        import subprocess

        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "dev", "project_v5e8.py")],
            capture_output=True, text=True, timeout=540)
        for ln in r.stdout.splitlines():
            if ln.startswith("PHASE_JSON:"):
                out.update(json.loads(ln[len("PHASE_JSON:"):]))
    elif name == "train":
        # measured 1.3B fwd+bwd+update steps (MANUAL phase: not in the
        # default orchestration — cold compiles run ~10 min each; run via
        # `python bench.py --phase train` and fold with merge_phase_cache).
        # Larger rungs need the memory knobs: AdamW/f32-carry tops out at
        # 33f on one 16 GB chip (see tools/dev/bench_train_step.py).
        import pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent
                               / "tools" / "dev"))
        from bench_train_step import run_shape

        for frames, opt, carry in (
            (9, "adamw", "f32"),
            (33, "adamw", "f32"),
            (49, "adamw", "bf16"),
            (81, "adafactor", "bf16"),
        ):
            dt, _, seq = run_shape(frames, n=2, opt=opt, carry=carry)
            key = f"train_step_{frames}f_{opt}_{carry}"
            out[key + "_s"] = round(dt, 3)
            out[key + "_seq"] = seq
    else:
        raise SystemExit(f"unknown phase {name}")
    _phase_emit(out)


# --------------------------------------------------------------------------
# orchestration
# --------------------------------------------------------------------------

_TUNNEL_BUDGET = [float(os.environ.get("BENCH_TUNNEL_BUDGET_S", "300"))]
_EMIT_STATE = {
    "emitted": False,
    "value": None,        # fresh primary (s/step)
    "vs_baseline": None,
    "detail": {},         # fresh detail keys
    "cache": None,        # last-good BENCH_LOCAL.json contents
    "probe_log": [],      # outage evidence: (utc, outcome) per probe attempt
}


def _log_probe(outcome: str):
    ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    _EMIT_STATE["probe_log"].append(f"{ts} {outcome}")


def _load_cache():
    try:
        with open(CACHE_PATH) as f:
            _EMIT_STATE["cache"] = json.load(f)
    except Exception:
        _EMIT_STATE["cache"] = None


def _save_cache():
    """Persist the freshest full picture for future wedged-tunnel runs."""
    if _EMIT_STATE["value"] is None:
        return
    cache = _EMIT_STATE["cache"] or {}
    merged_detail = dict(cache.get("detail", {}))
    merged_detail.update(_EMIT_STATE["detail"])
    try:
        with open(CACHE_PATH, "w") as f:
            json.dump({
                "value": _EMIT_STATE["value"],
                "vs_baseline": _EMIT_STATE["vs_baseline"],
                "detail": merged_detail,
                "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }, f, indent=1)
            f.write("\n")
    except Exception as e:  # pragma: no cover
        print(f"# cache save failed: {e}", file=sys.stderr)


def _emit_best():
    """Print the single result line from the best available data (fresh
    primary if measured, else the last-good cache marked stale)."""
    if _EMIT_STATE["emitted"]:
        return
    _EMIT_STATE["emitted"] = True
    sys.stderr.flush()  # keep earlier stderr notes BEFORE the JSON when merged
    cache = _EMIT_STATE["cache"] or {}
    fresh = _EMIT_STATE["value"] is not None
    detail = dict(cache.get("detail", {}))
    stale_keys = [k for k in detail if k not in _EMIT_STATE["detail"]]
    detail.update(_EMIT_STATE["detail"])
    if fresh:
        value, vsb = _EMIT_STATE["value"], _EMIT_STATE["vs_baseline"]
        if stale_keys:
            detail["stale_keys"] = sorted(stale_keys)
            detail["stale_measured_at"] = cache.get("measured_at")
    else:
        value, vsb = cache.get("value"), cache.get("vs_baseline")
        detail["stale"] = True
        detail["stale_measured_at"] = cache.get("measured_at")
        plog = _EMIT_STATE["probe_log"]
        if plog and any("exit rc=" in p for p in plog):
            detail["stale_reason"] = ("backend outage: probes exit with init "
                                      "errors (see stale_evidence)")
        elif plog:
            detail["stale_reason"] = ("tunnel wedged: probes hang without "
                                      "completing (see stale_evidence)")
        else:
            detail["stale_reason"] = "tunnel wedged or killed before fresh primary"
        if _EMIT_STATE["probe_log"]:
            # verifiable outage evidence: every probe attempt this run
            detail["stale_evidence"] = _EMIT_STATE["probe_log"][-8:]
        outage = []
        for wl in ("/tmp/tpu_watch.log", "/tmp/tunnel_watch.log"):
            try:  # best-effort: recovery watchers log every failed probe
                with open(wl) as f:
                    outage += [ln.strip() for ln in f
                               if "unhealthy" in ln or "failed" in ln][-6:]
            except OSError:
                pass
        if outage:
            detail["stale_outage_log"] = outage[-10:]
    if value is None:
        # no fresh measurement and no cache — still print a parseable line
        value, vsb = -1.0, 0.0
        detail["error"] = "no measurement possible (no TPU, no cache)"
    result = {
        "metric": "1.3B DiT denoise step (CFG batch-2, 480p 81f), single chip",
        "value": round(float(value), 4),
        "unit": "s/step",
        "vs_baseline": round(float(vsb or 0.0), 4),
        "detail": detail,
    }
    print(json.dumps(result), flush=True)


def _sig_handler(signum, frame):  # pragma: no cover - exercised via CI kill test
    print(f"# signal {signum}: emitting best partial result", file=sys.stderr)
    _emit_best()
    sys.stdout.flush()
    os._exit(0)


def _install_handlers():
    signal.signal(signal.SIGTERM, _sig_handler)
    signal.signal(signal.SIGINT, _sig_handler)
    atexit.register(_emit_best)


_ABANDONED_PROBES = []  # keep handles so abandoned probes don't get GC-killed


def _tunnel_alive(timeout_s: int = 150) -> bool:
    """One tiny op in a throwaway subprocess — detects a wedged tunnel
    without hanging this process.

    CRITICAL: a probe that exceeds the timeout is ABANDONED, never killed —
    killing an in-flight TPU op re-wedges the tunnel for 10-60 min (the
    round-3 probe-kill spiral). The orphan finishes its matmul whenever the
    tunnel clears and exits on its own."""
    import subprocess

    if os.environ.get("BENCH_FORCE_WEDGED"):  # CI injection of the wedged path
        return False
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))")
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        rc = p.poll()
        if rc is not None:
            return rc == 0
        time.sleep(2)
    _ABANDONED_PROBES.append(p)  # leave it running — do NOT kill
    return False


def _wait_for_tunnel() -> bool:
    """Probe until the tunnel answers, spending from the GLOBAL tunnel-wait
    budget (~5 min total across all phases — the driver's timeout must never
    be outwaited; see VERDICT r2 weak-1)."""
    while True:
        t0 = time.monotonic()
        alive = _tunnel_alive(timeout_s=150)
        _TUNNEL_BUDGET[0] -= time.monotonic() - t0
        if alive:
            return True
        if _TUNNEL_BUDGET[0] <= 0 or _remaining() < 180:
            return False
        wait = min(60.0, _TUNNEL_BUDGET[0])
        print(f"# tunnel wedged; waiting {wait:.0f}s "
              f"(budget {_TUNNEL_BUDGET[0]:.0f}s)", file=sys.stderr)
        time.sleep(wait)
        _TUNNEL_BUDGET[0] -= wait


def _merge_phase_output(stdout: str, detail: dict) -> bool:
    """Fold every PHASE_JSON line into detail; returns True if any found."""
    found = False
    for line in (stdout or "").splitlines():
        if line.startswith("PHASE_JSON:"):
            frag = json.loads(line[len("PHASE_JSON:"):])
            if "value" in frag:  # primary fragment
                _EMIT_STATE["value"] = frag["value"]
                _EMIT_STATE["vs_baseline"] = frag["vs_baseline"]
                detail.update(frag["detail"])
                _EMIT_STATE["detail"].update(frag["detail"])
            else:
                detail.update(frag)
                _EMIT_STATE["detail"].update(frag)
            found = True
    return found


_LAST_TPU_PHASE_FAILED = [False]


def _run_phase_subprocess(name: str, timeout_s: int, detail: dict,
                          retries: int = 1, needs_tpu: bool = True) -> bool:
    """Run a detail phase isolated; merge its (possibly partial) output.

    The tunnel gate only engages AFTER a failed/timed-out TPU phase: its
    purpose is to avoid launching into a freshly-wedged tunnel, and on a
    merely-sluggish tunnel (first per-process op can take minutes) a bounded
    probe fails even though generously-timed phases would succeed.

    Success (rc==0, no timeout) and got-partial-output are tracked
    SEPARATELY: a phase killed by its timeout that streamed PHASE_JSON
    still contributed data, but the kill of its in-flight op is exactly the
    documented wedge trigger — the next TPU phase must gate on the probe."""
    ok, got = _run_phase_inner(name, timeout_s, detail, retries, needs_tpu)
    if needs_tpu:
        _LAST_TPU_PHASE_FAILED[0] = not ok
    return ok or got


def _run_phase_inner(name: str, timeout_s: int, detail: dict,
                     retries: int, needs_tpu: bool):
    import subprocess

    got_any = False
    for attempt in range(retries + 1):
        if _remaining() < 120:
            print(f"# phase {name}: deadline near; skipping", file=sys.stderr)
            return False, got_any
        if (needs_tpu and _LAST_TPU_PHASE_FAILED[0]
                and not _wait_for_tunnel()):
            print(f"# phase {name}: tunnel unusable; skipping", file=sys.stderr)
            return False, got_any
        timeout_eff = min(timeout_s, max(60, int(_remaining() - 90)))
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--phase", name],
                timeout=timeout_eff, capture_output=True, text=True)
            stdout, stderr, ok = r.stdout, r.stderr, r.returncode == 0
        except subprocess.TimeoutExpired as e:
            def _txt(b):
                return b.decode(errors="replace") if isinstance(b, bytes) else (b or "")
            stdout, stderr, ok = _txt(e.stdout), _txt(e.stderr), False
            print(f"# phase {name}: timeout {timeout_eff}s "
                  f"(attempt {attempt + 1})", file=sys.stderr)
        got_any |= _merge_phase_output(stdout, detail)
        if ok:
            return True, got_any
        if got_any:
            # partial data in hand; don't retry (the kill likely wedged the
            # tunnel — let the next phase's gate probe it)
            return False, True
        tail = (stderr or "").strip().splitlines()[-1:] or ["no output"]
        print(f"# phase {name} failed (attempt {attempt + 1}): {tail[0]}",
              file=sys.stderr)
        if attempt < retries:
            time.sleep(30)  # let the server side settle before retrying
    return False, got_any


def _backend_probe(timeout_s: float):
    """Detect the jax backend in a throwaway subprocess; returns the backend
    string or None. Runs a tiny matmul first so 'tpu' also means 'answers
    ops'. On timeout the probe is ABANDONED, never killed (a kill of an
    in-flight op re-wedges the tunnel)."""
    import subprocess
    import tempfile

    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((128,128), jnp.bfloat16);"
            "assert float(jnp.sum(x @ x)) > 0;"
            "print('BACKEND=' + jax.default_backend(), flush=True)")
    out = tempfile.NamedTemporaryFile(mode="w+", suffix=".log", delete=False)
    t0 = time.monotonic()
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=out, stderr=out)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if p.poll() is not None:
            break
        time.sleep(3)
    if p.poll() is None:
        _ABANDONED_PROBES.append(p)  # leave it running — do NOT kill
        _log_probe(f"hang >{time.monotonic() - t0:.0f}s (abandoned, not killed)")
        return None
    try:
        out.seek(0)
        lines = out.read().splitlines()
        for line in lines:
            if line.startswith("BACKEND="):
                _log_probe(f"ok {line} after {time.monotonic() - t0:.0f}s")
                return line.split("=", 1)[1]
        err = next((ln for ln in reversed(lines)
                    if "Error" in ln or "UNAVAILABLE" in ln), "")
        _log_probe(f"exit rc={p.returncode} after "
                   f"{time.monotonic() - t0:.0f}s: {err[:160]}")
    finally:
        out.close()
        # completed probe: remove its log (abandoned probes keep theirs —
        # their file handle is still the orphan's stdout)
        try:
            os.unlink(out.name)
        except OSError:
            pass
    return None


def _long_wedge_wait():
    """Long backoff for a wedged tunnel, one probe IN FLIGHT at a time,
    polled until it answers or the budget runs out. Budget = what the
    wall-clock deadline can spare after reserving time for the primary phase.

    Two observed failure shapes (round 3/4): a classic wedge makes the probe
    HANG until it clears (handled by the long poll), while a worker outage
    makes each probe EXIT with an init error after ~25 min — so a probe
    that dies unhealthy must be relaunched (after a quiet pause) for as
    long as the budget allows, not treated as a final verdict."""
    if os.environ.get("BENCH_FORCE_WEDGED"):  # CI: tunnel is "wedged" forever
        return None
    reserve = 480.0  # keep ~8 min to measure the primary once the wedge clears
    deadline = time.monotonic() + min(
        float(os.environ.get("BENCH_WEDGE_WAIT_S", "2400")),
        _remaining() - reserve)
    attempt = 0
    while True:
        left = deadline - time.monotonic()
        if left < 120:
            return None
        attempt += 1
        print(f"# tunnel wedged; long backoff probe {attempt} "
              f"(budget {left:.0f}s; wedges clear in 10-40 min)",
              file=sys.stderr)
        backend = _backend_probe(timeout_s=left)
        if backend:
            return backend
        # probe exited unhealthy (init error) or budget hit while hanging
        # (then the next loop iteration falls out on left < 120)
        time.sleep(min(60.0, max(0.0, deadline - time.monotonic())))


def _orchestrate(quick: bool):
    """Pure orchestrator: never initializes a jax client, so each phase
    subprocess gets exclusive chip access (one process holds the TPU at a
    time; a parent holding it starves every child)."""
    import subprocess

    _install_handlers()
    _load_cache()
    if os.environ.get("BENCH_TEST_CONTRACT"):
        # CI hook: exercise the end-of-orchestration output ordering without
        # a chip — tests assert `2>&1 | tail -1` is the JSON line.
        _EMIT_STATE["value"], _EMIT_STATE["vs_baseline"] = 1.0, 0.5
        _EMIT_STATE["detail"]["contract_test"] = True
        _finalize()
        return
    if os.environ.get("BENCH_TEST_HANG"):
        # CI hook: simulate being mid-work when the driver's timeout fires,
        # to exercise the SIGTERM → emit-best-partial path
        print("# BENCH_TEST_HANG: handlers installed", file=sys.stderr, flush=True)
        time.sleep(120)

    backend = None
    probe_attempts = 0 if os.environ.get("BENCH_FORCE_WEDGED") else 2
    for _ in range(probe_attempts):
        backend = _backend_probe(timeout_s=100)
        if backend:
            break
        print("# backend probe timed out (wedged tunnel?); retrying",
              file=sys.stderr)
        time.sleep(60)
    if backend is None:
        # One LONG budget-aware backoff before surrendering to the cache: a
        # wedge clears in 10-40 min, which is inside the driver's window
        # even though it dwarfs the 2x100s probes above (VERDICT r3 item 2 —
        # rounds 2 and 3 both shipped stale artifacts because we gave up in
        # ~4 min). A single unbounded probe is launched and POLLED (never
        # killed: killing an in-flight op re-wedges the tunnel).
        backend = _long_wedge_wait()
    if backend is None:
        # tunnel dead: emit the last-good cache marked stale (never hang)
        print("# backend unreachable; emitting cached result", file=sys.stderr)
        _emit_best()
        return
    if backend != "tpu":
        # CPU box: everything tiny, one process
        dit_step_s, mxu_util, detail = bench_primary(quick)
        _EMIT_STATE["value"], _EMIT_STATE["vs_baseline"] = dit_step_s, mxu_util
        _EMIT_STATE["detail"].update(detail)
        _emit_best()
        return

    detail = {}
    # no pre-gate on primary (nothing failed yet — see _run_phase_subprocess)
    _run_phase_subprocess("primary", 1200, detail, retries=1)
    if _EMIT_STATE["value"] is None:
        print("# primary failed; will emit cache", file=sys.stderr)
        _emit_best()
        return

    if not quick:
        _run_phase_subprocess("720p", 600, detail)
        _run_phase_subprocess("a14b_block", 600, detail, retries=0)
        if _remaining() > 1100:
            # the REAL full-depth A14B step (on-device + streamed passes):
            # runs under a raised BENCH_DEADLINE_S; the driver's default-
            # deadline run carries it from the cache (like e2e720)
            _run_phase_subprocess("a14b_stream", 900, detail, retries=0)
        if _remaining() > 900:
            # full-depth 720p step, ISOLATED process (see _phase_main)
            _run_phase_subprocess("a14b_stream720", 700, detail, retries=0)
        _run_phase_subprocess("e2e", 1500, detail, retries=0)
        if _remaining() > 1700:
            # measured full 50-step 720p denoise (~16 min incl. warm): only
            # under a raised BENCH_DEADLINE_S (manual in-round runs); the
            # driver's default-deadline run carries it from the cache
            _run_phase_subprocess("e2e720", 1500, detail, retries=0)
        # t5 last among chip phases: a failing phase wedges the tunnel
        # ~10-40 min, so the flakiest phase must not sit in front of others
        _run_phase_subprocess("t5", 420, detail, retries=0)
        if "e2e_480p81f_50steps_s" in detail:
            detail["sec_per_video_480p_e2e"] = round(
                detail["e2e_480p81f_50steps_s"] + detail.get("t5_xxl_encode_s", 0.0), 2
            )
        if "dit_720p_step_s" in detail:
            detail["sec_per_video_720p_50steps_derived"] = round(
                detail.get("t5_xxl_encode_s", 0.0)
                + 50 * detail["dit_720p_step_s"]
                + detail.get("vae_decode_720p_s", 0.0), 2
            )
        _EMIT_STATE["detail"].update(
            {k: v for k, v in detail.items() if k not in _EMIT_STATE["detail"]})
        _run_phase_subprocess("a14b", 900, detail, needs_tpu=False)
        _run_phase_subprocess("qwen30b", 600, detail, needs_tpu=False)
        _run_phase_subprocess("a14b_train", 1200, detail, needs_tpu=False)
        _run_phase_subprocess("v5e8", 600, detail, needs_tpu=False)

    _finalize()


def _finalize(probe: bool = True):
    """End-of-run output contract: the JSON result line must be the LAST
    thing printed on EITHER stream — the driver reads the merged-stream
    last line (VERDICT r4 item 2: round 4's headline parsed as null because
    the final-probe status trailed the JSON). So the chip-health probe runs
    and reports BEFORE _emit_best(), and nothing prints after it."""
    _save_cache()
    if not probe or os.environ.get("BENCH_TEST_CONTRACT"):
        print("# final probe skipped (no chip phase ran)", file=sys.stderr)
    elif _remaining() > 100 and _tunnel_alive(timeout_s=90):
        # leave the chip verifiably unwedged for whoever runs next
        print("# final probe: chip healthy", file=sys.stderr)
    else:
        print("# final probe skipped/failed", file=sys.stderr)
    sys.stderr.flush()
    _emit_best()


def main():
    quick = "--quick" in sys.argv
    if "--phase" in sys.argv:
        _phase_main(sys.argv[sys.argv.index("--phase") + 1])
        return
    _orchestrate(quick)


if __name__ == "__main__":
    main()
