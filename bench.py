#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Primary metric (stable across rounds): the 1.3B DiT denoising step (CFG
batch-2, 832x480 81f latent — the reference's default T2V config,
inference_omni_t2v.sh:44-55) on the available chip.

detail adds the north-star numbers from BASELINE.md:
  - e2e_480p_50steps_s: MEASURED end-to-end seconds/video through the real
    pipeline (50 UniPC steps + VAE decode) plus a measured umT5-XXL encode;
  - dit_720p_step_s / sec_video_720p_50steps: measured 720p step (the
    BASELINE.json "5s 720p" config; full 50-step loop would be ~16 min on
    one chip, so the per-step number is measured and the video time derived);
  - a14b_fsdp_compile_s: the dual-expert A14B (dim 5120, 40 layers) denoise
    step COMPILED at real 480p shapes over a virtual 8-device fsdp x sp mesh
    — proof the sharded program builds even though A14B weights don't fit
    one chip.

vs_baseline semantics: the reference publishes no benchmark numbers
(BASELINE.md), so vs_baseline is the achieved fraction of the chip's bf16
matmul roofline for the primary metric (1.0 = speed of light).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# virtual CPU devices for the sharded-A14B compile check (must precede jax
# backend init; harmless for the TPU path)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

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
    import jax.numpy as jnp
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
    pipe = OmniVideoX2XUnified.random_init(cfg, with_vae=False, attn_impl="auto")
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
    z = jnp.asarray(latents)[None] if jnp.ndim(latents) == 4 else jnp.asarray(latents)
    del pipe, latents
    _free()

    vae_params = init_vae(jax.random.PRNGKey(3), cfg.vae)
    fd = jax.jit(lambda p, z: vae_decode(p, cfg.vae, z, dtype=jnp.float32))
    video = np.asarray(fd(vae_params, z))  # compile + run
    t0 = time.perf_counter()
    video = np.asarray(fd(vae_params, z))
    t_decode = time.perf_counter() - t0
    assert np.isfinite(video).all()
    del vae_params, video
    return t_denoise + t_decode


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
        wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="auto").astype(jnp.float32)))
    step_s = _timed(lambda *a: float(fwd(*a)), params, x, t, ctx, n=2)
    del params, x, ctx, fwd
    _free()

    vae_params = init_vae(jax.random.PRNGKey(3), cfg.vae)
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 21, 90, 160), jnp.float32)
    fd = jax.jit(lambda p, z: jnp.sum(vae_decode(p, cfg.vae, z, dtype=jnp.float32)))
    dec_s = _timed(lambda *a: float(fd(*a)), vae_params, z, n=1)
    del vae_params, z
    return step_s, dec_s


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


def _phase_main(name: str):
    """Run one detail phase and print its JSON fragment (subprocess entry).

    Each heavy phase runs in a fresh process: the axon tunnel wedges for
    minutes after an OOM or a killed op, so phase failures must not share a
    client with the primary metric (observed: e2e UNAVAILABLE cascading into
    every later phase of the same process)."""
    out = {}
    if name == "primary":
        dit_step_s, mxu_util, detail = bench_primary(quick=True)
        print("PHASE_JSON:" + json.dumps(
            {"value": dit_step_s, "vs_baseline": mxu_util, "detail": detail}))
        return
    if name == "e2e":
        out["e2e_480p81f_50steps_s"] = round(bench_e2e_480p(steps=50), 2)
    elif name == "720p":
        step720, dec720 = bench_720p_step()
        out["dit_720p_step_s"] = round(step720, 3)
        out["vae_decode_720p_s"] = round(dec720, 2)
    elif name == "t5":
        out["t5_xxl_encode_s"] = round(bench_t5_encode(), 3)
    elif name == "a14b":
        # pure compile check over virtual CPU devices — force the cpu
        # platform so a wedged axon tunnel can't hang backend init
        import jax

        jax.config.update("jax_platforms", "cpu")
        out["a14b_fsdp8_compile_s"] = round(bench_a14b_compile(), 1)
    else:
        raise SystemExit(f"unknown phase {name}")
    print("PHASE_JSON:" + json.dumps(out))


def _tunnel_alive(timeout_s: int = 90) -> bool:
    """One tiny op in a throwaway subprocess — detects a wedged tunnel
    without hanging this process."""
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_tunnel(max_wait_s: int = 900) -> bool:
    """Probe until the tunnel answers (axon wedges for 10-15 min after an
    OOM or a killed in-flight op)."""
    deadline = time.monotonic() + max_wait_s
    while True:
        if _tunnel_alive():
            return True
        if time.monotonic() > deadline:
            return False
        print("# tunnel wedged; waiting 120s", file=sys.stderr)
        time.sleep(120)


def _run_phase_subprocess(name: str, timeout_s: int, detail: dict,
                          retries: int = 1, needs_tpu: bool = True) -> None:
    """Run a detail phase isolated; merge its JSON on success."""
    import subprocess

    for attempt in range(retries + 1):
        if needs_tpu and not _wait_for_tunnel():
            print(f"# phase {name}: tunnel unusable; skipping", file=sys.stderr)
            return
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--phase", name],
                timeout=timeout_s, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"# phase {name}: timeout {timeout_s}s "
                  f"(attempt {attempt + 1})", file=sys.stderr)
            time.sleep(60)  # let the server side settle before the next phase
            continue
        for line in r.stdout.splitlines():
            if line.startswith("PHASE_JSON:"):
                detail.update(json.loads(line[len("PHASE_JSON:"):]))
                return
        tail = (r.stderr or "").strip().splitlines()[-1:] or ["no output"]
        print(f"# phase {name} failed (attempt {attempt + 1}): {tail[0]}",
              file=sys.stderr)
        time.sleep(60)


def bench_primary(quick: bool):
    """Primary metric + base detail dict (runs in ONE process's jax client)."""
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
    fwd = jax.jit(
        lambda p, x, t, c: jnp.sum(
            wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="auto").astype(jnp.float32)
        )
    )
    dit_step_s = _timed(lambda *a: float(fwd(*a)), params, x, t, ctx,
                        n=3 if on_tpu else 2)
    del params

    # VAE decode throughput (BASELINE.json: "VAE decode fps")
    vae_fps = vae_fps_bf16 = None
    if on_tpu:
        try:
            vae_params = init_vae(jax.random.PRNGKey(3), cfg.vae)
            z = jax.random.normal(jax.random.PRNGKey(4), (1, 16, frames_lat, lh, lw), jnp.float32)
            fd = jax.jit(
                lambda p, z: jnp.sum(vae_decode(p, cfg.vae, z, dtype=jnp.float32))
            )
            dec_s = _timed(lambda *a: float(fd(*a)), vae_params, z, n=1)
            n_frames = (frames_lat - 1) * 4 + 1
            vae_fps = n_frames / dec_s
            fdb = jax.jit(lambda p, z: jnp.sum(
                vae_decode(p, cfg.vae, z, dtype=jnp.bfloat16).astype(jnp.float32)))
            dec_bf16_s = _timed(lambda *a: float(fdb(*a)), vae_params, z, n=1)
            vae_fps_bf16 = n_frames / dec_bf16_s
            del vae_params
        except Exception as e:  # pragma: no cover
            print(f"# vae bench failed: {e}", file=sys.stderr)

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
        "vae_decode_fps_480p": round(vae_fps, 1) if vae_fps else None,
        "vae_decode_fps_480p_bf16": (round(vae_fps_bf16, 1)
                                     if vae_fps_bf16 else None),
        "vs_baseline_semantics": "fraction of bf16 roofline (reference publishes no numbers)",
    }

    if not on_tpu:
        try:
            detail["a14b_fsdp8_compile_s"] = round(bench_a14b_compile(), 1)
        except Exception as e:
            print(f"# a14b compile check failed: {e}", file=sys.stderr)

    return dit_step_s, mxu_util, detail


def _orchestrate(quick: bool):
    """Pure orchestrator: never initializes a jax client, so each phase
    subprocess gets exclusive chip access (one process holds the TPU at a
    time; a parent holding it starves every child)."""
    import subprocess

    backend = None
    for _ in range(4):
        code = "import jax; print('BACKEND=' + jax.default_backend())"
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=120,
                               capture_output=True, text=True)
            for line in r.stdout.splitlines():
                if line.startswith("BACKEND="):
                    backend = line.split("=", 1)[1]
            if backend:
                break
        except subprocess.TimeoutExpired:
            print("# backend probe timed out (wedged tunnel?); retrying",
                  file=sys.stderr)
            time.sleep(90)
    if backend != "tpu":
        # CPU box (or unusable tunnel): everything tiny, one process
        dit_step_s, mxu_util, detail = bench_primary(quick)
        _emit(dit_step_s, mxu_util, detail)
        return

    detail = {}
    primary = {}
    _run_phase_subprocess("primary", 1500, primary, retries=2)
    if "value" not in primary:
        raise SystemExit("primary bench phase failed")
    detail.update(primary["detail"])

    if not quick:
        _run_phase_subprocess("720p", 600, detail)
        _run_phase_subprocess("e2e", 1500, detail, retries=0)
        # t5 last: a failing phase wedges the tunnel ~10-40 min, so the
        # flakiest phase must not sit in front of the others; no retry
        # (deterministic failures just wedge twice)
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
        _run_phase_subprocess("a14b", 900, detail, needs_tpu=False)
    _emit(primary["value"], primary["vs_baseline"], detail)


def _emit(dit_step_s, mxu_util, detail):
    result = {
        "metric": "1.3B DiT denoise step (CFG batch-2, 480p 81f), single chip",
        "value": round(float(dit_step_s), 4),
        "unit": "s/step",
        "vs_baseline": round(float(mxu_util), 4),
        "detail": detail,
    }
    print(json.dumps(result))


def main():
    quick = "--quick" in sys.argv
    if "--phase" in sys.argv:
        _phase_main(sys.argv[sys.argv.index("--phase") + 1])
        return
    _orchestrate(quick)


if __name__ == "__main__":
    main()
