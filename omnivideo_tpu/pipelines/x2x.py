"""Unified x2x generation pipeline (T2V / V2V-edit / mixed-condition).

Role of reference `omnivideo/x2x_gen_unified.py:24-541` (OmniVideoX2XUnified)
and `x2x_gen_unified_1_3B.py:17` (single-expert subclass), re-designed
TPU-first:

- the denoising loop is ONE jit-compiled `lax.scan` per expert phase: the
  dual-expert boundary (t ≥ 0.875·T selects the high-noise expert,
  x2x_gen_unified.py:228-258) is resolved on the host into a static step-index
  split — scan #1 runs the high-noise expert, scan #2 the low-noise expert;
  no per-step Python, no CPU⇄device model swaps (both experts stay resident,
  sharded under fsdp when a mesh is given);
- CFG is fused as batch-2 (cond, uncond stacked) — one DiT forward per step
  instead of the reference's two sequential forwards
  (x2x_gen_unified.py:480-481);
- the mixed conditioning context is timestep-independent, so it is assembled
  AND text-embedded once per phase, outside the scan;
- the UniPC / DPM++ update is the precomputed-coefficient linear recurrence
  from schedulers/ — the whole hot loop is steps × (1 DiT forward + a few
  fused multiply-adds);
- per-sample RNG is `jax.random.fold_in`-style deterministic — seeded runs
  need no broadcast of seeds or contexts (reference x2x_gen_unified.py:
  374-380): every host computes identical values by construction. Unseeded
  (seed=-1) multi-process runs broadcast host 0's drawn seed once.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import prompts
from ..configs.base import PipelineConfig
from ..models.unified import build_mixed_context, null_ar_vision
from ..models.vae2_1 import Wan21VAE, init_vae, vae_decode, vae_encode
from ..models.wan_dit import cast_wan_params, embed_context, init_wan_dit, wan_dit_apply
from ..schedulers import FlowDPMSolver, FlowUniPC, get_sampling_sigmas

log = logging.getLogger(__name__)


def video_to_uint8_frames(video: jnp.ndarray) -> jnp.ndarray:
    """[C, T, H, W] f32 in [-1,1] → [T, H, W, C] uint8, ON DEVICE.

    Value-identical to utils.video._to_uint8 (clip → affine → +0.5 →
    truncating cast; float→int converts truncate toward zero in both XLA and
    numpy), so save_video(frames) writes the same bytes — but the host fetch
    over the tunnel moves 1 byte/px instead of 4 (the f32 fetch of a 480p·81f
    video is ~390 MB and was the dominant e2e run-to-run variance)."""
    x = jnp.clip(video.astype(jnp.float32), -1.0, 1.0)
    u8 = ((x + 1.0) * 127.5 + 0.5).astype(jnp.uint8)
    return jnp.transpose(u8, (1, 2, 3, 0))


@dataclasses.dataclass
class ExpertParams:
    wan: Any  # DiT param pytree
    companions: Any  # vlm_norm / vlm_proj / visual_context_adapter


class OmniVideoX2XUnified:
    """Unified x2x pipeline.

    Parameters are explicit pytrees (loaded via io.torch_convert or random);
    `low_noise` / `high_noise` may alias the same object for single-expert
    models (reference x2x_gen_unified_1_3B.py:139-140).
    """

    def __init__(
        self,
        config: PipelineConfig,
        low_noise: ExpertParams,
        high_noise: Optional[ExpertParams] = None,
        vae: Optional[Wan21VAE] = None,
        special_tokens: Optional[Dict[str, jnp.ndarray]] = None,
        text_encoder=None,  # optional callable: list[str] -> list[[L, text_dim]]
        attn_impl: str = "auto",
        sp=None,  # models.wan_dit.SPConfig for sequence-parallel denoising
        layer_stream: bool = False,
        qk_impl: str = "auto",  # fused norm+rope+bound prologue; "auto" =
        # measured winner for this width (ops/tuning.py tuned table)
        ew_impl: str = "auto",  # fused AdaLN sandwich kernel; "auto" as above
        stream_quant: Optional[str] = None,  # "int8": weight-only quantized
        # block streaming (ops/quant.py) — halves host->HBM bytes per block
        stream_group: int = 1,  # blocks per jitted dispatch (amortizes
        # per-dispatch latency on tunnel-attached chips; numerics identical)
        residual_dtype: Optional[str] = None,  # "bfloat16": store the
        # [B, L, dim] residual stream at bf16 (adds/norms still compute
        # f32) — halves the in-block norm/residual HBM traffic; measured
        # 3.83->3.76 s/step at 1.3B. None keeps the reference-parity f32
        # stream (torch promotion, reference model.py:245-246).
    ):
        self.config = config
        self.low_noise = low_noise
        self.high_noise = high_noise or low_noise
        self.vae = vae
        self.special_tokens = special_tokens
        self.text_encoder = text_encoder
        self.attn_impl = attn_impl
        self.qk_impl = qk_impl
        self.ew_impl = ew_impl
        self.residual_dtype = (None if residual_dtype in (None, "float32", "f32")
                               else jnp.dtype(residual_dtype))
        self.sp = sp
        self.num_train_timesteps = config.num_train_timesteps
        self.boundary = config.boundary
        # DiT context budget = max_context_len (unified_model.py:73-75)
        self.dit_cfg = config.dit.replace(text_len=config.max_context_len)
        self._denoise_cache: Dict[Any, Any] = {}
        # layer_stream: run the DiT block stack through the host→HBM
        # streaming executor (pipelines/streaming.py) — the single-chip
        # deployment for models whose params exceed HBM (A14B: ~14 GB/expert
        # vs 16 GB; the reference needs an 80 GB GPU, x2x_gen_unified.py:261).
        # Expert block stacks move to HOST memory; embeds/head stay resident.
        self.layer_stream = layer_stream
        self._stream: Dict[int, Any] = {}
        if layer_stream:
            assert sp is None, "layer streaming is single-device"
            from .streaming import BlockStreamingExecutor, split_host_params

            experts = {id(self.low_noise): self.low_noise,
                       id(self.high_noise): self.high_noise}
            for eid, ep in experts.items():
                resident, blocks = split_host_params(ep.wan)
                resident = jax.device_put(resident)
                self._stream[eid] = (
                    resident,
                    # packed: one flat buffer per dtype per block — per-leaf
                    # device_put over the axon tunnel is latency-bound
                    # (~30 round trips/block, 0.04 GB/s measured)
                    BlockStreamingExecutor(self.dit_cfg, blocks,
                                           attn_impl=attn_impl,
                                           qk_impl=qk_impl,
                                           ew_impl=ew_impl,
                                           packed=True,
                                           quant=stream_quant,
                                           group=stream_group),
                )

    # ------------------------------------------------------------------
    @classmethod
    def random_init(
        cls,
        config: PipelineConfig,
        seed: int = 0,
        with_vae: bool = True,
        attn_impl: str = "auto",
        layer_stream: bool = False,
        **pipe_kwargs,
    ) -> "OmniVideoX2XUnified":
        """Random-weight pipeline for smoke tests / benchmarks.

        With layer_stream=True the wan trees are built HOST-SIDE (eval_shape
        structure + numpy values): at A14B dims a device init would OOM the
        16 GB chip before the ctor could move the blocks to host memory."""
        from ..models.unified import init_unified_companions

        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        dtype = config.jnp_param_dtype

        def init_wan(k):
            if not layer_stream:
                return init_wan_dit(k, config.dit, dtype=dtype)
            shapes = jax.eval_shape(
                lambda kk: init_wan_dit(kk, config.dit, dtype=dtype), k)
            rng = np.random.default_rng(int(k[-1]))

            def full_leaf(s):
                if s.ndim == 1 and s.dtype == np.float32:
                    return np.ones(s.shape, np.float32)
                return (rng.standard_normal(s.shape, dtype=np.float32)
                        * 0.02).astype(s.dtype)

            def block_leaf(s):
                # stacked block leaves: generate ONE layer and broadcast to
                # the stack (zero-copy read-only view) — a random-weight
                # smoke needs no distinct layers, and full-stack host RNG
                # costs ~4 min per 28 GB A14B expert (e2e timed out on it)
                if s.ndim <= 1:
                    return full_leaf(s)
                one = full_leaf(
                    jax.ShapeDtypeStruct(s.shape[1:], s.dtype))
                return np.broadcast_to(one[None], s.shape)

            out = {kk: jax.tree_util.tree_map(full_leaf, v)
                   for kk, v in shapes.items() if kk != "blocks"}
            out["blocks"] = jax.tree_util.tree_map(
                block_leaf, shapes["blocks"])
            return out

        low = ExpertParams(
            wan=init_wan(k1),
            companions=init_unified_companions(k2, config),
        )
        high = low
        if config.dual_expert:
            high = ExpertParams(
                wan=init_wan(k3),
                companions=low.companions,
            )
        vae = None
        if with_vae:
            vae = Wan21VAE.create(init_vae(k4, config.vae), config.vae)
        return cls(config, low, high, vae=vae, attn_impl=attn_impl,
                   layer_stream=layer_stream, **pipe_kwargs)

    # ------------------------------------------------------------------
    def _encode_text(self, text: str) -> jnp.ndarray:
        if self.text_encoder is None:
            raise ValueError(
                "no text encoder attached; pass precomputed_context or attach "
                "a T5 encoder (models.t5)"
            )
        return self.text_encoder([text])[0]

    def _latent_shape(self, size, frame_num):
        vs = self.config.vae.vae_stride
        return (
            self.config.vae.z_dim,
            (frame_num - 1) // vs[0] + 1,
            size[1] // vs[1],
            size[0] // vs[2],
        )

    def _make_solver(self, sample_solver, sampling_steps, shift):
        if sample_solver == "unipc":
            return FlowUniPC.create(
                sampling_steps, shift=shift, num_train_timesteps=self.num_train_timesteps
            )
        if sample_solver == "dpm++":
            sig = get_sampling_sigmas(sampling_steps, shift)
            return FlowDPMSolver.create(
                sigmas=sig, num_train_timesteps=self.num_train_timesteps
            )
        raise NotImplementedError(f"unsupported solver {sample_solver}")

    def _denoise_segment_fn(self, solver_cls, seg_len: int, seq_len: int):
        """Build (and cache) the jitted per-expert scan."""
        key = (solver_cls, seg_len, seq_len, self.attn_impl, self.sp,
               self.qk_impl, self.ew_impl, self.residual_dtype)
        if key in self._denoise_cache:
            return self._denoise_cache[key]

        cfg = self.dit_cfg
        attn_impl = self.attn_impl
        qk_impl, ew_impl = self.qk_impl, self.ew_impl
        residual_dtype = self.residual_dtype
        sp = self.sp
        scan_step = solver_cls.scan_step
        pdtype = self.config.jnp_param_dtype

        @jax.jit
        def run(wan_params, state, coeffs, mixed2, guide_scale):
            ctx_emb2 = embed_context(wan_params, cfg, mixed2.astype(pdtype))

            def body(st, c):
                x2 = jnp.concatenate([st.x, st.x], axis=0).astype(pdtype)
                t2 = jnp.full((2,), c.timestep, jnp.float32)
                v2 = wan_dit_apply(
                    wan_params,
                    cfg,
                    x2,
                    t2,
                    ctx_emb2,
                    seq_len=seq_len,
                    context_embedded=True,
                    attn_impl=attn_impl,
                    qk_impl=qk_impl,
                    ew_impl=ew_impl,
                    sp=sp,
                    residual_dtype=residual_dtype,
                )
                # CFG: uncond + g·(cond − uncond) (x2x_gen_unified.py:484)
                v = v2[1:] + guide_scale * (v2[0:1] - v2[1:])  # keep [1,...]
                return scan_step(st, c, v), None

            state, _ = jax.lax.scan(body, state, coeffs)
            return state

        self._denoise_cache[key] = run
        return run

    def _denoise_segment_stream(self, solver_cls, seq_len: int):
        """Host-driven denoise loop for layer_stream mode: per step, the
        block stack runs as the executor's pipelined per-block dispatches
        (each far under the tunnel's single-dispatch ceiling — streaming
        subsumes max_steps_per_call); pre/post/solver updates stay jitted.
        Numerically identical to the scanned _denoise_segment_fn (the
        streamed forward is parity-tested in tests/test_streaming.py)."""
        key = ("stream", solver_cls, seq_len, self.residual_dtype)
        if key in self._denoise_cache:
            return self._denoise_cache[key]

        cfg = self.dit_cfg
        rdt = self.residual_dtype
        pdtype = self.config.jnp_param_dtype
        scan_step = solver_cls.scan_step
        embed2 = jax.jit(
            lambda rp, m2: embed_context(rp, cfg, m2.astype(pdtype)))
        solve = jax.jit(
            lambda st, c, v2, g: scan_step(
                st, c, v2[1:] + g * (v2[0:1] - v2[1:])))

        def run(resident, executor, state, coeffs, mixed2, guide_scale):
            from .streaming import wan_dit_stream_apply

            ctx2 = embed2(resident, mixed2)
            n = jax.tree_util.tree_leaves(coeffs)[0].shape[0]
            for i in range(n):
                c = jax.tree_util.tree_map(lambda a: a[i], coeffs)
                x2 = jnp.concatenate([state.x, state.x], axis=0)
                t2 = jnp.full((2,), c.timestep, jnp.float32)
                v2 = wan_dit_stream_apply(
                    resident, executor, cfg, x2, t2, ctx2,
                    seq_len=seq_len, context_embedded=True,
                    residual_dtype=rdt)
                state = solve(state, c, v2, guide_scale)
            return state

        self._denoise_cache[key] = run
        return run

    # ------------------------------------------------------------------
    def generate(
        self,
        input_prompt: str = "",
        precomputed_context: Optional[jnp.ndarray] = None,
        precomputed_context_null: Optional[jnp.ndarray] = None,
        ar_vision_input: Optional[jnp.ndarray] = None,
        visual_emb: Optional[jnp.ndarray] = None,
        aligned_emb: Optional[jnp.ndarray] = None,
        ref_images: Optional[jnp.ndarray] = None,
        token_order: str = "v2",
        size: Tuple[int, int] = (1280, 720),
        frame_num: int = 81,
        shift: float = 5.0,
        sample_solver: str = "unipc",
        sampling_steps: int = 50,
        guide_scale=5.0,
        n_prompt: str = "",
        seed: int = -1,
        condition_mode: str = "auto",
        decode: bool = True,
        max_steps_per_call: Optional[int] = None,
        vae_dtype=None,
        output_uint8: bool = False,
    ):
        """Generate a video (reference generate(), x2x_gen_unified.py:261-540).

        Returns decoded video [3, frame_num, H, W] f32 in [-1,1] (or
        [frame_num, H, W, 3] uint8 frames when output_uint8 — the [-1,1]→byte
        quantization runs ON DEVICE so the host fetch moves 4× less data over
        the tunnel; math identical to utils.video._to_uint8), or the raw
        latents when decode=False.
        """
        cfg = self.config
        target_shape = self._latent_shape(size, frame_num)
        pt, ph, pw = cfg.dit.patch_size
        sp_size = self.sp.sp_size if self.sp is not None else 1
        seq_len = (
            math.ceil(
                (target_shape[2] * target_shape[3]) / (ph * pw) * target_shape[1] / sp_size
            )
            * sp_size
        )

        if n_prompt == "":
            n_prompt = prompts.SAMPLE_NEG_PROMPT_EN
        if seed < 0:
            # keep the "every host computes identical values" invariant even
            # for unseeded runs: host 0 draws the seed and broadcasts it
            # (the TPU analog of the reference's dist.broadcast of seed_g,
            # x2x_gen_unified.py:374-380); single-process runs skip the
            # collective.
            seed = int(np.random.randint(0, 2**31 - 1))
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                seed = int(multihost_utils.broadcast_one_to_all(np.int32(seed)))
        key = jax.random.PRNGKey(seed)

        # ---- conditioning --------------------------------------------------
        context = (
            precomputed_context
            if precomputed_context is not None
            else self._encode_text(input_prompt)
        )
        context_null = (
            precomputed_context_null
            if precomputed_context_null is not None
            else (self._encode_text(n_prompt) if self.text_encoder else None)
        )
        if context_null is None:
            log.warning("no negative context available; using zeros")
            context_null = jnp.zeros((1, cfg.dit.text_dim), jnp.float32)

        ar_null = None
        if ar_vision_input is not None and condition_mode != "text_only":
            ar_null = null_ar_vision(ar_vision_input.shape[-1])

        def mixed(ctx, arv, companions):
            return build_mixed_context(
                companions,
                cfg,
                context=ctx,
                ar_vision=arv,
                visual_emb=visual_emb,
                aligned_emb=aligned_emb,
                ref_images=ref_images,
                special_tokens=self.special_tokens,
                condition_mode="full" if condition_mode == "auto" else condition_mode,
                order=token_order,
            )

        # ---- solver + noise ------------------------------------------------
        solver = self._make_solver(sample_solver, sampling_steps, shift)
        noise = jax.random.normal(key, target_shape, jnp.float32)[None]  # [1,C,F,h,w]
        state = solver.init_state(noise)

        boundary_t = self.boundary * self.num_train_timesteps
        n_high = int(np.sum(solver.timesteps >= boundary_t)) if self.config.dual_expert else 0
        S = len(solver.timesteps)

        if isinstance(guide_scale, (tuple, list)):
            g_low, g_high = float(guide_scale[0]), float(guide_scale[1])
        else:
            g_low = g_high = float(guide_scale)

        segments = []
        if n_high > 0:
            segments.append((self.high_noise, 0, n_high, g_high))
        if n_high < S:
            segments.append((self.low_noise, n_high, S, g_low))

        if max_steps_per_call:
            # chunk each expert segment into near-equal scan calls: the
            # solver state carries all cross-step memory, so splitting is
            # exact (the expert-boundary split above relies on the same
            # property). Near-equal sizing keeps the jit cache to <=2 scan
            # lengths per segment. Bounds single-dispatch walltime (the
            # axon tunnel drops executions running for minutes) and gives
            # the preemption guard step-level granularity.
            chunked = []
            for expert, a, b, g in segments:
                n = b - a
                pieces = -(-n // max_steps_per_call)
                base, extra = divmod(n, pieces)
                at = a
                for i in range(pieces):
                    ln = base + (1 if i < extra else 0)
                    chunked.append((expert, at, at + ln, g))
                    at += ln
            segments = chunked

        import time as _time

        solver_cls = type(solver)
        for expert, a, b, g in segments:
            t_seg = _time.perf_counter()
            coeffs_seg = jax.tree_util.tree_map(lambda f: f[a:b], solver.coeffs)
            mixed2 = jnp.stack(
                [
                    mixed(context, ar_vision_input, expert.companions),
                    mixed(context_null, ar_null, expert.companions),
                ]
            )
            if self.layer_stream:
                resident, executor = self._stream[id(expert)]
                run = self._denoise_segment_stream(solver_cls, seq_len)
                state = run(resident, executor, state, coeffs_seg, mixed2,
                            jnp.float32(g))
            else:
                run = self._denoise_segment_fn(solver_cls, b - a, seq_len)
                state = run(expert.wan, state, coeffs_seg, mixed2,
                            jnp.float32(g))
            # force the segment: block_until_ready is a NO-OP under the axon
            # TPU plugin, so without a scalar readback the walltime logs (and
            # any caller timing generate()) measure dispatch, not execution.
            # Must not be an assert: `python -O` would strip the load-bearing
            # readback along with the finiteness check.
            seg_sum = float(jnp.sum(state.x))
            if not np.isfinite(seg_sum):
                raise FloatingPointError(
                    f"non-finite latents after denoise steps [{a}:{b})")
            log.info("denoise segment steps[%d:%d) took %.2fs (guide %.1f)",
                     a, b, _time.perf_counter() - t_seg, g)

        latents = state.x  # [1, C, F, h, w] f32
        if not decode:
            return latents
        assert self.vae is not None, "no VAE attached"
        # layer-stream mode: denoising is over, so the executors'
        # residentized device block copies (up to 1.4 GB/expert) are dead
        # weight — the 480p·81f VAE decode OOMed with them held
        for _, ex in self._stream.values():
            ex.release()
        if self.layer_stream:
            # drop cached jit executables too: the dim-5120 denoise programs
            # pin their device constants; decode recompiles from the
            # persistent XLA cache
            jax.clear_caches()
            try:
                ms = jax.devices()[0].memory_stats() or {}
                log.info("HBM before decode: in_use=%.2f GB peak=%.2f GB "
                         "limit=%.2f GB",
                         ms.get("bytes_in_use", 0) / 1e9,
                         ms.get("peak_bytes_in_use", 0) / 1e9,
                         ms.get("bytes_limit", 0) / 1e9)
            except Exception:  # memory_stats unsupported on some backends
                pass
        # vae_dtype=bf16 runs the decoder convs on the bf16 MXU path (~2x);
        # output is cast back to f32 before [-1,1] clamping either way
        video = (self.vae.decode(latents, dtype=vae_dtype) if vae_dtype is not None
                 else self.vae.decode(latents))
        if output_uint8:
            return np.asarray(video_to_uint8_frames(video[0]))
        return np.asarray(video[0])
