"""Single-chip training of DiT stacks whose parameters exceed HBM.

Role of the reference's multi-GPU ZeRO-1 fine-tuning
(`/root/reference/previous_version/Omni-Video1/finetune_model.py:725-732`
shards optimizer state across GPUs because one 80 GB card cannot hold
A14B training state): a v5e chip has 16 GB of HBM, so neither the 40-block
A14B parameter stack nor its gradients/optimizer state can be resident.
`StreamedTrainer` runs the flow-matching train step as a host↔HBM pipeline
instead — the TPU analog is *streaming ZeRO-offload to host memory on ONE
chip* rather than sharding across many:

- **forward**: blocks stream host→HBM exactly like inference
  (pipelines/streaming.py), saving each block's input activation (optionally
  offloaded back to host — 40 × [B,L,dim] f32 cannot stay resident at A14B
  480p shapes);
- **backward** (pass A): walking blocks in reverse, each block re-streams
  its params and recomputes its forward inside `jax.vjp` (remat by
  construction — no checkpoint stack), yielding (d_params, d_x, d_e0, d_ctx);
  d_params goes back to host, d_x chains to the previous block, and the
  tiny conditioning grads accumulate on device;
- **update** (pass B): gradients are scaled by the *global*-norm clip factor
  (the squared norms were accumulated during pass A, so the clip is exact —
  not per-block) and each block runs the SAME per-leaf optax transform the
  resident trainer uses (`trainer.make_inner_optimizer`; adafactor's
  factored stats make each block's optimizer state a few hundred KB).

Two passes are required for exactness: `optax.clip_by_global_norm` couples
every leaf through one scalar, and adafactor's stats update is nonlinear in
the gradient, so the scale must be known before any leaf updates. The result
is bit-comparable to `make_train_step` + `make_optimizer` — asserted
leaf-for-leaf in tests/test_streamed_training.py. With clipping DISABLED
(`grad_clip=0`) the update fuses into pass A — the block's params are
already on device for the vjp, so no gradient ever crosses to host and
pass B disappears (~2x less h2d traffic per step), still exactly matching
the monolithic no-clip trainer.

Traffic arithmetic at A14B dims (bf16 params, 0.7 GB/block): fwd params h2d
0.7 + act d2h/h2d 2×1.34 (f32, 480p·81f b1) + bwd params h2d 0.7 + grads
d2h/h2d 2×0.7 (bf16 cotangents) + updated params d2h 0.7 ≈ 6.5 GB/block,
~260 GB/step. A PCIe v5e host (≥16 GB/s h2d) sustains that in ~20 s/step on
top of ~12 s of compute; the tunnel-attached chip here is bandwidth-bound,
which `bench.py --phase a14b_stream` quantifies (same transfer path).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs.base import PipelineConfig, WanDiTConfig
from ..models.wan_dit import (
    WanAuxInputs,
    _dense,
    embed_context,
    patchify,
    time_embeddings,
    unpatchify,
    wan_block_apply,
)
from ..ops.norms import layer_norm
from ..ops.rope import rope_3d_tables
from ..schedulers.flow_match import FlowMatchScheduler
from .trainer import (
    TrainConfig,
    _sample_timestep_ids,
    make_inner_optimizer,
)


from ..pipelines.streaming import BlockPacker


@functools.lru_cache(maxsize=32)
def _unpack_jit(packer: BlockPacker):
    """Device-side unpack: {dtype: flat} → pytree (static slices, one jit
    per packer signature)."""
    return jax.jit(packer.unpack)


@functools.lru_cache(maxsize=32)
def _pack_jit(packer: BlockPacker):
    """Device-side pack: pytree → {dtype: flat} so a d2h fetch is one
    transfer per dtype instead of one per leaf (the tunnel pays a full
    round trip per transfer — see pipelines/streaming.py::BlockPacker)."""

    def pack(tree):
        groups: Dict[str, list] = {}
        for leaf, (key, _, _, _) in zip(jax.tree_util.tree_leaves(tree),
                                        packer.specs):
            groups.setdefault(key, []).append(leaf.reshape(-1))
        return {k: jnp.concatenate(v) if len(v) > 1 else v[0]
                for k, v in groups.items()}

    return jax.jit(pack)


class StreamedTrainState(NamedTuple):
    """Host-orchestrated training state. `resident` (embeds/time/head — a few
    hundred MB at A14B) and its optimizer state live on device; the block
    stack and its optimizer states live in host memory as numpy pytrees."""

    resident: Any                 # device pytree (non-block params)
    resident_opt: Any             # device optax state for resident
    host_blocks: List[Any]        # per-block host numpy param pytrees
    host_block_opts: List[Any]    # per-block host numpy optax states
    step: int


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class StreamedTrainer:
    """Flow-matching trainer for block stacks larger than device memory.

    Mirrors `make_train_step`'s loss (trainer.py:182-211 — same rng splits,
    timestep sampling, CFG dropout, flow-match target/weighting) with the
    `lax.scan` over blocks replaced by per-block streamed dispatches.
    """

    def __init__(
        self,
        cfg: PipelineConfig,
        tc: TrainConfig,
        attn_impl: str = "auto",
        act_offload: bool = True,
        device=None,
        packed_transfers: bool = True,
        stream_quant: Optional[str] = None,
    ):
        assert tc.grad_accum_steps == 1, "streamed trainer: accumulate on host"
        assert not tc.trainable_filters, "streamed trainer trains all params"
        assert stream_quant in (None, "int8"), stream_quant
        self.cfg = cfg
        self.tc = tc
        self.dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
        self.attn_impl = attn_impl
        self.act_offload = act_offload
        self.device = device or jax.devices()[0]
        # stream_quant="int8" — the tunnel-class transfer diet (VERDICT r4
        # item 6): fwd AND bwd block-param streams ride weight-only q8
        # (0.35 vs 0.7 GB/block at A14B), gradients are quantized ON DEVICE
        # before the d2h fetch, and the block optimizer update runs on the
        # HOST CPU backend (same optax fn, zero extra crossings — updated
        # params/opt state never cross the wire). Opt-in: grads are taken
        # at the dequantized-q8 weights and ride int8, so the step is no
        # longer bit-identical to the monolithic trainer (master weights on
        # host stay full precision; parity bound in tests).
        self.stream_quant = stream_quant
        self._q8_cache_step = -1
        self._q8_blocks: List[Any] = []
        # packed_transfers: every per-block host<->device crossing (params,
        # grads, optimizer state) moves as one flat buffer per dtype — the
        # tunnel pays a round trip per transfer, so ~30-leaf pytrees are
        # latency-bound otherwise. Host-side cost is one memcpy per pack.
        self.packed_transfers = packed_transfers
        self._packers: Dict[Any, BlockPacker] = {}
        self.inner = make_inner_optimizer(tc)
        self.flow = FlowMatchScheduler.create(
            num_inference_steps=tc.num_train_timesteps,
            num_train_timesteps=tc.num_train_timesteps,
            shift=tc.flow_shift,
            is_training=True,
        )
        self._jit: Dict[str, Callable] = {}
        self._build_jits()

    # ------------------------------------------------------------------
    def init_state(self, params) -> StreamedTrainState:
        """params: full wan pytree (host or device). Blocks move to host;
        per-block optimizer states are initialized host-side (zeros — no
        device roundtrip needed)."""
        resident = {k: jax.device_put(v, self.device)
                    for k, v in params.items() if k != "blocks"}
        stacked = _to_host(params["blocks"])
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        host_blocks = [jax.tree_util.tree_map(lambda a: a[i], stacked)
                       for i in range(n)]
        # identical shapes → init once, replicate structure with fresh copies
        opt0 = _to_host(self.inner.init(host_blocks[0]))
        host_opts = [jax.tree_util.tree_map(np.copy, opt0) for _ in range(n)]
        resident_opt = self.inner.init(resident)
        return StreamedTrainState(resident, resident_opt, host_blocks,
                                  host_opts, 0)

    # ------------------------------------------------------------------
    def _build_jits(self):
        cfg, tc, flow = self.dit_cfg, self.tc, self.flow
        pcfg = self.cfg
        timesteps = flow.timesteps

        @jax.jit
        def prep(batch, rng):
            """Noise/timestep/CFG-dropout prep — EXACTLY make_train_step's
            loss_fn prologue (same split order) so streamed and scanned steps
            agree bit-for-bit under one rng."""
            latents = batch["latents"].astype(jnp.float32)
            B = latents.shape[0]
            k_t, k_n, k_cfg = jax.random.split(rng, 3)
            tid = _sample_timestep_ids(k_t, B, tc)
            t = timesteps[tid]
            noise = jax.random.normal(k_n, latents.shape, jnp.float32)
            noisy = flow.add_noise(latents, noise, t)
            target = flow.training_target(latents, noise, t)
            weights = flow.training_weight(t)
            context = batch["context"]
            if tc.cfg_dropout > 0 and "uncond_context" in batch:
                drop = jax.random.uniform(k_cfg, (B,)) < tc.cfg_dropout
                context = jnp.where(drop[:, None, None],
                                    batch["uncond_context"], context)
            return noisy, t, context, target, weights

        def pre_fn(resident, noisy, t, context):
            pdtype = resident["patch_embedding"]["kernel"].dtype
            tokens = patchify(noisy.astype(pdtype), cfg.patch_size)
            h = _dense(resident["patch_embedding"], tokens)
            e, e0 = time_embeddings(resident, cfg, t)
            ctx = embed_context(resident, cfg, context)
            return h.astype(jnp.float32), e, e0, ctx

        @jax.jit
        def pre(resident, noisy, t, context):
            return pre_fn(resident, noisy, t, context)

        @jax.jit
        def pre_grads(resident, noisy, t, context, cts):
            _, pull = jax.vjp(
                lambda r: pre_fn(r, noisy, t, context), resident)
            return pull(cts)[0]

        def block_fn(bp, x, e0, ctx, cos, sin):
            aux = WanAuxInputs(e0=e0, context=ctx, rope_cos=cos,
                               rope_sin=sin, kv_lens=None, sp=None)
            return wan_block_apply(bp, x, aux, cfg, attn_impl=self.attn_impl)

        self._block_fn = block_fn  # subclasses build adapter-aware jits on it

        @jax.jit
        def block_fwd(bp, x, e0, ctx, cos, sin):
            return block_fn(bp, x, e0, ctx, cos, sin)

        @jax.jit
        def block_grads(bp, x, e0, ctx, cos, sin, ct):
            # vjp recomputes the block forward: remat by construction (the
            # scanned trainer sets remat=True for the same reason)
            _, pull = jax.vjp(
                lambda b, xx, ee, cc: block_fn(b, xx, ee, cc, cos, sin),
                bp, x, e0, ctx)
            return pull(ct)

        def post_loss_fn(resident, hf, e, target, weights):
            grid = self._grid(target.shape)
            hp = resident["head"]
            eh = (hp["modulation"].astype(jnp.float32)[None, None]
                  + e[:, :, None])  # [B,T,2,d]
            xn = layer_norm(hf, cfg.eps, out_f32=True)
            y = xn * (1.0 + eh[:, :, 1]) + eh[:, :, 0]
            out = _dense(hp["head"], y, dtype=jnp.float32)
            v = unpatchify(out, grid, cfg.patch_size, cfg.out_dim)
            per = jnp.mean(jnp.square(v - target), axis=(1, 2, 3, 4))
            return jnp.mean(weights * per)

        @jax.jit
        def post_loss_grads(resident, hf, e, target, weights):
            loss, grads = jax.value_and_grad(
                post_loss_fn, argnums=(0, 1, 2))(resident, hf, e, target,
                                                 weights)
            return loss, grads

        @jax.jit
        def sq_norm(tree):
            return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(tree))

        @jax.jit
        def upd(p, g, opt_state, scale):
            # same multiply (and dtype promotion) optax.clip_by_global_norm
            # applies, with the scale computed from the GLOBAL norm
            g = jax.tree_util.tree_map(lambda x: x * scale, g)
            updates, opt2 = self.inner.update(g, opt_state, p)
            return optax.apply_updates(p, updates), opt2

        @jax.jit
        def acc(a, b):
            return jax.tree_util.tree_map(jnp.add, a, b)

        @jax.jit
        def post_loss_dh(resident, hf, e, target, weights):
            # head/resident frozen (LoRA mode): only the stack-top cotangent
            loss, d_h = jax.value_and_grad(post_loss_fn, argnums=1)(
                resident, hf, e, target, weights)
            return loss, d_h

        self._jit = dict(prep=prep, pre=pre, pre_grads=pre_grads,
                         block_fwd=block_fwd, block_grads=block_grads,
                         post_loss_grads=post_loss_grads,
                         post_loss_dh=post_loss_dh, sq_norm=sq_norm,
                         upd=upd, acc=acc)

        if getattr(self, "stream_quant", None):
            from ..ops.quant import dequantize_block, quantize_block_jnp

            @jax.jit
            def block_fwd_q(qbp, x, e0, ctx, cos, sin):
                return block_fn(dequantize_block(qbp), x, e0, ctx, cos, sin)

            @jax.jit
            def block_grads_q(qbp, x, e0, ctx, cos, sin, ct):
                bp = dequantize_block(qbp)
                _, pull = jax.vjp(
                    lambda b, xx, ee, cc: block_fn(b, xx, ee, cc, cos, sin),
                    bp, x, e0, ctx)
                return pull(ct)

            @jax.jit
            def qgrad(g):
                # shrink the d2h gradient fetch to int8 + f32 scales
                return quantize_block_jnp(g)

            # the block optimizer update runs on the HOST CPU backend —
            # byte-identical optax math, zero tunnel crossings for updated
            # params / optimizer state. Inputs committed to a cpu device
            # pin the jit execution there (jit follows committed inputs).
            cpu = jax.devices("cpu")[0]

            def upd_fn(p, g, opt_state, scale):
                g = jax.tree_util.tree_map(lambda x: x * scale, g)
                updates, opt2 = self.inner.update(g, opt_state, p)
                return optax.apply_updates(p, updates), opt2

            upd_jit = jax.jit(upd_fn)

            def upd_cpu(p, g, opt_state, scale):
                put = lambda t: jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, cpu), t)
                return upd_jit(put(p), put(g), put(opt_state),
                               jax.device_put(np.float32(scale), cpu))
            self._jit.update(block_fwd_q=block_fwd_q,
                             block_grads_q=block_grads_q, qgrad=qgrad,
                             upd_cpu=upd_cpu)
        del pcfg

    # ------------------------------------------------------------------
    def _grid(self, latent_shape):
        pt, ph, pw = self.dit_cfg.patch_size
        return (latent_shape[2] // pt, latent_shape[3] // ph,
                latent_shape[4] // pw)

    def _put(self, tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, self.device), tree)

    # ---- packed host<->device transfers (one flat buffer per dtype) ----
    def _packer_for(self, tree) -> BlockPacker:
        key = jax.tree_util.tree_structure(tree)
        pk = self._packers.get(key)
        if pk is None:
            pk = self._packers[key] = BlockPacker(tree)
        return pk

    def _put_packed(self, tree):
        """Host pytree → device pytree via one transfer per dtype. Device
        or mixed trees fall back to the per-leaf path."""
        if not self.packed_transfers or not all(
                isinstance(l, np.ndarray)
                for l in jax.tree_util.tree_leaves(tree)):
            return self._put(tree)
        pk = self._packer_for(tree)
        bufs = pk.pack(tree)
        dev = {k: jax.device_put(v, self.device) for k, v in bufs.items()}
        return _unpack_jit(pk)(dev)

    def _fetch_packed(self, tree):
        """Device pytree → host numpy pytree via one fetch per dtype."""
        if not self.packed_transfers:
            return _to_host(tree)
        pk = self._packer_for(tree)
        bufs = _pack_jit(pk)(tree)
        host = {k: np.asarray(v) for k, v in bufs.items()}
        return pk.unpack(host)

    def _put_block_q8(self, host_blocks, i):
        """stream_quant h2d: quantize each host block ONCE per step (params
        only change in pass B, so fwd and bwd share the q8 form) and send
        int8 payload + f32 scales packed — 0.35 vs 0.7 GB/block at A14B."""
        from ..ops.quant import quantize_block

        if self._q8_cache_step != id(host_blocks[0]):
            self._q8_cache_step = id(host_blocks[0])
            self._q8_key_ref = host_blocks[0]  # pin: no id reuse after GC
            self._q8_blocks = [None] * len(host_blocks)
        if self._q8_blocks[i] is None:
            hb = host_blocks[i]
            if not all(isinstance(l, np.ndarray)
                       for l in jax.tree_util.tree_leaves(hb)):
                hb = _to_host(hb)
            self._q8_blocks[i] = quantize_block(hb)
        return self._put_packed(self._q8_blocks[i])

    # ------------------------------------------------------------------
    def train_step(self, state: StreamedTrainState, batch, rng):
        """One exact flow-matching step. Returns (state', metrics)."""
        J = self._jit
        n = len(state.host_blocks)
        dev = self.device
        batch = self._put(batch)

        noisy, t, context, target, weights = J["prep"](batch, rng)
        h, e, e0, ctx = J["pre"](state.resident, noisy, t, context)
        grid = self._grid(noisy.shape)
        cos, sin = rope_3d_tables(grid, self.dit_cfg.head_dim,
                                  self.dit_cfg.rope_max_seq_len,
                                  self.dit_cfg.rope_theta)
        cos, sin = self._put((cos, sin))

        # ---- forward: stream blocks, save inputs (double-buffered h2d) ----
        q8 = self.stream_quant is not None
        fwd_key, grads_key = (("block_fwd_q", "block_grads_q") if q8
                              else ("block_fwd", "block_grads"))
        put_block = (self._put_block_q8 if q8 else
                     lambda blocks, i: self._put_packed(blocks[i]))
        acts: List[Any] = []
        slot = put_block(state.host_blocks, 0)
        for i in range(n):
            nxt = (put_block(state.host_blocks, i + 1)
                   if i + 1 < n else None)
            acts.append(_to_host(h) if self.act_offload else h)
            h = J[fwd_key](slot, h, e0, ctx, cos, sin)
            slot = nxt

        # ---- head + loss, cotangents for the top of the stack ----
        loss, (g_res_post, d_h, d_e) = J["post_loss_grads"](
            state.resident, h, e, target, weights)
        total_sq = jnp.zeros((), jnp.float32)

        # ---- backward pass A: per-block grads + global sq-norm ----
        # fused mode (grad_clip disabled): the block's params are already on
        # device for the vjp, so the optimizer update applies HERE — no grad
        # d2h/h2d roundtrip and no pass B (≈2x less h2d traffic per step).
        # stream_quant is never fused: the q8 compute stream is not the
        # master copy, so the update runs host-side (pass B on the CPU
        # backend) against the full-precision host blocks.
        fused = not self.tc.grad_clip and not q8
        host_grads: List[Any] = [None] * n
        new_blocks: List[Any] = [None] * n
        new_opts: List[Any] = [None] * n
        one = jnp.float32(1.0)
        d_e0 = None
        d_ctx = None
        slot = put_block(state.host_blocks, n - 1)
        for i in range(n - 1, -1, -1):
            nxt = put_block(state.host_blocks, i - 1) if i > 0 else None
            x_i = self._put(acts[i]) if self.act_offload else acts[i]
            dbp, d_h, de0_i, dctx_i = J[grads_key](
                slot, x_i, e0, ctx, cos, sin, d_h)
            total_sq = total_sq + J["sq_norm"](dbp)
            d_e0 = de0_i if d_e0 is None else J["acc"](d_e0, de0_i)
            d_ctx = dctx_i if d_ctx is None else J["acc"](d_ctx, dctx_i)
            if fused:
                bp2, opt2 = J["upd"](slot, dbp,
                                     self._put_packed(
                                         state.host_block_opts[i]), one)
                new_blocks[i] = self._fetch_packed(bp2)
                new_opts[i] = self._fetch_packed(opt2)
            elif q8:
                # int8 + per-channel scales ride the d2h fetch (half the
                # bytes of the bf16 cotangents)
                host_grads[i] = self._fetch_packed(J["qgrad"](dbp))
            else:
                host_grads[i] = self._fetch_packed(dbp)
            acts[i] = None
            slot = nxt

        # ---- grads through the pre-stage (embeds/time/text) ----
        g_res_pre = J["pre_grads"](state.resident, noisy, t, context,
                                   (d_h, d_e, d_e0, d_ctx))
        g_res = J["acc"](g_res_post, g_res_pre)
        # the monolithic grad tree holds each resident leaf once, with
        # post+pre contributions summed — so the global norm uses g_res
        total_sq = total_sq + J["sq_norm"](g_res)

        gnorm = jnp.sqrt(total_sq)
        if fused:
            resident, resident_opt = J["upd"](state.resident, g_res,
                                              state.resident_opt, one)
        elif q8:
            # clip scale from the (unquantized, on-device) global norm
            scale_dev = (jnp.float32(self.tc.grad_clip)
                         / jnp.maximum(gnorm, jnp.float32(self.tc.grad_clip))
                         if self.tc.grad_clip else one)
            resident, resident_opt = J["upd"](state.resident, g_res,
                                              state.resident_opt, scale_dev)
            # pass B on the HOST CPU backend: dequantize the fetched q8
            # grads and run the same optax update against the full-precision
            # host blocks — updated params/opt state never cross the wire
            from ..ops.quant import dequantize_block_np

            scale_h = float(scale_dev)
            for i in range(n):
                g = dequantize_block_np(host_grads[i])
                bp2, opt2 = J["upd_cpu"](state.host_blocks[i], g,
                                         state.host_block_opts[i], scale_h)
                new_blocks[i] = _to_host(bp2)
                new_opts[i] = _to_host(opt2)
                host_grads[i] = None
        else:
            # exactly optax.clip_by_global_norm's trim ratio:
            # clip/max(norm, clip)
            clip = jnp.float32(self.tc.grad_clip)
            scale = clip / jnp.maximum(gnorm, clip)

            # ---- update pass B: resident on device, blocks streamed ----
            resident, resident_opt = J["upd"](state.resident, g_res,
                                              state.resident_opt, scale)
            for i in range(n):
                bp2, opt2 = J["upd"](self._put_packed(state.host_blocks[i]),
                                     self._put_packed(host_grads[i]),
                                     self._put_packed(
                                         state.host_block_opts[i]),
                                     scale)
                new_blocks[i] = self._fetch_packed(bp2)
                new_opts[i] = self._fetch_packed(opt2)
                host_grads[i] = None

        metrics = {"loss": loss, "grad_norm": gnorm}
        return StreamedTrainState(resident, resident_opt, new_blocks,
                                  new_opts, state.step + 1), metrics


# ---------------------------------------------------------------------------
# streamed LoRA: frozen base streams, adapters train on device
# ---------------------------------------------------------------------------


class StreamedLoRAState(NamedTuple):
    """LoRA training state for a larger-than-HBM stack. The frozen base
    (resident + host block stack) never changes; only the tiny device-
    resident adapter pytrees and their optimizer state evolve."""

    resident: Any                 # device pytree, FROZEN (embeds/time/head)
    host_blocks: List[Any]        # per-block host numpy BASE params (no lora)
    lora: List[Any]               # per-block {path: {lora_a, lora_b}}, device
    lora_scales: List[Any]        # per-block {path: {lora_scale}}, FROZEN
    lora_opt: Any                 # one optax state over the whole lora list
    step: int


def _merge_ad(ab, sc):
    """Rejoin the trainable (A, B) and frozen (scale) adapter halves into
    the {path: site} form apply_lora_state grafts."""
    return {p: {**ab[p], **sc[p]} for p in ab}


class StreamedLoRATrainer(StreamedTrainer):
    """LoRA finetuning of DiT stacks whose BASE parameters exceed HBM.

    The combination the reference cannot express on one accelerator: its
    LoRA lives in the torch/PEFT VILA trainer (reference llava
    train.py:81-130) and its A14B finetune needs multi-GPU ZeRO
    (finetune_model.py:725-732). Here the frozen base streams host→HBM
    exactly like inference (forward, then re-streamed for the vjp-recompute
    backward), while the adapters — a few MB for the whole 40-block A14B
    stack — stay resident and train with a fully device-side optimizer.

    Versus the full StreamedTrainer this removes per-block gradient d2h/h2d
    AND the updated-params d2h (the base never changes): host traffic per
    step drops from ~6.5 GB/block to 2 param h2d passes (~1.4 GB/block at
    A14B) plus activation offload. The exact global-norm clip needs no
    second pass — adapter grads are resident, so all updates apply after
    pass A with the true global norm.

    Parity contract (tests/test_streamed_training.py): loss and updated
    adapters match make_train_step over lora-injected params with
    trainable_filters=LORA_FILTERS on the same rng (lora_scale frozen in
    both — it is split out of the differentiated pytree here).
    """

    def __init__(self, cfg: PipelineConfig, tc: TrainConfig,
                 attn_impl: str = "auto", act_offload: bool = True,
                 device=None, base_quant: Optional[str] = None):
        import dataclasses

        # the base-class assert rejects trainable_filters; in LoRA mode the
        # trainable set is the adapters by construction
        super().__init__(cfg, dataclasses.replace(tc, trainable_filters=()),
                         attn_impl=attn_impl, act_offload=act_offload,
                         device=device)
        from .lora import apply_lora_state

        assert base_quant in (None, "int8"), base_quant
        # base_quant="int8": stream the FROZEN base as weight-only int8
        # (ops/quant.py) and dequantize inside the block jit — the QLoRA
        # recipe (adapters train in full precision against a quantized
        # frozen base). Halves the dominant h2d cost of both passes.
        self.base_quant = base_quant
        block_fn = self._block_fn
        if base_quant:
            from ..ops.quant import dequantize_block as _deq
        else:
            _deq = lambda b: b  # noqa: E731

        @jax.jit
        def lora_block_fwd(base, ab, sc, x, e0, ctx, cos, sin):
            bp = apply_lora_state(_deq(base), _merge_ad(ab, sc))
            return block_fn(bp, x, e0, ctx, cos, sin)

        @jax.jit
        def lora_block_grads(base, ab, sc, x, e0, ctx, cos, sin, ct):
            # vjp recomputes the merged-block forward (remat by construction)
            # and pulls back ONLY into (A, B) and the chained input
            _, pull = jax.vjp(
                lambda a, xx: block_fn(
                    apply_lora_state(_deq(base), _merge_ad(a, sc)),
                    xx, e0, ctx, cos, sin), ab, x)
            return pull(ct)

        self._jit["lora_block_fwd"] = lora_block_fwd
        self._jit["lora_block_grads"] = lora_block_grads
        self._base_key = None
        self._base_packed: List[Any] = []
        self._base_pk: Optional[BlockPacker] = None

    # ------------------------------------------------------------------
    def _put_base(self, host_blocks, i):
        """Frozen-base h2d: the transfer-ready form never changes, so
        prepare the whole stack once per host_blocks identity (aliased
        entries once — bench schedules reuse one block) and reuse across
        steps. With base_quant the prepared form is the int8-quantized tree
        (packed: int8 payload + f32 scales, still one buffer per dtype)."""
        all_np = all(isinstance(l, np.ndarray)
                     for l in jax.tree_util.tree_leaves(host_blocks[i]))
        if self.base_quant is None and (not self.packed_transfers
                                        or not all_np):
            return self._put(host_blocks[i])
        key = (id(host_blocks), id(host_blocks[0]))
        if self._base_key != key:
            prep: Dict[int, Any] = {}
            for b in host_blocks:
                if id(b) not in prep:
                    hb = b if all_np else _to_host(b)
                    if self.base_quant:
                        from ..ops.quant import quantize_block
                        hb = quantize_block(hb)
                    prep[id(b)] = hb
            pk = (self._packer_for(prep[id(host_blocks[0])])
                  if self.packed_transfers else None)
            packed = {k: (pk.pack(v) if pk is not None else v)
                      for k, v in prep.items()}
            self._base_packed = [packed[id(b)] for b in host_blocks]
            self._base_pk = pk
            self._base_key = key
        ent = self._base_packed[i]
        if self._base_pk is None:
            return self._put(ent)
        dev = {k: jax.device_put(v, self.device) for k, v in ent.items()}
        return _unpack_jit(self._base_pk)(dev)

    # ------------------------------------------------------------------
    def init_state(self, params) -> StreamedLoRAState:
        """params: full wan pytree WITH adapters already injected
        (training/lora.py::inject_lora on the stacked blocks)."""
        from .lora import extract_lora, strip_lora

        resident = {k: jax.device_put(v, self.device)
                    for k, v in params.items() if k != "blocks"}
        stacked = _to_host(params["blocks"])
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        blocks = [jax.tree_util.tree_map(lambda a: a[i], stacked)
                  for i in range(n)]
        full = [extract_lora(b) for b in blocks]
        assert jax.tree_util.tree_leaves(full), \
            "no adapters found — inject_lora the blocks first"
        lora = [self._put({p: {k: site[k] for k in ("lora_a", "lora_b")}
                           for p, site in f.items()}) for f in full]
        scales = [self._put({p: {"lora_scale": site["lora_scale"]}
                             for p, site in f.items()}) for f in full]
        host_blocks = [strip_lora(b) for b in blocks]
        lora_opt = self.inner.init(lora)
        return StreamedLoRAState(resident, host_blocks, lora, scales,
                                 lora_opt, 0)

    # ------------------------------------------------------------------
    def train_step(self, state: StreamedLoRAState, batch, rng):
        """One exact flow-matching LoRA step. Returns (state', metrics)."""
        J = self._jit
        n = len(state.host_blocks)
        batch = self._put(batch)

        noisy, t, context, target, weights = J["prep"](batch, rng)
        h, e, e0, ctx = J["pre"](state.resident, noisy, t, context)
        cos, sin = rope_3d_tables(self._grid(noisy.shape),
                                  self.dit_cfg.head_dim,
                                  self.dit_cfg.rope_max_seq_len,
                                  self.dit_cfg.rope_theta)
        cos, sin = self._put((cos, sin))

        # ---- forward: stream frozen base, adapters already resident ----
        acts: List[Any] = []
        slot = self._put_base(state.host_blocks, 0)
        for i in range(n):
            nxt = (self._put_base(state.host_blocks, i + 1)
                   if i + 1 < n else None)
            acts.append(_to_host(h) if self.act_offload else h)
            h = J["lora_block_fwd"](slot, state.lora[i], state.lora_scales[i],
                                    h, e0, ctx, cos, sin)
            slot = nxt

        loss, d_h = J["post_loss_dh"](state.resident, h, e, target, weights)

        # ---- backward: re-stream base, adapter grads stay resident ----
        grads: List[Any] = [None] * n
        total_sq = jnp.zeros((), jnp.float32)
        slot = self._put_base(state.host_blocks, n - 1)
        for i in range(n - 1, -1, -1):
            nxt = self._put_base(state.host_blocks, i - 1) if i > 0 else None
            x_i = self._put(acts[i]) if self.act_offload else acts[i]
            d_ab, d_h = J["lora_block_grads"](
                slot, state.lora[i], state.lora_scales[i], x_i,
                e0, ctx, cos, sin, d_h)
            grads[i] = d_ab
            total_sq = total_sq + J["sq_norm"](d_ab)
            acts[i] = None
            slot = nxt

        # ---- update: adapters are tiny and resident — one exact-clip pass
        gnorm = jnp.sqrt(total_sq)
        if self.tc.grad_clip:
            clip = jnp.float32(self.tc.grad_clip)
            scale = clip / jnp.maximum(gnorm, clip)
        else:
            scale = jnp.float32(1.0)
        lora, lora_opt = J["upd"](state.lora, grads, state.lora_opt, scale)

        metrics = {"loss": loss, "grad_norm": gnorm}
        return StreamedLoRAState(state.resident, state.host_blocks, lora,
                                 state.lora_scales, lora_opt,
                                 state.step + 1), metrics

    # ------------------------------------------------------------------
    def export_params(self, state: StreamedLoRAState):
        """Reassemble the full wan pytree (stacked blocks WITH adapters) —
        for merge_lora / checkpoint export."""
        merged = [
            jax.tree_util.tree_map(np.asarray,
                                   _graft(state.host_blocks[i],
                                          _merge_ad(_to_host(state.lora[i]),
                                                    _to_host(state.lora_scales[i]))))
            for i in range(len(state.host_blocks))
        ]
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *merged)
        params = dict(state.resident)
        params["blocks"] = stacked
        return params


def _graft(base, lora_state):
    from .lora import apply_lora_state

    return apply_lora_state(base, lora_state)
