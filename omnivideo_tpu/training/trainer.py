"""Flow-matching trainer.

Role of reference `previous_version/Omni-Video1/finetune_model.py:493-916`:
flow-matching loss `mean(w·(v̂ − (ε − x))²)` (finetune_model.py:829-834) with
uniform timestep sampling, CFG condition dropout, selective freezing, cosine
warmup schedule, gradient clipping — TPU-native:

- the train step is ONE jitted function; dp gradients reduce via the mesh's
  'data' axis and parameter/optimizer-state sharding over 'fsdp' replaces
  DeepSpeed ZeRO-1 (finetune_model.py:725-732): optax state inherits each
  parameter's NamedSharding so optimizer memory is sharded exactly like
  ZeRO — but chosen declaratively, not by a runtime engine;
- CFG dropout uses jax.random keys (deterministic across hosts — the
  reference pre-samples python RNG to keep NCCL ranks in sync,
  unified_model.py:157-162; here sync is by construction);
- selective freezing is an optax.masked wrapper over path predicates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..configs.base import PipelineConfig
from ..models.wan_dit import wan_dit_apply
from ..schedulers.flow_match import FlowMatchScheduler


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-6
    weight_decay: float = 0.01
    grad_clip: float = 0.1
    warmup_steps: int = 500
    total_steps: int = 10_000
    flow_shift: float = 3.0
    cfg_dropout: float = 0.2
    num_train_timesteps: int = 1000
    remat: bool = True
    # micro-batch accumulation (reference DeepSpeed gradient_accumulation_steps,
    # omnivideo_mixed_task_1_3B.yaml:61): grads accumulate across k train_step
    # calls; the wrapped update applies on every k-th (optax.MultiSteps)
    grad_accum_steps: int = 1
    # timestep density (reference weighting_scheme, yaml:54-57): "uniform"
    # or SD3-style "logit_normal" — u = sigmoid(N(mean, std)), concentrating
    # samples at mid-noise levels
    # "adamw" | "adafactor" (adafactor: factored 2nd moment, ~0 state HBM)
    optimizer: str = "adamw"
    # dtype of the residual stream CARRIED between blocks (and therefore of
    # the 30 per-block remat checkpoints the backward saves): "float32"
    # matches reference autocast; "bfloat16" halves the 30·[B,L,dim] f32
    # checkpoint stack (3.5 GB at 480p·49f) — in-block math stays f32
    carry_dtype: str = "float32"
    timestep_sampling: str = "uniform"  # | "logit_normal" | "mode"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.29  # "mode" scheme sharpness (yaml:57)
    # path-substring predicates for freezing (reference finetune_model.py:560-586)
    trainable_filters: tuple = ()  # empty = train everything


def _sample_timestep_ids(key, B, tc: TrainConfig):
    """Timestep indices per sample under tc.timestep_sampling."""
    if tc.timestep_sampling == "logit_normal":
        u = jax.nn.sigmoid(
            jax.random.normal(key, (B,)) * tc.logit_std + tc.logit_mean)
        return jnp.clip((u * tc.num_train_timesteps).astype(jnp.int32),
                        0, tc.num_train_timesteps - 1)
    if tc.timestep_sampling == "mode":
        # SD3 "mode" density: u' = 1 - u - s·(cos²(πu/2) − 1 + u)
        u = jax.random.uniform(key, (B,))
        u = 1.0 - u - tc.mode_scale * (
            jnp.cos(jnp.pi * u / 2) ** 2 - 1.0 + u)
        return jnp.clip((u * tc.num_train_timesteps).astype(jnp.int32),
                        0, tc.num_train_timesteps - 1)
    assert tc.timestep_sampling == "uniform", tc.timestep_sampling
    return jax.random.randint(key, (B,), 0, tc.num_train_timesteps)


def _trainable_mask(params, filters):
    if not filters:
        return jax.tree_util.tree_map(lambda _: True, params)

    def f(path, _):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return any(s in name for s in filters)

    return jax.tree_util.tree_map_with_path(f, params)


def _lr_scaled_decay(wd: float, sched) -> optax.GradientTransformation:
    """Decoupled weight decay scaled by the lr schedule (adamw semantics).

    Appended after a transform whose emitted updates are already final deltas
    (adafactor): adds -sched(step)·wd·param so the effective decay matches
    optax.adamw's lr·wd, independent of the inner optimizer's own scaling.
    """

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("_lr_scaled_decay requires params")
        lr = sched(state.count)
        updates = jax.tree_util.tree_map(
            lambda u, p: u - lr * wd * p.astype(u.dtype), updates, params
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def make_inner_optimizer(tc: TrainConfig):
    """The per-leaf part of the optimizer — everything EXCEPT the global-norm
    clip. Every transform here is leaf-local (adafactor's factored stats,
    adamw's moments, the lr-scaled decay), so applying it per-block with
    independent states is bit-identical to one monolithic application: the
    streamed trainer (training/streaming.py) relies on this to update blocks
    one at a time while matching make_optimizer exactly."""
    # clamp warmup for short runs (smoke tests, tiny finetunes): optax
    # requires decay_steps > warmup_steps
    warmup = min(tc.warmup_steps, max(tc.total_steps - 1, 0))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.learning_rate,
        warmup_steps=warmup,
        decay_steps=max(tc.total_steps, warmup + 1),
    )
    if tc.optimizer == "adafactor":
        # factored second moment (rank-1 row/col stats): ~0 optimizer HBM vs
        # AdamW's 2x params — the standard TPU choice when single-chip
        # training is argument-bound (1.3B AdamW m/v alone are 5.2 GB).
        # Weight decay is NOT passed to optax.adafactor: its
        # weight_decay_rate applies AFTER internal lr scaling, so a raw
        # tc.weight_decay (0.01) would decay params ~1%/step — ~lr/wd times
        # stronger than adamw's decoupled lr·wd decay. Instead append an
        # lr-scaled decay transform so both optimizers decay by lr·wd·param.
        inner = optax.adafactor(learning_rate=sched)
        if tc.weight_decay:
            inner = optax.chain(inner, _lr_scaled_decay(tc.weight_decay, sched))
    else:
        inner = optax.adamw(sched, weight_decay=tc.weight_decay)
    return inner


def make_optimizer(tc: TrainConfig, params=None):
    # grad_clip=0 disables clipping (optax.clip_by_global_norm(0) would
    # ZERO every update — trim ratio 0/‖g‖)
    inner = make_inner_optimizer(tc)
    tx = (optax.chain(optax.clip_by_global_norm(tc.grad_clip), inner)
          if tc.grad_clip else inner)
    if params is not None and tc.trainable_filters:
        # optax.masked passes masked-OUT updates through UNCHANGED (they are
        # raw gradients at that point), so a second masked(set_to_zero)
        # stage is required to actually freeze the complement — without it
        # apply_updates would ADD the raw gradient to every frozen param.
        mask = _trainable_mask(params, tc.trainable_filters)
        inv = jax.tree_util.tree_map(lambda m: not m, mask)
        tx = optax.chain(optax.masked(tx, mask),
                         optax.masked(optax.set_to_zero(), inv))
    if tc.grad_accum_steps > 1:
        # accumulator state is sharded like the grads (GSPMD propagates), so
        # the ZeRO-style memory layout survives accumulation
        tx = optax.MultiSteps(tx, every_k_schedule=tc.grad_accum_steps)
    return tx


def make_train_step(
    cfg: PipelineConfig,
    tc: TrainConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    attn_impl: str = "auto",
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {'latents': [B,C,F,h,w], 'context': [B,Lc,text_dim] (padded),
            'uncond_context': [B,Lc,text_dim] (optional, for CFG dropout)}
    """
    flow = FlowMatchScheduler.create(
        num_inference_steps=tc.num_train_timesteps,
        num_train_timesteps=tc.num_train_timesteps,
        shift=tc.flow_shift,
        is_training=True,
    )
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        B = latents.shape[0]
        k_t, k_n, k_cfg = jax.random.split(rng, 3)

        tid = _sample_timestep_ids(k_t, B, tc)
        t = flow.timesteps[tid]
        noise = jax.random.normal(k_n, latents.shape, jnp.float32)
        noisy = flow.add_noise(latents, noise, t)
        target = flow.training_target(latents, noise, t)
        weights = flow.training_weight(t)  # [B]

        context = batch["context"]
        if tc.cfg_dropout > 0 and "uncond_context" in batch:
            drop = jax.random.uniform(k_cfg, (B,)) < tc.cfg_dropout
            context = jnp.where(drop[:, None, None], batch["uncond_context"], context)

        v = wan_dit_apply(
            params,
            dit_cfg,
            noisy.astype(cfg.jnp_param_dtype),
            t,
            context,
            attn_impl=attn_impl,
            remat=tc.remat,
            mesh=mesh,
            carry_dtype=jnp.bfloat16 if tc.carry_dtype == "bfloat16" else None,
        )
        per = jnp.mean(jnp.square(v - target), axis=(1, 2, 3, 4))
        return jnp.mean(weights * per)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step


def init_train_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# unified (mixed-condition) training: wan + companions jointly
# ---------------------------------------------------------------------------


def make_unified_train_step(
    cfg: PipelineConfig,
    tc: TrainConfig,
    tx,
    special_tokens=None,
    mesh=None,
    attn_impl: str = "auto",
):
    """Train step for the unified mixed-condition model.

    params pytree: {'wan': <DiT>, 'companions': <vlm_norm/vlm_proj/vca>}.
    batch: {'latents': [B,C,F,h,w], 'context': [B,Lt,text_dim],
            'vlm': [B,Lv,vlm_dim] (optional), 'visual_emb': [B,C,F,h,w]
            (optional), 'aligned_emb': [B,La,text_dim] (optional — the v1
            offline dataset's adapter-chain features)}

    CFG dropout (reference unified_model.py:157-192): with prob cfg_dropout a
    sample's conditioning is replaced by the unconditional variant — here both
    mixed contexts are assembled at fixed shape and selected per-sample, which
    is exact under the reference's own zero-pad-and-attend semantics.
    """
    import jax.numpy as jnp

    from ..models.unified import build_mixed_context_batch, null_ar_vision

    flow = FlowMatchScheduler.create(
        num_inference_steps=tc.num_train_timesteps,
        num_train_timesteps=tc.num_train_timesteps,
        shift=tc.flow_shift,
        is_training=True,
    )
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        B = latents.shape[0]
        k_t, k_n, k_cfg = jax.random.split(rng, 3)

        tid = _sample_timestep_ids(k_t, B, tc)
        t = flow.timesteps[tid]
        noise = jax.random.normal(k_n, latents.shape, jnp.float32)
        noisy = flow.add_noise(latents, noise, t)
        target = flow.training_target(latents, noise, t)
        weights = flow.training_weight(t)

        comp = params["companions"]
        vlm = batch.get("vlm")
        visual = batch.get("visual_emb")
        aligned = batch.get("aligned_emb")
        mixed_c = build_mixed_context_batch(
            comp, cfg, text_ctx=batch["context"], vlm=vlm, visual_emb=visual,
            special_tokens=special_tokens, aligned_emb=aligned,
        )
        if tc.cfg_dropout > 0:
            # unconditional variant: zero text + 2-token null VLM, keeping
            # visual (unified_model.py:176-190)
            vlm_null = None
            if vlm is not None:
                vlm_null = jnp.broadcast_to(
                    null_ar_vision(vlm.shape[-1])[None], (B, 2, vlm.shape[-1])
                )
            # visual/aligned stay in the uncond variant: dropout targets the
            # text + VLM conditioning (unified_model.py:176-190)
            mixed_u = build_mixed_context_batch(
                comp, cfg, text_ctx=jnp.zeros_like(batch["context"]),
                vlm=vlm_null, visual_emb=visual, special_tokens=special_tokens,
                aligned_emb=aligned,
            )
            drop = jax.random.uniform(k_cfg, (B,)) < tc.cfg_dropout
            mixed_c = jnp.where(drop[:, None, None], mixed_u, mixed_c)

        v = wan_dit_apply(
            params["wan"],
            dit_cfg,
            noisy.astype(cfg.jnp_param_dtype),
            t,
            mixed_c,
            attn_impl=attn_impl,
            remat=tc.remat,
            mesh=mesh,
            carry_dtype=jnp.bfloat16 if tc.carry_dtype == "bfloat16" else None,
        )
        per = jnp.mean(jnp.square(v - target), axis=(1, 2, 3, 4))
        return jnp.mean(weights * per)

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    return train_step
