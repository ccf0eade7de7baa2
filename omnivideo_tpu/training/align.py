"""Vision-head / adapter alignment training.

Role of reference `.../llava/train/train_vila_vh.py` +
`vila_with_vh_trainer.py:645-686` (compute_loss combining LM loss with an
*alignment* loss that trains the VisionHead + DM_Adapter chain to map VLM
hidden states into the diffusion model's conditioning space).

TPU-native: one jitted step training only the chain (the VLM and DiT stay
frozen); the alignment target is the precomputed conditioning embedding
(e.g. T5/aligned_emb features from the offline dataset, P5's `aligned_emb`
key). Loss = MSE + optional cosine term, as in the reference trainer's
embedding-alignment objective.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.adapters import dm_adapter_apply, vision_head_apply


class AlignState(NamedTuple):
    params: Any  # {'vision_head': ..., 'adapter': ...}
    opt_state: Any
    step: jnp.ndarray


def alignment_loss(params, batch, cosine_weight: float = 0.0):
    """batch: {'vlm': [B, L, vlm_dim], 'target': [B, Q, out_dim]}.

    The chain output [B, Q, out_dim] is regressed onto the target embeddings
    (MSE; optional 1−cosine term per token).
    """
    heads = vision_head_apply(params["vision_head"], batch["vlm"])
    out = dm_adapter_apply(params["adapter"], heads)
    tgt = batch["target"]
    mse = jnp.mean(jnp.square(out - tgt))
    if cosine_weight > 0:
        num = jnp.sum(out * tgt, -1)
        den = jnp.linalg.norm(out, axis=-1) * jnp.linalg.norm(tgt, axis=-1) + 1e-6
        mse = mse + cosine_weight * jnp.mean(1.0 - num / den)
    return mse


def make_align_step(tx: optax.GradientTransformation, cosine_weight: float = 0.0):
    def step(state: AlignState, batch: Dict[str, jnp.ndarray]):
        loss, grads = jax.value_and_grad(alignment_loss)(
            state.params, batch, cosine_weight
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return AlignState(params, opt_state, state.step + 1), {"loss": loss}

    return step


def init_align_state(params, tx) -> AlignState:
    return AlignState(params, tx.init(params), jnp.zeros((), jnp.int32))
