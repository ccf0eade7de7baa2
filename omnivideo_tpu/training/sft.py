"""LLM supervised fine-tuning (SFT) for the AR/VLM stage.

Role of reference `.../llava/train/train.py` + `vila_with_vh_trainer.py:645-686`
(HF-Trainer LM fine-tune; compute_loss = LM cross-entropy, optionally combined
with the vision-head alignment objective) and the vendored `llava/trl/trainer/
sft_trainer.py:512` (plain SFT).

TPU-native: one jitted train step over the Qwen3 text model
(`models/qwen3vl/text_model.py::qwen3_forward`, scan-over-layers → single
compiled block). Labels use the HF convention: positions with label == -100
are masked out of the loss (prompt tokens, padding). The combined mode adds
`training/align.py::alignment_loss` on the vision-head/adapter chain, weighted
by `align_weight`, training both the LM and the chain in one step — the role
of train_vila_vh.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.qwen3vl.text_model import Qwen3TextConfig, qwen3_forward
from .align import alignment_loss

IGNORE_INDEX = -100  # HF masking convention (llava/train/train.py)


@dataclass(frozen=True)
class SFTConfig:
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    warmup_steps: int = 100
    total_steps: int = 10_000
    align_weight: float = 0.0  # >0: add vision-head/adapter alignment loss
    cosine_weight: float = 0.0  # cosine term inside the alignment loss


class SFTState(NamedTuple):
    params: Any  # {'lm': qwen3 params[, 'chain': {'vision_head','adapter'}]}
    opt_state: Any
    step: jnp.ndarray


def make_sft_optimizer(tc: SFTConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tc.learning_rate, tc.warmup_steps, max(tc.total_steps, tc.warmup_steps + 1)
    )
    return optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(sched, weight_decay=tc.weight_decay),
    )


def lm_loss(lm_params, cfg: Qwen3TextConfig, ids, labels, attn_mask=None,
            sp_mesh=None, seq_axis: str = "seq"):
    """Next-token cross-entropy with -100 masking.

    ids/labels: [B, L] int32. logits[t] predicts labels[t+1] (causal shift).
    Returns (mean loss over unmasked targets, num targets).

    sp_mesh: run the forward sequence-parallel over `seq_axis` (ring
    token-causal attention, models/qwen3vl/text_model.py::qwen3_forward_sp);
    the causal shift happens on the GLOBAL sharded logits, so the loss is
    identical to the single-device form. Note: padding must sit at the tail
    (the SP forward has no attn_mask — tail pads are masked out of the loss
    and cannot influence earlier positions under causality).
    """
    if sp_mesh is not None:
        from ..models.qwen3vl.text_model import qwen3_forward_sp

        _, logits = qwen3_forward_sp(lm_params, cfg, ids, sp_mesh, seq_axis)
    else:
        _, logits = qwen3_forward(lm_params, cfg, ids, attn_mask)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = (targets != IGNORE_INDEX).astype(jnp.float32)
    safe = jnp.maximum(targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(mask.sum(), 1.0)
    return (nll * mask).sum() / n, n


def make_sft_step(
    cfg: Qwen3TextConfig,
    tc: SFTConfig,
    tx: optax.GradientTransformation,
    sp_mesh=None,
):
    """Jittable SFT step.

    batch: {'ids': [B,L], 'labels': [B,L]} (+ 'attn_mask' optional;
    + 'vlm'/'target' when align_weight > 0, see training/align.py).
    sp_mesh: sequence-parallel LM forward (see lm_loss).
    """

    def loss_fn(params, batch):
        loss, n = lm_loss(
            params["lm"], cfg, batch["ids"], batch["labels"],
            batch.get("attn_mask"), sp_mesh=sp_mesh,
        )
        metrics = {"lm_loss": loss, "num_targets": n}
        if tc.align_weight > 0.0:
            al = alignment_loss(
                params["chain"],
                {"vlm": batch["vlm"], "target": batch["target"]},
                tc.cosine_weight,
            )
            metrics["align_loss"] = al
            loss = loss + tc.align_weight * al
        return loss, metrics

    def step(state: SFTState, batch: Dict[str, jnp.ndarray]):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            **metrics,
        }
        return SFTState(params, opt_state, state.step + 1), metrics

    return step


def init_sft_state(params, tx) -> SFTState:
    return SFTState(params, tx.init(params), jnp.zeros((), jnp.int32))


def build_sft_labels(
    ids: jnp.ndarray, prompt_lens: jnp.ndarray, pad_id: Optional[int] = None
) -> jnp.ndarray:
    """Mask prompt positions (and padding) to IGNORE_INDEX — the reference
    preprocessors' `targets[:source_len] = IGNORE_INDEX` (llava train.py)."""
    B, L = ids.shape
    pos = jnp.arange(L)[None]
    labels = jnp.where(pos < prompt_lens[:, None], IGNORE_INDEX, ids)
    if pad_id is not None:
        labels = jnp.where(ids == pad_id, IGNORE_INDEX, labels)
    return labels


class SFTDataset:
    """Directory of per-sample .npz/.pkl files with `ids` (int array) and
    `prompt_len` (int) [+ optional `vlm`, `target` for alignment].
    Role of the reference's supervised dataset builders (llava/data/dataset.py)
    reduced to the offline-tokenized form this framework trains from."""

    def __init__(self, root: str):
        from pathlib import Path

        self.files = sorted(
            p for p in Path(root).iterdir() if p.suffix in (".npz", ".pkl", ".pt")
        )
        assert self.files, f"no samples under {root}"

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i):
        import numpy as np

        p = self.files[i]
        if p.suffix == ".npz":
            d = dict(np.load(p, allow_pickle=True))
        else:
            from ..io.torch_reader import read_torch_checkpoint, to_float_numpy

            d = read_torch_checkpoint(str(p))
            d = {k: (to_float_numpy(v) if k not in ("ids", "prompt_len") else v)
                 for k, v in d.items()}
        return d


def sft_collate(samples, seq_len: int, pad_id: int = 0):
    """Pad ids to seq_len. Labels come either precomputed per sample (the
    conversation-format path — per-turn masks from
    training/conversation.py::preprocess_conversation) or derived from a
    single `prompt_len` prefix; padding is always masked."""
    import numpy as np

    B = len(samples)
    ids = np.full((B, seq_len), pad_id, np.int32)
    labels = np.full((B, seq_len), IGNORE_INDEX, np.int32)
    real_len = np.zeros((B,), np.int32)
    for i, s in enumerate(samples):
        a = np.asarray(s["ids"], np.int32).reshape(-1)[:seq_len]
        ids[i, : len(a)] = a
        real_len[i] = len(a)
        if "labels" in s:
            lab = np.asarray(s["labels"], np.int32).reshape(-1)[:seq_len]
            labels[i, : len(lab)] = lab
        else:
            plen = int(np.asarray(s["prompt_len"]).reshape(-1)[0])
            lab = a.copy()
            lab[:plen] = IGNORE_INDEX
            labels[i, : len(a)] = lab
    batch = {
        "ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attn_mask": jnp.asarray(
            (np.arange(seq_len)[None] < real_len[:, None]).astype(np.int32)
        ),
    }
    if all("vlm" in s for s in samples):
        batch["vlm"] = jnp.asarray(
            np.stack([np.asarray(s["vlm"], np.float32) for s in samples])
        )
        batch["target"] = jnp.asarray(
            np.stack([np.asarray(s["target"], np.float32) for s in samples])
        )
    return batch


def sft_data_loader(ds, batch_size: int, seq_len: int,
                    seed: int = 0, pad_id: int = 0,
                    group_by_length: bool = False,
                    group_by_modality: bool = False,
                    world_size: int = 1):
    """Infinite batch iterator: plain shuffle, or length-grouped ordering
    when the dataset exposes `lengths`/`modality_lengths` (role of
    LengthGroupedSampler, llava_trainer.py:397-432)."""
    import numpy as np

    if group_by_length or group_by_modality:
        from .conversation import length_grouped_batches

        lengths = ds.modality_lengths if group_by_modality else ds.lengths
        batches = length_grouped_batches(
            lengths, batch_size, world_size=world_size, seed=seed,
            by_modality=group_by_modality,
        )
        for idx in batches:
            yield sft_collate([ds[j] for j in idx], seq_len, pad_id)
        return

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(ds))
    i = 0
    while True:
        if i + batch_size > len(order):
            order = rng.permutation(len(ds))
            i = 0
        yield sft_collate([ds[j] for j in order[i:i + batch_size]], seq_len, pad_id)
        i += batch_size


class MixtureDataset:
    """Weighted blend of SFT data sources.

    Role of the reference's data-mixture registry
    (llava/data/datasets_mixture.py: named sources combined per recipe, each
    repeated by its sampling ratio before the epoch shuffle): weight w > 1
    repeats a source ~w times per epoch; w < 1 takes a seeded w-fraction.
    Exposes `lengths`/`modality_lengths` when every source does, so
    length-grouped batching composes.
    """

    def __init__(self, sources, weights=None, seed: int = 0):
        import numpy as np

        assert sources, "empty mixture"
        weights = list(weights) if weights is not None else [1.0] * len(sources)
        assert len(weights) == len(sources)
        rng = np.random.default_rng(seed)
        self.sources = list(sources)
        self.index = []  # (source_idx, sample_idx)
        for si, (src, w) in enumerate(zip(self.sources, weights)):
            n = len(src)
            reps = int(w)
            frac = w - reps
            for _ in range(reps):
                self.index.extend((si, j) for j in range(n))
            if frac > 0:
                take = rng.choice(n, size=max(1, round(frac * n)), replace=False)
                self.index.extend((si, int(j)) for j in sorted(take))
        assert self.index, "mixture resolved to zero samples"

    def __len__(self):
        return len(self.index)

    def __getitem__(self, i):
        si, j = self.index[i]
        return self.sources[si][j]

    def _gather(self, attr):
        per_src = [getattr(s, attr) for s in self.sources]
        return [per_src[si][j] for si, j in self.index]

    @property
    def lengths(self):
        return self._gather("lengths")

    @property
    def modality_lengths(self):
        return self._gather("modality_lengths")
