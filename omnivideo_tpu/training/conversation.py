"""Conversation-format supervised data: chat tokenization with per-turn loss
masks, multimodal placeholder normalization, and length-grouped batching.

Role of the reference's supervised multimodal data layer:
- `llava/utils/tokenizer.py:116` (`preprocess_conversation`): tokenize a chat
  transcript and mask everything except the assistant responses (+ their stop
  token) to IGNORE_INDEX;
- `llava/data/dataset.py:65` (`preprocess_multimodal`): normalize `<image>` /
  `<video>` placeholders (prepend to the first turn when media is attached
  but no token present, enforce a trailing newline per token);
- `llava/data/dataset.py:249` (`LazySupervisedDataset`): lazy JSON/JSONL
  dataset exposing `lengths` / `modality_lengths` for the sampler;
- `llava/train/llava_trainer.py:67-151` (`split_to_even_chunks`,
  `get_length_grouped_indices`, `get_modality_length_grouped_indices`,
  `LengthGroupedSampler`): world-aware length-grouped batch ordering.

The masking here is re-derived rather than ported: instead of the reference's
sentinel-replacement diff, each assistant turn's span is located as the token
delta between the chat template rendered up to the turn WITH the generation
prompt (header included) and rendered THROUGH the turn — which by construction
unmasks exactly the response content plus its stop/end tokens, the same span
the sentinel diff produces. If a template breaks the prefix property the
sample degrades to fully-masked with a warning, matching the reference's
failure mode (tokenizer.py:146-149).

Works with any HF fast tokenizer; tokenizers without a `chat_template` get a
ChatML default (the Qwen family format used by the Qwen3-VL stage).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

IGNORE_INDEX = -100
IMAGE_TOKEN = "<image>"
VIDEO_TOKEN = "<video>"

# ChatML (the Qwen family template) — default for tokenizers that ship no
# chat_template of their own.
CHATML_TEMPLATE = (
    "{% for message in messages %}"
    "{{'<|im_start|>' + message['role'] + '\n' + message['content'] + '<|im_end|>' + '\n'}}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{'<|im_start|>assistant\n'}}{% endif %}"
)

_ROLE_BY_SENDER = {"human": "user", "gpt": "assistant", "system": "system",
                   "user": "user", "assistant": "assistant"}

logger = logging.getLogger(__name__)


def normalize_messages(messages: Sequence[Dict[str, str]]) -> List[Dict[str, str]]:
    """Accept both the reference's {'from','value'} records and OpenAI-style
    {'role','content'}; return role/content form."""
    out = []
    for m in messages:
        if "role" in m:
            role, content = m["role"], m["content"]
        else:
            sender = m["from"]
            if sender not in _ROLE_BY_SENDER:
                raise ValueError(f"unknown conversation sender {sender!r}")
            role, content = _ROLE_BY_SENDER[sender], m["value"]
        out.append({"role": role, "content": content})
    return out


def _render(tokenizer, messages, add_generation_prompt: bool) -> List[int]:
    text = tokenizer.apply_chat_template(
        messages, add_generation_prompt=add_generation_prompt, tokenize=False
    )
    return tokenizer(text, add_special_tokens=False)["input_ids"]


def _ensure_chat_template(tokenizer):
    if getattr(tokenizer, "chat_template", None) is None:
        tokenizer.chat_template = CHATML_TEMPLATE
    return tokenizer


def tokenize_conversation(
    messages: Sequence[Dict[str, str]],
    tokenizer,
    add_generation_prompt: bool = False,
) -> np.ndarray:
    """Token ids of the chat-templated conversation (no loss mask)."""
    _ensure_chat_template(tokenizer)
    msgs = normalize_messages(messages)
    return np.asarray(_render(tokenizer, msgs, add_generation_prompt), np.int32)


def preprocess_conversation(
    messages: Sequence[Dict[str, str]],
    tokenizer,
) -> Dict[str, np.ndarray]:
    """Tokenize a (possibly multi-turn) conversation and build labels that
    keep only assistant responses (+ stop tokens) — everything else, including
    system/user turns and assistant headers, is IGNORE_INDEX.

    Returns {'ids': int32 [T], 'labels': int32 [T]}.
    """
    _ensure_chat_template(tokenizer)
    msgs = normalize_messages(messages)
    ids = np.asarray(_render(tokenizer, msgs, False), np.int32)
    labels = np.full_like(ids, IGNORE_INDEX)

    ok = True
    for i, m in enumerate(msgs):
        if m["role"] != "assistant":
            continue
        # span = delta between "conversation up to this turn + assistant
        # header" and "conversation through this turn"
        head = _render(tokenizer, msgs[:i], True)
        full = _render(tokenizer, msgs[: i + 1], False)
        if (
            len(head) <= len(full) <= len(ids)
            and list(ids[: len(full)]) == full
            and full[: len(head)] == head
        ):
            labels[len(head): len(full)] = ids[len(head): len(full)]
        else:
            ok = False
            break
    if not ok:
        # same degradation the reference applies when the template diff
        # cannot be matched: train on nothing rather than on wrong spans
        logger.warning("chat template is not prefix-stable for this sample; "
                       "masking all tokens")
        labels[:] = IGNORE_INDEX
    return {"ids": ids, "labels": labels}


def preprocess_multimodal(
    messages: Sequence[Dict[str, str]],
    has_media: bool,
    media_token: str = IMAGE_TOKEN,
) -> List[Dict[str, str]]:
    """Placeholder normalization (reference preprocess_multimodal,
    dataset.py:65-95): when media is attached but no placeholder appears
    anywhere, prepend one to the first turn; every placeholder ends up
    followed by exactly one newline."""
    msgs = [dict(m) for m in normalize_messages(messages)]
    if not has_media:
        return msgs
    if not any(media_token in m["content"] for m in msgs):
        msgs[0]["content"] = f"{media_token}\n{msgs[0]['content']}"
    for m in msgs:
        if media_token in m["content"]:
            parts = [p.strip() for p in m["content"].split(media_token)]
            text = ""
            for p in parts[:-1]:
                text += p + (" " if p else "") + media_token + "\n"
            m["content"] = (text + parts[-1]).strip()
    return msgs


class ConversationDataset:
    """Lazy conversation-format SFT dataset over a JSON list or JSONL file.

    Record form (the reference's data_mixture record, dataset.py:327-440):
      {"conversations": [{"from": "human", "value": ...}, ...],
       "image": optional path, "video": optional path}

    __getitem__ tokenizes on access and returns {'ids','labels'} arrays
    consumable by `sft_collate`. `lengths` / `modality_lengths` are cheap
    word-count estimates (reference dataset.py:282-297) for the
    length-grouped sampler — multimodal samples positive, text-only negative
    in `modality_lengths`.
    """

    def __init__(self, path: str, tokenizer, media_token_len: int = 256):
        p = Path(path)
        if p.suffix == ".jsonl":
            self.records = [json.loads(l) for l in p.read_text().splitlines() if l.strip()]
        else:
            self.records = json.loads(p.read_text())
        assert self.records, f"no records in {path}"
        self.tokenizer = _ensure_chat_template(tokenizer)
        self.media_token_len = media_token_len

    def __len__(self):
        return len(self.records)

    def _has_media(self, r) -> bool:
        return bool(r.get("image") or r.get("video"))

    @property
    def lengths(self) -> List[int]:
        out = []
        for r in self.records:
            n = sum(len(m.get("value", m.get("content", "")).split())
                    for m in r["conversations"])
            out.append(n + (self.media_token_len if self._has_media(r) else 0))
        return out

    @property
    def modality_lengths(self) -> List[int]:
        return [l if self._has_media(r) else -l
                for r, l in zip(self.records, self.lengths)]

    def __getitem__(self, i) -> Dict[str, Any]:
        r = self.records[i]
        token = VIDEO_TOKEN if r.get("video") else IMAGE_TOKEN
        msgs = preprocess_multimodal(r["conversations"], self._has_media(r), token)
        sample = preprocess_conversation(msgs, self.tokenizer)
        for k in ("image", "video"):
            if r.get(k):
                sample[k] = r[k]
        return sample


# ---------------------------------------------------------------------------
# Length-grouped batch ordering (re-derivation of llava_trainer.py:67-151)
# ---------------------------------------------------------------------------


def split_to_even_chunks(indices: Sequence[int], lengths: Sequence[int],
                         num_chunks: int) -> List[List[int]]:
    """Partition `indices` into `num_chunks` load-balanced chunks: each index
    goes to the currently-lightest chunk until that chunk is full. Uneven
    remainders fall back to strided assignment (same contract as the
    reference's split_to_even_chunks)."""
    if len(indices) % num_chunks != 0:
        return [list(indices[i::num_chunks]) for i in range(num_chunks)]
    per_chunk = len(indices) // num_chunks
    chunks: List[List[int]] = [[] for _ in range(num_chunks)]
    load = np.zeros(num_chunks)
    for idx in indices:
        c = int(np.argmin(load))
        chunks[c].append(idx)
        load[c] += lengths[idx]
        if len(chunks[c]) == per_chunk:
            load[c] = np.inf
    return chunks


def get_length_grouped_indices(lengths: Sequence[int], batch_size: int,
                               world_size: int,
                               rng: Optional[np.random.Generator] = None) -> List[int]:
    """Global sample order such that each world_size x batch_size megabatch
    holds similar-length samples (minimal padding waste) while megabatch
    order stays shuffled."""
    rng = rng or np.random.default_rng(0)
    perm = rng.permutation(len(lengths))
    mb = batch_size * world_size
    megabatches = [perm[i: i + mb].tolist() for i in range(0, len(lengths), mb)]
    megabatches = [sorted(m, key=lambda i: lengths[i], reverse=True)
                   for m in megabatches]
    chunked = [split_to_even_chunks(m, lengths, world_size) for m in megabatches]
    return [i for m in chunked for chunk in m for i in chunk]


def get_modality_length_grouped_indices(
    lengths: Sequence[int], batch_size: int, world_size: int,
    rng: Optional[np.random.Generator] = None,
) -> List[int]:
    """Like get_length_grouped_indices but multimodal (length > 0) and
    text-only (length < 0) samples never share a megabatch; the two streams'
    megabatches interleave in shuffled order and the leftovers merge into one
    final batch (reference get_modality_length_grouped_indices)."""
    rng = rng or np.random.default_rng(0)
    assert all(l != 0 for l in lengths), "zero-length sample"
    if all(l > 0 for l in lengths) or all(l < 0 for l in lengths):
        return get_length_grouped_indices(
            [abs(l) for l in lengths], batch_size, world_size, rng)
    mm = [(i, l) for i, l in enumerate(lengths) if l > 0]
    lang = [(i, -l) for i, l in enumerate(lengths) if l < 0]
    mb = batch_size * world_size

    def stream(pairs):
        idx = [p[0] for p in pairs]
        lens = [p[1] for p in pairs]
        order = get_length_grouped_indices(lens, batch_size, world_size, rng)
        shuffled = [idx[i] for i in order]
        return [shuffled[i: i + mb] for i in range(0, len(shuffled), mb)]

    mm_mb, lang_mb = stream(mm), stream(lang)
    leftover = (mm_mb[-1] if mm_mb else []) + (lang_mb[-1] if lang_mb else [])
    megabatches = mm_mb[:-1] + lang_mb[:-1]
    megabatches = [megabatches[i] for i in rng.permutation(len(megabatches))]
    if leftover:
        megabatches.append(sorted(leftover))
    return [i for m in megabatches for i in m]


def length_grouped_batches(
    lengths: Sequence[int], batch_size: int, world_size: int = 1,
    seed: int = 0, by_modality: bool = False,
):
    """Infinite generator of per-step index batches (this process sees its
    local batch; callers shard across dp ranks separately). Re-shuffles with
    a fresh epoch key each pass — role of LengthGroupedSampler
    (llava_trainer.py:397-432) without the torch Sampler machinery."""
    epoch = 0
    while True:
        rng = np.random.default_rng((seed, epoch))
        fn = (get_modality_length_grouped_indices if by_modality
              else get_length_grouped_indices)
        order = fn(lengths, batch_size, world_size, rng)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            yield order[i: i + batch_size]
        epoch += 1
