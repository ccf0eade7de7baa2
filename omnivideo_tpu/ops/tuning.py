"""Persisted kernel-tuning table (measured-winner defaults).

TPU kernel dispatch has a handful of performance-only choices — cross-attn
single- vs multi-step KV, the fused qk-prep prologue, the fused-AdaLN
elementwise kernel — whose winner depends on model shape (dim 1536 vs 5120)
and was measured on chip by the A/B drivers in ``tools/dev/``. This module
is the single place those winners live:

- ``tuned_defaults.json`` (committed next to this file) maps shape-keyed
  entries to the measured winner; the A/B drivers rewrite it with
  ``--write-tuned`` so a fresh measurement flips the default for every
  caller (bench, CLI, pipelines) without code edits.
- Env sweep knobs (``FLASH_XATTN_MODE`` etc.) take precedence over the
  table — they exist for the on-chip sweeps themselves.
- Every choice here is performance-only: all variants are value-parity
  asserted by the A/B drivers and tests/test_attention.py, so the table can
  never change results, only speed. (Semantic implementation switches stay
  explicit function arguments — see VERDICT r3 item 10.)

Role-equivalent to tile-size autotuning caches in CUDA frameworks; the
reference hardcodes its flash-attn dispatch (reference
``omnivideo/modules/attention.py:94-130``).
"""
from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Any

DEFAULT_PATH = Path(__file__).with_name("tuned_defaults.json")

_cache: dict[str, dict] = {}


def _path() -> Path:
    return Path(os.environ.get("OMNIVIDEO_TUNED_PATH", str(DEFAULT_PATH)))


def _table() -> dict:
    p = str(_path())
    if p not in _cache:
        try:
            with open(p) as f:
                _cache[p] = json.load(f)
        except (OSError, ValueError):
            _cache[p] = {}
    return _cache[p]


def reset_cache() -> None:
    """Drop the in-process table cache (tests / after write_tuned)."""
    _cache.clear()


def lookup(section: str, shape_key: str, default: str) -> str:
    """Winner for ``section`` at ``shape_key``, falling back to the
    section's ``"default"`` entry, then ``default``."""
    sec = _table().get(section)
    if isinstance(sec, dict):
        return str(sec.get(shape_key, sec.get("default", default)))
    if sec is not None:  # scalar section (e.g. a vmem budget)
        return str(sec)
    return default


def write_tuned(section: str, shape_key: str, value: Any, source: str) -> Path:
    """Persist a measured winner (atomic rewrite; merges with the table)."""
    import datetime

    p = _path()
    try:
        with open(p) as f:
            table = json.load(f)
    except (OSError, ValueError):
        table = {}
    sec = table.setdefault(section, {})
    if not isinstance(sec, dict):
        sec = table[section] = {"default": sec}
    sec[shape_key] = value
    meta = table.setdefault("_meta", {})
    meta[f"{section}.{shape_key}"] = {
        "source": source,
        "updated": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
    }
    fd, tmp = tempfile.mkstemp(dir=str(p.parent), suffix=".tuned.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, p)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    reset_cache()
    return p


# ---- concrete knobs -------------------------------------------------------

def xattn_mode(n_heads: int, lk_rounded: int) -> str:
    """Cross-attention KV stepping: "single" (whole context one VMEM-resident
    block) vs "multi" (divisor bk, wide q tiles). Env FLASH_XATTN_MODE is the
    sweep override."""
    env = os.environ.get("FLASH_XATTN_MODE")
    if env:
        return env
    return lookup("flash_xattn_mode", f"N{n_heads}_Lk{lk_rounded}", "single")


def xattn_vmem_mb() -> float:
    env = os.environ.get("FLASH_XATTN_VMEM_MB")
    if env:
        return float(env)
    return float(lookup("flash_xattn_vmem_mb", "default", "8"))


def persist_winner(timings: dict, dim: int, n_heads: int, lk_rounded: int,
                   source: str, margin: float = 0.01) -> list:
    """Persist the best measured combo from an on-chip A/B.

    timings: {(xattn_mode, ew_impl, qk_impl): seconds}. The winner is
    written only when it beats the combo matching today's resolved defaults
    by more than ``margin`` (guards against flipping defaults on noise).
    Callers must clear the FLASH_XATTN_MODE sweep env before calling.
    Returns the list of (section, shape_key, value) actually written."""
    cur = (xattn_mode(n_heads, lk_rounded),
           lookup("ew_impl", f"dim{dim}", "xla"),
           lookup("qk_impl", f"dim{dim}", "xla"))
    best = min(timings, key=timings.get)
    written: list = []
    if best == cur:
        return written
    base_t = timings.get(cur)
    if base_t is not None and timings[best] > base_t * (1.0 - margin):
        return written
    for sec, key, val, fallback in (
        ("flash_xattn_mode", f"N{n_heads}_Lk{lk_rounded}", best[0], "single"),
        ("ew_impl", f"dim{dim}", best[1], "xla"),
        ("qk_impl", f"dim{dim}", best[2], "xla"),
    ):
        if lookup(sec, key, fallback) != val:
            write_tuned(sec, key, val, source)
            written.append((sec, key, val))
    return written


def resolve_impl(kind: str, requested: str, dim: int, platform: str) -> str:
    """Resolve an impl argument of "auto" to the measured winner for this
    model width, TPU only (the fused kernels are TPU kernels; CPU keeps the
    XLA path). Explicit values pass through untouched."""
    if requested != "auto":
        return requested
    if platform != "tpu":
        return "xla"
    return lookup(kind, f"dim{dim}", "xla")
