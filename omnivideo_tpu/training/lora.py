"""LoRA: low-rank adapter finetuning over functional pytree params.

Role of the reference's PEFT-based LoRA finetuning in its vendored VILA
trainer (reference ``previous_version/Omni-Video1/nets/third_party/llava/
train/train.py:81-130`` — lora_enable / lora_r / lora_alpha over the
linear layers found by ``find_all_linear_names``), re-designed for the
functional-pytree world instead of module surgery:

- adapters live INSIDE the params pytree: an adapted projection dict
  ``{"kernel": W, "bias": b}`` gains ``lora_a`` [..., d_in, r],
  ``lora_b`` [..., r, d_out] (zeros) and ``lora_scale`` () = alpha/r.
  Because they share the pytree, scan-over-layers slices them alongside
  the base weights and every existing trainer / checkpointer / sharder
  handles them with no special cases.
- the forward delta ``x @ A @ B * scale`` is applied by the models' dense
  helper (models/wan_dit.py::_dense) whenever the lora keys are present —
  at init B == 0, so injecting adapters never changes outputs.
- training freezes the base weights via the existing
  ``TrainConfig.trainable_filters`` + optax.masked machinery:
  ``trainable_filters=LORA_FILTERS`` trains exactly the adapters, and the
  optimizer carries state ONLY for them (MaskedNode elsewhere) — the
  LoRA memory win on top of the low-rank grads.
- ``merge_lora`` folds ``W + scale * A @ B`` back into the kernels for
  deployment (handles scan-stacked [L, d_in, d_out] leaves).

Two adapter layouts are supported:

- dense-site dicts ``{"kernel": W, "bias": b}`` (the wan DiT and
  companions) — ``inject_lora``; applied by wan_dit._dense;
- bare sibling keys ``{"q": W, "q_lora_a": A, ...}`` for models whose
  params are raw tensors keyed by name (the Qwen3 text stack — the
  reference's actual LoRA target) — ``inject_lora_bare``; applied by
  qwen3vl.text_model._lin in the full/cached/SP forwards.
"""
from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp

# wan DiT attention + ffn projections (models/wan_dit.py::init_wan_dit)
DEFAULT_TARGETS: Tuple[str, ...] = (
    "self_attn/q", "self_attn/k", "self_attn/v", "self_attn/o",
    "cross_attn/q", "cross_attn/k", "cross_attn/v", "cross_attn/o",
    "cross_attn/k_img", "cross_attn/v_img",
    "ffn/fc1", "ffn/fc2",
)

# pass as TrainConfig.trainable_filters to train adapters only.
# NOTE: excludes "lora_scale" (a frozen alpha/r constant).
LORA_FILTERS: Tuple[str, ...] = ("lora_a", "lora_b")

_LORA_KEYS = ("lora_a", "lora_b", "lora_scale")
_LORA_SUFFIXES = ("_lora_a", "_lora_b", "_lora_scale")


def _is_lora_key(k: str) -> bool:
    return k in _LORA_KEYS or k.endswith(_LORA_SUFFIXES)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def _iter_sites(params, targets):
    """Yield (path_str, site_dict) for every adapted dense site: a dict with
    a >=2-D "kernel" whose pytree path matches one of ``targets``."""
    def walk(node, path):
        if isinstance(node, dict):
            k = node.get("kernel")
            if (hasattr(k, "ndim") and k.ndim >= 2
                    and any(t in path for t in targets)):
                yield path, node
                return  # dense site dicts don't nest further
            for name, child in node.items():
                yield from walk(child, f"{path}/{name}" if path else name)

    yield from walk(params, "")


def inject_lora(params, key, rank: int, alpha: float | None = None,
                targets: Iterable[str] = DEFAULT_TARGETS, dtype=jnp.float32):
    """Return a copy of ``params`` with LoRA adapters at every matching
    dense site. B is zeros, so the forward is unchanged until training
    moves it. Stacked (scan-over-layers) kernels [L, d_in, d_out] get
    stacked adapters sliced alongside them by the scan."""
    assert rank >= 1
    scale_val = (alpha if alpha is not None else float(rank)) / rank
    sites = list(_iter_sites(params, tuple(targets)))
    if not sites:
        raise ValueError(f"no dense sites matched targets {tuple(targets)}")
    keys = jax.random.split(key, len(sites))
    # tree_map rebuilds every container, so mutating the copy is safe
    out = jax.tree_util.tree_map(lambda x: x, params)

    def replace_at(tree, path, new_site):
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = new_site

    for (path, site), k in zip(sites, keys):
        w = site["kernel"]
        *lead, d_in, d_out = w.shape
        # A ~ N(0, 1/d_in) (role of PEFT's kaiming init), B = 0
        a = (jax.random.normal(k, (*lead, d_in, rank), dtype)
             / jnp.sqrt(jnp.asarray(d_in, dtype)))
        b = jnp.zeros((*lead, rank, d_out), dtype)
        new_site = dict(site)
        new_site["lora_a"], new_site["lora_b"] = a, b
        # scale carries the site's leading (layer-stack) dims so that
        # lax.scan over stacked blocks can slice it alongside the weights
        new_site["lora_scale"] = jnp.full(tuple(lead), scale_val, jnp.float32)
        replace_at(out, path, new_site)
    return out


def lora_delta(site, x):
    """The adapter contribution ``(x @ A) @ B * scale`` in x's dtype.
    Called by the models' dense helpers when lora keys are present."""
    a = site["lora_a"].astype(x.dtype)
    b = site["lora_b"].astype(x.dtype)
    return ((x @ a) @ b) * site["lora_scale"].astype(x.dtype)


def _fold(w, a, b, scale):
    delta = jnp.einsum("...ir,...ro->...io", a, b) * scale[..., None, None]
    return (w.astype(jnp.float32) + delta.astype(jnp.float32)).astype(w.dtype)


def merge_lora(params):
    """Fold every adapter into its kernel (W += scale * A @ B) and strip the
    lora keys — the deployment export. Handles stacked leaves via einsum
    over the trailing two axes, and both adapter layouts: dense-site dicts
    ({"kernel", "lora_a", ...}) and bare sibling keys ("q", "q_lora_a", ...)."""
    def walk(node):
        if isinstance(node, dict):
            node = dict(node)
            if "lora_a" in node:
                node["kernel"] = _fold(node.pop("kernel"), node.pop("lora_a"),
                                       node.pop("lora_b"),
                                       node.pop("lora_scale"))
                return node
            for nm in [k[: -len("_lora_a")] for k in list(node)
                       if k.endswith("_lora_a")]:
                node[nm] = _fold(node[nm], node.pop(nm + "_lora_a"),
                                 node.pop(nm + "_lora_b"),
                                 node.pop(nm + "_lora_scale"))
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def strip_lora(params):
    """Remove adapters WITHOUT merging (recover the exact base params)."""
    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()
                    if not _is_lora_key(k)}
        return node

    return walk(params)


def extract_lora(params):
    """The adapter-only subtree {path: {"lora_a", "lora_b", "lora_scale"}} —
    a small standalone checkpoint (~2·r/d of the base size)."""
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            keys = [k for k in node if _is_lora_key(k)]
            if keys:
                out[path] = {k: node[k] for k in keys}
            for name, child in node.items():
                walk(child, f"{path}/{name}" if path else name)

    walk(params, "")
    return out


def apply_lora_state(params, lora_state):
    """Graft an ``extract_lora`` subtree onto (base or already-injected)
    params — the adapter-checkpoint load path."""
    params = jax.tree_util.tree_map(lambda x: x, params)

    def walk(node, path):
        if isinstance(node, dict):
            if path in lora_state:
                node.update(lora_state[path])
            for name, child in node.items():
                walk(child, f"{path}/{name}" if path else name)

    walk(params, "")
    return params


# LLM (bare-tensor) attention + dense-MLP projections; MoE expert banks and
# routers are deliberately NOT adapted (PEFT practice, and the router must
# stay stable under finetuning)
DEFAULT_BARE_NAMES: Tuple[str, ...] = ("q", "k", "v", "o",
                                       "gate", "up", "down")

# Qwen3-VL vision tower linears (reference lora_vt role) — pass as
# ``names=VISION_BARE_NAMES`` to inject_lora_bare over the vision params
VISION_BARE_NAMES: Tuple[str, ...] = ("qkv_w", "proj_w",
                                      "mlp_fc1_w", "mlp_fc2_w")


def inject_lora_bare(params, key, rank: int, alpha: float | None = None,
                     names: Iterable[str] = DEFAULT_BARE_NAMES,
                     dtype=jnp.float32):
    """``inject_lora`` for bare-tensor params: any dict entry ``name: W``
    (W.ndim >= 2) with ``name`` in ``names`` gains ``{name}_lora_a/_lora_b/
    _lora_scale`` sibling keys, consumed by qwen3vl.text_model._lin.
    Dicts named "experts" are skipped (grouped MoE banks). Stacked
    [L, d_in, d_out] tensors get stacked adapters (scan slices them)."""
    assert rank >= 1
    names = tuple(names)
    scale_val = (alpha if alpha is not None else float(rank)) / rank
    out = jax.tree_util.tree_map(lambda x: x, params)
    sites = []

    def collect(node, path):
        if isinstance(node, dict):
            for nm, child in list(node.items()):
                if isinstance(child, dict):
                    if nm != "experts":
                        collect(child, f"{path}/{nm}")
                elif (nm in names and hasattr(child, "ndim")
                      and child.ndim >= 2 and not _is_lora_key(nm)):
                    # "gate" is also the MoE ROUTER's name: at a MoE layer
                    # mlp["gate"] is the router [D, E] and sits beside
                    # "experts" — skip it there
                    if nm == "gate" and "experts" in node:
                        continue
                    sites.append((node, nm))

    collect(out, "")
    if not sites:
        raise ValueError(f"no bare sites matched names {names}")
    keys = jax.random.split(key, len(sites))
    for (node, nm), k in zip(sites, keys):
        w = node[nm]
        *lead, d_in, d_out = w.shape
        node[nm + "_lora_a"] = (jax.random.normal(k, (*lead, d_in, rank),
                                                  dtype)
                                / jnp.sqrt(jnp.asarray(d_in, dtype)))
        node[nm + "_lora_b"] = jnp.zeros((*lead, rank, d_out), dtype)
        node[nm + "_lora_scale"] = jnp.full(tuple(lead), scale_val,
                                            jnp.float32)
    return out


def lora_masked(tx, params, extra_filters: Iterable[str] = ()):
    """Wrap ANY optax transformation so it trains only the adapters (plus
    any path matching ``extra_filters``): the complement's updates are
    zeroed (optax.masked alone passes masked-out updates through as raw
    gradients). Use for trainers that build their own optimizer
    (e.g. training/sft.py::make_sft_optimizer)."""
    import optax

    filters = tuple(LORA_FILTERS) + tuple(extra_filters)

    def f(path, _):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return any(s in name for s in filters)

    mask = jax.tree_util.tree_map_with_path(f, params)
    inv = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(optax.masked(tx, mask),
                       optax.masked(optax.set_to_zero(), inv))


def save_adapters_npz(params, path):
    """Write the adapter-only state to one .npz (path::key flat keys) —
    the portable adapter checkpoint (role of PEFT's adapter_model.bin)."""
    import numpy as np

    flat = {f"{p}::{k}": np.asarray(v)
            for p, site in extract_lora(params).items()
            for k, v in site.items()}
    assert flat, "no adapters to save"
    np.savez(path, **flat)
    return len(flat)


def load_adapters_npz(path):
    """Read a save_adapters_npz file back into the {path: {key: arr}} form
    apply_lora_state grafts."""
    import numpy as np

    z = np.load(path)
    out: dict = {}
    for key in z.files:
        p, k = key.split("::")
        out.setdefault(p, {})[k] = jnp.asarray(z[key])
    return out


def count_lora_params(params) -> int:
    return sum(int(v.size) for site in extract_lora(params).values()
               for k, v in site.items() if not k.endswith("scale"))
