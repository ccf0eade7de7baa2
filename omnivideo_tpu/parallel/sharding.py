"""Parameter and activation sharding rules.

Role of reference `omnivideo/distributed/fsdp.py:11-42` (torch FSDP FULL_SHARD
with per-block auto-wrap + bf16/f32 mixed precision) — TPU-native: parameters
get `NamedSharding`s over the 'fsdp' mesh axis and XLA GSPMD inserts the
all-gathers/reduce-scatters that FSDP does by hand. The per-block auto-wrap
maps naturally onto the stacked-blocks layout: block leaves are
[num_layers, ...] and shard on a non-layer dimension, so each scan step
all-gathers exactly one block — the same communication schedule as the
reference's wrap-per-WanAttentionBlock, chosen by the compiler.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(path_names, leaf, fsdp_size: int) -> P:
    """Shard the largest divisible dim on 'fsdp'; replicate small leaves.

    For stacked block leaves (leading layer axis), the layer axis is never
    sharded — it is the lax.scan axis.
    """
    shape = leaf.shape
    if leaf.ndim == 0 or leaf.size < 1024 or fsdp_size == 1:
        return P()
    start = 1 if "blocks" in path_names else 0
    dims = list(range(start, leaf.ndim))
    # prefer the last dim (output features — turns allgather into the
    # reduce-scatter-friendly layout), else any divisible dim
    for d in reversed(dims):
        if shape[d] % fsdp_size == 0:
            spec = [None] * leaf.ndim
            spec[d] = "fsdp"
            return P(*spec)
    return P()


# Megatron-style TP split of the transformer block, expressed as sharding
# rules only (no model changes — GSPMD inserts the collectives; SURVEY §2.3
# row TP names this the optional TPU free win the reference lacks):
#   column-parallel (output features on 'tensor'): q/k/v, ffn fc1
#   row-parallel (input features on 'tensor'):     o,     ffn fc2
_TP_COL = ("/q/kernel", "/k/kernel", "/v/kernel", "/k_img/kernel",
           "/v_img/kernel", "/fc1/kernel")
_TP_ROW = ("/o/kernel", "/fc2/kernel")
_TP_COL_BIAS = ("/q/bias", "/k/bias", "/v/bias", "/k_img/bias",
                "/v_img/bias", "/fc1/bias")


def _tp_leaf_spec(path_names, leaf, fsdp_size: int, tp_size: int):
    """TP spec for a block leaf, or None to fall back to the fsdp rule.

    Kernels are [layers?, in, out]; the complementary matmul dim takes the
    'fsdp' axis when divisible, so fsdp×tensor compose on one weight.
    """
    if tp_size == 1 or "blocks" not in path_names:
        return None
    shape = leaf.shape

    def spec(tp_dim, fsdp_dim):
        if shape[tp_dim] % tp_size:
            return None
        s = [None] * leaf.ndim
        s[tp_dim] = "tensor"
        if fsdp_dim is not None and fsdp_size > 1 and shape[fsdp_dim] % fsdp_size == 0:
            s[fsdp_dim] = "fsdp"
        return P(*s)

    if leaf.ndim >= 2 and any(path_names.endswith(k) for k in _TP_COL):
        return spec(-1, -2 if leaf.ndim >= 3 else None)
    if leaf.ndim >= 2 and any(path_names.endswith(k) for k in _TP_ROW):
        return spec(-2, -1 if leaf.ndim >= 3 else None)
    if any(path_names.endswith(k) for k in _TP_COL_BIAS):
        return spec(-1, None)
    return None


def params_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for a param pytree: FSDP over the 'fsdp' axis,
    plus Megatron-style head/FFN tensor parallelism over 'tensor' when the
    mesh carries a tensor axis > 1."""
    fsdp = mesh.shape["fsdp"]
    tp = mesh.shape.get("tensor", 1)

    def f(path, leaf):
        names = "/".join(
            str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p))
            for p in path
        )
        spec = _tp_leaf_spec(names, leaf, fsdp, tp)
        if spec is None:
            spec = _leaf_spec(names, leaf, fsdp)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params: Any, mesh: Mesh):
    """Place a param pytree on the mesh with fsdp shardings."""
    sh = params_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch dim over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def seq_constraint(x, mesh: Mesh):
    """Sequence-parallel constraint for token tensors [B, L, D]: L over 'seq'.

    This is the sharding-propagation form of the reference's monkey-patched
    sequence-sharded DiT forward (full_sequence_parallel.py:63-163): tokens
    live sharded along the sequence axis and XLA inserts the collectives
    (the explicit Ulysses all_to_all kernel in parallel/ulysses.py is the
    hand-optimized variant).
    """
    if mesh is None or mesh.shape.get("seq", 1) == 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", "seq", None))
    )
