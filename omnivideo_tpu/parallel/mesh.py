"""Device mesh construction.

Role of reference `omnivideo/distributed/util.py:9-92`
(init_distributed_group / init_sequence_parallel_group /
init_distributed_groups building orthogonal NCCL process groups) — TPU-native:
one `jax.sharding.Mesh` with named axes

    ('data', 'fsdp', 'seq', 'tensor')

- 'data'  : data parallelism (JSONL sharding / per-batch, reference C17)
- 'fsdp'  : parameter sharding (reference torch-FSDP FULL_SHARD, C16)
- 'seq'   : sequence parallelism for long-video attention (reference
            Ulysses C14/C15 and ring P11)
- 'tensor': Megatron-style tensor parallelism over attention heads / FFN
            hidden — the reference has no TP (SURVEY §2.3 row TP: "No");
            on TPU it is a free win expressed purely as parameter
            shardings (sharding.py) with XLA GSPMD inserting the
            collectives. Partitions the XLA-attention einsum path; the
            Pallas flash kernel is opaque to GSPMD, so combine tensor>1
            with attn_impl='xla' (or keep tp=1 on the Pallas path).

Collectives ride ICI inside a pod; no process-group bookkeeping — shardings
are declared on arrays and XLA inserts all-gather/reduce-scatter/all-to-all.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "seq", "tensor")


def create_mesh(
    dp: int = 1,
    fsdp: int = 1,
    sp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = dp * fsdp * sp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(dp, fsdp, sp, tp)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(1, 1, 1, 1)


def mesh_shape_for(n_devices: int) -> Tuple[int, int, int]:
    """Reasonable default (dp, fsdp, sp) factorization for n devices."""
    if n_devices == 1:
        return (1, 1, 1)
    if n_devices % 8 == 0:
        # dp>1 so the gradient all-reduce path is exercised alongside fsdp+sp
        return (n_devices // 4, 2, 2)
    if n_devices % 4 == 0:
        return (n_devices // 4, 2, 2)
    if n_devices % 2 == 0:
        return (n_devices // 2, 2, 1)
    return (n_devices, 1, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
