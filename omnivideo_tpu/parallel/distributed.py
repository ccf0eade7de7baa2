"""Multi-host bring-up.

Role of reference `tools/inference/generate_omni_v2v.py:408-412` /
`omnivideo/distributed/util.py:9-16` (torchrun env:// rendezvous →
`dist.init_process_group(nccl)`) — TPU-native: `jax.distributed.initialize`.
On Cloud TPU pod slices initialize() auto-detects the coordinator and
process topology from the TPU metadata; elsewhere (CPU fleets, manual
bring-up) the coordinator address / process count / process id come from
flags or the standard JAX env vars.

After initialization every host sees the GLOBAL device set via
`jax.devices()`; a `jax.sharding.Mesh` built over it spans the pod, ICI
collectives ride the interconnect inside a slice and DCN between slices —
no process-group bookkeeping (reference builds 3 orthogonal NCCL groups;
here shardings are declared per-array and GSPMD inserts the collectives).

Usage in CLIs (tools/generate.py, tools/finetune.py):

    from omnivideo_tpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed(args.coordinator, args.num_processes,
                                 args.process_id)

Single-process runs (no flags, no env) are a no-op, so the same entry point
works from a laptop to a multi-host pod.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

# env vars honoured when flags are absent (the JAX-standard names first)
_ENV_COORD = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
_ENV_NPROC = ("JAX_NUM_PROCESSES", "NUM_PROCESSES")
_ENV_PID = ("JAX_PROCESS_ID", "PROCESS_ID")


def _env_first(names) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def _on_tpu_pod() -> bool:
    """Cloud TPU pod-slice workers expose worker topology env vars that
    jax.distributed.initialize() can auto-detect from."""
    return bool(
        os.environ.get("TPU_WORKER_ID")
        or os.environ.get("CLOUD_TPU_TASK_ID")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when the run is multi-host.

    Returns True if `jax.distributed.initialize` was called. Resolution:

    1. explicit args (CLI flags) — full manual bring-up;
    2. JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES / JAX_PROCESS_ID) env;
    3. TPU pod-slice auto-detect (TPU_WORKER_ID and friends present) —
       initialize() with no args;
    4. otherwise: single-process run, no-op.

    Must be called before any JAX backend touch (first jax op / jax.devices).
    """
    import jax

    coordinator_address = coordinator_address or _env_first(_ENV_COORD)
    if num_processes is None:
        v = _env_first(_ENV_NPROC)
        num_processes = int(v) if v else None
    if process_id is None:
        v = _env_first(_ENV_PID)
        process_id = int(v) if v else None

    if coordinator_address is None and not _on_tpu_pod():
        return False  # single-process

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    log.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def add_distributed_args(parser) -> None:
    """argparse flags mirroring the reference's torchrun rendezvous knobs."""
    parser.add_argument(
        "--coordinator", default=None,
        help="host:port of process 0 for multi-host runs "
             "(JAX_COORDINATOR_ADDRESS env also honoured)",
    )
    parser.add_argument("--num_processes", type=int, default=None,
                        help="total number of host processes")
    parser.add_argument("--process_id", type=int, default=None,
                        help="this host's process id (0-based)")
