"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests (fsdp / Ulysses seq-parallel / dp) run on a virtual
8-device CPU mesh, which the reference (NCCL-only) cannot do — see SURVEY.md §4.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep XLA from oversubscribing the (often single-core) test machine.
os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")
os.environ.setdefault("INTRA_OP_PARALLELISM_THREADS", "1")
