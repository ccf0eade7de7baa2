"""Multi-host bring-up wiring (parallel/distributed.py).

Reference analog: torchrun env:// rendezvous in generate_omni_v2v.py:408-412.
jax.distributed.initialize is mocked — these tests validate the resolution
logic (flags > env > TPU auto-detect > single-process no-op), not a real
multi-host rendezvous.
"""

import os

import jax
import pytest

from omnivideo_tpu.parallel.distributed import (
    add_distributed_args,
    maybe_initialize_distributed,
)


@pytest.fixture()
def mock_init(monkeypatch):
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    # make sure ambient pod env never leaks into the tests
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID", "TPU_WORKER_ID",
                "CLOUD_TPU_TASK_ID", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    return calls


def test_single_process_is_noop(mock_init):
    assert maybe_initialize_distributed() is False
    assert mock_init == []


def test_explicit_flags(mock_init):
    assert maybe_initialize_distributed("10.0.0.1:1234", 4, 2) is True
    assert mock_init == [
        {"coordinator_address": "10.0.0.1:1234", "num_processes": 4,
         "process_id": 2}
    ]


def test_env_rendezvous(mock_init, monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "head:9999")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "8")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    assert maybe_initialize_distributed() is True
    assert mock_init == [
        {"coordinator_address": "head:9999", "num_processes": 8,
         "process_id": 3}
    ]


def test_tpu_pod_autodetect(mock_init, monkeypatch):
    monkeypatch.setenv("TPU_WORKER_ID", "0")
    assert maybe_initialize_distributed() is True
    assert mock_init == [{}]  # no-arg auto-detect


def test_flags_override_env(mock_init, monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "env-host:1")
    assert maybe_initialize_distributed("flag-host:2", 2, 1) is True
    assert mock_init[0]["coordinator_address"] == "flag-host:2"


def test_argparse_flags():
    import argparse

    p = argparse.ArgumentParser()
    add_distributed_args(p)
    args = p.parse_args(["--coordinator", "h:1", "--num_processes", "2",
                         "--process_id", "1"])
    assert (args.coordinator, args.num_processes, args.process_id) == ("h:1", 2, 1)
    args = p.parse_args([])
    assert args.coordinator is None


def test_real_two_process_rendezvous():
    """REAL jax.distributed.initialize: two local processes rendezvous on the
    CPU backend, see each other's devices, psum across all of them, broadcast
    from host 0, and each runs a DP shard of a tiny generate (VERDICT r2
    item 4 — the mock-only tests above validate resolution logic; this one
    actually executes the bring-up the reference does with torchrun+NCCL)."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:  # grab a free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = Path(__file__).resolve().parent / "distributed_worker.py"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid} devices=4" in out, out
