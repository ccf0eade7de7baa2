"""Multi-host bring-up wiring (parallel/distributed.py).

Reference analog: torchrun env:// rendezvous in generate_omni_v2v.py:408-412.
jax.distributed.initialize is mocked — these tests validate the resolution
logic (flags > env > TPU auto-detect > single-process no-op), not a real
multi-host rendezvous.
"""

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
