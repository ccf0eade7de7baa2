"""Worker for the REAL jax.distributed rendezvous test (not importable as a
test module — run as a subprocess by test_distributed.py).

Each of N processes: CPU backend with 2 virtual local devices, rendezvous at
the given coordinator, then (1) assert the global device view, (2) run a
global psum over every device of every process, (3) broadcast host-0 data,
(4) run a tiny DP generate with the process's own shard of the work — the
TPU-native analog of the reference's torchrun+NCCL bring-up
(omnivideo/distributed/util.py:9-16, generate_omni_v2v.py:408-412).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from omnivideo_tpu.parallel.distributed import maybe_initialize_distributed

    assert maybe_initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    # the global device set sums both processes' local devices
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # one psum across EVERY device of EVERY process
    mesh = Mesh(np.array(jax.devices()), ("d",))
    local = jnp.ones((jax.local_device_count(),), jnp.float32)
    garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("d"))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    # fully-replicated output is fully addressable on every process
    assert float(total) == 2 * nproc, float(total)

    # host-0 broadcast (the seed-sync primitive generate() relies on)
    got = int(multihost_utils.broadcast_one_to_all(
        np.int32(123 if pid == 0 else 0)))
    assert got == 123, got

    # tiny DP generate: every process runs its own shard of the input list
    # (tools/generate.py shards JSONL rows by jax.process_index())
    from omnivideo_tpu.configs.base import PipelineConfig, VAEConfig, WanDiTConfig
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = PipelineConfig(
        name="tiny-dist",
        dit=WanDiTConfig(patch_size=(1, 2, 2), in_dim=8, out_dim=8, dim=32,
                         ffn_dim=64, freq_dim=16, text_dim=24, num_heads=2,
                         num_layers=1),
        vae=VAEConfig(dim=8, z_dim=8),
        max_context_len=16, dual_expert=False, vlm_in_dim=8,
        param_dtype="float32",
    )
    pipe = OmniVideoX2XUnified.random_init(cfg, attn_impl="xla", with_vae=False)
    ctx = jnp.ones((4, 24), jnp.float32) * 0.1
    lat = pipe.generate(
        precomputed_context=ctx, precomputed_context_null=jnp.zeros_like(ctx),
        size=(16, 16), frame_num=5, sampling_steps=1, guide_scale=3.0,
        seed=100 + pid, decode=False)
    assert np.isfinite(np.asarray(lat)).all()

    print(f"WORKER_OK pid={pid} devices={jax.device_count()}", flush=True)


if __name__ == "__main__":
    main()
