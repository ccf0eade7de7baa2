"""omnivideo_tpu — TPU-native unified video generation & editing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SAIS-FUXI/Omni-Video (reference mounted at /root/reference): a unified x2x
pipeline (text-to-video, video-to-video instruction editing, mixed-condition
generation) built TPU-first:

- the Wan-style video DiT runs as one jit-compiled program with
  scan-over-layers, bf16 matmuls on the MXU and f32 AdaLN/norm math;
- attention is a Pallas flash-attention kernel (XLA einsum oracle for tests);
- flow-matching UniPC / DPM++ samplers are precomputed host-side coefficient
  tables driving a tiny linear recurrence inside a lax.scan denoise loop with
  CFG fused as batch-2;
- the causal 3D VAE streams encode/decode via lax.scan with an explicit
  conv-state carry;
- parallelism is expressed with jax.sharding (data / fsdp / seq mesh axes):
  FSDP parameter sharding, Ulysses sequence-parallel attention via shard_map
  all_to_all, ring attention over ICI.

Layer map parity: see SURVEY.md; reference call stacks cited per-module.
"""

__version__ = "0.1.0"
