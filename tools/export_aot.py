#!/usr/bin/env python
"""Ahead-of-time export of the DiT denoise step for serving.

Serializes the jitted CFG-2 denoise forward (weights excluded — they are
call-time arguments) as a portable StableHLO artifact via `jax.export`.
A serving process loads the artifact and calls it without tracing Python
model code — no framework import, stable across process restarts, and the
compile cache is warm from the first call.

The reference has no serving-export story (torch modules are re-built per
process); this is TPU-native deployment plumbing.

Examples:
  python tools/export_aot.py --tiny --platform cpu --out /tmp/dit.bin
  python tools/export_aot.py --tiny --platform cpu --load /tmp/dit.bin --check
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from omnivideo_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()  # reuse TPU compiles across invocations


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--size", default="832*480")
    p.add_argument("--frame_num", type=int, default=81)
    p.add_argument("--out", default=None, help="write artifact here")
    p.add_argument("--load", default=None, help="load + call an artifact")
    p.add_argument("--check", action="store_true",
                   help="after load, run once on random inputs")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None)
    return p.parse_args()


def _cfg(args):
    from omnivideo_tpu.configs import WAN_CONFIGS

    cfg = WAN_CONFIGS[args.task]
    if args.tiny:
        cfg = cfg.replace(
            dit=cfg.dit.replace(dim=128, ffn_dim=256, num_heads=4, num_layers=2,
                                freq_dim=32, text_dim=64),
            max_context_len=64,
        )
    return cfg


def _shapes(args, cfg):
    import jax.numpy as jnp

    w, h = (int(x) for x in args.size.split("*"))
    if args.tiny:
        w, h = 64, 32
        args.frame_num = min(args.frame_num, 9)
    vs = cfg.vae.vae_stride
    lat = (cfg.vae.z_dim, (args.frame_num - 1) // vs[0] + 1, h // vs[1], w // vs[2])
    import jax

    x = jax.ShapeDtypeStruct((2,) + lat, jnp.bfloat16)
    t = jax.ShapeDtypeStruct((2,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((2, cfg.max_context_len, cfg.dit.text_dim), jnp.bfloat16)
    return x, t, ctx


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax import export as jexport

    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply

    cfg = _cfg(args)
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)

    if args.load:
        blob = Path(args.load).read_bytes()
        art = jexport.deserialize(blob)
        print(f"loaded {args.load}: {len(blob)} bytes, "
              f"in_avals={[str(a) for a in art.in_avals][:2]}...")
        if args.check:
            params = init_wan_dit(jax.random.PRNGKey(0), dit_cfg, dtype=jnp.bfloat16)
            xs, ts, cs = _shapes(args, cfg)
            x = jnp.zeros(xs.shape, xs.dtype)
            t = jnp.full(ts.shape, 500.0, ts.dtype)
            c = jnp.zeros(cs.shape, cs.dtype)
            t0 = time.perf_counter()
            out = art.call(params, x, t, c)
            out = jax.block_until_ready(out)
            print(f"artifact call OK: out {out.shape} "
                  f"({time.perf_counter() - t0:.2f}s incl. compile)")
        return

    params = init_wan_dit(jax.random.PRNGKey(0), dit_cfg, dtype=jnp.bfloat16)

    def denoise(params, x, t, ctx):
        return wan_dit_apply(params, dit_cfg, x, t, ctx,
                             attn_impl="xla" if args.platform == "cpu" else "auto")

    xs, ts, cs = _shapes(args, cfg)
    p_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
    )
    exp = jexport.export(jax.jit(denoise))(p_shapes, xs, ts, cs)
    blob = exp.serialize()
    out = args.out or f"dit_{args.task}.aot"
    Path(out).write_bytes(blob)
    print(f"exported {out}: {len(blob)} bytes "
          f"(platforms={exp.platforms}, x={xs.shape}, ctx={cs.shape})")


if __name__ == "__main__":
    main()
