"""A/B the fused residual+LN+modulate Pallas kernel against the plain-XLA
elementwise sandwich, in-DiT at the flagship 480p·81f shape.

Run on the chip:  python tools/dev/bench_adaln_ab.py [--n 3]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--frames", type=int, default=21)
    ap.add_argument("--rows", type=int, default=0, help="row-tile override")
    args = ap.parse_args()

    import omnivideo_tpu.models.wan_dit as wd
    import omnivideo_tpu.ops.fused_adaln as fa
    from omnivideo_tpu.configs import T2V_1_3B

    cfg = T2V_1_3B
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    params = wd.init_wan_dit(jax.random.PRNGKey(0), dit_cfg, dtype=jnp.bfloat16)
    # the head is zero-init (AdaLN-zero): randomize it so the A/B value
    # comparison actually observes the blocks' output
    params["head"]["head"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(7), params["head"]["head"]["kernel"].shape,
        jnp.float32)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 16, args.frames, 60, 104), jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.max_context_len, dit_cfg.text_dim), jnp.bfloat16)

    if args.rows:
        fa._BLOCK_ROWS = args.rows

    def run(tag, enable):
        ew = "pallas" if enable else "xla"
        fwd = jax.jit(lambda p, x, t, c: jnp.sum(
            wd.wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="pallas",
                             ew_impl=ew)
            .astype(jnp.float32)))
        val = float(fwd(params, x, t, ctx))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.n):
            val = float(fwd(params, x, t, ctx))
        dt = (time.perf_counter() - t0) / args.n
        print(f"{tag}: {dt:.3f} s/step  (sum {val:.1f})", flush=True)
        return dt, val

    t_old, v_old = run("xla elementwise ", False)
    t_new, v_new = run("fused adaln     ", True)
    rel = abs(v_new - v_old) / max(1e-9, abs(v_old))
    print(f"speedup {t_old / t_new:.4f}x  delta {t_old - t_new:+.3f} s  "
          f"value rel-diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
