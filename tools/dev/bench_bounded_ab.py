"""A/B the bounded-softmax flash path against the running-max path, in-DiT
(standalone kernel timings carry a ~30-40 ms tunnel host-sync floor, so all
kernel efficiency is measured amortized over the 30 DiT blocks).

Run on the chip:  python tools/dev/bench_bounded_ab.py [--n 3]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    import omnivideo_tpu.models.wan_dit as wd
    from omnivideo_tpu.configs import T2V_1_3B

    cfg = T2V_1_3B
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    params = wd.init_wan_dit(jax.random.PRNGKey(0), dit_cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 21, 60, 104), jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.max_context_len, dit_cfg.text_dim), jnp.bfloat16)

    orig_attention = wd.attention

    def run(tag, force_assume):
        if force_assume is None:
            wd.attention = orig_attention
        else:
            wd.attention = functools.partial(
                _forced, orig_attention, force_assume)
        fwd = jax.jit(lambda p, x, t, c: jnp.sum(
            wd.wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="pallas")
            .astype(jnp.float32)))
        val = float(fwd(params, x, t, ctx))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.n):
            val = float(fwd(params, x, t, ctx))
        dt = (time.perf_counter() - t0) / args.n
        print(f"{tag}: {dt:.3f} s/step  (sum {val:.1f})", flush=True)
        return dt, val

    def _forced(orig, forced_value, *a, **kw):
        kw["assume_normalized"] = forced_value
        return orig(*a, **kw)

    t_old, v_old = run("running-max (baseline)", False)
    t_new, v_new = run("bounded-softmax      ", True)
    rel = abs(v_new - v_old) / max(abs(v_old), 1e-9)
    print(f"speedup: {t_old / t_new:.3f}x   output rel-diff {rel:.2e}")


if __name__ == "__main__":
    main()
