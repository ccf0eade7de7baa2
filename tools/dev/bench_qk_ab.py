"""A/B the fused qk-prep prologue (ops/pallas/qk_prep.py) in-DiT at the
flagship 1.3B 480p·81f shape, plus the cross-attn dispatch mode.

Run on the chip:  python tools/dev/bench_qk_ab.py [--n 3]

Value parity is asserted across variants (same params/inputs -> the output
sums must agree to bf16 tolerance); VERDICT r3 item 1's 1.3B done-bar is
step <= 3.6 s.
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
    ap.add_argument("--write-tuned", action="store_true",
                    help="persist the winner into ops/tuning.py's table "
                         "when it beats the current default by >1%")
    args = ap.parse_args()

    import omnivideo_tpu.models.wan_dit as wd
    from omnivideo_tpu.configs import T2V_1_3B

    cfg = T2V_1_3B
    dit_cfg = cfg.dit.replace(text_len=cfg.max_context_len)
    params = wd.init_wan_dit(jax.random.PRNGKey(0), dit_cfg, dtype=jnp.bfloat16)
    params["head"]["head"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(7), params["head"]["head"]["kernel"].shape,
        jnp.float32)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 16, args.frames, 60, 104), jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.max_context_len, dit_cfg.text_dim),
                            jnp.bfloat16)

    results = {}
    for xmode in ("single", "multi"):
        for qk in ("xla", "pallas"):
            os.environ["FLASH_XATTN_MODE"] = xmode
            fwd = jax.jit(lambda p, x, t, c: jnp.sum(
                wd.wan_dit_apply(p, dit_cfg, x, t, c, attn_impl="pallas",
                                 qk_impl=qk).astype(jnp.float32)))
            val = float(fwd(params, x, t, ctx))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.n):
                val = float(fwd(params, x, t, ctx))
            dt = (time.perf_counter() - t0) / args.n
            tag = f"xattn={xmode} qk={qk}"
            print(f"{tag:26s}: {dt:.3f} s/step  (sum {val:.1f})", flush=True)
            results[tag] = (dt, val)
            jax.clear_caches()
    os.environ.pop("FLASH_XATTN_MODE", None)

    vals = [v for _, v in results.values()]
    ref = vals[0]
    for tag, (dt, v) in results.items():
        assert abs(v - ref) <= max(3e-3 * abs(ref), 1.0), (tag, v, ref)
    best = min(results.items(), key=lambda kv: kv[1][0])
    print(f"\nbest: {best[0]}  {best[1][0]:.3f} s/step "
          f"(values agree across variants)")

    if args.write_tuned:
        from omnivideo_tpu.ops import tuning

        timings = {}
        for tag, (dt, _) in results.items():
            parts = dict(p.split("=") for p in tag.split())
            timings[(parts["xattn"], "xla", parts["qk"])] = dt
        lk_r = (cfg.max_context_len + 127) // 128 * 128
        written = tuning.persist_winner(
            timings, dit_cfg.dim, dit_cfg.num_heads, lk_r,
            source="bench_qk_ab (1.3B 480p·81f)")
        for sec, key, val in written:
            print(f"TUNED_UPDATED {sec}[{key}] = {val}", flush=True)
        if not written:
            print("tuned table unchanged (winner == default or within "
                  "noise margin)", flush=True)


if __name__ == "__main__":
    main()
