#!/usr/bin/env python
"""MEASURED full-model Qwen3-VL-30B-A3B text decode on one chip (VERDICT r4
item 3: replace qwen30b_decode_tok_s_derived with a measured end-to-end run).

The full model is 60 GB bf16 / 30 GB int8 — neither fits 16 GB HBM, and
layer-streaming whole layers costs 30 GB/token. But the A3B structure
activates only 8 of 128 experts per token per layer, so the serving design
measured here is **expert-on-demand streaming**:

  - RESIDENT on device (bf16): every layer's attention + norms + router
    (~0.95 GB), the tied embedding/lm_head (0.62 GB), the KV cache;
  - STREAMED from host per routing decision: the selected experts as
    weight-only int8 (ops/quant.py layout) — 8 experts x 4.7 MB x 48 layers
    = 1.8 GB/token for decode; prefill fetches each layer's activated-expert
    UNION once.

Every dispatch is milliseconds-scale (no tunnel-deadline risk); the
measured number is dominated by this tunnel's ~0.05 GB/s h2d — the tool
also emits the bytes/token so a PCIe-host (16 GB/s) projection is plain
arithmetic, and the production path (experts sharded across chips, EP) is
documented in docs/PERFORMANCE.md.

Weights are random (no checkpoints in this environment) at the REAL dims:
48 layers, D=2048, 32/4 heads x 128, E=128, top-8, M=768
(/root/reference/omnivideo/vllm_model.py:30-31 model card). Host experts are
GENERATED deterministically on demand (seeded by layer/expert) — holding all
29 GB int8 in RAM is unnecessary.

    python tools/dev/tpu_qwen_full_decode.py [--prompt_len 16] [--tokens 3]
    python tools/dev/tpu_qwen_full_decode.py --tiny   # CPU plumbing check
"""
import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def emit(d):
    print("PHASE_JSON:" + json.dumps(d), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt_len", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from omnivideo_tpu.models.qwen3vl.text_model import (Qwen3TextConfig,
                                                         _rms, _rope)

    if args.tiny:
        cfg = Qwen3TextConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
            vocab_size=512)
    else:
        cfg = Qwen3TextConfig(
            hidden_size=2048, intermediate_size=6144, num_hidden_layers=48,
            num_attention_heads=32, num_key_value_heads=4, head_dim=128,
            num_experts=128, num_experts_per_tok=8, moe_intermediate_size=768,
            vocab_size=151936)
    nl, D, N, K, hd = (cfg.num_hidden_layers, cfg.hidden_size,
                       cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
    E, M, k_top = cfg.num_experts, cfg.moe_intermediate_size, cfg.num_experts_per_tok
    P, max_len = args.prompt_len, args.prompt_len + args.tokens + 1
    eps = cfg.rms_norm_eps
    Q_SCALE = np.float32(0.4 / np.sqrt(D) / 127.0)  # int8 -> bf16 scale

    # ---- resident params (attention + router + norms + tied embed) ----
    @jax.jit
    def init_resident(key):
        ks = jax.random.split(key, 8)
        r = lambda kk, *s: (jax.random.normal(kk, s, jnp.bfloat16)
                            * float(0.5 / np.sqrt(s[-2] if len(s) > 1 else 1)))
        layers = {
            "ln1": jnp.ones((nl, D), jnp.bfloat16),
            "ln2": jnp.ones((nl, D), jnp.bfloat16),
            "q": r(ks[0], nl, D, N * hd), "k": r(ks[1], nl, D, K * hd),
            "v": r(ks[2], nl, D, K * hd), "o": r(ks[3], nl, N * hd, D),
            "q_norm": jnp.ones((nl, hd), jnp.bfloat16),
            "k_norm": jnp.ones((nl, hd), jnp.bfloat16),
            "router": r(ks[4], nl, D, E),
        }
        embed = r(ks[5], cfg.vocab_size, D)  # tied lm_head
        final_ln = jnp.ones((D,), jnp.bfloat16)
        return {"layers": layers, "embed": embed, "final_ln": final_ln}

    res = init_resident(jax.random.PRNGKey(0))
    float(jnp.sum(res["final_ln"].astype(jnp.float32)))  # force init

    # ---- host expert store: deterministic on-demand int8 generation ----
    def gen_expert(li: int, ei: int):
        rng = np.random.default_rng(1_000_003 * li + ei)
        return {m: rng.integers(-127, 128, (D, M) if m != "down" else (M, D),
                                dtype=np.int8) for m in ("gate", "up", "down")}

    bytes_moved = [0]

    def fetch_experts(li: int, idx_list):
        """Stack the chosen experts' int8 weights and ship them h2d."""
        ws = [gen_expert(li, int(e)) for e in idx_list]
        out = {}
        for m in ("gate", "up", "down"):
            a = np.stack([w[m] for w in ws])
            bytes_moved[0] += a.nbytes
            out[m] = jax.device_put(a)
        return out

    # ---- jitted stages ----
    def attn_cached(lp, x, pos, kc, vc, length):
        """x [1,L,D]; kc/vc [1,max_len,K,hd]; writes this call's k/v at
        [pos], attends over positions < length+L (causal within the call)."""
        B, L, _ = x.shape
        hn = _rms(x, lp["ln1"], eps)
        q = (hn @ lp["q"]).reshape(B, L, N, hd)
        k = (hn @ lp["k"]).reshape(B, L, K, hd)
        v = (hn @ lp["v"]).reshape(B, L, K, hd)
        q = _rms(q, lp["q_norm"], eps)
        k = _rms(k, lp["k_norm"], eps)
        q = _rope(q, pos, cfg.rope_theta)
        k = _rope(k, pos, cfg.rope_theta)
        kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype), (0, length, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype), (0, length, 0, 0))
        rep = N // K
        k_r = jnp.repeat(kc, rep, axis=2)
        v_r = jnp.repeat(vc, rep, axis=2)
        logits = jnp.einsum("bind,bjnd->bnij", q, k_r,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        j = jnp.arange(max_len)[None, None, None, :]
        i = pos[:, None, :, None]
        logits = jnp.where(j <= i, logits, -3.4e38)
        probs = jax.nn.softmax(logits, axis=-1).astype(v_r.dtype)
        o = jnp.einsum("bnij,bjnd->bind", probs, v_r,
                       preferred_element_type=jnp.float32)
        return o.astype(x.dtype).reshape(B, L, N * hd), kc, vc

    @partial(jax.jit, static_argnums=())
    def stage_a(res_layers, i, x, pos, kc, vc, length):
        """attention + residual + post-norm + router top-k for layer i."""
        lp = jax.tree_util.tree_map(lambda a: a[i], res_layers)
        o, kc, vc = attn_cached(lp, x, pos, kc, vc, length)
        x = x + (o @ lp["o"])
        hn = _rms(x, lp["ln2"], eps)
        rl = (hn.reshape(-1, D) @ lp["router"]).astype(jnp.float32)
        pr = jax.nn.softmax(rl, axis=-1)
        topv, topi = jax.lax.top_k(pr, k_top)
        topv = topv / jnp.sum(topv, -1, keepdims=True)  # norm_topk_prob
        return x, hn, topv, topi, kc, vc

    @jax.jit
    def stage_moe(x, hn, eq, topv, slot_of):
        """MoE over the FETCHED experts. eq: int8 stacks [U, ...];
        slot_of: [T, k] indices into the U fetched experts."""
        T = hn.shape[0] * hn.shape[1]
        ht = hn.reshape(T, D)
        deq = lambda a: a.astype(jnp.bfloat16) * jnp.bfloat16(Q_SCALE)
        g = jnp.einsum("td,udm->utm", ht, deq(eq["gate"]))
        u = jnp.einsum("td,udm->utm", ht, deq(eq["up"]))
        o = jnp.einsum("utm,umd->utd", jax.nn.silu(g) * u, deq(eq["down"]))
        # combine: y[t] = sum_s topv[t,s] * o[slot_of[t,s], t]
        t_idx = jnp.arange(T)[:, None]
        picked = o[slot_of, t_idx]  # [T, k, D]
        y = jnp.sum(picked * topv[:, :, None].astype(o.dtype), axis=1)
        return x + y.reshape(x.shape)

    @jax.jit
    def logits_of(res, x):
        h = _rms(x[:, -1:], res["final_ln"], eps)
        return jnp.argmax((h.reshape(-1, D) @ res["embed"].T)
                          .astype(jnp.float32), -1)

    kc = jnp.zeros((nl, 1, max_len, K, hd), jnp.bfloat16)
    vc = jnp.zeros((nl, 1, max_len, K, hd), jnp.bfloat16)

    def forward(res, ids, kc, vc, length):
        """One full-model pass over ids (prefill or single decode token)."""
        L = ids.shape[1]
        x = res["embed"][ids]
        pos = jnp.broadcast_to(jnp.arange(length, length + L)[None], (1, L))
        kcs, vcs = [], []
        for li in range(nl):
            x, hn, topv, topi, kci, vci = stage_a(
                res["layers"], li, x, pos, kc[li], vc[li], length)
            kcs.append(kci)
            vcs.append(vci)
            topi_h = np.asarray(topi)  # [T, k] host routing decision
            uniq = np.unique(topi_h)
            # bucket the fetched-expert count so stage_moe compiles once per
            # bucket, not once per distinct union size (pads repeat expert
            # uniq[0]; slot_of never points at them)
            bucket = min(E, -(-len(uniq) // 16) * 16) if len(uniq) > k_top \
                else len(uniq)
            if len(uniq) < bucket:
                uniq = np.concatenate(
                    [uniq, np.full(bucket - len(uniq), uniq[0])])
            eq = fetch_experts(li, uniq)
            remap = np.zeros(E, np.int32)
            remap[uniq] = np.arange(len(uniq))
            x = stage_moe(x, hn, eq, topv, jnp.asarray(remap[topi_h]))
        tok = logits_of(res, x)
        return int(tok[0]), jnp.stack(kcs), jnp.stack(vcs)

    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, P)))

    # prefill (measured end-to-end, incl. host expert generation + h2d)
    t0 = time.perf_counter()
    tok, kc, vc = forward(res, ids, kc, vc, 0)
    t_prefill = time.perf_counter() - t0
    pf_gb = bytes_moved[0] / 1e9
    emit({"qwen30b_full_prefill_measured_s": round(t_prefill, 1),
          "qwen30b_full_prefill_len": P,
          "qwen30b_full_prefill_expert_gb": round(pf_gb, 2)})

    # greedy decode, measured per token
    times = []
    for step in range(args.tokens):
        bytes_moved[0] = 0
        t0 = time.perf_counter()
        tok, kc, vc = forward(res, jnp.asarray([[tok]]), kc, vc, P + step)
        times.append(time.perf_counter() - t0)
        print(f"# decode step {step}: {times[-1]:.1f}s tok={tok} "
              f"({bytes_moved[0]/1e9:.2f} GB experts)", file=sys.stderr,
              flush=True)
    t_tok = float(np.median(times))
    dec_gb = bytes_moved[0] / 1e9
    # PCIe-host projection: same bytes at 16 GB/s + the measured on-chip
    # compute (cached-decode layer x nl, BENCH_LOCAL qwen30b_text_layer_decode_us)
    t_compute = 616e-6 * nl
    t_pcie = dec_gb / 16.0 + t_compute
    out = {
        "qwen30b_decode_tok_s_measured": round(1.0 / t_tok, 3),
        "qwen30b_decode_s_per_tok_measured": round(t_tok, 1),
        "qwen30b_decode_expert_gb_per_tok": round(dec_gb, 2),
        "qwen30b_decode_tok_s_pcie_projected": round(1.0 / t_pcie, 1),
    }
    emit(out)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
