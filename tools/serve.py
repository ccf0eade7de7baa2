#!/usr/bin/env python
"""Minimal HTTP serving frontend for the x2x generation pipeline.

The reference has no serving story (its CLIs are batch scripts;
`vllm_model.py` only wraps the VLM stage) — this is TPU-native deployment
plumbing on top of the same pipeline the CLI drives: the pipeline compiles
once at startup (per requested size/steps signature), then requests reuse
the warm jit cache.

    python tools/serve.py --random_weights --tiny --platform cpu --port 8800

API (JSON over stdlib http.server — zero new dependencies):

  GET  /healthz            -> {"status": "ok", "backend": ...}
  POST /generate           body: {"prompt": str | "context": [[...]],
                                  "size": [W, H], "frame_num": int,
                                  "sampling_steps": int, "seed": int,
                                  "guide_scale": float}
                           -> {"id": ..., "path": "<written clip>",
                               "latency_s": ...}

Requests are served sequentially (one TPU program at a time — matching the
one-process-per-chip execution model); a lock keeps concurrent POSTs safe.
"""

import argparse
import json
import logging
import re
import sys
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from omnivideo_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()  # reuse TPU compiles across invocations

log = logging.getLogger("serve")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--output_dir", default="outputs/serve")
    p.add_argument("--port", type=int, default=8800)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--attn_impl", default="auto")
    p.add_argument("--max_steps_per_call", type=int, default=None)
    p.add_argument("--vae_dtype", default=None, choices=[None, "float32", "bfloat16"])
    p.add_argument("--residual_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="DiT residual-stream storage dtype (bf16 default "
                        "for serving; float32 = strict reference parity)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None)
    p.add_argument("--once", default=None,
                   help="serve exactly one request from this JSON file and "
                        "exit (smoke-test mode, no socket)")
    return p.parse_args()


def build_pipeline(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from omnivideo_tpu.configs import WAN_CONFIGS
    from omnivideo_tpu.pipelines.x2x import OmniVideoX2XUnified

    cfg = WAN_CONFIGS[args.task]
    if args.tiny:
        cfg = cfg.replace(
            dit=cfg.dit.replace(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                                freq_dim=32, text_dim=48),
            vae=cfg.vae.__class__(dim=8, z_dim=16, num_res_blocks=1),
            max_context_len=64,
        )
    if args.random_weights:
        pipe = OmniVideoX2XUnified.random_init(
            cfg, attn_impl=args.attn_impl, residual_dtype=args.residual_dtype)
    else:
        assert args.ckpt_dir, "--ckpt_dir required without --random_weights"
        from omnivideo_tpu.pipelines.loading import load_pipeline

        pipe = load_pipeline(cfg, args.ckpt_dir, attn_impl=args.attn_impl,
                             residual_dtype=args.residual_dtype)
    return cfg, pipe


class Server:
    def __init__(self, args):
        self.args = args
        self.cfg, self.pipe = build_pipeline(args)
        self.outdir = Path(args.output_dir)
        self.outdir.mkdir(parents=True, exist_ok=True)
        self.lock = threading.Lock()

    def handle_generate(self, req: dict) -> dict:
        import jax.numpy as jnp
        import numpy as np

        from omnivideo_tpu.utils.video import save_video

        t0 = time.perf_counter()
        size = tuple(req.get("size", (832, 480)))
        frame_num = int(req.get("frame_num", 81))
        steps = int(req.get("sampling_steps", 50))
        seed = int(req.get("seed", 0))
        guide = float(req.get("guide_scale", 3.0))

        if "context" in req:
            ctx = jnp.asarray(np.asarray(req["context"], np.float32))
            ctx_null = jnp.zeros_like(ctx)  # client sent features; no encoder assumed
        elif self.pipe.text_encoder is not None:
            ctx = self.pipe.text_encoder([req.get("prompt", "")])[0]
            # None → generate() encodes the default negative prompt, matching
            # the CLI path (tools/generate.py); zeros here would silently
            # change CFG output for the same request (ADVICE r2)
            ctx_null = None
        else:
            raise ValueError("no text encoder attached; POST a precomputed "
                             "'context' [[L, text_dim]] instead of 'prompt'")
        vae_dtype = (None if self.args.vae_dtype is None
                     else getattr(jnp, self.args.vae_dtype))
        with self.lock:  # one TPU program at a time
            video = self.pipe.generate(
                precomputed_context=ctx,
                precomputed_context_null=ctx_null,
                size=size, frame_num=frame_num, sampling_steps=steps,
                guide_scale=guide, seed=seed, decode=True,
                max_steps_per_call=self.args.max_steps_per_call,
                vae_dtype=vae_dtype,
            )
        # the client id is echoed back but NEVER used in the filesystem path
        # unless it is a plain token — "../../x" must not escape --output_dir
        # (ADVICE r2: path traversal on the HTTP surface)
        client_id = str(req.get("id") or "")
        rid = client_id if re.fullmatch(r"[A-Za-z0-9_-]{1,64}", client_id) \
            else uuid.uuid4().hex[:10]
        path = save_video(str(self.outdir / f"{rid}.mp4"), np.asarray(video))
        return {"id": client_id or rid, "file_id": rid, "path": str(path),
                "latency_s": round(time.perf_counter() - t0, 2)}


def make_handler(server: Server):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._reply(200, {"status": "ok",
                                  "backend": jax.default_backend(),
                                  "task": server.args.task})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                self._reply(200, server.handle_generate(req))
            except Exception as e:
                log.exception("generate failed")
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *a):
            log.info("%s " + fmt, self.address_string(), *a)

    return Handler


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = parse_args()
    server = Server(args)
    if args.once:
        req = json.loads(Path(args.once).read_text())
        out = server.handle_generate(req)
        print(json.dumps(out))
        return
    httpd = HTTPServer((args.host, args.port), make_handler(server))
    log.info("serving %s on http://%s:%d", args.task, args.host, args.port)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
