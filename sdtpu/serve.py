"""Minimal production-style HTTP serving for text-to-image.

Not in the reference (a one-shot CLI binary); sdtpu adds a deployable
surface: a stdlib ThreadingHTTPServer with model warm-up at startup
(fixed shapes => one XLA compile), a device lock (JAX dispatch is
single-stream per host process), and JSON/PNG responses.

    python -m sdtpu.serve native sd.safetensors --port 8000
    curl -X POST localhost:8000/generate \
         -d '{"prompt": "an ancient mossy stone", "steps": 20, "seed": 1}'
    # -> {"images": ["<base64 png>"], "latency_s": ...}
    curl localhost:8000/healthz
"""

from __future__ import annotations

import base64
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _State:
    sd = None
    tokenizer = None
    lock = threading.Lock()
    default_steps = 20
    default_scale = 7.5
    ready = False


STATE = _State()


def _generate(prompt, steps, scale, seed, batch, negative):
    import jax
    import numpy as np

    from sdtpu.utils.image import encode_png_rgb8

    key = jax.random.PRNGKey(seed) if seed is not None else None
    t0 = time.perf_counter()
    with STATE.lock:
        imgs = STATE.sd.generate(
            STATE.tokenizer, prompt, guidance_scale=scale, n_steps=steps,
            n_images=batch, key=key, negative_prompt=negative)
    dt = time.perf_counter() - t0
    pngs = [base64.b64encode(encode_png_rgb8(np.asarray(im))).decode()
            for im in imgs]
    return {"images": pngs, "latency_s": round(dt, 3),
            "images_per_sec": round(len(pngs) / dt, 3)}


class Handler(BaseHTTPRequestHandler):
    def _send(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200 if STATE.ready else 503,
                       {"ready": STATE.ready})
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):
        if self.path != "/generate":
            self._send(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            prompt = req["prompt"]
            steps = int(req.get("steps", STATE.default_steps))
            scale = float(req.get("guidance_scale", STATE.default_scale))
            seed = req.get("seed")
            batch = int(req.get("n_images", 1))
            negative = req.get("negative_prompt", "")
            if not (1 <= steps <= 1000) or not (1 <= batch <= 16):
                raise ValueError("steps in [1,1000], n_images in [1,16]")
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": f"bad request: {e}"})
            return
        try:
            self._send(200, _generate(prompt, steps, scale,
                                      None if seed is None else int(seed),
                                      batch, negative))
        except Exception as e:  # pragma: no cover - defensive
            self._send(500, {"error": f"{type(e).__name__}: {e}"})

    def log_message(self, fmt, *args):  # quiet by default
        pass


def make_server(sd, tokenizer, port: int = 8000, warmup: bool = True,
                default_steps: int = 20):
    STATE.sd = sd
    STATE.tokenizer = tokenizer
    STATE.default_steps = default_steps
    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    if warmup:
        import jax

        _generate("warmup", default_steps, 7.5, 0, 1, "")
    STATE.ready = True
    return server


def main(argv=None):
    argv = list(sys.argv if argv is None else argv)
    port, steps, preset, bf16 = 8000, 20, "sd-v1-4", False
    pos = [argv[0]]
    i = 1
    while i < len(argv):
        a = argv[i]
        if a == "--port":
            port = int(argv[i + 1]); i += 2
        elif a == "--steps":
            steps = int(argv[i + 1]); i += 2
        elif a == "--preset":
            preset = argv[i + 1]; i += 2
        elif a == "--bf16":
            bf16 = True; i += 1
        else:
            pos.append(a); i += 1
    if len(pos) != 3:
        print(f"Usage: {pos[0]} <model_type> <model> [--port N] [--steps N]"
              " [--preset P] [--bf16]", file=sys.stderr)
        sys.exit(1)

    import jax.numpy as jnp

    from sdtpu.cli import load_model
    from sdtpu.tokenizer import SimpleTokenizer

    print("Loading model...")
    sd = load_model(pos[1], pos[2], preset,
                    compute_dtype=jnp.bfloat16 if bf16 else jnp.float32)
    print("Warming up (compiling)...")
    server = make_server(sd, SimpleTokenizer(), port, default_steps=steps)
    print(f"Serving on :{port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
