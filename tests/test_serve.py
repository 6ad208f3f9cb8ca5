"""HTTP serving layer: spin up the real server on the tiny model and
drive it through the socket."""

import base64
import json
import threading
import urllib.request

import numpy as np
import pytest

from sdtpu.pipeline import StableDiffusion
from sdtpu.serve import make_server
from sdtpu.tokenizer import SimpleTokenizer
from sdtpu.utils.image import decode_png_rgb8
from tests.test_pipeline import TINY, tiny_params


@pytest.fixture(scope="module")
def server_port():
    sd = StableDiffusion(tiny_params(), TINY)
    server = make_server(sd, SimpleTokenizer(), port=0, warmup=True,
                         default_steps=2)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield port
    server.shutdown()


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server_port):
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/healthz") as r:
        assert r.status == 200
        assert json.loads(r.read()) == {"ready": True}


def test_generate_roundtrip(server_port):
    code, resp = _post(server_port, {"prompt": "a stone", "steps": 2, "seed": 7})
    assert code == 200, resp
    assert len(resp["images"]) == 1
    img = decode_png_rgb8(base64.b64decode(resp["images"][0]))
    assert img.shape == (32, 32, 3)

    # determinism with the same seed
    code2, resp2 = _post(server_port, {"prompt": "a stone", "steps": 2, "seed": 7})
    assert resp2["images"][0] == resp["images"][0]


def test_generate_errors(server_port):
    code, resp = _post(server_port, {"steps": 2})
    assert code == 400 and "prompt" in resp["error"]
    code, resp = _post(server_port, {"prompt": "x", "steps": 0})
    assert code == 400
    code, resp = _post(server_port, {"prompt": "x", "n_images": 99})
    assert code == 400


def test_concurrent_requests_batch(server_port):
    """Fire concurrent requests; the micro-batcher must fuse and answer
    all of them correctly (distinct prompts/seeds per request)."""
    import concurrent.futures as cf

    def call(i):
        return _post(server_port, {"prompt": f"stone {i}", "steps": 2,
                                   "seed": i, "guidance_scale": 5.0 + i})

    with cf.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(call, range(4)))
    for code, resp in results:
        assert code == 200, resp
        img = decode_png_rgb8(base64.b64decode(resp["images"][0]))
        assert img.shape == (32, 32, 3)
    # distinct seeds -> distinct images
    imgs = {r[1]["images"][0] for r in results}
    assert len(imgs) == 4
