"""Regenerate the committed end-to-end golden fixture.

The reference ships a real output image (README.md:36-38, img0.png) as
its de-facto integration oracle; sdtpu's equivalent is a COMMITTED tiny
checkpoint + fixed latent + prompt -> committed output pixels, asserted
in tests/test_golden.py (VERDICT r3 task 3). Every kernel/dispatch/
sampler change is gated against silent end-to-end drift, absolutely
rather than relative.

Run ONLY when intentionally re-baselining (a deliberate numeric change):
    python tools/make_golden.py
then commit the files it rewrites under tests/fixtures/golden/.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main():
    from tests.test_golden import (
        FIXTURE_DIR, GOLDEN_CASES, _flatten, load_fixture,
    )
    from sdtpu.tokenizer import SimpleTokenizer
    from sdtpu.utils.image import encode_png_rgb8
    from tests.test_pipeline import tiny_params

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    ckpt_path = os.path.join(FIXTURE_DIR, "tiny_ckpt.npz")
    if os.path.exists(ckpt_path):
        print(f"keeping existing checkpoint {ckpt_path} (delete to re-roll)")
    else:
        params = tiny_params(seed=0)
        flat = {}
        _flatten("", params, flat)
        # f16 storage halves the fixture; the loader casts to f32 (the
        # golden pins the f32 pipeline on the f16-quantised weights)
        flat = {k: (v.astype(np.float16)
                    if getattr(v, "dtype", None) == np.float32 else v)
                for k, v in flat.items()}
        from tests.test_golden import GOLDEN_CONFIG

        hw = GOLDEN_CONFIG.latent_size
        lat = np.asarray(
            jax.random.normal(jax.random.PRNGKey(99), (1, hw, hw, 4)),
            np.float32)
        np.savez(ckpt_path, __latent__=lat, **flat)
        print(f"wrote {ckpt_path} ({os.path.getsize(ckpt_path)} bytes)")

    from tests.test_golden import generate

    params, lat = load_fixture()
    tok = SimpleTokenizer()
    only = set(sys.argv[1:])  # optional case names: add without re-baselining
    for name, case in GOLDEN_CASES.items():
        if only and name not in only:
            continue
        img = generate(params, tok, lat, case)
        out = os.path.join(FIXTURE_DIR, f"{name}.png")
        with open(out, "wb") as f:
            f.write(encode_png_rgb8(img[0]))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
