"""Native C++ runtime vs Python oracle (build on demand; all entry points
have pure-Python fallbacks, so absence is also a valid configuration)."""

import os
import random
import string

import numpy as np
import pytest

from sdtpu import runtime


@pytest.fixture(scope="module")
def lib():
    if not runtime.available():
        if not runtime.build():
            pytest.skip("native toolchain unavailable")
    return runtime


def test_native_tokenizer_matches_python_on_corpus(lib):
    from sdtpu.tokenizer import SimpleTokenizer

    py = SimpleTokenizer(use_native=False)
    nat = SimpleTokenizer(use_native=True)
    assert nat._native is not None

    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + " .,!?'\"-()[]{}:;/<>|@#$%^&*"
    cases = [
        "Hello world! <|startoftext|>asdf<|startoftext|>",
        "<|startoftext|>An ancient mossy stone.<|endoftext|>",
        "it's we're I'll they'd you've can't",
        "",
        "    ",
        "...",
        "<|startoftext|><|endoftext|>",
        "a" * 200,
    ] + ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80)))
         for _ in range(200)]
    for text in cases:
        assert nat.encode(text) == py.encode(text), repr(text)


def test_native_tokenizer_nonascii_falls_back(lib):
    from sdtpu.tokenizer import SimpleTokenizer

    py = SimpleTokenizer(use_native=False)
    nat = SimpleTokenizer(use_native=True)
    text = "naïve café über"
    assert nat.encode(text) == py.encode(text)  # python path, same ids


def test_native_png_matches_decoder(lib):
    from sdtpu.utils.image import decode_png_rgb8

    img = np.random.default_rng(1).integers(0, 256, (33, 17, 3)).astype(np.uint8)
    data = lib.png_encode_rgb8(img)
    assert data is not None
    np.testing.assert_array_equal(decode_png_rgb8(data), img)


def test_bulk_reader(lib, tmp_path):
    paths = []
    for i in range(50):
        p = tmp_path / f"f{i}.npy"
        p.write_bytes(os.urandom(64 + i * 7))
        paths.append(str(p))
    bufs = lib.read_files_bulk(paths)
    assert bufs is not None
    for p, b in zip(paths, bufs):
        assert open(p, "rb").read() == b
