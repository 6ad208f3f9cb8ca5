"""ctypes bindings for the native C++ runtime (libsdtpu.so).

Build with `make -C sdtpu/runtime`. Every entry point has a pure-Python
fallback, so the framework runs identically without the native library —
`available()` reports which path is active.

Native components (mirroring the reference's native-Rust surface):
- CLIP BPE tokenizer fast path (reference: src/tokenizer.rs)
- PNG RGB8 encoder (reference: the `image` crate, sample/main.rs:116-125)
- parallel bulk file reader for the npy dump tree (reference reads the
  ~1000 files serially, load.rs:30-47)
"""

from __future__ import annotations

import ctypes
import mmap
import os
from functools import lru_cache
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libsdtpu.so")


@lru_cache()
def _lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.sdtpu_tokenizer_new.restype = ctypes.c_void_p
    lib.sdtpu_tokenizer_new.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.sdtpu_tokenizer_free.argtypes = [ctypes.c_void_p]
    lib.sdtpu_tokenizer_vocab_size.argtypes = [ctypes.c_void_p]
    lib.sdtpu_tokenizer_vocab_size.restype = ctypes.c_int
    lib.sdtpu_tokenizer_encode.restype = ctypes.c_int
    lib.sdtpu_tokenizer_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
    ]
    lib.sdtpu_png_encode_rgb8.restype = ctypes.c_int
    lib.sdtpu_png_encode_rgb8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.sdtpu_free.argtypes = [ctypes.c_void_p]
    lib.sdtpu_read_files.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _lib() is not None


def build(quiet: bool = True) -> bool:
    """Compile libsdtpu.so in-tree; returns availability."""
    import subprocess

    here = os.path.dirname(__file__)
    r = subprocess.run(["make", "-C", here],
                       capture_output=quiet, text=True)
    _lib.cache_clear()
    return r.returncode == 0 and available()


class NativeTokenizer:
    """ASCII fast-path BPE encoder. encode() returns None for inputs the
    native path rejects (non-ASCII) — callers fall back to Python."""

    def __init__(self, merges_text: bytes):
        lib = _lib()
        if lib is None:
            raise RuntimeError("libsdtpu.so not built")
        self._lib = lib
        self._h = lib.sdtpu_tokenizer_new(merges_text, len(merges_text))
        if not self._h:
            raise RuntimeError("native tokenizer init failed")

    @property
    def n_vocab(self) -> int:
        return self._lib.sdtpu_tokenizer_vocab_size(self._h)

    def encode(self, text: str) -> Optional[List[int]]:
        try:
            raw = text.encode("ascii")
        except UnicodeEncodeError:
            return None
        cap = max(256, 4 * len(raw) + 16)
        buf = (ctypes.c_uint32 * cap)()
        n = self._lib.sdtpu_tokenizer_encode(self._h, raw, buf, cap)
        if n < 0:
            return None
        return list(buf[:n])

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.sdtpu_tokenizer_free(self._h)
        except Exception:
            pass


def png_encode_rgb8(img: np.ndarray) -> Optional[bytes]:
    lib = _lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    assert c == 3, img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.sdtpu_png_encode_rgb8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        return None
    try:
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.sdtpu_free(out)


def read_files_bulk(paths: List[str],
                    n_threads: int = 8) -> Optional[List[memoryview]]:
    """Read many files concurrently; None if the native lib is absent.

    Returns zero-copy memoryviews into one shared mmap arena. Two traps
    at SD-v1 scale (2793 files / 4.3GB, measured r5, BENCHLOG):
    per-file ctypes buffers (create_string_buffer + .raw copies cost
    minutes), and a single np.empty arena — numpy MADV_HUGEPAGEs
    allocations >=4MB, and under THP defrag=madvise every first-touch
    fault inside the C fread then does synchronous compaction (19.4s vs
    1.3s per 1.86GB). mmap.mmap(-1, total) gets plain anonymous pages.
    """
    lib = _lib()
    if lib is None:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lens = (ctypes.c_uint64 * n)()
    lib.sdtpu_file_sizes(c_paths, n, lens)
    sizes = [int(lens[i]) for i in range(n)]
    total = sum(sizes)
    if total == 0:
        return [memoryview(b"")[:0] for _ in sizes]
    arena = mmap.mmap(-1, total)
    base = ctypes.addressof(ctypes.c_char.from_buffer(arena))
    c_bufs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    offs = []
    off = 0
    for i, s in enumerate(sizes):
        offs.append(off)
        c_bufs[i] = ctypes.cast(base + off, ctypes.POINTER(ctypes.c_uint8))
        off += s
    ok = lib.sdtpu_read_files(c_paths, n, c_bufs, lens, n_threads)
    if ok != n:
        return None
    view = memoryview(arena)  # keeps the arena alive via each slice
    return [view[o: o + s] for o, s in zip(offs, sizes)]
