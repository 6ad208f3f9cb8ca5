"""Host/device-polymorphic RNG for param-tree initialization.

The initializers (models/initializers.py + the per-model init_* trees)
are written against `split/uniform/normal` from this module. Three key
types select three execution modes for the SAME tree-building code:

- `jax.random.PRNGKey`: exactly `jax.random` — traceable, on-device,
  fully independent draws. The right choice inside jitted builders and
  for from-scratch training runs.
- `HostKey`: pure NUMPY — zero XLA compiles, zero device round-trips.
  Draws ONE shared entropy pool per root key and fills each leaf from a
  key-derived offset (wrapping), applying the leaf's affine scale + cast
  in a single fused pass (numpy float draws run at only ~0.1 Gval/s on
  this 1-vCPU host; pool fills at ~2.3 Gval/s).
- `SpecKey`: draws NOTHING — returns `LeafSpec` placeholders recording
  (pool offset, size, scale, shift, shape, dtype). `device_expand` then
  materialises the whole tree ON the device from a small uploaded pool
  with ONE trivially-codegen'd XLA program (slices + multiplies).

Why `SpecKey`/`device_expand` exist — the cold-start numbers (BENCHLOG
r4, tunneled v5e): the tunnel uploads host->device at only ~54MB/s
single-stream (~75MB/s with 8 parallel streams), so ANY init that ships
the 2.1GB bf16 tree through it floors at ~40s; and per-leaf jax.random
init is ~75 distinct remote compiles while a single jitted full-tree
builder pays full server-side codegen on a cold server (BENCH_r03:
init_s 138s). Expanding an 8M-value pool on-device uploads ~64MB and
compiles a pure data-movement program measured at ~4s server codegen
even when never cached (vs ~200s for the sampler graph) — total init
~3-7s in every server/cache state.

Per-leaf marginals under the pool modes are exact uniform(-b,b) /
normal*s; cross-leaf draws may share pool subsequences — statistically
fine for weight init, and bit-exact reproducible per seed. Pass
`pool_vals=0` to HostKey for full-entropy per-leaf draws.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import numpy as np

_DEFAULT_POOL_VALS = 32 * 1024 * 1024  # 128MB f32; > largest SD leaf / 1.2
# device_expand default: big enough for statistical variety, small enough
# that the two pools upload through the ~54MB/s tunnel in ~1.2s
_DEVICE_POOL_VALS = 8 * 1024 * 1024

_KIND_SEED = {"uniform": 1, "normal": 2}  # NOT hash(): PYTHONHASHSEED varies


def _pool_seed(root_entropy, kind: str) -> np.random.SeedSequence:
    root = root_entropy if isinstance(root_entropy, int) else 0
    return np.random.SeedSequence([root, _KIND_SEED[kind]])


def _make_pool(root_entropy, kind: str, pool_vals: int) -> np.ndarray:
    g = np.random.Generator(np.random.SFC64(_pool_seed(root_entropy, kind)))
    if kind == "uniform":
        # centered [-1, 1): per-leaf scaling is then ONE multiply
        pool = g.random(pool_vals, dtype=np.float32)
        pool *= np.float32(2.0)
        pool -= np.float32(1.0)
    else:
        pool = g.standard_normal(pool_vals, dtype=np.float32)
    return pool


def _draw_offset(ss: np.random.SeedSequence, pool_vals: int) -> int:
    """The per-leaf pool offset. HostKey and SpecKey MUST agree on this
    so a SpecKey expansion reproduces the HostKey tree bit-for-bit."""
    return int(np.random.Generator(np.random.SFC64(ss)).integers(pool_vals))


class HostKey:
    """Numpy-backed drop-in for a jax PRNG key in init code.

    Wraps a `np.random.SeedSequence`; `split` spawns children (stable,
    collision-free). Children share the ROOT key's entropy pools (see
    module docstring); draws use SFC64 (fastest numpy BitGenerator).
    """

    __slots__ = ("ss", "pool_vals", "device", "_pools")

    def __init__(self, seed, pool_vals: int = _DEFAULT_POOL_VALS,
                 device=None, _pools=None):
        self.ss = (seed if isinstance(seed, np.random.SeedSequence)
                   else np.random.SeedSequence(seed))
        self.pool_vals = pool_vals
        # streaming mode: device_put every leaf as soon as it is built,
        # bounding the host-RAM footprint to the transfer lag (this VM
        # populates brand-new anonymous pages at only ~0.1GB/s)
        self.device = device
        # {kind: f32 pool} shared by the whole split tree of this key
        self._pools = _pools if _pools is not None else {}

    def _gen(self) -> np.random.Generator:
        return np.random.Generator(np.random.SFC64(self.ss))

    def split(self, num: int):
        return [HostKey(s, self.pool_vals, self.device, self._pools)
                for s in self.ss.spawn(num)]

    def _out(self, x: np.ndarray):
        if self.device is None:
            return x
        return jax.device_put(x, self.device)

    # ---------------------------------------------------------- pool path

    def _pool(self, kind: str) -> np.ndarray:
        pool = self._pools.get(kind)
        if pool is None:
            # pool seed derives from the root entropy + kind only (NOT
            # from this child key), so every child of one root sees the
            # same pool and a given root seed is reproducible regardless
            # of which leaf initializes first
            root = self._pools.setdefault("_root_entropy", self.ss.entropy)
            pool = self._pools[kind] = _make_pool(root, kind, self.pool_vals)
        return pool

    def _pieces(self, kind: str, n: int):
        """(pos, pool-slice) pieces covering n consecutive pool values
        from a key-derived offset, wrapping."""
        pool = self._pool(kind)
        p = pool.size
        o = _draw_offset(self.ss, p)
        pieces, pos = [], 0
        while pos < n:
            k = min(p - o, n - pos)
            pieces.append((pos, pool[o:o + k]))
            pos += k
            o = 0
        return pieces

    def uniform(self, shape, dtype, minval, maxval):
        n = int(np.prod(shape)) if shape else 1
        if not self.pool_vals:
            x = self._gen().random(n, dtype=np.float32)
            if (minval, maxval) != (0.0, 1.0):
                x = x * np.float32(maxval - minval) + np.float32(minval)
            return self._out(_cast(x, dtype).reshape(shape))
        # pool values are centered [-1,1): value = x*scale + shift.
        # ONE fused multiply-and-cast pass straight into the leaf buffer
        # (a separate astype pass measured 3-7x slower in-context).
        scale = np.float32((maxval - minval) * 0.5)
        shift = np.float32((maxval + minval) * 0.5)
        if shift:
            # asymmetric bounds (never hit by the SD initializers —
            # fan-in init is symmetric): do the whole affine in f32 and
            # cast ONCE, matching device_expand bit-for-bit. (Adding a
            # f32 scalar to a low-precision buffer would both promote
            # the dtype and double-round.)
            buf = np.empty(n, np.float32)
            for pos, piece in self._pieces("uniform", n):
                np.multiply(piece, scale, out=buf[pos:pos + piece.size])
            buf += shift
            return self._out(_cast(buf, dtype).reshape(shape))
        out = np.empty(n, np.dtype(dtype))
        for pos, piece in self._pieces("uniform", n):
            np.multiply(piece, scale, out=out[pos:pos + piece.size],
                        casting="unsafe")
        return self._out(out.reshape(shape))

    def normal(self, shape, dtype, scale: float = 1.0):
        n = int(np.prod(shape)) if shape else 1
        if not self.pool_vals:
            x = self._gen().standard_normal(n, dtype=np.float32)
            if scale != 1.0:
                x *= np.float32(scale)
            return self._out(_cast(x, dtype).reshape(shape))
        out = np.empty(n, np.dtype(dtype))
        for pos, piece in self._pieces("normal", n):
            np.multiply(piece, np.float32(scale), out=out[pos:pos + piece.size],
                        casting="unsafe")
        return self._out(out.reshape(shape))


# ------------------------------------------------------------ spec mode

class LeafSpec(NamedTuple):
    """Placeholder for one to-be-generated leaf (see device_expand)."""

    kind: str      # "uniform" | "normal"
    offset: int    # start position in the kind's pool
    scale: float
    shift: float
    shape: tuple
    dtype: str     # numpy dtype name ("bfloat16", "float32", ...)


class SpecKey:
    """Draws nothing: records LeafSpecs with the same key-derived pool
    offsets a HostKey would use, for on-device expansion."""

    __slots__ = ("ss", "pool_vals", "root_entropy")

    def __init__(self, seed, pool_vals: int = _DEVICE_POOL_VALS,
                 root_entropy=None):
        self.ss = (seed if isinstance(seed, np.random.SeedSequence)
                   else np.random.SeedSequence(seed))
        self.pool_vals = pool_vals
        self.root_entropy = (self.ss.entropy if root_entropy is None
                             else root_entropy)

    def split(self, num: int):
        return [SpecKey(s, self.pool_vals, self.root_entropy)
                for s in self.ss.spawn(num)]

    def uniform(self, shape, dtype, minval, maxval):
        return LeafSpec("uniform", _draw_offset(self.ss, self.pool_vals),
                        (maxval - minval) * 0.5, (maxval + minval) * 0.5,
                        tuple(shape), np.dtype(dtype).name)

    def normal(self, shape, dtype, scale: float = 1.0):
        return LeafSpec("normal", _draw_offset(self.ss, self.pool_vals),
                        scale, 0.0, tuple(shape), np.dtype(dtype).name)


def spec_key(seed: int = 0, pool_vals: int = _DEVICE_POOL_VALS) -> SpecKey:
    return SpecKey(seed, pool_vals)


def _map_specs(tree, fn):
    """Map fn over LeafSpec leaves; everything else passes through."""
    if isinstance(tree, LeafSpec):
        return fn(tree)
    if isinstance(tree, dict):
        return {k: _map_specs(v, fn) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_map_specs(v, fn) for v in tree)
    return tree


def device_expand(spec_tree, key: SpecKey, device=None):
    """Materialise a SpecKey-built tree on the device.

    Uploads the (small) entropy pools and runs ONE jitted expansion
    program: per leaf a static pool slice (tiled when the leaf wraps),
    an affine scale, a cast, a reshape. Measured on the tunneled v5e:
    ~4s XLA codegen for a never-cached program + ~1.2s pool upload +
    <1s execute — vs ~40s to upload the finished 2.1GB tree (BENCHLOG
    r4). Bit-identical to HostKey generation with the same seed and
    pool_vals (oracle: tests/test_models.py)."""
    import jax.numpy as jnp

    p = key.pool_vals
    kinds = set()
    _map_specs(spec_tree, lambda s: kinds.add(s.kind))
    pools = {k: _make_pool(key.root_entropy, k, p) for k in sorted(kinds)}

    def expand(pools):
        def leaf(s: LeafSpec):
            n = int(np.prod(s.shape)) if s.shape else 1
            pool = pools[s.kind]
            if s.offset + n <= p:
                x = jax.lax.slice(pool, (s.offset,), (s.offset + n,))
            else:  # wraps: tile then slice (XLA folds this to gathers)
                reps = (s.offset + n + p - 1) // p
                x = jax.lax.slice(jnp.tile(pool, reps), (s.offset,),
                                  (s.offset + n,))
            x = x * np.float32(s.scale)
            if s.shift:
                x = x + np.float32(s.shift)
            return x.astype(np.dtype(s.dtype)).reshape(s.shape)

        return _map_specs(spec_tree, leaf)

    with jax.default_device(device) if device is not None else _nullcontext():
        pools_dev = jax.device_put(pools, device)
        return jax.jit(expand)(pools_dev)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


_malloc_tuned = False


def _tune_malloc():
    """Raise glibc's M_MMAP_THRESHOLD so multi-MB leaf buffers come from
    the heap and freed pages are REUSED across leaves. Default glibc
    mmap/munmaps each large leaf, and this VM populates brand-new
    anonymous pages at ~0.1GB/s (measured, BENCHLOG r4) — reuse is the
    difference between ~5s and ~15s for a full-tree host init."""
    global _malloc_tuned
    if _malloc_tuned:
        return
    _malloc_tuned = True
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(128 * 1024 * 1024))
    except Exception:
        pass


def host_key(seed: int = 0, pool_vals: int = _DEFAULT_POOL_VALS,
             device=None) -> HostKey:
    """device: stream every generated leaf to this jax device immediately
    (see HostKey.__init__); None keeps leaves as host numpy arrays."""
    if pool_vals:
        _tune_malloc()
    return HostKey(seed, pool_vals, device)


def _cast(x: np.ndarray, dtype):
    return x if np.dtype(dtype) == x.dtype else x.astype(np.dtype(dtype))


def split(key, num: int = 2):
    if isinstance(key, (HostKey, SpecKey)):
        return key.split(num)
    return jax.random.split(key, num)


def uniform(key, shape, dtype=np.float32, minval=0.0, maxval=1.0):
    if isinstance(key, (HostKey, SpecKey)):
        return key.uniform(shape, dtype, minval, maxval)
    return jax.random.uniform(key, shape, dtype, minval, maxval)


def normal(key, shape, dtype=np.float32, scale: float = 1.0):
    """scale folds a std multiplier into the generation pass (host path)
    instead of a separate elementwise op on the returned array — in
    streaming/spec mode the return value is not a plain numpy array."""
    if isinstance(key, (HostKey, SpecKey)):
        return key.normal(shape, dtype, scale)
    x = jax.random.normal(key, shape, dtype)
    return x * scale if scale != 1.0 else x
