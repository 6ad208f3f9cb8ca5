"""Oracle tests for models/rng.py — the host/device-polymorphic init RNG.

The load-bearing claims (rng.py module docstring, wired into bench.py and
__graft_entry__.py for zero-remote-compile init):
  1. the three key types build STRUCTURALLY IDENTICAL trees (same paths,
     shapes, dtypes) through the unmodified init_* code;
  2. `device_expand(SpecKey tree)` is BIT-IDENTICAL to the HostKey tree
     for the same seed + pool_vals (the device expansion is just a
     different executor for the same draws);
  3. pool-mode marginals are correct (uniform bounds/mean, normal std);
  4. pool_vals=0 falls back to full-entropy per-leaf draws.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import SD_TINY
from sdtpu.models import rng
from sdtpu.models.clip import init_clip
from sdtpu.models.unet import init_unet
from sdtpu.models.vae import init_autoencoder

POOL = 1 << 16  # small pool: exercises offset wrapping on larger leaves


def _leaves_with_paths(tree):
    return jax.tree_util.tree_flatten_with_path(tree)[0]


def _full_tree(key, dtype=jnp.float32):
    k1, k2, k3 = rng.split(key, 3)
    return {
        "clip": init_clip(k1, SD_TINY.clip, dtype=dtype),
        "unet": init_unet(k2, SD_TINY.unet, dtype=dtype),
        "autoencoder": init_autoencoder(k3, SD_TINY.vae, dtype=dtype),
    }


def test_host_tree_matches_jax_tree_structure():
    host = _full_tree(rng.host_key(0))
    dev = _full_tree(jax.random.PRNGKey(0))
    ph = _leaves_with_paths(host)
    pd = _leaves_with_paths(dev)
    assert len(ph) == len(pd)
    for (path_h, leaf_h), (path_d, leaf_d) in zip(ph, pd):
        assert path_h == path_d
        assert leaf_h.shape == leaf_d.shape, path_h
        assert np.dtype(leaf_h.dtype) == np.dtype(leaf_d.dtype), path_h


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_device_expand_bit_identical_to_host(dtype):
    """SpecKey + device_expand reproduces the HostKey tree bit-for-bit:
    same pools, same key-derived offsets, same affine+cast rounding."""
    host = _full_tree(rng.host_key(0, pool_vals=POOL), dtype=dtype)
    spec = _full_tree(rng.spec_key(0, pool_vals=POOL), dtype=dtype)
    expanded = rng.device_expand(spec, rng.spec_key(0, pool_vals=POOL))
    for (path_h, h), (path_e, e) in zip(
            _leaves_with_paths(host), _leaves_with_paths(expanded)):
        assert path_h == path_e
        he = np.asarray(h)
        ee = np.asarray(e)
        assert he.dtype == ee.dtype, path_h
        assert (he.view(np.uint8) == ee.view(np.uint8)).all(), path_h


def test_host_key_deterministic_and_seed_sensitive():
    a = _full_tree(rng.host_key(7, pool_vals=POOL))
    b = _full_tree(rng.host_key(7, pool_vals=POOL))
    c = _full_tree(rng.host_key(8, pool_vals=POOL))
    la, lb, lc = (jax.tree_util.tree_leaves(t) for t in (a, b, c))
    assert all((x == y).all() for x, y in zip(la, lb))
    assert any(not (x == y).all() for x, y in zip(la, lc))


def test_pool_uniform_marginals():
    k = rng.host_key(3, pool_vals=POOL)
    x = k.uniform((200_000,), np.float32, -0.25, 0.25)
    assert x.min() >= -0.25 and x.max() < 0.25
    assert abs(x.mean()) < 5e-3
    # asymmetric bounds exercise the shift path (f32 affine, one cast)
    y = k.split(2)[0].uniform((100_000,), jnp.bfloat16, 0.0, 1.0)
    assert y.dtype == np.dtype(jnp.bfloat16)  # no silent f32 promotion
    yf = y.astype(np.float32)
    assert yf.min() >= 0.0 and yf.max() <= 1.0 and abs(yf.mean() - 0.5) < 5e-3


def test_pool_normal_marginals():
    k = rng.host_key(4, pool_vals=POOL)
    x = k.normal((200_000,), np.float32, scale=0.02)
    assert abs(float(x.std()) - 0.02) < 1e-3
    assert abs(float(x.mean())) < 1e-3


def test_full_entropy_fallback():
    """pool_vals=0: independent per-leaf draws (no shared pool)."""
    k = rng.host_key(5, pool_vals=0)
    k1, k2 = k.split(2)
    a = k1.normal((4096,), np.float32)
    b = k2.normal((4096,), np.float32)
    assert not (a == b).any()
    u = k1.uniform((4096,), np.float32, -0.1, 0.1)
    assert u.min() >= -0.1 and u.max() < 0.1


def test_wrapping_leaf_covers_pool_seam():
    """A leaf larger than the pool wraps: every value still comes from
    the pool, in order, from the key-derived offset."""
    k = rng.host_key(6, pool_vals=1024)
    x = k.normal((5000,), np.float32)  # ~5x the pool size
    pool = k._pool("normal")
    off = rng._draw_offset(k.ss, 1024)
    want = np.concatenate([pool[off:], np.tile(pool, 5)])[:5000]
    np.testing.assert_array_equal(np.asarray(x), want)


def test_streaming_device_put():
    """HostKey(device=...) returns committed jax arrays per leaf."""
    dev = jax.devices()[0]
    k = rng.host_key(0, pool_vals=POOL, device=dev)
    x = k.normal((128,), np.float32)
    assert isinstance(x, jax.Array)
    assert x.devices() == {dev}
