"""Oracle tests for the fused GEGLU-MLP sublayer kernel (interpret mode,
CPU) against the unfused op composition used by sdtpu/models/unet.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.ops.activations import geglu
from sdtpu.ops.conv import linear
from sdtpu.ops.fused_mlp import fused_geglu_mlp
from sdtpu.ops.groupnorm import layer_norm


def _unfused(x, g, b, wp, bp, wl, bl, eps=1e-5):
    hn = layer_norm(x, g, b, eps)
    proj = linear({"w": wp, "b": bp}, hn)
    val, gate = jnp.split(proj, 2, axis=-1)
    return x + linear({"w": wl, "b": bl}, geglu(val, gate))


def _make(key, b, s, c, dtype):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (b, s, c), dtype)
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), dtype)
    bb = 0.1 * jax.random.normal(ks[2], (c,), dtype)
    wp = c ** -0.5 * jax.random.normal(ks[3], (c, 8 * c), dtype)
    bp = 0.1 * jax.random.normal(ks[4], (8 * c,), dtype)
    wl = (4 * c) ** -0.5 * jax.random.normal(ks[5], (4 * c, c), dtype)
    bl = 0.1 * jax.random.normal(ks[6], (c,), dtype)
    return x, g, bb, wp, bp, wl, bl


@pytest.mark.parametrize("b,s,c,block_rows", [
    (2, 256, 32, 128),   # multiple row blocks
    (1, 64, 64, 128),    # single block, clamps to s
])
def test_fused_mlp_matches_unfused_f32(b, s, c, block_rows):
    args = _make(jax.random.PRNGKey(0), b, s, c, jnp.float32)
    want = _unfused(*args)
    got = fused_geglu_mlp(*args, block_rows=block_rows, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_matches_unfused_bf16():
    args = _make(jax.random.PRNGKey(1), 2, 128, 32, jnp.bfloat16)
    want = _unfused(*args).astype(jnp.float32)
    got = fused_geglu_mlp(*args, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)
