"""Fused GroupNorm+SiLU Pallas kernel vs the reference-formula op
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdtpu.ops import group_norm, silu
from sdtpu.ops.fused_groupnorm import group_norm_silu

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 64), 32),
    ((1, 16, 16, 128), 32),
    ((2, 7, 9, 40), 8),   # odd spatial, rows not a power of two
])
def test_fused_matches_reference(shape, groups):
    x = jnp.asarray(RNG.standard_normal(shape), jnp.float32)
    g = jnp.asarray(RNG.standard_normal(shape[-1]), jnp.float32)
    b = jnp.asarray(RNG.standard_normal(shape[-1]), jnp.float32)
    want = silu(group_norm(x, g, b, groups, 1e-5))
    got = group_norm_silu(x, g, b, groups, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_no_silu_bf16():
    x = jnp.asarray(RNG.standard_normal((2, 8, 8, 64)), jnp.bfloat16)
    g = jnp.ones(64, jnp.bfloat16)
    b = jnp.zeros(64, jnp.bfloat16)
    want = group_norm(x, g, b, 32, 1e-5)
    got = group_norm_silu(x, g, b, 32, 1e-5, silu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=3e-2)
