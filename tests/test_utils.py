"""Profiling / debug utility coverage."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.utils import profiling
from sdtpu.utils.debug import assert_finite, shape_check


def test_phase_registry():
    profiling.REGISTRY.reset()
    with profiling.phase("a"):
        pass
    with profiling.phase("a"):
        pass
    with profiling.phase("b"):
        pass
    s = profiling.REGISTRY.summary()
    assert s["counts"] == {"a": 2, "b": 1}
    assert set(s["phases"]) == {"a", "b"}
    report = json.loads(profiling.REGISTRY.report({"extra": 1}))
    assert report["extra"] == 1
    profiling.REGISTRY.reset()


def test_assert_finite():
    assert_finite({"w": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError) as e:
        assert_finite({"w": jnp.asarray([1.0, np.nan])}, "bad")
    assert "bad" in str(e.value)


def test_shape_check():
    shape_check(jnp.zeros((2, 3)), (2, 3))
    shape_check(jnp.zeros((2, 3)), (None, 3))
    with pytest.raises(AssertionError):
        shape_check(jnp.zeros((2, 3)), (2, 4), "t")
