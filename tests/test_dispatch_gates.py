"""Kernel-dispatch gate boundaries (pure functions; use_pallas is
monkeypatched true so the shape logic is testable on CPU).

These pin the measured decisions in BENCHLOG.md — moving a boundary
without re-measuring should fail a test, not silently change perf
(or re-introduce the 2048px compile-time OOMs)."""

import sdtpu.ops.dispatch as dispatch
from sdtpu.models.unet import _use_fused_attn, _use_fused_resblock


def _force_pallas(monkeypatch):
    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)


def test_fused_attn_gate(monkeypatch):
    _force_pallas(monkeypatch)
    # 512px / 1024px UNet levels: fused
    assert _use_fused_attn(64 * 64, 320, 8)        # 512px level 0
    assert _use_fused_attn(32 * 32, 640, 8)
    assert _use_fused_attn(16 * 16, 1280, 8)
    assert _use_fused_attn(128 * 128, 320, 8)      # 1024px level 0
    assert _use_fused_attn(64 * 64, 640, 8)        # 1024px level 1
    # 2048px level 1 (S=16384, C=640): 136MB VMEM — must NOT be fused
    assert not _use_fused_attn(128 * 128, 640, 8)
    # 2048px level 0 (S=65536): beyond the kernel's S cap
    assert not _use_fused_attn(256 * 256, 320, 8)
    # odd head dims stay unfused (sublane granule)
    assert not _use_fused_attn(64 * 64, 300, 8)


def test_fused_resblock_gate(monkeypatch):
    _force_pallas(monkeypatch)
    import jax.numpy as jnp

    # XLA wins the 512px UNet maps (BENCHLOG re-measure post-restructure)
    assert not _use_fused_resblock(jnp.zeros((8, 64, 64, 320)))
    assert not _use_fused_resblock(jnp.zeros((8, 32, 32, 640)))
    # the fused chain takes the 1024px-class maps
    assert _use_fused_resblock(jnp.zeros((4, 128, 128, 320)))
    assert _use_fused_resblock(jnp.zeros((4, 256, 256, 320)))
