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


def test_online_block_pick():
    """Large-S q-block override (benchmarks/attn65536_ext.py): callers on
    the defaults get bq=4096 at >=32768 tokens with small head dims; the
    VAE-mid d=512 shape and explicit caller choices are untouched."""
    from sdtpu.ops.flash_attention import _pick_online_blocks

    # 2048px UNet self-attention: override fires
    assert _pick_online_blocks(512, 1024, 65536, 65536, 40) == (4096, 1024)
    assert _pick_online_blocks(512, 1024, 32768, 32768, 64) == (4096, 1024)
    # VAE mid attention d=512: measured best at the default
    assert _pick_online_blocks(512, 1024, 65536, 65536, 512) == (512, 1024)
    # 16K regime: below the override floor (single-k path owns it anyway)
    assert _pick_online_blocks(512, 1024, 16384, 16384, 40) == (512, 1024)
    # explicit caller choice always wins
    assert _pick_online_blocks(2048, 2048, 65536, 65536, 40) == (2048, 2048)
    # non-4096-divisible sq cannot take the override
    assert _pick_online_blocks(512, 1024, 34816, 34816, 40) == (512, 1024)


def test_force_xla_differentiable_carveout(monkeypatch):
    """force_xla pins everything; allow_differentiable=True re-admits
    only the custom-VJP gates (use_pallas_differentiable)."""
    monkeypatch.setattr(dispatch, "_use_pallas_cached", lambda: True)
    assert dispatch.use_pallas() and dispatch.use_pallas_differentiable()
    with dispatch.force_xla():
        assert not dispatch.use_pallas()
        assert not dispatch.use_pallas_differentiable()
    with dispatch.force_xla(allow_differentiable=True):
        assert not dispatch.use_pallas()
        assert dispatch.use_pallas_differentiable()
        with dispatch.force_xla():  # nested stricter context wins
            assert not dispatch.use_pallas()
            # a plain force_xla nested inside still leaves the diff
            # carve-out of the OUTER context active by design: the
            # carve-out is only ever entered by the training loss
            assert dispatch.use_pallas_differentiable()
