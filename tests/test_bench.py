"""bench.py harness smoke tests on the virtual 8-device CPU mesh: the
multi-chip dp path (BASELINE config 4) and the vs_baseline glob must work
without real TPU hardware."""

import json

import jax


def test_bench_dp_path(monkeypatch, capsys):
    import bench

    assert len(jax.devices()) >= 8  # conftest provisions the virtual mesh
    monkeypatch.setenv("SDTPU_BENCH_PRESET", "sd-tiny")
    monkeypatch.setenv("SDTPU_BENCH_BATCH", "8")
    monkeypatch.setenv("SDTPU_BENCH_STEPS", "2")
    monkeypatch.setenv("SDTPU_BENCH_ITERS", "1")
    # sd-tiny's 2-level VAE has vae_factor=2: the default 512px would be
    # a 256x256 latent (65536-token attention x batch 8 — OOM on CPU).
    # 64px -> 32x32 latent, the same cost the test always had.
    monkeypatch.setenv("SDTPU_BENCH_SIZE", "64")
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    assert rec["n_devices"] == len(jax.devices())
    assert "dp=" in rec["metric"]


def test_baseline_glob():
    """vs_baseline must read the driver's BENCH_r01.json wrapper format."""
    import bench

    val, fname = bench._baseline_value()
    # BENCH_r01.json is checked in by the driver; if present it must parse
    if fname is not None:
        assert val and val > 0
        assert fname.startswith("BENCH_r")
