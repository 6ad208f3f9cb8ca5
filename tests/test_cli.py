"""CLI argument-surface tests (no model load): flag parsing must fail
with usage messages, never tracebacks (ADVICE r2: a value-taking flag as
the final argument used to raise IndexError)."""

import pytest

from sdtpu.cli import finetune_main, sample_main


@pytest.mark.parametrize("flag", ["--sampler", "--seed", "--batch",
                                  "--preset", "--negative", "--init-image",
                                  "--strength", "--mask", "--lora",
                                  "--concept"])
def test_value_flag_at_end_gives_usage_error(flag, capsys):
    with pytest.raises(SystemExit) as e:
        sample_main(["sample", "dump", "model", "7.5", "20", "p", "out", flag])
    assert e.value.code == 1
    assert f"{flag} requires a value" in capsys.readouterr().err


@pytest.mark.parametrize("flag", ["--steps", "--lr", "--state-dir", "--opt",
                                  "--ti", "--ti-vectors", "--ti-init",
                                  "--ti-lr"])
def test_finetune_value_flag_at_end_gives_usage_error(flag, capsys):
    with pytest.raises(SystemExit) as e:
        finetune_main(["finetune", "native", "m", "data", "out", flag])
    assert e.value.code == 1
    assert f"{flag} requires a value" in capsys.readouterr().err


def test_finetune_wrong_positional_count(capsys):
    with pytest.raises(SystemExit) as e:
        finetune_main(["finetune", "native", "m"])
    assert e.value.code == 1
    assert "Usage:" in capsys.readouterr().err


def test_finetune_bad_opt_value(capsys):
    with pytest.raises(SystemExit) as e:
        finetune_main(["finetune", "--opt", "lion", "native", "m", "d", "o"])
    assert e.value.code == 1
    assert "--opt must be" in capsys.readouterr().err


def test_bad_sampler_value(capsys):
    with pytest.raises(SystemExit) as e:
        sample_main(["sample", "--sampler", "plms", "dump", "model",
                     "7.5", "20", "p", "out"])
    assert e.value.code == 1
    assert "--sampler must be" in capsys.readouterr().err


def test_karras_requires_sigma_ladder_sampler(capsys):
    with pytest.raises(SystemExit) as e:
        sample_main(["sample", "--karras", "dump", "model",
                     "7.5", "20", "p", "out"])
    assert e.value.code == 1
    assert "--karras needs --sampler" in capsys.readouterr().err


def test_concept_rejects_img2img_before_load(capsys):
    """--concept + --init-image must fail in the argv-validation block
    (milliseconds), not after tokenizer/model load (ADVICE r3). A missing
    init-image FILE would raise FileNotFoundError later; getting the
    usage error proves we never reached any loading."""
    with pytest.raises(SystemExit) as e:
        sample_main(["sample", "--concept", "c.safetensors",
                     "--init-image", "missing.png", "dump", "model",
                     "7.5", "20", "p", "out"])
    assert e.value.code == 1
    assert "--concept is not supported with --init-image" \
        in capsys.readouterr().err


def test_wrong_positional_count(capsys):
    with pytest.raises(SystemExit) as e:
        sample_main(["sample", "dump", "model"])
    assert e.value.code == 1
    assert "Usage:" in capsys.readouterr().err


def test_bad_guidance_scale(capsys):
    with pytest.raises(SystemExit) as e:
        sample_main(["sample", "dump", "model", "abc", "20", "p", "out"])
    assert e.value.code == 1
    assert "Invalid unconditional guidance scale" in capsys.readouterr().err

def _run_finetune_capture(monkeypatch):
    """Stub model load / tokenizer / run_finetune; return the kwargs dict
    that finetune_main forwards to run_finetune."""
    import sdtpu.cli as cli
    import sdtpu.finetune as finetune
    import sdtpu.tokenizer as tokenizer

    captured = {}

    def fake_run(sd, tok, data, out_model, **kw):
        captured.update(kw)
        return {"final_loss": 0.0, "steps_per_sec": 0.0, "out_path": out_model}

    monkeypatch.setattr(cli, "load_model",
                        lambda *a, **k: object())
    monkeypatch.setattr(tokenizer, "SimpleTokenizer", lambda: object())
    monkeypatch.setattr(finetune, "run_finetune", fake_run)
    return captured


def test_finetune_fast_preset(monkeypatch):
    """--fast selects the measured winner (BENCHLOG r5): adafactor,
    batch 8, no remat."""
    captured = _run_finetune_capture(monkeypatch)
    finetune_main(["finetune", "--fast", "native", "m", "d", "o"])
    assert captured["opt_kind"] == "adafactor"
    assert captured["batch_size"] == 8
    assert captured["remat"] is False


def test_finetune_fast_explicit_flags_override(monkeypatch):
    """Explicit flags beat --fast regardless of position."""
    captured = _run_finetune_capture(monkeypatch)
    finetune_main(["finetune", "--batch", "4", "--fast", "--opt", "adamw",
                   "native", "m", "d", "o"])
    assert captured["opt_kind"] == "adamw"
    assert captured["batch_size"] == 4
    assert captured["remat"] is False
