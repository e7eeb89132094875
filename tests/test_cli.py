"""CLI surface: python -m faster_whisper_tpu."""

import json
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    import wave

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000 * 2) * 3000).astype(np.int16)
    path = tmp_path_factory.mktemp("cli") / "a.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return str(path)


def _run_cli(monkeypatch, wav_file, *extra):
    """Run main() in-process with the tiny random model patched in."""
    from faster_whisper_tpu import __main__ as cli
    from faster_whisper_tpu.testing import build_test_model

    monkeypatch.setattr(
        "faster_whisper_tpu.WhisperModel",
        lambda *a, **k: build_test_model(),
    )
    import io

    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    cli.main([wav_file, "--language", "en", "--beam-size", "1",
              "--no-vad", "--batch-size", "2", "--temperature", "0",
              *extra])
    return out.getvalue()


def test_cli_srt(monkeypatch, wav_file):
    out = _run_cli(monkeypatch, wav_file, "--output-format", "srt")
    assert "-->" in out and out.strip().split("\n")[0] == "1"


def test_cli_json(monkeypatch, wav_file):
    out = _run_cli(monkeypatch, wav_file, "--output-format", "json")
    data = json.loads(out)
    assert "segments" in data
    for seg in data["segments"]:
        assert seg["end"] >= seg["start"]


def test_cli_vtt_header(monkeypatch, wav_file):
    out = _run_cli(monkeypatch, wav_file, "--output-format", "vtt")
    assert out.startswith("WEBVTT")


def test_cli_help_runs():
    r = subprocess.run(
        [sys.executable, "-m", "faster_whisper_tpu", "--help"],
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PALLAS_AXON_POOL_IPS": ""},
        timeout=120,
    )
    assert r.returncode == 0 and "transcribe" in r.stdout


def test_cli_no_vad_long_audio(monkeypatch, tmp_path):
    """--no-vad must not hit the batched pipeline's no-clips RuntimeError
    on audio longer than one 30 s window (routes sequentially)."""
    import wave

    rng = np.random.default_rng(2)
    pcm = (rng.standard_normal(16000 * 35) * 3000).astype(np.int16)
    path = tmp_path / "long.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    out = _run_cli(monkeypatch, str(path))  # _run_cli passes --no-vad
    assert isinstance(out, str)


def test_cli_output_dir(monkeypatch, wav_file, tmp_path):
    from faster_whisper_tpu import __main__ as cli
    from faster_whisper_tpu.testing import build_test_model

    monkeypatch.setattr(
        "faster_whisper_tpu.WhisperModel", lambda *a, **k: build_test_model()
    )
    out_dir = tmp_path / "out"
    cli.main([wav_file, "--language", "en", "--beam-size", "1", "--no-vad",
              "--temperature", "0",
              "--output-format", "srt", "--output-dir", str(out_dir)])
    files = list(out_dir.glob("*.srt"))
    assert len(files) == 1 and "-->" in files[0].read_text()


def test_validate_gate_mock_mode(capsys):
    """The real-weights acceptance gate command must run end-to-end in
    --mock mode: every golden check executes its path over a random-weight
    model (structural invariants), WER skips without a dataset, and the
    summary JSON reports zero failures."""
    from faster_whisper_tpu import validate

    # A cheap subset keeps the suite fast (the full mock gate compiles
    # every pipeline variant, ~7 min on the CPU mesh); the command itself
    # defaults to all checks.
    rc = validate.main(
        ["--mock", "--checks",
         "jfk sequential + words,jfk batched,hotwords,librispeech wer"]
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert rc == 0, summary
    assert summary["fail"] == 0
    assert summary["pass"] == 3
    assert summary["skip"] == 1  # WER skips without a dataset
    assert summary["mode"] == "mock"


def test_precompile_smoke_mock(capsys):
    """precompile must run its batched warm-up end-to-end on a random
    tiny-test model and report the phase timings."""
    from faster_whisper_tpu import precompile
    from faster_whisper_tpu.testing import build_test_model

    import faster_whisper_tpu.precompile as pc

    orig = pc.build_model
    pc.build_model = lambda args: build_test_model()
    try:
        rc = precompile.main(
            ["--model", "tiny-test", "--random-weights",
             "--compute-type", "default", "--batch-size", "2",
             "--beam-size", "1", "--max-new-tokens", "8",
             "--language", "en"]
        )
    finally:
        pc.build_model = orig
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert rc == 0
    assert "batched pipeline (beam)" in report["phases"]
