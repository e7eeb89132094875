"""precompile.warm_parallel must cover the batched pipeline's big programs.

Round-5 cold-start contract (the round-4 driver bench paid a 1002 s
serial cold warmup): after warm_parallel runs against a fresh cache,
a production batched transcribe may compile NO new decode/encode/mel/VAD
programs — the shape bucketing (audio length, VAD windows, pow2 batch
axis) makes the set enumerable, and the warm uses production-identical
static arguments.  Trivial sub-second eager ops (pads, concats, the
assemble scatter) are allowed to compile lazily; the beam program is the
one that costs 40-700 s cold through a remote-compile relay.

Also pins utils._seed_cache_from_artifacts: entries shipped in an
artifacts dir land in a fresh cache exactly once.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BIG = ("beam_search", "sample-", "jit_sample", "encode", "chunked_mel",
        "vad_forward", "vad_slice", "prefill", "quantize_params", "jit_init")

_A_SCRIPT = """
import os, sys
sys.path.insert(0, {root!r})
from faster_whisper_tpu.precompile import build_model, warm_parallel
import argparse
args = argparse.Namespace(model="test-micro", compute_type="int8",
                          random_weights=True)
model = build_model(args)
fails = warm_parallel(model, durations_s=(65.0,), batch_size=4,
                      beam_size=2, max_new_tokens=16, language="en")
assert not fails, fails
print("A_DONE")
"""

_B_SCRIPT = """
import os, sys
sys.path.insert(0, {root!r})
from faster_whisper_tpu.precompile import build_model, synthetic_speech
from faster_whisper_tpu.transcribe import BatchedInferencePipeline
import argparse
args = argparse.Namespace(model="test-micro", compute_type="int8",
                          random_weights=True)
model = build_model(args)
audio = synthetic_speech(65.0, seed=3)
segs, _ = BatchedInferencePipeline(model).transcribe(
    audio, language="en", beam_size=2, batch_size=4,
    max_new_tokens=16, temperature=[0.0],
)
print(f"B_DONE n={{sum(1 for _ in segs)}}")
"""


def _entries(cache_dir):
    out = []
    for root, _, files in os.walk(cache_dir):
        out.extend(files)
    return out


def _cpu_env(cache_dir):
    env = dict(os.environ)
    for key in list(env):
        if key.startswith(("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU")):
            del env[key]
    env["JAX_PLATFORMS"] = "cpu"
    env["FWT_COMPILE_CACHE"] = cache_dir
    env["FWT_CACHE_MIN_COMPILE_SECS"] = "0"
    env["FWT_CACHE_ARTIFACTS"] = "/nonexistent"  # isolate from repo artifacts
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_warm_parallel_covers_batched_pipeline(tmp_path):
    cache_dir = str(tmp_path / "xla-cache")
    env = _cpu_env(cache_dir)

    proc = subprocess.run(
        [sys.executable, "-c", _A_SCRIPT.format(root=ROOT)],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "A_DONE" in proc.stdout
    before = set(_entries(cache_dir))
    assert any("beam_search" in e for e in before), sorted(before)

    proc = subprocess.run(
        [sys.executable, "-c", _B_SCRIPT.format(root=ROOT)],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "B_DONE" in proc.stdout

    new = [e for e in set(_entries(cache_dir)) - before
           if any(tag in e for tag in _BIG)]
    assert not new, (
        f"production batched transcribe compiled big program(s) "
        f"warm_parallel missed: {new}"
    )


def test_seed_cache_from_artifacts(tmp_path):
    art = tmp_path / "artifacts"
    art.mkdir()
    (art / "jit_fake-abc123-cache").write_bytes(b"payload")
    (art / "not-a-cache-entry.txt").write_bytes(b"ignored")
    cache = tmp_path / "cache"
    cache.mkdir()

    os.environ["FWT_CACHE_ARTIFACTS"] = str(art)
    try:
        from faster_whisper_tpu.utils import _seed_cache_from_artifacts

        n = _seed_cache_from_artifacts(str(cache))
        assert n == 1
        assert (cache / "jit_fake-abc123-cache").read_bytes() == b"payload"
        # second call: already present, nothing re-copied
        assert _seed_cache_from_artifacts(str(cache)) == 0
    finally:
        del os.environ["FWT_CACHE_ARTIFACTS"]
