"""The precompile tool must cover every program production can hit.

Round-3 verdict item: the fallback ladder cost ~90 s of first-touch JIT
because `precompile --sequential` compiled rung programs with
non-production arguments (empty suppress set, one prompt bucket) that the
persistent-cache key never matched.  This test pins the contract with the
real mechanism: process A runs the tool against a fresh cache dir, process
B runs production `transcribe` with the FULL temperature ladder forced to
fire on every window (log_prob_threshold=100 rejects every rung) plus the
batched pipeline, and asserts the cache gained ZERO entries — i.e. every
program B needed was already compiled by A.

Runs hermetically on CPU with the test-micro model; the cache write floor
is forced to 0 s so even sub-second programs are recorded (production
floor is 1 s, utils.enable_compilation_cache).
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_B_SCRIPT = """
import os, sys
sys.path.insert(0, {root!r})
from faster_whisper_tpu.precompile import build_model, synthetic_speech
import argparse
args = argparse.Namespace(model="test-micro", compute_type="int8",
                          random_weights=True)
model = build_model(args)
audio = synthetic_speech((2 * 2 + 3) * 18.0)

# sequential, full ladder, every rung forced to fire on every window
segs, _ = model.transcribe(
    audio[: 16000 * 95],
    language="en",
    beam_size=2,
    best_of=2,
    max_new_tokens=16,
    temperature=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
    condition_on_previous_text=True,
    log_prob_threshold=100.0,  # unsatisfiable: rejects every rung
)
n_seq = sum(1 for _ in segs)

# batched pipeline at the tool's shapes
from faster_whisper_tpu.transcribe import BatchedInferencePipeline
segs, _ = BatchedInferencePipeline(model).transcribe(
    audio,
    language="en",
    beam_size=2,
    batch_size=2,
    max_new_tokens=16,
    temperature=[0.0],
)
n_bat = sum(1 for _ in segs)
print(f"B_DONE seq={{n_seq}} bat={{n_bat}}")
"""


def _count(cache_dir):
    return sum(len(fs) for _, _, fs in os.walk(cache_dir))


def test_precompile_covers_full_ladder(tmp_path):
    cache_dir = str(tmp_path / "xla-cache")
    env = dict(os.environ)
    for key in list(env):
        if key.startswith(("PALLAS_AXON", "AXON_", "TPU_", "LIBTPU")):
            del env[key]
    env["JAX_PLATFORMS"] = "cpu"
    env["FWT_COMPILE_CACHE"] = cache_dir
    env["FWT_CACHE_MIN_COMPILE_SECS"] = "0"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")

    # A: the tool
    proc = subprocess.run(
        [
            sys.executable, "-m", "faster_whisper_tpu.precompile",
            "--model", "test-micro", "--random-weights", "--sequential",
            "--compute-type", "int8", "--batch-size", "2",
            "--beam-size", "2", "--best-of", "2",
            "--max-new-tokens", "16", "--language", "en",
        ],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    n_after_tool = _count(cache_dir)
    assert n_after_tool > 0, "precompile cached nothing"

    # B: production paths, full ladder forced
    proc = subprocess.run(
        [sys.executable, "-c", _B_SCRIPT.format(root=ROOT)],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "B_DONE" in proc.stdout

    new_entries = _count(cache_dir) - n_after_tool
    assert new_entries == 0, (
        f"production transcribe compiled {new_entries} program(s) the "
        f"precompile tool missed (cache {cache_dir})"
    )
