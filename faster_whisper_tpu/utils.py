"""Model registry, download helpers, logging and misc utilities.

TPU-native re-implementation of the reference's model-hub layer
(reference: faster_whisper/utils.py:11-152).  The registry maps both the
CTranslate2 conversions used by the reference and the original OpenAI/HF
checkpoints (we can load either format; see models/load.py).
"""

import logging
import os
import re

from typing import List, Optional, Union

# Name -> HF repo of the CTranslate2 conversion (same registry the reference
# uses, reference: faster_whisper/utils.py:11-31).
_MODELS = {
    "tiny.en": "Systran/faster-whisper-tiny.en",
    "tiny": "Systran/faster-whisper-tiny",
    "base.en": "Systran/faster-whisper-base.en",
    "base": "Systran/faster-whisper-base",
    "small.en": "Systran/faster-whisper-small.en",
    "small": "Systran/faster-whisper-small",
    "medium.en": "Systran/faster-whisper-medium.en",
    "medium": "Systran/faster-whisper-medium",
    "large-v1": "Systran/faster-whisper-large-v1",
    "large-v2": "Systran/faster-whisper-large-v2",
    "large-v3": "Systran/faster-whisper-large-v3",
    "large": "Systran/faster-whisper-large-v3",
    "distil-large-v2": "Systran/faster-distil-whisper-large-v2",
    "distil-medium.en": "Systran/faster-distil-whisper-medium.en",
    "distil-small.en": "Systran/faster-distil-whisper-small.en",
    "distil-large-v3": "Systran/faster-distil-whisper-large-v3",
    "distil-large-v3.5": "distil-whisper/distil-large-v3.5-ct2",
    "large-v3-turbo": "mobiuslabsgmbh/faster-whisper-large-v3-turbo",
    "turbo": "mobiuslabsgmbh/faster-whisper-large-v3-turbo",
}

# Name -> HF repo of the original (safetensors) checkpoint; used as an
# alternate weight source since we can load HF-format Whisper directly.
_HF_MODELS = {
    "tiny.en": "openai/whisper-tiny.en",
    "tiny": "openai/whisper-tiny",
    "base.en": "openai/whisper-base.en",
    "base": "openai/whisper-base",
    "small.en": "openai/whisper-small.en",
    "small": "openai/whisper-small",
    "medium.en": "openai/whisper-medium.en",
    "medium": "openai/whisper-medium",
    "large-v1": "openai/whisper-large-v1",
    "large-v2": "openai/whisper-large-v2",
    "large-v3": "openai/whisper-large-v3",
    "large": "openai/whisper-large-v3",
    "distil-large-v2": "distil-whisper/distil-large-v2",
    "distil-medium.en": "distil-whisper/distil-medium.en",
    "distil-small.en": "distil-whisper/distil-small.en",
    "distil-large-v3": "distil-whisper/distil-large-v3",
    "distil-large-v3.5": "distil-whisper/distil-large-v3.5",
    "large-v3-turbo": "openai/whisper-large-v3-turbo",
    "turbo": "openai/whisper-large-v3-turbo",
}


def available_models() -> List[str]:
    """Returns the names of available models (reference: utils.py:34-36)."""
    return list(_MODELS.keys())


def get_assets_path():
    """Returns the path to the assets directory."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def get_logger():
    """Returns the module logger."""
    return logging.getLogger("faster_whisper_tpu")


_phase_t0 = None


class phase_timer:
    """Stamped phase logging for cold-start diagnosis, enabled with
    FWT_PHASE_LOG=1 (bench.py turns it on for the warmup calls).  Each
    ``with phase_timer("vad"):`` block prints one line to stderr when it
    closes: elapsed seconds plus the absolute offset since the first
    phase — so a driver-killed run still shows where the time went
    (round 4's 1002 s warmup was opaque for exactly this reason)."""

    __slots__ = ("name", "t0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        import time

        global _phase_t0
        self.t0 = time.perf_counter()
        if _phase_t0 is None:
            _phase_t0 = self.t0
        return self

    def __exit__(self, *exc):
        if os.environ.get("FWT_PHASE_LOG", "0") == "0":
            return False
        import sys
        import time

        t1 = time.perf_counter()
        print(
            f"# phase {self.name}: {t1 - self.t0:.2f}s"
            f" (at +{t1 - _phase_t0:.1f}s)",
            file=sys.stderr,
            flush=True,
        )
        return False


_compilation_cache_enabled = False


# Mosaic (Pallas) kernel compilation needs the accelerator type; some
# tunneled TPU environments (axon relay) only export the generation name.
_TPU_GEN_TYPES = {
    "v4": "v4-8",
    "v5e": "v5litepod-1",
    "v5p": "v5p-8",
    "v6e": "v6e-1",
}


def ensure_tpu_accelerator_type(argv=None):
    """Set TPU_ACCELERATOR_TYPE from PALLAS_AXON_TPU_GEN, re-exec'ing the
    current process when needed so the variable is visible from
    interpreter start (the axon remote-compile relay captures the env at
    boot, before any script code runs).  No-op when already set, when no
    generation hint exists, or after the one re-exec.  Benchmarks and
    bench.py call this first; the in-process fallback in
    enable_compilation_cache covers library users."""
    import sys

    gen = os.environ.get("PALLAS_AXON_TPU_GEN")
    if (
        not gen
        or "TPU_ACCELERATOR_TYPE" in os.environ
        or os.environ.get("_FWT_REEXEC") == "1"
    ):
        return
    os.environ["TPU_ACCELERATOR_TYPE"] = _TPU_GEN_TYPES.get(gen, gen)
    os.environ["_FWT_REEXEC"] = "1"
    if argv is None:
        # ``python -m pkg.mod`` rewrites sys.argv[0] to the module's file
        # path; re-exec'ing that path directly would put the package dir
        # (not the cwd) at sys.path[0] and break package imports — keep
        # the -m form instead.
        import __main__

        spec = getattr(__main__, "__spec__", None)
        if spec is not None and spec.name:
            argv = ["-m", spec.name] + sys.argv[1:]
        else:
            argv = sys.argv
    os.execv(sys.executable, [sys.executable] + list(argv))


def _seed_cache_from_artifacts(cache_dir: str) -> int:
    """Copy repo-shipped precompiled-program artifacts into the live
    compilation cache (fresh-machine cold-start aid: a cache entry loads
    in ~2 s where a cold compile takes 5-700 s through the remote-compile
    relay).  Artifacts live in ``artifacts/xla_cache/`` next to the
    package as zstd/gzip-compressed cache entries named exactly like the
    uncompressed keys.  A stale artifact (key mismatch after a
    jaxlib/backend change) is simply never looked up — worst case is
    wasted disk, never wrong results (the key covers program + versions).
    Returns the number of entries seeded."""
    art_dir = os.environ.get(
        "FWT_CACHE_ARTIFACTS",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "artifacts", "xla_cache"),
    )
    if not os.path.isdir(art_dir):
        return 0
    import gzip
    import shutil

    n = 0
    for name in os.listdir(art_dir):
        src = os.path.join(art_dir, name)
        opener, dst_name = open, name
        if name.endswith(".gz"):
            opener, dst_name = gzip.open, name[:-3]
        if not dst_name.endswith("-cache"):
            continue
        dst = os.path.join(cache_dir, dst_name)
        if os.path.exists(dst):
            continue
        try:
            with opener(src, "rb") as f_in, open(dst + ".tmp", "wb") as f_out:
                shutil.copyfileobj(f_in, f_out)
            os.replace(dst + ".tmp", dst)
            n += 1
        except OSError:  # read-only cache dir, torn artifact, ...
            continue
    return n


def enable_compilation_cache(path: Optional[str] = None):
    """Enable JAX's persistent compilation cache so the handful of programs
    this library compiles (mel, VAD, encode, prefill, decode-loop per
    bucket) survive process restarts.  Safe to call repeatedly."""
    global _compilation_cache_enabled
    if _compilation_cache_enabled:
        return
    import jax

    # In-process fallback of ensure_tpu_accelerator_type (no re-exec:
    # library users may hold state; Mosaic reads this lazily at kernel
    # compile time so an in-process set usually suffices).
    if "TPU_ACCELERATOR_TYPE" not in os.environ:
        gen = os.environ.get("PALLAS_AXON_TPU_GEN")
        if gen:
            os.environ["TPU_ACCELERATOR_TYPE"] = _TPU_GEN_TYPES.get(gen, gen)

    if path is None:
        path = os.environ.get(
            "FWT_COMPILE_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "faster_whisper_tpu", "xla"
            ),
        )
    if path in ("0", "off", "disabled"):
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # By default jax points XLA's per-fusion autotune cache INTO the
    # compilation-cache dir, which bakes the cache-dir *path* into
    # compile_options and therefore into every cache key — two machines
    # (or two dirs) never share entries.  The autotune cache is a GPU
    # feature (dead weight on TPU): disable it so keys are
    # path-independent and baked cache artifacts are portable.  (The
    # option does not exist on older jax: degrade to path-dependent
    # keys rather than failing model construction.)
    if hasattr(jax.config, "jax_persistent_cache_enable_xla_caches"):
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    _seed_cache_from_artifacts(path)
    # Tests override the floor to 0 so even sub-second (CPU tiny-model)
    # programs land in the cache and zero-new-compiles can be asserted.
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ.get("FWT_CACHE_MIN_COMPILE_SECS", "1.0")),
    )
    _compilation_cache_enabled = True


def download_model(
    size_or_id: str,
    output_dir: Optional[str] = None,
    local_files_only: bool = False,
    cache_dir: Optional[str] = None,
    revision: Optional[str] = None,
    use_auth_token: Optional[Union[str, bool]] = None,
):
    """Downloads a Whisper model from the Hugging Face Hub.

    Accepts the same sizes / repo ids as the reference
    (reference: faster_whisper/utils.py:49-116).  Downloads the CTranslate2
    conversion (config.json / preprocessor_config.json / model.bin /
    tokenizer.json / vocabulary.*), which models/load.py can read directly.

    Returns the path to the downloaded model directory.
    """
    if re.match(r".*/.*", size_or_id):
        repo_id = size_or_id
    else:
        repo_id = _MODELS.get(size_or_id)
        if repo_id is None:
            raise ValueError(
                "Invalid model size '%s', expected one of: %s"
                % (size_or_id, ", ".join(_MODELS.keys()))
            )

    import huggingface_hub

    allow_patterns = [
        "config.json",
        "preprocessor_config.json",
        "model.bin",
        "model.safetensors",
        "model*.safetensors",
        "tokenizer.json",
        "vocabulary.*",
    ]

    kwargs = {
        "local_files_only": local_files_only,
        "allow_patterns": allow_patterns,
        "revision": revision,
        # silent downloads, as the reference does (utils.py:102)
        "tqdm_class": _make_disabled_tqdm(),
    }

    if output_dir is not None:
        kwargs["local_dir"] = output_dir

    if cache_dir is not None:
        kwargs["cache_dir"] = cache_dir

    if use_auth_token is not None:
        kwargs["token"] = use_auth_token

    return huggingface_hub.snapshot_download(repo_id, **kwargs)


def format_timestamp(
    seconds: float,
    always_include_hours: bool = False,
    decimal_marker: str = ".",
) -> str:
    """Format seconds as [HH:]MM:SS.mmm (reference: utils.py:119-139)."""
    assert seconds >= 0, "non-negative timestamp expected"
    milliseconds = round(seconds * 1000.0)

    hours, milliseconds = divmod(milliseconds, 3_600_000)
    minutes, milliseconds = divmod(milliseconds, 60_000)
    seconds, milliseconds = divmod(milliseconds, 1_000)

    hours_marker = f"{hours:02d}:" if always_include_hours or hours > 0 else ""
    return (
        f"{hours_marker}{minutes:02d}:{seconds:02d}{decimal_marker}{milliseconds:03d}"
    )


def _make_disabled_tqdm():
    from tqdm.auto import tqdm

    class disabled_tqdm(tqdm):
        """A tqdm that never renders — handed to huggingface_hub so model
        downloads stay silent unless the caller opts into progress
        (reference: utils.py:142-145)."""

        def __init__(self, *args, **kwargs):
            kwargs["disable"] = True
            super().__init__(*args, **kwargs)

    return disabled_tqdm


def __getattr__(name):
    # lazily constructed so importing utils never pulls tqdm eagerly
    if name == "disabled_tqdm":
        return _make_disabled_tqdm()
    raise AttributeError(name)


def get_end(segments: List[dict]) -> Optional[float]:
    """End time of the last word (or segment) in a segment list
    (reference: utils.py:148-152)."""
    return next(
        (w["end"] for s in reversed(segments) for w in reversed(s["words"])),
        segments[-1]["end"] if segments else None,
    )
