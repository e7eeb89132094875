"""Voice activity detection: Silero VAD (JAX) + speech-chunk bookkeeping.

Same public surface and behavior as the reference's VAD layer
(reference: faster_whisper/vad.py:14-292): ``VadOptions``,
``get_speech_timestamps`` (the hysteresis state machine over per-window
speech probabilities), ``collect_chunks`` (packs speech into <=max_duration
buffers with offset/duration metadata) and ``SpeechTimestampsMap``
(VAD-compressed clock -> original clock).  The neural probability model
runs on TPU via models/silero.py instead of onnxruntime.

The state machine itself is branchy, cheap, host-side policy code — exactly
where the reference keeps it; only the probabilities come from the device.
"""

import bisect
import functools
import os

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from faster_whisper_tpu.utils import phase_timer


@dataclass
class VadOptions:
    """VAD options (semantics per reference: faster_whisper/vad.py:14-42).

    Attributes:
      threshold: Speech threshold; probabilities ABOVE it count as speech.
      neg_threshold: Silence re-entry threshold (defaults to threshold-0.15,
        floored at 0.01).
      min_speech_duration_ms: Chunks shorter than this are dropped.
      max_speech_duration_s: Longer chunks are split at the last >=98 ms
        silence, or aggressively just before the limit.
      min_silence_duration_ms: Silence to wait before closing a chunk.
      speech_pad_ms: Padding added on both sides of final chunks.
    """

    threshold: float = 0.5
    neg_threshold: float = None
    min_speech_duration_ms: int = 0
    max_speech_duration_s: float = float("inf")
    min_silence_duration_ms: int = 2000
    speech_pad_ms: int = 400


def upload_with_vad(audio: np.ndarray, return_audio: bool = True):
    """Pipelined shared PCM upload + Silero forward.

    Splits the host->device transfer into UPLOAD_BUCKET slices and runs
    the VAD forward on each slice as it lands (LSTM state + 64-sample
    context carried across slices, models/silero.py::_vad_slice_step),
    so VAD compute and the later slices' transfers overlap instead of
    serializing.

    OPT-IN (``FWT_PIPELINED_VAD=1``), default off: on the tunneled chip
    this measures SLOWER than the serial upload->forward prefix it
    replaces (min 1.59 vs 1.30 s, medians 2.48 vs 1.71 s per 13 minutes;
    benchmarks/profile_vad_pipeline.py) — each of the ~12 slice steps
    adds a dispatch round-trip, and the serial prefix's cost is mostly
    tunnel RTT/queue drain rather than the 45 ms device forward, so
    pipelining multiplies the dominant term instead of hiding the minor
    one.  Kept for direct-attached deployments where dispatch latency is
    microseconds and transfer/compute overlap is the real win.

    Returns ``(audio_dev, probs)``:
      * ``audio_dev`` — value-identical to ``ops.mel.upload_audio(audio)``
        (the f32 device PCM at the same int16 grid, zero-padded to the
        upload bucket), assembled on device by writing each dequantized
        slice through one traced-offset program; ``None`` when
        ``return_audio=False``.
      * ``probs`` — host ndarray of per-window speech probabilities
        covering at least ``len(audio)//512 + 1`` windows, bitwise equal
        to the whole-buffer forward's output (pinned by tests/test_vad.py);
        host-assembled because its only consumer is the host hysteresis
        state machine.
    """
    import jax.numpy as jnp

    from faster_whisper_tpu.models.silero import (
        _CONTEXT,
        _WINDOW,
        VAD_SLICE_SAMPLES,
        _vad_slice_step,
        _write_slice,
    )

    weights = get_vad_model().weights
    n = len(audio)
    n_slices = max(1, -(-n // VAD_SLICE_SAMPLES))
    total = n_slices * VAD_SLICE_SAMPLES
    expected_windows = n // _WINDOW + 1
    if os.environ.get("FWT_I16_TRANSFER", "1") != "0":
        q = np.zeros(total, np.int16)
        q[:n] = np.clip(
            np.round(np.asarray(audio) * 32768.0), -32768, 32767
        ).astype(np.int16)
    else:
        q = np.pad(np.asarray(audio, np.float32), (0, total - n))

    tail = jnp.zeros(_CONTEXT, jnp.float32)
    h = jnp.zeros(128, jnp.float32)
    c = jnp.zeros(128, jnp.float32)
    probs = []
    # Slices are written into one preallocated buffer through a single
    # traced-offset program (models/silero.py::_write_slice) — an n-ary
    # concatenate at the end would key a fresh XLA program per slice
    # COUNT, an unbounded (unwarmable) set across file durations.
    audio_dev = jnp.zeros(total, jnp.float32) if return_audio else None
    for off in range(0, total, VAD_SLICE_SAMPLES):
        dev = jnp.asarray(q[off : off + VAD_SLICE_SAMPLES])  # async h2d
        p, tail, h, c, f32_slice = _vad_slice_step(weights, dev, tail, h, c)
        probs.append(p)
        if return_audio:
            audio_dev = _write_slice(audio_dev, f32_slice, off)
    if total < expected_windows * _WINDOW:
        # n is an exact bucket multiple: the reference pads one more
        # window past the buffer end; run one zero slice (device-made, no
        # transfer) for its probabilities.  The audio copy stays at
        # ``total`` — upload_audio would not have padded here either.
        zero = jnp.zeros(VAD_SLICE_SAMPLES, jnp.int16 if q.dtype == np.int16
                         else jnp.float32)
        p, _, _, _, _ = _vad_slice_step(weights, zero, tail, h, c)
        probs.append(p)

    # The probabilities feed the host-side hysteresis state machine
    # directly, so they are assembled on the host: per-slice pulls after
    # all dispatches are queued (overlap preserved), and no per-slice-
    # count device concat program exists.
    probs_host = (
        np.asarray(probs[0])
        if len(probs) == 1
        else np.concatenate([np.asarray(p) for p in probs])
    )
    return audio_dev, probs_host


def get_speech_timestamps(
    audio: np.ndarray,
    vad_options: Optional[VadOptions] = None,
    sampling_rate: int = 16000,
    audio_device=None,
    probs_device=None,
    **kwargs,
) -> List[dict]:
    """Split long audio into speech chunks using Silero VAD.

    Returns a list of {"start": sample, "end": sample} dicts.
    Behavior contract: reference vad.py:45-183.  ``audio_device`` may pass
    an already-uploaded jax copy of ``audio`` to skip this call's
    host->device transfer — the batched pipeline does exactly this with
    its shared PCM upload (transcribe.py, FWT_SHARED_UPLOAD).  Both paths
    quantize to the same int16 grid on device (FWT_I16_TRANSFER), so
    decisions match between them; pass FWT_I16_TRANSFER=0 for bit-exact
    float32 end to end.
    """
    if vad_options is None:
        vad_options = VadOptions(**kwargs)

    window = 512
    threshold = vad_options.threshold
    neg_threshold = vad_options.neg_threshold
    if neg_threshold is None:
        neg_threshold = max(threshold - 0.15, 0.01)

    min_speech_samples = sampling_rate * vad_options.min_speech_duration_ms / 1000
    pad_samples = sampling_rate * vad_options.speech_pad_ms / 1000
    max_speech_samples = (
        sampling_rate * vad_options.max_speech_duration_s - window - 2 * pad_samples
    )
    min_silence_samples = sampling_rate * vad_options.min_silence_duration_ms / 1000
    min_silence_at_max_speech = sampling_rate * 98 / 1000

    n_samples = len(audio)
    model = get_vad_model()
    pad = window - n_samples % window
    expected_windows = n_samples // window + 1
    if (
        probs_device is None
        and audio_device is None
        and n_samples
        and os.environ.get("FWT_PIPELINED_VAD", "0") == "1"
        and hasattr(model, "weights")  # real Silero (tests inject fakes)
    ):
        # opt-in (see upload_with_vad: measured slower over the tunnel):
        # take the pipelined sliced path, probs only
        _, probs_device = upload_with_vad(audio, return_audio=False)
    if probs_device is not None:
        # pipelined upload already dispatched the forward per slice
        # (upload_with_vad); pull the full bucketed buffer in one
        # transfer and slice host-side so no per-length slice program
        # exists, then drop the trailing zero-pad windows
        with phase_timer("vad probs pull"):
            probs = np.asarray(probs_device)[:expected_windows]
    elif audio_device is not None:
        # upload_audio ships the device copy zero-padded to a 512-aligned
        # bucket, so it usually already holds the reference's pad window;
        # only the rare exact-bucket-fit length needs one more window
        # (a single extra eager program instead of one per file length).
        import jax.numpy as jnp

        n_dev = int(audio_device.shape[0])
        target = max(expected_windows * window, -(-n_dev // window) * window)
        if n_dev == target:
            padded = audio_device
        else:
            padded = jnp.pad(audio_device, (0, target - n_dev))
        with phase_timer("vad forward (compile+exec+probs pull)"):
            # slice to the reference's window count: the device copy's
            # bucket tail adds trailing zero windows whose probabilities
            # must not reach the hysteresis state machine
            probs = model(padded)[:expected_windows]
    else:
        padded = np.pad(audio, (0, pad))
        with phase_timer("vad forward (compile+exec+probs pull)"):
            probs = model(padded)[:expected_windows]

    # --- hysteresis state machine over window probabilities ---
    # Native C transliteration first (~24k iterations per 13 minutes of
    # audio cost ~0.2 s in Python); exact-equality vs the Python loop is
    # pinned by tests/test_vad.py.  FWT_NATIVE_VAD_SM=0 forces Python.
    speeches = None
    if os.environ.get("FWT_NATIVE_VAD_SM", "1") != "0":
        from faster_whisper_tpu.vad_native import hysteresis_native

        speeches = hysteresis_native(
            probs, window, threshold, neg_threshold, min_speech_samples,
            max_speech_samples, min_silence_samples,
            min_silence_at_max_speech, n_samples,
        )
    if speeches is None:
        speeches = _hysteresis_py(
            probs, window, threshold, neg_threshold, min_speech_samples,
            max_speech_samples, min_silence_samples,
            min_silence_at_max_speech, n_samples,
        )

    # --- pad chunks and share short inter-chunk silences ---
    for i, speech in enumerate(speeches):
        if i == 0:
            speech["start"] = int(max(0, speech["start"] - pad_samples))
        if i != len(speeches) - 1:
            gap = speeches[i + 1]["start"] - speech["end"]
            if gap < 2 * pad_samples:
                speech["end"] += int(gap // 2)
                speeches[i + 1]["start"] = int(
                    max(0, speeches[i + 1]["start"] - gap // 2)
                )
            else:
                speech["end"] = int(min(n_samples, speech["end"] + pad_samples))
                speeches[i + 1]["start"] = int(
                    max(0, speeches[i + 1]["start"] - pad_samples)
                )
        else:
            speech["end"] = int(min(n_samples, speech["end"] + pad_samples))

    return speeches


def _hysteresis_py(
    probs,
    window: int,
    threshold: float,
    neg_threshold: float,
    min_speech_samples: float,
    max_speech_samples: float,
    min_silence_samples: float,
    min_silence_at_max_speech: float,
    n_samples: int,
) -> List[dict]:
    """Reference Python implementation of the hysteresis loop (behavior
    contract: reference vad.py:96-152).  The production path runs the
    identical branches in C (native/vad_sm.cpp); this stays as the
    fallback and the parity oracle."""
    speeches: List[dict] = []
    current: dict = {}
    triggered = False
    temp_end = 0  # candidate end while tolerating short silence
    prev_end = 0  # last >=98ms silence position (for max-duration splits)
    next_start = 0

    for i, p in enumerate(probs):
        pos = window * i

        if p >= threshold and temp_end:
            temp_end = 0
            if next_start < prev_end:
                next_start = pos

        if p >= threshold and not triggered:
            triggered = True
            current["start"] = pos
            continue

        if triggered and pos - current["start"] > max_speech_samples:
            if prev_end:
                current["end"] = prev_end
                speeches.append(current)
                current = {}
                if next_start < prev_end:
                    # silence reached and still silent: close out entirely
                    triggered = False
                else:
                    current["start"] = next_start
                prev_end = next_start = temp_end = 0
            else:
                current["end"] = pos
                speeches.append(current)
                current = {}
                prev_end = next_start = temp_end = 0
                triggered = False
                continue

        if p < neg_threshold and triggered:
            if not temp_end:
                temp_end = pos
            if pos - temp_end > min_silence_at_max_speech:
                prev_end = temp_end
            if pos - temp_end < min_silence_samples:
                continue
            current["end"] = temp_end
            if current["end"] - current["start"] > min_speech_samples:
                speeches.append(current)
            current = {}
            prev_end = next_start = temp_end = 0
            triggered = False
            continue

    if current and (n_samples - current["start"]) > min_speech_samples:
        current["end"] = n_samples
        speeches.append(current)
    return speeches


def collect_chunks(
    audio: np.ndarray,
    chunks: List[dict],
    sampling_rate: int = 16000,
    max_duration: float = float("inf"),
) -> Tuple[List[np.ndarray], List[Dict[str, float]]]:
    """Concatenate speech chunks into buffers of at most ``max_duration``
    seconds, with {offset, duration, segments} metadata per buffer
    (reference: vad.py:186-243)."""
    if not chunks:
        return [np.array([], dtype=np.float32)], [
            {"offset": 0, "duration": 0, "segments": []}
        ]

    audio_chunks: List[np.ndarray] = []
    metadata: List[dict] = []
    pieces: List[np.ndarray] = []
    segments: List[dict] = []
    duration = 0  # samples in the current buffer
    total = 0  # samples emitted so far (offset basis)

    def flush():
        nonlocal pieces, segments, duration, total
        audio_chunks.append(
            np.concatenate(pieces) if pieces else np.array([], dtype=np.float32)
        )
        metadata.append(
            {
                "offset": total / sampling_rate,
                "duration": duration / sampling_rate,
                "segments": segments,
            }
        )
        total += duration
        pieces, segments, duration = [], [], 0

    for chunk in chunks:
        size = chunk["end"] - chunk["start"]
        if duration + size > max_duration * sampling_rate:
            flush()
            # Note: the chunk that triggers the flush starts the next buffer
            # and is NOT recorded in its segment metadata — this mirrors the
            # reference exactly (vad.py:209-233, where the long chunk is
            # assigned without appending to current_segments).
            pieces = [audio[chunk["start"] : chunk["end"]]]
            duration = size
        else:
            segments.append(chunk)
            pieces.append(audio[chunk["start"] : chunk["end"]])
            duration += size

    flush()
    return audio_chunks, metadata


class SpeechTimestampsMap:
    """Maps VAD-compressed timestamps back to the original clock
    (reference: vad.py:246-285)."""

    def __init__(self, chunks: List[dict], sampling_rate: int, time_precision: int = 2):
        self.sampling_rate = sampling_rate
        self.time_precision = time_precision
        self.chunk_end_sample = []
        self.total_silence_before = []

        previous_end = 0
        silent_samples = 0
        for chunk in chunks:
            silent_samples += chunk["start"] - previous_end
            previous_end = chunk["end"]
            self.chunk_end_sample.append(chunk["end"] - silent_samples)
            self.total_silence_before.append(silent_samples / sampling_rate)

    def get_original_time(
        self,
        time: float,
        chunk_index: Optional[int] = None,
        is_end: bool = False,
    ) -> float:
        if chunk_index is None:
            chunk_index = self.get_chunk_index(time, is_end)
        return round(
            self.total_silence_before[chunk_index] + time, self.time_precision
        )

    def get_chunk_index(self, time: float, is_end: bool = False) -> int:
        sample = int(time * self.sampling_rate)
        if is_end and sample in self.chunk_end_sample:
            return self.chunk_end_sample.index(sample)
        return min(
            bisect.bisect(self.chunk_end_sample, sample),
            len(self.chunk_end_sample) - 1,
        )


@functools.lru_cache
def get_vad_model():
    """Returns the (cached) on-device Silero VAD model instance."""
    from faster_whisper_tpu.models.silero import SileroVAD

    return SileroVAD()
