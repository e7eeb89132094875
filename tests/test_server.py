"""HTTP serving surface: request parsing, inference, response schema."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from faster_whisper_tpu.server import make_server
from faster_whisper_tpu.testing import build_test_model


@pytest.fixture(scope="module")
def server_obj():
    model = build_test_model()
    server = make_server(model, model_name="test-tiny")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server
    server.shutdown()
    server.service.close()


@pytest.fixture(scope="module")
def server_url(server_obj):
    return f"http://127.0.0.1:{server_obj.server_port}"


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz") as r:
        body = json.load(r)
    assert body == {"status": "ok", "model": "test-tiny"}


def _wav_bytes(seconds=2.0, sr=16000, seed=0):
    import io
    import wave

    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(int(sr * seconds)) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _post_multipart(url, payload, fields):
    boundary = "fwtboundary"
    parts = []
    for k, v in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"'
            f"\r\n\r\n{v}\r\n".encode()
        )
    parts.append(
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="a.wav"\r\nContent-Type: audio/wav\r\n\r\n'.encode()
        + payload
        + b"\r\n"
    )
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    req = urllib.request.Request(
        url + "/v1/audio/transcriptions",
        data=body,
        headers={
            "Content-Type": f"multipart/form-data; boundary={boundary}"
        },
    )
    return urllib.request.urlopen(req)


def test_transcription_multipart(server_url):
    fields = {
        "language": "en",
        "beam_size": "2",
        "vad_filter": "false",
        "response_format": "verbose_json",
        "batch_size": "2",
    }
    with _post_multipart(server_url, _wav_bytes(), fields) as r:
        out = json.load(r)
    assert "text" in out and "segments" in out
    assert out["language"] == "en"
    for seg in out["segments"]:
        assert seg["end"] >= seg["start"]
        assert "avg_logprob" in seg


def test_transcription_raw_body_query_options(server_url):
    req = urllib.request.Request(
        server_url
        + "/transcribe?language=en&beam_size=1&vad_filter=false"
        + "&response_format=text&batch_size=0",
        data=_wav_bytes(seed=1),
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        r.read()


def test_bad_option_is_400(server_url):
    try:
        _post_multipart(
            server_url, _wav_bytes(), {"beam_size": "not-a-number"}
        )
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_missing_file_is_400(server_url):
    req = urllib.request.Request(
        server_url + "/v1/audio/transcriptions",
        data=b"",
        headers={"Content-Type": "application/octet-stream"},
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_oversized_body_is_413(server_url):
    req = urllib.request.Request(
        server_url + "/v1/audio/transcriptions",
        data=b"x",
        headers={
            "Content-Type": "application/octet-stream",
            "Content-Length": str(600 * 1024 * 1024),
        },
    )
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 413
        e.read()


def test_concurrent_requests_serialize(server_url):
    """Two simultaneous uploads must both succeed (handlers queue on the
    service lock; ThreadingHTTPServer gives each its own thread)."""
    import concurrent.futures

    fields = {"language": "en", "beam_size": "1", "vad_filter": "false",
              "batch_size": "2"}
    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        futs = [
            ex.submit(
                lambda seed: json.load(
                    _post_multipart(server_url, _wav_bytes(seed=seed), fields)
                ),
                s,
            )
            for s in (10, 11)
        ]
        outs = [f.result(timeout=300) for f in futs]
    assert all("segments" in o for o in outs)


# ---------------------------------------------------------------------------
# Cross-request continuous batching (faster_whisper_tpu/scheduler.py)
# ---------------------------------------------------------------------------


def test_continuous_batcher_coalesces_and_matches_unscheduled():
    """Four concurrent requests' chunks must merge into shared device
    batches (fewer batches than chunks) and produce segments identical to
    the unscheduled in-request path."""
    import concurrent.futures
    import io

    from faster_whisper_tpu.audio import decode_audio
    from faster_whisper_tpu.scheduler import ContinuousBatcher
    from faster_whisper_tpu.transcribe import BatchedInferencePipeline

    model = build_test_model()
    audio = decode_audio(io.BytesIO(_wav_bytes(seconds=3.0, seed=5)))

    kwargs = dict(language="en", beam_size=2, vad_filter=False,
                  max_new_tokens=16, temperature=[0.0])

    # baseline: plain in-request path
    ref_segments, _ = BatchedInferencePipeline(model).transcribe(
        audio, batch_size=2, **kwargs
    )
    ref = [(s.text, s.start, s.end) for s in ref_segments]

    batcher = ContinuousBatcher(model, max_batch=4, max_wait_ms=300)
    try:
        barrier = threading.Barrier(4)

        def one_request(_):
            barrier.wait()  # maximize overlap
            pipeline = BatchedInferencePipeline(model, scheduler=batcher)
            segments, _ = pipeline.transcribe(audio, batch_size=4, **kwargs)
            return [(s.text, s.start, s.end) for s in segments]

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(one_request, range(4)))

        assert batcher.chunks_processed == 4
        # coalescing is the point: 4 concurrent single-chunk requests must
        # share batches instead of running one device batch each
        assert batcher.batches_dispatched <= 2, batcher.batches_dispatched
        for out in outs:
            assert out == ref
    finally:
        batcher.close()


def test_server_concurrent_requests_share_batches(server_obj, server_url):
    """End-to-end over HTTP: concurrent uploads ride the shared batcher."""
    import concurrent.futures

    fields = {"language": "en", "beam_size": "1", "vad_filter": "false",
              "batch_size": "4", "max_new_tokens": "16", "temperature": "0"}

    service = server_obj.service  # exposed by make_server
    assert service.batcher is not None
    b0 = service.batcher.batches_dispatched
    c0 = service.batcher.chunks_processed
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        futs = [
            ex.submit(
                lambda seed: json.load(
                    _post_multipart(server_url, _wav_bytes(seed=seed), fields)
                ),
                s,
            )
            for s in (20, 21, 22, 23)
        ]
        outs = [f.result(timeout=600) for f in futs]
    assert all("text" in o for o in outs)
    chunks = service.batcher.chunks_processed - c0
    batches = service.batcher.batches_dispatched - b0
    assert chunks == 4
    assert batches < chunks, (batches, chunks)  # overlap happened


def _parse_sse(raw: bytes):
    events = []
    for block in raw.decode().split("\n\n"):
        block = block.strip()
        if not block:
            continue
        assert block.startswith("data: "), block
        data = block[len("data: "):]
        events.append(data if data == "[DONE]" else json.loads(data))
    return events


def test_sse_streaming_batched(server_url):
    """stream=true yields one transcript.segment event per segment, a
    transcript.text.done summary, then [DONE] — and the streamed segments
    equal the non-streaming response's."""
    fields = {
        "language": "en", "beam_size": "2", "vad_filter": "false",
        "batch_size": "2", "response_format": "verbose_json",
    }
    with _post_multipart(server_url, _wav_bytes(), dict(fields)) as r:
        plain = json.load(r)
    with _post_multipart(
        server_url, _wav_bytes(), dict(fields, stream="true")
    ) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        events = _parse_sse(r.read())

    assert events[-1] == "[DONE]"
    done = events[-2]
    assert done["type"] == "transcript.text.done"
    assert done["text"] == plain["text"]
    assert done["language"] == plain["language"]
    seg_events = events[:-2]
    assert all(e["type"] == "transcript.segment" for e in seg_events)
    got = [(e["segment"]["start"], e["segment"]["end"], e["segment"]["text"])
           for e in seg_events]
    want = [(s["start"], s["end"], s["text"]) for s in plain["segments"]]
    assert got == want


def test_sse_streaming_sequential_releases_lock(server_url):
    """batch_size=0 streams through the service lock; a second request
    afterwards must not deadlock (the _LockedDrain released it)."""
    fields = {
        "language": "en", "beam_size": "1", "vad_filter": "false",
        "batch_size": "0", "stream": "true",
    }
    for _ in range(2):
        with _post_multipart(server_url, _wav_bytes(seed=2), dict(fields)) as r:
            events = _parse_sse(r.read())
        assert events[-1] == "[DONE]"
        assert events[-2]["type"] == "transcript.text.done"


def test_batcher_shares_batches_across_temperatures():
    """Requests that differ ONLY in sampling temperature must coalesce:
    the temperature is a per-row traced argument of the sampling program
    (scheduler.GenKey drops it from the batch key), so a t=0.3 and a
    t=0.8 request ride one device batch with per-row temperatures."""
    import concurrent.futures
    import io

    from faster_whisper_tpu.audio import decode_audio
    from faster_whisper_tpu.scheduler import ContinuousBatcher
    from faster_whisper_tpu.transcribe import BatchedInferencePipeline

    model = build_test_model()
    audio = decode_audio(io.BytesIO(_wav_bytes(seconds=3.0, seed=5)))

    eng = model.model
    dispatched = []
    orig = eng.generate_dispatch

    def spy(enc, prompts, **kw):
        dispatched.append(kw.get("sampling_temperature"))
        return orig(enc, prompts, **kw)

    eng.generate_dispatch = spy
    batcher = ContinuousBatcher(model, max_batch=4, max_wait_ms=300)
    try:
        barrier = threading.Barrier(2)

        def one_request(temp):
            barrier.wait()
            pipeline = BatchedInferencePipeline(model, scheduler=batcher)
            segments, _ = pipeline.transcribe(
                audio, language="en", beam_size=1, temperature=[temp],
                vad_filter=False, max_new_tokens=16, batch_size=4,
            )
            return [(s.start, s.end) for s in segments]

        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            outs = list(ex.map(one_request, [0.3, 0.8]))

        assert all(outs), outs
        assert batcher.chunks_processed == 2
        assert batcher.batches_dispatched == 1, (
            batcher.batches_dispatched, dispatched
        )
        # one batched dispatch carrying BOTH temperatures per-row
        temps = dispatched[-1]
        assert isinstance(temps, list) and sorted(set(temps)) == [0.3, 0.8]
    finally:
        eng.generate_dispatch = orig
        batcher.close()


def _scrape_metrics(server_url):
    with urllib.request.urlopen(server_url + "/metrics") as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    out = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, value = line.rsplit(" ", 1)
        out[name] = float(value)
    return out


def test_metrics_endpoint_counts_requests(server_url):
    before = _scrape_metrics(server_url)

    with _post_multipart(
        server_url, _wav_bytes(1.0), {"language": "en", "beam_size": "1"}
    ) as r:
        n_segments = len(json.load(r).get("segments", []))
    with pytest.raises(urllib.error.HTTPError):
        _post_multipart(server_url, b"", {})  # no payload -> 400

    after = _scrape_metrics(server_url)
    ok = 'fwt_requests_total{status="ok"}'
    bad = 'fwt_requests_total{status="bad_request"}'
    assert after[ok] == before.get(ok, 0) + 1
    assert after[bad] == before.get(bad, 0) + 1
    assert after["fwt_segments_total"] >= before.get(
        "fwt_segments_total", 0
    ) + n_segments
    assert after["fwt_audio_seconds_total"] > before.get(
        "fwt_audio_seconds_total", 0
    )
    assert after["fwt_request_seconds_total"] > before.get(
        "fwt_request_seconds_total", 0
    )
    assert after["fwt_requests_in_flight"] == 0
    # the shared ContinuousBatcher's efficiency counters are exported too
    assert "fwt_batcher_batches_dispatched_total" in after
    assert "fwt_batcher_chunks_processed_total" in after


def test_scheduler_path_all_silence_yields_no_segments():
    """When the VAD removes all speech, collect_chunks still emits one
    empty chunk with metadata; the scheduler path must submit zero rows
    (regression: it used to submit len(chunks_metadata) rows and crash
    encoding an empty feature list)."""
    from faster_whisper_tpu.scheduler import ContinuousBatcher
    from faster_whisper_tpu.transcribe import BatchedInferencePipeline

    model = build_test_model()
    silence = np.zeros(16000, dtype=np.float32)
    batcher = ContinuousBatcher(model, max_batch=4)
    try:
        pipeline = BatchedInferencePipeline(model, scheduler=batcher)
        segments, info = pipeline.transcribe(
            silence, language="en", beam_size=1
        )
        assert list(segments) == []
        assert info.duration_after_vad == 0
        assert batcher.batches_dispatched == 0
    finally:
        batcher.close()
