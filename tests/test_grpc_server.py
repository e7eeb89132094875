"""gRPC serving surface: RPC schema, streaming, parity with HTTP results."""

import io
import wave

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")

from faster_whisper_tpu.grpc_server import TranscriptionClient, make_server
from faster_whisper_tpu.protos import transcription_pb2 as pb
from faster_whisper_tpu.testing import build_test_model


@pytest.fixture(scope="module")
def grpc_target():
    model = build_test_model()
    server, port = make_server(model, model_name="test-tiny")
    server.start()
    yield f"127.0.0.1:{port}"
    server.stop(grace=None)
    server.service.close()


@pytest.fixture(scope="module")
def client(grpc_target):
    c = TranscriptionClient(grpc_target)
    yield c
    c.close()


def _wav_bytes(seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(int(sr * seconds)) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_health(client):
    resp = client.health(pb.HealthRequest())
    assert resp.status == "ok"
    assert resp.model == "test-tiny"


def test_transcribe_unary(client):
    resp = client.transcribe(
        pb.TranscribeRequest(
            audio=_wav_bytes(), language="en", beam_size=2, batch_size=2,
            verbose=True,
        )
    )
    assert resp.info.language == "en"
    assert resp.info.duration > 0
    assert len(resp.segments) >= 1
    for seg in resp.segments:
        assert seg.end >= seg.start
        assert list(seg.tokens)  # verbose populates tokens
    assert resp.text == "".join(s.text for s in resp.segments).strip()


def test_transcribe_stream_matches_unary(client):
    req = pb.TranscribeRequest(
        audio=_wav_bytes(seed=1), language="en", beam_size=2, batch_size=2
    )
    unary = client.transcribe(req)
    events = list(client.transcribe_stream(req))

    assert events[0].WhichOneof("event") == "info"
    assert events[0].info.language == unary.info.language
    assert events[-1].WhichOneof("event") == "done_text"
    assert events[-1].done_text == unary.text
    segs = [e.segment for e in events[1:-1]]
    assert all(e.WhichOneof("event") == "segment" for e in events[1:-1])
    got = [(s.start, s.end, s.text) for s in segs]
    want = [(s.start, s.end, s.text) for s in unary.segments]
    assert got == want


def test_transcribe_stream_sequential_releases_lock(client):
    """sequential=true streams under the service lock; back-to-back calls
    must not deadlock."""
    req = pb.TranscribeRequest(
        audio=_wav_bytes(seed=2), language="en", beam_size=1, sequential=True
    )
    for _ in range(2):
        events = list(client.transcribe_stream(req))
        assert events[-1].WhichOneof("event") == "done_text"


def test_bad_audio_is_invalid_argument(client):
    with pytest.raises(grpc.RpcError) as exc_info:
        client.transcribe(pb.TranscribeRequest(audio=b"not audio at all"))
    assert exc_info.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_options_mapping():
    from faster_whisper_tpu.grpc_server import _options_from_request

    opts = _options_from_request(
        pb.TranscribeRequest(
            language="fr", task="translate", beam_size=3,
            temperature=[0.0, 0.5], word_timestamps=True, vad_filter=True,
            initial_prompt="bonjour", hotwords="jax tpu", max_new_tokens=64,
            without_timestamps=True, prefix="le", multilingual=True,
            no_condition_on_previous_text=True, batch_size=4,
        )
    )
    assert opts == {
        "language": "fr", "task": "translate", "beam_size": 3,
        "temperature": [0.0, 0.5], "word_timestamps": True,
        "vad_filter": True, "initial_prompt": "bonjour",
        "hotwords": "jax tpu", "max_new_tokens": 64,
        "without_timestamps": True, "prefix": "le", "multilingual": True,
        "condition_on_previous_text": False, "batch_size": 4,
    }
    # proto zero-values fall through to library defaults
    defaults = _options_from_request(pb.TranscribeRequest())
    assert defaults == {"vad_filter": False, "batch_size": 8}
    # sequential forces the seek-loop path
    seq = _options_from_request(pb.TranscribeRequest(sequential=True))
    assert seq["batch_size"] == 0
