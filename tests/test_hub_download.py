"""Execute the REAL hub download path against a local mock HF endpoint.

The environment has zero network egress, so `download_model` cannot hit
huggingface.co — but `huggingface_hub` routes every request through the
`HF_ENDPOINT` env var, so the genuine client machinery (repo_info, file
metadata HEADs, snapshot layout, allow-pattern filtering, cache reuse,
local_files_only) can run unmodified against a loopback HTTP server
serving a real loadable CT2 model directory.

This executes the path the reference only exercises online
(reference: faster_whisper/utils.py:49-116 download_model;
tests/test_utils.py:6-29 download-to-dir/cache): registry name -> repo
id mapping, allow_patterns (config/preprocessor_config/model.bin/
tokenizer.json/vocabulary.*) excluding decoy files, the hub cache
`models--org--name/snapshots/<commit>` layout, `output_dir=` local-dir
mode, offline re-resolution from cache, and finally
`WhisperModel(<downloaded dir>)` loading and transcribing audio — the
full hub -> load -> transcribe chain with only the network endpoint
swapped.

The download runs in a subprocess because huggingface_hub freezes
HF_ENDPOINT into its constants at import time.
"""

import http.server
import json
import os
import subprocess
import sys
import threading

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REPO_ID = "Systran/faster-whisper-tiny"  # what the registry maps "tiny" to
COMMIT = "0" * 40


def _build_repo_files() -> dict:
    """A complete, genuinely loadable int8 CT2 model repo (toy sizes)."""
    from faster_whisper_tpu.models.config import tiny_test_config
    from faster_whisper_tpu.models.load import random_params
    from faster_whisper_tpu.testing import (
        build_synthetic_tokenizer,
        serialize_ct2_int8,
    )

    cfg = tiny_test_config()
    params = random_params(cfg, seed=3, dtype="float32")
    return {
        "model.bin": serialize_ct2_int8(params, cfg),
        "config.json": json.dumps(
            {
                "attention_heads": cfg.n_text_head,
                "alignment_heads": [[1, 0], [1, 1]],
            }
        ).encode(),
        "preprocessor_config.json": json.dumps(
            {"feature_size": cfg.n_mels}
        ).encode(),
        "tokenizer.json": build_synthetic_tokenizer().to_str().encode(),
        "vocabulary.json": json.dumps(["<dummy>"]).encode(),
        # decoys: listed by the repo but excluded by allow_patterns
        "pytorch_model.bin": b"\x00" * 64,
        "README.md": b"# decoy\n",
    }


class _MockHubHandler(http.server.BaseHTTPRequestHandler):
    files: dict = {}
    requested: list = []

    def log_message(self, *a):  # silence
        pass

    def _file_for(self, path):
        # /{org}/{name}/resolve/{revision}/{filename}
        parts = path.split("/resolve/", 1)
        if len(parts) != 2 or parts[0].lstrip("/") != REPO_ID:
            return None
        _, fname = parts[1].split("/", 1)
        return self.files.get(fname), fname

    def do_GET(self):
        path = self.path.split("?", 1)[0]
        type(self).requested.append(("GET", path))
        if path.startswith("/api/models/"):
            info = {
                "id": REPO_ID,
                "modelId": REPO_ID,
                "sha": COMMIT,
                "private": False,
                "downloads": 0,
                "likes": 0,
                "tags": [],
                "siblings": [
                    {"rfilename": name} for name in sorted(self.files)
                ],
            }
            body = json.dumps(info).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        hit = self._file_for(path)
        if hit and hit[0] is not None:
            body, fname = hit
            self.send_response(200)
            self._file_headers(body, fname)
            self.end_headers()
            self.wfile.write(body)
            return
        self.send_response(404)
        self.end_headers()

    def do_HEAD(self):
        path = self.path.split("?", 1)[0]
        type(self).requested.append(("HEAD", path))
        hit = self._file_for(path)
        if hit and hit[0] is not None:
            body, fname = hit
            self.send_response(200)
            self._file_headers(body, fname)
            self.end_headers()
            return
        self.send_response(404)
        self.end_headers()

    def _file_headers(self, body, fname):
        import hashlib

        etag = hashlib.sha256(body).hexdigest()
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("ETag", f'"{etag}"')
        self.send_header("X-Repo-Commit", COMMIT)


@pytest.fixture(scope="module")
def mock_hub():
    handler = _MockHubHandler
    handler.files = _build_repo_files()
    handler.requested = []
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}", handler
    server.shutdown()
    server.server_close()


_CHILD = r"""
import json, os, sys

out = {}
from faster_whisper_tpu.utils import download_model

cache_dir = os.path.join(sys.argv[1], "hub-cache")

# 1) registry-name download into the hub cache
path = download_model("tiny", cache_dir=cache_dir)
out["snapshot"] = path
out["snapshot_files"] = sorted(os.listdir(path))

# 2) local_files_only re-resolution: must serve from cache, no network
path2 = download_model("tiny", cache_dir=cache_dir, local_files_only=True)
out["offline_same"] = os.path.realpath(path2) == os.path.realpath(path)

# 3) output_dir (local_dir) mode with an explicit repo id
outdir = os.path.join(sys.argv[1], "local-model")
path3 = download_model(
    "Systran/faster-whisper-tiny", output_dir=outdir, cache_dir=cache_dir
)
out["local_dir_files"] = sorted(
    f for f in os.listdir(outdir) if not f.startswith(".")
)

# 4) the downloaded directory must load and transcribe through the
#    public API first try (int8 CT2 layout)
from faster_whisper_tpu.transcribe import WhisperModel

model = WhisperModel(path, compute_type="int8")
segments, info = model.transcribe(
    sys.argv[2], language="en", beam_size=1, max_new_tokens=4
)
segs = list(segments)
out["n_segments"] = len(segs)
out["language"] = info.language
print(json.dumps(out))
"""


def test_download_model_against_mock_hub(mock_hub, jfk_path, tmp_path):
    endpoint, handler = mock_hub
    env = dict(os.environ)
    env.update(
        HF_ENDPOINT=endpoint,
        HF_HUB_DISABLE_TELEMETRY="1",
        HF_HUB_OFFLINE="0",
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        # hermetic hub state for this child only
        HF_HOME=str(tmp_path / "hf-home"),
    )
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(tmp_path), str(jfk_path)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(proc.stdout.splitlines()[-1])

    allowed = {
        "config.json",
        "preprocessor_config.json",
        "model.bin",
        "tokenizer.json",
        "vocabulary.json",
    }
    # allow-pattern filtering: decoys listed by the repo never downloaded
    assert set(out["snapshot_files"]) == allowed, out["snapshot_files"]
    assert set(out["local_dir_files"]) == allowed, out["local_dir_files"]
    fetched = {
        p.split("/resolve/", 1)[1].split("/", 1)[1]
        for (m, p) in handler.requested
        if "/resolve/" in p and m == "GET"
    }
    assert "pytorch_model.bin" not in fetched
    assert "README.md" not in fetched
    assert "model.bin" in fetched

    # hub cache layout: models--Systran--faster-whisper-tiny/snapshots/<sha>
    assert "models--Systran--faster-whisper-tiny" in out["snapshot"]
    assert COMMIT in out["snapshot"]
    assert out["offline_same"] is True

    # the downloaded checkpoint worked through the public transcribe path
    # (seed-3 weights deterministically yield one segment on the 11 s jfk
    # fixture — zero segments would mean a broken tokenizer/weight load)
    assert out["n_segments"] >= 1, out
    assert out["language"] == "en"
