import os
import sys

# Prefer a virtual 8-device CPU mesh so sharding/pjit paths are exercised
# without TPU hardware.  Must be set before jax import — environments whose
# sitecustomize imports jax at interpreter start (e.g. a TPU tunnel) win;
# there the suite runs on the real backend and mesh-only tests skip.  Run
#   env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python -m pytest tests/
# to force the CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_DATA_DIR = "/root/reference/tests/data"


@pytest.fixture
def data_dir():
    return REFERENCE_DATA_DIR


@pytest.fixture
def jfk_path(data_dir):
    path = os.path.join(data_dir, "jfk.flac")
    if not os.path.exists(path):
        pytest.skip("jfk.flac fixture not available")
    return path


@pytest.fixture
def stereo_wav_path(data_dir):
    path = os.path.join(data_dir, "stereo_diarization.wav")
    if not os.path.exists(path):
        pytest.skip("stereo_diarization.wav fixture not available")
    return path


@pytest.fixture
def hotwords_mp3_path(data_dir):
    path = os.path.join(data_dir, "hotwords.mp3")
    if not os.path.exists(path):
        pytest.skip("hotwords.mp3 fixture not available")
    return path


@pytest.fixture
def multilingual_mp3_path(data_dir):
    path = os.path.join(data_dir, "multilingual.mp3")
    if not os.path.exists(path):
        pytest.skip("multilingual.mp3 fixture not available")
    return path
