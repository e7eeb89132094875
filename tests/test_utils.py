"""Model registry / download utilities (reference: tests/test_utils.py)."""

import os

import pytest

from faster_whisper_tpu.utils import _MODELS, available_models, format_timestamp


def test_available_models():
    models = available_models()
    assert isinstance(models, list)
    # the reference's full registry (reference: utils.py:11-31)
    for name in (
        "tiny", "tiny.en", "base", "base.en", "small", "small.en",
        "medium", "medium.en", "large-v1", "large-v2", "large-v3", "large",
        "distil-small.en", "distil-medium.en", "distil-large-v2",
        "distil-large-v3", "large-v3-turbo", "turbo",
    ):
        assert name in models, name


def test_invalid_model_size_raises():
    from faster_whisper_tpu.utils import download_model

    with pytest.raises(ValueError):
        download_model("not-a-model-size")


def test_download_model_to_dir(tmpdir):
    if os.environ.get("FWT_NETWORK_TESTS") != "1":
        pytest.skip("network-gated (set FWT_NETWORK_TESTS=1)")
    from faster_whisper_tpu.utils import download_model

    output_dir = str(tmpdir.join("model"))
    model_dir = download_model("tiny", output_dir=output_dir)
    assert model_dir == output_dir
    assert os.path.isdir(model_dir)


def test_format_timestamp_shapes():
    assert format_timestamp(0.0) == "00:00.000"
    assert format_timestamp(61.5) == "01:01.500"
    assert format_timestamp(3601.0) == "01:00:01.000"
    assert format_timestamp(1.0, always_include_hours=True, decimal_marker=",") == "00:00:01,000"
