import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from faster_whisper_tpu.ops.quant import (  # noqa: E402
    QuantizedLinear,
    int8_dense,
    quantize_params,
    quantize_weight,
)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    q = quantize_weight(jnp.asarray(w))
    assert q.q.dtype == jnp.int8
    assert q.s.shape == (32,)
    deq = np.asarray(q.q, dtype=np.float32) * np.asarray(q.s)[None, :]
    # per-channel max error bounded by half a quantization step
    step = np.asarray(q.s)
    assert np.all(np.abs(deq - w) <= step / 2 + 1e-6)


def test_int8_dense_close_to_dense():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.05
    b = rng.standard_normal(32).astype(np.float32) * 0.01

    ref = x @ w + b
    got = np.asarray(int8_dense(jnp.asarray(x), quantize_weight(jnp.asarray(w)), jnp.asarray(b)))
    # int8 W8A8: ~1% relative error on random gaussians
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()


def test_int8_dense_batched_rank3():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.05
    got = np.asarray(int8_dense(jnp.asarray(x), quantize_weight(jnp.asarray(w))))
    ref = x @ w
    assert got.shape == ref.shape
    assert np.abs(got - ref).mean() / np.abs(ref).mean() < 0.05


def test_quantize_params_structure():
    from faster_whisper_tpu.models.config import tiny_test_config
    from faster_whisper_tpu.models.load import random_params

    cfg = tiny_test_config()
    params = random_params(cfg, dtype="float32")
    qparams = quantize_params(params)

    assert isinstance(qparams["decoder"]["layers"]["self_attn"]["wq"], QuantizedLinear)
    assert isinstance(qparams["encoder"]["layers"]["mlp"]["w1"], QuantizedLinear)
    # embeddings / conv / layernorms untouched
    assert not isinstance(qparams["decoder"]["token_embed"], QuantizedLinear)
    assert not isinstance(qparams["encoder"]["conv1_w"], QuantizedLinear)
    # stacked-layer scales keep the leading layer axis
    L = cfg.n_text_layer
    assert qparams["decoder"]["layers"]["self_attn"]["wq"].q.shape[0] == L
    assert qparams["decoder"]["layers"]["self_attn"]["wq"].s.shape[0] == L


def test_int8_model_forward_close():
    from faster_whisper_tpu.models import model as M
    from faster_whisper_tpu.models.config import tiny_test_config
    from faster_whisper_tpu.models.load import random_params

    cfg = tiny_test_config()
    params = random_params(cfg, dtype="float32")
    qparams = quantize_params(params)

    mel = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 80, 3000), dtype=np.float32)
    )
    xa = M.encode(params, cfg, mel)
    xa_q = M.encode(qparams, cfg, mel)
    # encoder outputs stay well-correlated under int8
    a, b = np.asarray(xa).ravel(), np.asarray(xa_q).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr


def test_int8_generation_runs():
    from faster_whisper_tpu.testing import build_test_model
    from faster_whisper_tpu.models.load import random_params
    from faster_whisper_tpu.models.config import tiny_test_config
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.transcribe import WhisperModel

    cfg = tiny_test_config()
    model = WhisperModel.from_parts(
        random_params(cfg, dtype="float32"),
        cfg,
        build_synthetic_tokenizer(),
        compute_type="int8",
    )
    segs, info = model.transcribe(
        np.random.default_rng(0).standard_normal(16000 * 2).astype(np.float32) * 0.1,
        language="en",
        beam_size=1,
        temperature=[0.0],
        log_prob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
    )
    list(segs)  # must run through the full pipeline
