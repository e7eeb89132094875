"""Numeric parity against the canonical HF/torch Whisper implementation.

The environment has torch (CPU) + transformers but no network, so the
strongest available evidence that the JAX model math is right is:
build a randomly-initialized `WhisperForConditionalGeneration`, save it
with `save_pretrained` (safetensors, offline), load it through OUR
production HF loader (models/load.py::load_hf_safetensors), and compare

  * encoder hidden states, and
  * teacher-forced decoder logits (self-attn causal + cross-attn + tied
    output projection)

to float32 tolerance on the same inputs.  This validates the conv stem,
attention/layernorm placement, GELU variant, position embeddings, the
tied logits head, and the checkpoint key mapping in one shot — i.e. a
real OpenAI/HF checkpoint would produce matching numbers too.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def hf_and_ours(tmp_path_factory):
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from faster_whisper_tpu.models.load import load_model

    hf_cfg = WhisperConfig(
        vocab_size=1000,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=1500,
        max_target_positions=448,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()

    model_dir = tmp_path_factory.mktemp("hf_whisper_tiny_random")
    hf.save_pretrained(model_dir, safe_serialization=True)

    params, cfg = load_model(str(model_dir), dtype="float32")
    return hf, params, cfg


def test_encoder_matches_hf(hf_and_ours):
    hf, params, cfg = hf_and_ours
    from faster_whisper_tpu.models import model as M

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5

    with torch.no_grad():
        want = (
            hf.model.encoder(input_features=torch.from_numpy(mel))
            .last_hidden_state.numpy()
        )
    got = np.asarray(M.encode(params, cfg, jnp.asarray(mel)), dtype=np.float32)

    assert got.shape == want.shape  # (1, 1500, d)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_teacher_forced_decoder_logits_match_hf(hf_and_ours):
    hf, params, cfg = hf_and_ours
    from faster_whisper_tpu.models import model as M
    from faster_whisper_tpu.models.engine import _forward_with_alignment

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    tokens = rng.integers(0, 1000, size=(1, 12)).astype(np.int64)

    with torch.no_grad():
        want = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    xa = M.encode(params, cfg, jnp.asarray(mel))
    logits, _ = _forward_with_alignment(
        params,
        cfg,
        ((0, 0),),  # any head; we only use the logits here
        jnp.asarray(tokens.astype(np.int32)),
        xa,
    )
    got = np.asarray(logits, dtype=np.float32)

    assert got.shape == want.shape  # (1, 12, vocab)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
    # ranking agreement at every position
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
