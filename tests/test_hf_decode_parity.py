"""End-to-end decode parity against HF transformers' Whisper generate.

test_hf_numeric_parity.py proves teacher-forced logits parity; these tests
go the rest of the way: run `WhisperForConditionalGeneration.generate` on a
shared random checkpoint and assert OUR full on-device decode loop (prefill,
KV-cached steps, logits rules, stopping, score bookkeeping) produces the
same token sequences.  This is the strongest offline stand-in for the
reference's golden-transcript acceptance tests
(reference: tests/test_transcribe.py:14-59), which require real weights
and network access.

Comparison semantics per mode:
  * greedy (both our beam path with K=1 and our top-1 sampling path):
    sequence-identical on every seed.
  * greedy + timestamp rules: sequence-identical, with HF's own
    `WhisperTimeStampLogitsProcessor` supplying the reference rule set.
  * beam (length_penalty=0 so both frameworks rank by the raw logprob sum):
    beam search is an approximate search, and at float32 tolerance a
    near-tie can legitimately flip which prefix a 4-beam frontier keeps, so
    the assertion is: our reported score must equal a torch teacher-forced
    re-score of our sequence (score honesty), and the sequence must either
    match HF's or out-score it.  Regressions in our search can only show up
    as scoring worse, never "differently but fine".

Everything runs under highest matmul precision so the comparison is
meaningful on TPU (whose default f32 matmul rounds through bf16).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402

VOCAB = 1000
EOS = 2
START = 3
MAX_NEW = 40


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from faster_whisper_tpu.models.load import load_model

    hf_cfg = WhisperConfig(
        vocab_size=VOCAB,
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
        eos_token_id=EOS,
        decoder_start_token_id=START,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    model_dir = tmp_path_factory.mktemp("hf_decode_parity_ckpt")
    hf.save_pretrained(model_dir, safe_serialization=True)
    params, cfg = load_model(str(model_dir), dtype="float32")

    from faster_whisper_tpu.generation.processors import TokenMeta

    meta = TokenMeta(
        eot=EOS,
        timestamp_begin=901,
        no_timestamps=900,
        no_speech=4,
        blank=(5,),
        vocab_size=VOCAB,
    )
    return hf, params, cfg, meta


def _mel(seed, batch=1):
    return np.random.default_rng(seed).standard_normal(
        (batch, 80, 3000)
    ).astype(np.float32) * 0.5


def _hf_seq(ids):
    """HF output -> generated tokens: drop the decoder_start prefix (kept
    for beam outputs, stripped for greedy in transformers 4.57), the
    trailing eos, and post-eos padding."""
    ids = list(ids)
    if ids and ids[0] == START:
        ids = ids[1:]
    if EOS in ids:
        ids = ids[: ids.index(EOS)]
    return ids


def _ours_generate(params, cfg, meta, mel, prompts, **kw):
    from faster_whisper_tpu.generation.generate import generate
    from faster_whisper_tpu.models import model as M

    with jax.default_matmul_precision("highest"):
        xa = M.encode(params, cfg, jnp.asarray(mel))
        return generate(
            params, cfg, meta, xa, prompts, sot_id=START,
            max_length=MAX_NEW + max(len(p) for p in prompts), **kw,
        )


def _torch_rescore(hf, mel, seq):
    """Teacher-forced sum of log-softmax probabilities of seq (incl. its
    implicit eos omitted — seq excludes eos, so score the tokens only)."""
    ids = torch.tensor([[START] + list(seq)])
    with torch.no_grad():
        logits = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=ids,
        ).logits
    lp = torch.log_softmax(logits.float(), -1)
    return sum(lp[0, i, t].item() for i, t in enumerate(seq))


def test_greedy_decode_matches_hf(checkpoint):
    hf, params, cfg, meta = checkpoint
    for seed in range(10):
        mel = _mel(100 + seed)
        with torch.no_grad():
            want = _hf_seq(
                hf.generate(
                    input_features=torch.from_numpy(mel),
                    max_new_tokens=MAX_NEW, num_beams=1, do_sample=False,
                    return_timestamps=False,
                )[0].tolist()
            )
        got = _ours_generate(
            params, cfg, meta, mel, [[START]],
            beam_size=1, sampling_temperature=0.0,
            with_timestamps=False, suppress_blank=False,
        )[0].sequences_ids[0]
        assert got == want, f"seed {seed}: {got} != {want}"


def test_greedy_via_sampling_path_matches_hf(checkpoint):
    """beam_size=1 + sampling_topk=1 is CT2's greedy spelling: the sampling
    kernel restricted to the single top candidate must equal HF greedy."""
    hf, params, cfg, meta = checkpoint
    for seed in range(3):
        mel = _mel(100 + seed)
        with torch.no_grad():
            want = _hf_seq(
                hf.generate(
                    input_features=torch.from_numpy(mel),
                    max_new_tokens=MAX_NEW, num_beams=1, do_sample=False,
                    return_timestamps=False,
                )[0].tolist()
            )
        got = _ours_generate(
            params, cfg, meta, mel, [[START]],
            beam_size=1, sampling_temperature=1.0, sampling_topk=1,
            with_timestamps=False, suppress_blank=False,
        )[0].sequences_ids[0]
        assert got == want, f"seed {seed}: {got} != {want}"


def test_batched_greedy_matches_hf(checkpoint):
    hf, params, cfg, meta = checkpoint
    mel = _mel(7, batch=3)
    with torch.no_grad():
        hf_out = hf.generate(
            input_features=torch.from_numpy(mel),
            max_new_tokens=MAX_NEW, num_beams=1, do_sample=False,
            return_timestamps=False,
        )
    res = _ours_generate(
        params, cfg, meta, mel, [[START]] * 3,
        beam_size=1, sampling_temperature=0.0,
        with_timestamps=False, suppress_blank=False,
    )
    for i in range(3):
        assert res[i].sequences_ids[0] == _hf_seq(hf_out[i].tolist()), i


def test_timestamp_rules_match_hf(checkpoint):
    """Greedy under HF's own WhisperTimeStampLogitsProcessor: pairing,
    monotonicity, initial-timestamp cap, and the force-timestamp
    probability rule must all agree step by step."""
    from transformers import GenerationConfig
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor,
    )

    hf, params, cfg, meta = checkpoint
    gcfg = GenerationConfig(
        no_timestamps_token_id=meta.no_timestamps,
        eos_token_id=EOS,
        max_initial_timestamp_index=50,
    )
    for seed in range(6):
        mel = _mel(200 + seed)
        proc = WhisperTimeStampLogitsProcessor(gcfg, begin_index=1)
        with torch.no_grad():
            want = _hf_seq(
                hf.generate(
                    input_features=torch.from_numpy(mel),
                    max_new_tokens=MAX_NEW, num_beams=1, do_sample=False,
                    return_timestamps=False, logits_processor=[proc],
                )[0].tolist()
            )
        got = _ours_generate(
            params, cfg, meta, mel, [[START]],
            beam_size=1, sampling_temperature=0.0,
            with_timestamps=True, suppress_blank=False,
            max_initial_timestamp_index=50,
        )[0].sequences_ids[0]
        assert got == want, f"seed {seed}: {got} != {want}"


def test_beam_decode_matches_or_outscores_hf(checkpoint):
    hf, params, cfg, meta = checkpoint
    n_identical = 0
    for seed in range(10):
        mel = _mel(100 + seed)
        with torch.no_grad():
            out = hf.generate(
                input_features=torch.from_numpy(mel),
                max_new_tokens=MAX_NEW, num_beams=4, do_sample=False,
                return_timestamps=False, length_penalty=0.0,
                early_stopping=True, return_dict_in_generate=True,
                output_scores=True,
            )
        hf_seq = _hf_seq(out.sequences[0].tolist())

        res = _ours_generate(
            params, cfg, meta, mel, [[START]],
            beam_size=4, patience=1.0, length_penalty=0.0,
            with_timestamps=False, suppress_blank=False, return_scores=True,
        )[0]
        our_seq = res.sequences_ids[0]
        our_score = res.scores[0]

        # Score honesty: our reported score is a real logprob sum.
        rescored = _torch_rescore(hf, mel, our_seq)
        assert abs(our_score - rescored) < 2e-2, (
            f"seed {seed}: reported {our_score} vs torch rescore {rescored}"
        )

        if our_seq == hf_seq:
            n_identical += 1
        else:
            hf_score = _torch_rescore(hf, mel, hf_seq)
            assert our_score >= hf_score - 1e-3, (
                f"seed {seed}: our beam result scores worse: "
                f"{our_score} < {hf_score}\nours {our_seq}\nhf   {hf_seq}"
            )
    # Tie-flips should be the exception, not the rule.
    assert n_identical >= 7, f"only {n_identical}/10 beam decodes identical"
