"""Container smoke test: transcribe the bundled jfk.flac and print segments.

Equivalent of the reference's docker/infer.py (tiny model, word
timestamps).  With network access the real `tiny` checkpoint is
downloaded from the hub; in hermetic environments set FWT_RANDOM_WEIGHTS=1
to run the identical pipeline on a random-weight tiny model (the output
text is garbage but the full device path — mel, encoder, beam search,
word-timestamp DTW — executes).
"""

import os

jfk_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jfk.flac")
if not os.path.exists(jfk_path):
    jfk_path = "jfk.flac"

if os.environ.get("FWT_RANDOM_WEIGHTS") == "1":
    import dataclasses

    from faster_whisper_tpu.models.config import CONFIGS
    from faster_whisper_tpu.models.load import random_params
    from faster_whisper_tpu.testing import build_synthetic_tokenizer
    from faster_whisper_tpu.transcribe import WhisperModel

    tok = build_synthetic_tokenizer(base_vocab=50257)
    config = dataclasses.replace(
        CONFIGS["tiny"], n_vocab=tok.get_vocab_size(), multilingual=True
    )
    model = WhisperModel.from_parts(
        random_params(config, dtype="float32"), config, tok,
        {"feature_size": config.n_mels},
    )
else:
    from faster_whisper_tpu import WhisperModel

    model = WhisperModel("tiny")

segments, info = model.transcribe(jfk_path, word_timestamps=True)
for segment in segments:
    print("[%.2fs -> %.2fs] %s" % (segment.start, segment.end, segment.text))
