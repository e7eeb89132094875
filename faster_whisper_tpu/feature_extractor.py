"""Whisper log-mel feature extraction (TPU-backed).

Same public contract as the reference FeatureExtractor
(reference: faster_whisper/feature_extractor.py:5-230): construct with the
model's preprocessor_config values, call with a float32 waveform, get a
float32 (n_mels, n_frames) normalized log-mel matrix back.  The compute runs
on device via ops/mel.py (windowed-DFT matmuls on the MXU) instead of the
reference's host numpy STFT; results agree to f32 rounding.
"""

import numpy as np


class FeatureExtractor:
    def __init__(
        self,
        feature_size=80,
        sampling_rate=16000,
        hop_length=160,
        chunk_length=30,
        n_fft=400,
    ):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.chunk_length = chunk_length
        self.n_samples = chunk_length * sampling_rate
        self.nb_max_frames = self.n_samples // hop_length
        self.time_per_frame = hop_length / sampling_rate
        self.sampling_rate = sampling_rate
        self.feature_size = feature_size
        self.mel_filters = self.get_mel_filters(
            sampling_rate, n_fft, n_mels=feature_size
        ).astype(np.float32)
        self._device_constants = None

    @staticmethod
    def get_mel_filters(sr, n_fft, n_mels=128):
        """Slaney-scale mel filterbank, identical in math to librosa's
        ``filters.mel(..., htk=False)`` port used by the reference
        (reference: feature_extractor.py:25-65, incl. the hardcoded
        max_mel=45.245640471924965 at :34)."""
        n_mels = int(n_mels)
        fft_freqs = np.fft.rfftfreq(n=n_fft, d=1.0 / sr)

        # Mel band edges, uniformly spaced on the Slaney mel scale.
        max_mel = 45.245640471924965
        mels = np.linspace(0.0, max_mel, n_mels + 2)

        # Slaney: linear below 1 kHz, logarithmic above.
        f_sp = 200.0 / 3
        freqs = f_sp * mels
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        log_region = mels >= min_log_mel
        freqs[log_region] = min_log_hz * np.exp(
            logstep * (mels[log_region] - min_log_mel)
        )

        fdiff = np.diff(freqs)
        ramps = freqs[:, None] - fft_freqs[None, :]
        lower = -ramps[:-2] / fdiff[:-1, None]
        upper = ramps[2:] / fdiff[1:, None]
        weights = np.maximum(0.0, np.minimum(lower, upper))

        # Constant-energy (Slaney) normalization per channel.
        enorm = 2.0 / (freqs[2 : n_mels + 2] - freqs[:n_mels])
        weights *= enorm[:, None]

        return weights

    def _constants(self):
        """Lazily stage the filterbank and DFT bases onto the device."""
        if self._device_constants is None:
            import jax.numpy as jnp

            from faster_whisper_tpu.ops.mel import dft_basis, hann_window

            window = hann_window(self.n_fft)
            cos_b, sin_b = dft_basis(self.n_fft, window)
            self._device_constants = (
                jnp.asarray(self.mel_filters),
                jnp.asarray(cos_b),
                jnp.asarray(sin_b),
            )
        return self._device_constants

    def __call__(
        self, waveform: np.ndarray, padding=160, chunk_length=None, return_device=False
    ):
        """Compute the normalized log-mel spectrogram of ``waveform``.

        Matches the reference call contract (feature_extractor.py:198-230),
        including the mutable per-call ``chunk_length`` override
        (:203-205).  Returns a float32 numpy array (n_mels, n_frames), or
        the on-device array when ``return_device`` (the transcription
        pipelines keep features device-resident to avoid host round-trips).
        """
        if chunk_length is not None:
            self.n_samples = chunk_length * self.sampling_rate
            self.nb_max_frames = self.n_samples // self.hop_length

        if waveform.dtype != np.float32:
            waveform = waveform.astype(np.float32)

        from faster_whisper_tpu.ops.mel import log_mel_spectrogram

        mel_filters, cos_b, sin_b = self._constants()
        out = log_mel_spectrogram(
            waveform,
            mel_filters,
            cos_b,
            sin_b,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            padding=padding,
        )
        return out if return_device else np.asarray(out)

    def chunk_features(self, audio: np.ndarray, starts, lengths):
        """Per-chunk features for the batched pipeline, fully on device.

        Equivalent to ``[self(audio[s:s+l])[..., :-1]`` zero-padded to the
        30 s window ``for s, l in zip(starts, lengths)]`` (reference:
        transcribe.py:463-467 + :514-516) with one host->device audio
        transfer.  Returns a (N, n_mels, nb_max_frames) device array.
        """
        from faster_whisper_tpu.ops.mel import chunked_log_mel

        mel_filters, cos_b, sin_b = self._constants()
        return chunked_log_mel(
            audio,
            np.asarray(starts, np.int64),
            np.asarray(lengths, np.int64),
            mel_filters,
            cos_b,
            sin_b,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            n_frames_win=self.nb_max_frames,
        )
