"""Audio frontend: Whisper log-mel spectrogram (host-side, numpy).

Ref analog: the feature-extraction step of the reference's
transcription endpoint (vllm/entrypoints/openai/speech_to_text.py ->
HF WhisperFeatureExtractor). Pure numpy so the serving frontend needs
no torch/audio deps: hann STFT (center/reflect), slaney-scale mel
filterbank, log10 with Whisper's max-8 clamp and (x+4)/4 scaling.
Differentially tested against WhisperFeatureExtractor
(tests/models/test_whisper_vs_hf.py).
"""

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_SECONDS = 30


def _hertz_to_mel(freq):
    # Slaney scale: linear below 1 kHz, log above.
    freq = np.asarray(freq, np.float64)
    mels = 3.0 * freq / 200.0
    log_region = freq >= 1000.0
    logstep = 27.0 / np.log(6.4)
    return np.where(log_region,
                    15.0 + np.log(np.maximum(freq, 1e-10) / 1000.0) *
                    logstep, mels)


def _mel_to_hertz(mels):
    mels = np.asarray(mels, np.float64)
    freq = 200.0 * mels / 3.0
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= 15.0,
                    1000.0 * np.exp(logstep * (mels - 15.0)), freq)


def mel_filter_bank(n_freqs: int = N_FFT // 2 + 1,
                    n_mels: int = N_MELS,
                    sample_rate: int = SAMPLE_RATE,
                    fmin: float = 0.0,
                    fmax: float = 8000.0) -> np.ndarray:
    """[n_mels, n_freqs] triangular slaney-normalized filterbank."""
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_hertz_to_mel(fmin), _hertz_to_mel(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hertz(mel_pts)
    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # [F, M+2]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up)).T  # [M, F]
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    return fb * enorm[:, None]


def log_mel_spectrogram(audio: np.ndarray,
                        n_mels: int = N_MELS,
                        n_samples: int | None = None) -> np.ndarray:
    """waveform [S] float -> Whisper log-mel [n_mels, frames].

    Pads/trims to the 30 s window (n_samples overrides for tiny test
    checkpoints with short max_source_positions)."""
    audio = np.asarray(audio, np.float64).reshape(-1)
    if n_samples is None:
        n_samples = CHUNK_SECONDS * SAMPLE_RATE
    if len(audio) < n_samples:
        audio = np.pad(audio, (0, n_samples - len(audio)))
    else:
        audio = audio[:n_samples]
    # Center STFT with reflect padding (HF spectrogram center=True).
    pad = N_FFT // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    window = np.hanning(N_FFT + 1)[:-1]
    n_frames = 1 + (len(padded) - N_FFT) // HOP
    idx = (np.arange(N_FFT)[None, :] +
           HOP * np.arange(n_frames)[:, None])
    frames = padded[idx] * window
    stft = np.fft.rfft(frames, n=N_FFT, axis=1)  # [T, F]
    magnitudes = np.abs(stft[:-1]) ** 2  # whisper drops the last frame
    fb = mel_filter_bank(n_mels=n_mels)
    mel = fb @ magnitudes.T  # [M, T-1]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)
