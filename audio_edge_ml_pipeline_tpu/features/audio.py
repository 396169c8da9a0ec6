"""Registered audio extractors — batched jit pipelines on the accelerator.

Same names, parameters, and numerical contracts as the reference extractors
(audio/deep.py: audio_mel_spec :76-134, audio_waveform :142-188, audio_cqt
:196-260, audio_mfcc_seq :268-328; audio/classical.py: audio_classical
:94-356), with execution replaced by the ops.dsp batched kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..ops import dsp
from ..ops.golden.librosa_ref import _ALL_CLASSICAL
from .base import BatchedAudioExtractor
from .registry import register


@register
class AudioMelSpectrogram(BatchedAudioExtractor):
    """Log-mel spectrogram normalized to [0, 1]; shape (n_mels, T)."""

    name = "audio_mel_spec"
    feature_type = "deep"

    def __init__(
        self,
        sample_rate: int = 16000,
        n_mels: int = 40,
        n_fft: int = 512,
        hop_length: int = 160,
        duration: Optional[float] = None,
        backend: str = "xla",
    ) -> None:
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.duration = duration
        self.backend = backend
        if backend == "pallas":
            # fused Pallas mel core (ops/pallas_mel.py); numerically
            # equivalent. bench.py A/B on v5e (B=4096, 5 s clips): XLA
            # folded-gather path 81.4k clips/s vs Pallas 42.3k -> xla stays
            # the default; re-measured every round in BENCH_r*.json
            from ..ops.pallas_mel import mel_spec_feature_pallas

            interpret = jax.default_backend() not in ("tpu", "axon")
            self._fn = self._jit_time_major(
                lambda w, l: mel_spec_feature_pallas(
                    w, sr=sample_rate, n_mels=n_mels, n_fft=n_fft,
                    hop_length=hop_length, lengths=l, interpret=interpret,
                )
            )
        else:
            self._fn = self._jit_time_major(
                lambda w, l: dsp.mel_spec_feature(
                    w, sr=sample_rate, n_mels=n_mels, n_fft=n_fft, hop_length=hop_length, lengths=l
                )
            )

    def min_samples(self) -> int:
        return self.n_fft

    def frames_for(self, n_samples: int) -> int:
        return dsp.n_frames_for(n_samples, self.hop_length)

    def batch_feature(self, waves, lengths):
        return self._fn(waves, lengths)


@register
class AudioWaveform(BatchedAudioExtractor):
    """Raw PCM waveform peak-normalized to [-1, 1]; shape (n_samples,)."""

    name = "audio_waveform"
    feature_type = "deep"

    def __init__(self, sample_rate: int = 16000, duration: Optional[float] = 1.0) -> None:
        self.sample_rate = sample_rate
        self.duration = duration
        self._fn = jax.jit(dsp.waveform_feature)

    def batch_feature(self, waves, lengths):
        return self._fn(waves, lengths)


@register
class AudioCQT(BatchedAudioExtractor):
    """|CQT| in dB, normalized to [0, 1]; shape (n_bins, T)."""

    name = "audio_cqt"
    feature_type = "deep"
    # dsp.cqt_magnitude blocks its own frames tensor under _CQT_FRAMES_BUDGET,
    # so the extractor batch is set by throughput, not memory: B=512 measured
    # 4.2k clips/s on v5e vs a ~2.5k dispatch-overhead ceiling at the old B=64
    batch_size = 512

    def __init__(
        self,
        sample_rate: int = 22050,
        hop_length: int = 512,
        n_bins: int = 84,
        bins_per_octave: int = 12,
        fmin: Optional[float] = None,
        duration: Optional[float] = None,
    ) -> None:
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.n_bins = n_bins
        self.bins_per_octave = bins_per_octave
        self.fmin = fmin
        self.duration = duration
        self._fn = self._jit_time_major(
            lambda w, l: dsp.cqt_feature(
                w,
                sr=sample_rate,
                hop_length=hop_length,
                n_bins=n_bins,
                bins_per_octave=bins_per_octave,
                fmin=fmin,
                lengths=l,
            )
        )

    def min_samples(self) -> int:
        return self.hop_length * 2

    def frames_for(self, n_samples: int) -> int:
        return dsp.n_frames_for(n_samples, self.hop_length)

    def batch_feature(self, waves, lengths):
        return self._fn(waves, lengths)


@register
class AudioMFCCSequence(BatchedAudioExtractor):
    """MFCC sequence, per-coefficient z-scored; shape (n_mfcc, T)."""

    name = "audio_mfcc_seq"
    feature_type = "deep"

    def __init__(
        self,
        sample_rate: int = 22050,
        n_mfcc: int = 40,
        n_fft: int = 1024,
        hop_length: int = 512,
        duration: Optional[float] = None,
    ) -> None:
        self.sample_rate = sample_rate
        self.n_mfcc = n_mfcc
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.duration = duration
        self._fn = self._jit_time_major(
            lambda w, l: dsp.mfcc_seq_feature(
                w, sr=sample_rate, n_mfcc=n_mfcc, n_fft=n_fft, hop_length=hop_length, lengths=l
            )
        )

    def min_samples(self) -> int:
        return self.n_fft

    def frames_for(self, n_samples: int) -> int:
        return dsp.n_frames_for(n_samples, self.hop_length)

    def batch_feature(self, waves, lengths):
        return self._fn(waves, lengths)


@register
class AudioClassicalExtractor(BatchedAudioExtractor):
    """Flat classical feature vector (302-d default) for sklearn-style
    estimators; per-group mean/std aggregation in canonical order."""

    name = "audio_classical"
    feature_type = "classical"
    exact_length_batching = True  # deltas/contrast are not pad-maskable

    def __init__(
        self,
        sample_rate: int = 22050,
        n_mfcc: int = 40,
        n_mels: int = 128,
        n_fft: int = 1024,
        hop_length: int = 512,
        min_duration: float = 0.1,
        features: Optional[list[str]] = None,
        aggregations: Optional[list[str]] = None,
    ) -> None:
        self.sample_rate = sample_rate
        self.n_mfcc = n_mfcc
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.min_duration = min_duration
        self.duration = None
        if features is None:
            self.features = list(_ALL_CLASSICAL)
        else:
            unknown = set(features) - set(_ALL_CLASSICAL)
            if unknown:
                raise ValueError(
                    f"Unknown feature group(s): {sorted(unknown)}. Valid keys: {_ALL_CLASSICAL}"
                )
            self.features = [k for k in _ALL_CLASSICAL if k in set(features)]
        if aggregations is None:
            self.aggregations = ["mean", "std"]
        else:
            unknown = set(aggregations) - {"mean", "std"}
            if unknown:
                raise ValueError(f"Unknown aggregation(s): {sorted(unknown)}. Valid: ['mean', 'std']")
            if not aggregations:
                raise ValueError("aggregations must contain at least one value.")
            self.aggregations = [a for a in ["mean", "std"] if a in set(aggregations)]
        feats = tuple(self.features)
        aggs = tuple(self.aggregations)
        self._fn = jax.jit(
            lambda w, l: dsp.classical_feature_vector(
                w,
                sr=sample_rate,
                n_mfcc=n_mfcc,
                n_mels=n_mels,
                n_fft=n_fft,
                hop_length=hop_length,
                features=feats,
                aggregations=aggs,
                lengths=l,
            )
        )

    @property
    def feature_dim(self) -> int:
        n_agg = len(self.aggregations)
        raw = {"spectral_contrast": 7, "chroma": 12, "tonnetz": 6}
        total = 0
        for key in self.features:
            if key in ("mfcc", "delta_mfcc", "delta2_mfcc"):
                total += n_agg * self.n_mfcc
            else:
                total += n_agg * raw.get(key, 1)
        return total

    def min_samples(self) -> int:
        # one STFT frame + enough MFCC frames for the width-9 delta filter
        return max(int(self.min_duration * self.sample_rate), self.n_fft, 8 * self.hop_length)

    def batch_feature(self, waves, lengths):
        return self._fn(waves, lengths)
