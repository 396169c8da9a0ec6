"""ops.golden — float64 numpy reference implementations (the parity oracle).

librosa is not a dependency of this framework. Instead, every DSP algorithm
the reference pipeline relies on (librosa calls in
reference src/preprocessing/feature_extraction/audio/{deep,classical}.py) is
re-implemented here from its published definition, in float64 numpy, with
librosa's exact conventions (center=True constant padding, periodic Hann,
slaney mel filterbank, power_to_db(ref=np.max, top_db=80), Savitzky-Golay
deltas, Ellis chroma, ...).

The JAX/Pallas kernels in ``ops/`` are tested against this module to
max|delta| <= 1e-5 (BASELINE.md parity target). The C mel frontend emitted by
the deploy codegen is tested against it too, replacing the reference's
device-only parity loop (tools/receive_mel.py) with a host-executable one.
"""

from .librosa_ref import (  # noqa: F401
    hann_periodic,
    frame_signal,
    stft,
    fft_frequencies,
    hz_to_mel,
    mel_to_hz,
    mel_frequencies,
    mel_filterbank,
    power_to_db,
    amplitude_to_db,
    minmax_normalize,
    melspectrogram,
    dct_ii_ortho_matrix,
    mfcc,
    delta,
    chroma_filterbank,
    chroma_stft,
    spectral_centroid,
    spectral_rolloff,
    spectral_bandwidth,
    spectral_contrast,
    spectral_flatness,
    zero_crossing_rate,
    rms,
    tonnetz,
    cqt_basis,
    cqt,
    classical_feature_vector,
    mel_spec_feature,
    mfcc_seq_feature,
    cqt_feature,
    waveform_feature,
)
