"""Self-consistency tests for the golden (numpy float64) DSP oracle.

Where an independent implementation exists in scipy/numpy, the golden module
is cross-checked against it (DCT, Savitzky-Golay deltas, rFFT framing). The
remaining functions are validated structurally (shapes, ranges, known
analytic cases)."""

import numpy as np
import pytest
import scipy.fft
import scipy.signal

from audio_edge_ml_pipeline_tpu.ops import golden as g


def test_hann_periodic_matches_scipy():
    for n in (16, 512, 1024):
        w = g.hann_periodic(n)
        ref = scipy.signal.get_window("hann", n, fftbins=True)
        np.testing.assert_allclose(w, ref, atol=1e-12)


def test_stft_frame_count_and_direct_dft(fsc22_like_clip):
    y = fsc22_like_clip[:4000].astype(np.float64)
    n_fft, hop = 512, 160
    S = g.stft(y, n_fft=n_fft, hop_length=hop)
    assert S.shape == (257, 1 + len(y) // hop)
    # frame 3 checked against a direct DFT of the padded, windowed frame
    pad = np.pad(y, n_fft // 2)
    fi = 3
    frame = pad[fi * hop : fi * hop + n_fft] * g.hann_periodic(n_fft)
    np.testing.assert_allclose(S[:, fi], np.fft.rfft(frame), atol=1e-9)


def test_mel_filterbank_properties():
    fb = g.mel_filterbank(16000, 512, 40)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all()
    # each filter has nonzero support and peaks strictly inside the band
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: filters integrate to ~2/bandwidth -> rows not unit
    peaks = fb.argmax(axis=1)
    # strictly increasing interior peaks: collapsed adjacent filters or
    # edge-pinned peaks (bin 0 / Nyquist) would all slip past a >= check
    assert (np.diff(peaks) > 0).all()
    assert peaks[0] > 0 and peaks[-1] < fb.shape[1] - 1


def test_power_to_db_ref_max_and_topdb():
    S = np.array([[1e-12, 1.0, 100.0]])
    out = g.power_to_db(S, ref="max")
    assert out.max() == 0.0
    assert out.min() >= -80.0  # top_db clip
    out2 = g.power_to_db(S, ref=1.0, top_db=None)
    np.testing.assert_allclose(out2[0, 2], 20.0, atol=1e-12)


def test_dct_matrix_matches_scipy():
    D = g.dct_ii_ortho_matrix(40, 128)
    x = np.random.default_rng(0).standard_normal((128, 7))
    ref = scipy.fft.dct(x, type=2, norm="ortho", axis=0)[:40]
    np.testing.assert_allclose(D @ x, ref, atol=1e-10)


def test_delta_matches_scipy_savgol():
    x = np.random.default_rng(1).standard_normal((40, 64))
    for order in (1, 2):
        ours = g.delta(x, width=9, order=order)
        ref = scipy.signal.savgol_filter(x, 9, polyorder=order, deriv=order, axis=-1, mode="interp")
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_mel_spec_feature_contract(fsc22_like_clip):
    feat = g.mel_spec_feature(fsc22_like_clip, sr=16000, n_mels=40, n_fft=512, hop_length=160)
    assert feat.shape == (40, 1 + len(fsc22_like_clip) // 160)  # 501 frames for 5 s
    assert feat.shape[1] == 501
    assert 0.0 <= feat.min() and feat.max() <= 1.0
    # normalization hits both ends of [0,1] (up to eps)
    assert feat.max() > 0.999
    assert feat.min() < 1e-6


def test_mfcc_seq_feature_standardized(clip_22050):
    feat = g.mfcc_seq_feature(clip_22050)
    assert feat.shape[0] == 40
    np.testing.assert_allclose(feat.mean(axis=1), 0.0, atol=1e-7)
    np.testing.assert_allclose(feat.std(axis=1), 1.0, atol=1e-3)


def test_cqt_feature_shape_and_tone_peak(clip_22050):
    feat = g.cqt_feature(clip_22050, sr=22050, hop_length=512, n_bins=84)
    assert feat.shape == (84, 1 + len(clip_22050) // 512)
    assert 0.0 <= feat.min() and feat.max() <= 1.0
    # C5 = 523.25 Hz should dominate: bin index = 12*log2(523.25/C1) = 48
    mean_energy = feat.mean(axis=1)
    assert abs(int(mean_energy.argmax()) - 48) <= 1


def test_classical_vector_dims(clip_22050):
    v = g.classical_feature_vector(clip_22050)
    assert v.shape == (302,)  # reference audio/classical.py:30-31
    lean = g.classical_feature_vector(
        clip_22050,
        features=[
            "mfcc",
            "spectral_centroid",
            "spectral_rolloff",
            "spectral_bandwidth",
            "spectral_contrast",
            "spectral_flatness",
            "chroma",
            "zcr",
            "rms",
        ],
    )
    assert lean.shape == (130,)  # reference audio/classical.py:36-39
    mean_only = g.classical_feature_vector(clip_22050, aggregations=["mean"])
    assert mean_only.shape == (151,)


def test_spectral_descriptors_sane(clip_22050):
    y, sr, n_fft, hop = clip_22050, 22050, 1024, 512
    c = g.spectral_centroid(y, sr, n_fft, hop)
    assert (c > 0).all() and (c < sr / 2).all()
    r = g.spectral_rolloff(y, sr, n_fft, hop)
    assert (r >= 0).all() and (r <= sr / 2).all()
    bw = g.spectral_bandwidth(y, sr, n_fft, hop)
    assert (bw > 0).all()
    fl = g.spectral_flatness(y, n_fft, hop)
    assert (fl >= 0).all() and (fl <= 1.0 + 1e-9).all()
    sc = g.spectral_contrast(y, sr, n_fft, hop)
    assert sc.shape[0] == 7
    ch = g.chroma_stft(y, sr, n_fft, hop)
    assert ch.shape[0] == 12
    assert ch.max() <= 1.0 + 1e-12
    # C natural should dominate the chromagram of a C5+A3 dyad
    assert ch.mean(axis=1).argmax() == 0
    tn = g.tonnetz(ch)
    assert tn.shape[0] == 6
    z = g.zero_crossing_rate(y, hop_length=hop)
    assert (z >= 0).all() and (z <= 1).all()
    rm = g.rms(y, frame_length=n_fft, hop_length=hop)
    assert (rm >= 0).all()


def test_zcr_analytic():
    # 100 Hz square-ish wave at sr=16000: 200 crossings/s -> zcr = 200/16000
    sr = 16000
    t = np.arange(sr) / sr
    y = np.sign(np.sin(2 * np.pi * 100 * t)) * 0.5
    z = g.zero_crossing_rate(y, frame_length=2048, hop_length=512)
    np.testing.assert_allclose(z.mean(), 200.0 / sr, rtol=0.05)


def test_rms_analytic():
    y = np.ones(8192) * 0.5
    r = g.rms(y, frame_length=2048, hop_length=512)
    # interior frames see all-0.5 signal -> rms 0.5
    np.testing.assert_allclose(r[0, 4:-4], 0.5, atol=1e-12)
