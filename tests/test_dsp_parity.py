"""Parity: batched JAX DSP (float32) vs the float64 golden oracle.

BASELINE.md target: max|delta| <= 1e-5 for mel, MFCC, power_to_db and
normalization. Hz-scaled descriptors (centroid/rolloff/bandwidth) use a
relative tolerance of the same order.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_edge_ml_pipeline_tpu.ops import dsp
from audio_edge_ml_pipeline_tpu.ops import golden as g


@pytest.fixture(scope="module")
def batch16k():
    """8 heterogeneous 5 s clips @ 16 kHz."""
    rng = np.random.default_rng(16)
    sr, n = 16000, 80000
    t = np.arange(n) / sr
    clips = []
    for i in range(8):
        f0 = 180.0 * (i + 1)
        y = (
            0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 2.7 * f0 * t + i)
            + 0.06 * rng.standard_normal(n)
        )
        y[i * 5000 : i * 5000 + 2000] += 0.7 * rng.standard_normal(2000)
        clips.append(y.astype(np.float32))
    return np.stack(clips), sr


@pytest.fixture(scope="module")
def batch22k():
    rng = np.random.default_rng(22)
    sr, n = 22050, 66150  # 3 s
    t = np.arange(n) / sr
    clips = []
    for i in range(4):
        y = (
            0.5 * np.sin(2 * np.pi * (220 + 97 * i) * t)
            + 0.1 * rng.standard_normal(n)
        )
        clips.append(y.astype(np.float32))
    return np.stack(clips), sr


def _golden_stack(fn, batch):
    return np.stack([fn(batch[i]) for i in range(batch.shape[0])])


def test_stft_power_parity(batch16k):
    y, sr = batch16k
    S = np.asarray(dsp.stft_spectrum(jnp.asarray(y[:2]), 512, 160, power=2.0))
    ref = _golden_stack(lambda c: np.abs(g.stft(c, 512, 160)) ** 2, y[:2])
    # raw power spans ~6 orders of magnitude; compare relative to per-clip peak
    scale = ref.max(axis=(1, 2), keepdims=True)
    assert np.max(np.abs(S - ref) / scale) < 1e-6


def test_stft_re_im_folded_parity(batch16k):
    """The folded half-size-GEMM STFT must match the complex oracle bin-for-
    bin — including the DC column, the Nyquist column, and the x[N/2]
    rank-1 center correction that the fold splits out."""
    y, sr = batch16k
    re, im = dsp.stft_re_im(jnp.asarray(y[:2]), 512, 160)
    got = np.asarray(re) + 1j * np.asarray(im)          # (B, T, F)
    ref = _golden_stack(lambda c: g.stft(c, 512, 160).T, y[:2])
    scale = np.abs(ref).max(axis=(1, 2), keepdims=True)
    err = np.max(np.abs(got - ref) / scale)
    assert err < 1e-6, f"folded stft parity {err:.3e}"
    # the zero-imag bins stay exactly representable
    assert np.max(np.abs(np.asarray(im)[..., 0])) == 0.0
    assert np.max(np.abs(np.asarray(im)[..., -1])) == 0.0


def test_stft_re_im_edge_pad(batch16k):
    y, sr = batch16k
    re, im = dsp.stft_re_im(jnp.asarray(y[:1]), 512, 160, pad_mode="edge")
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = _golden_stack(lambda c: g.stft(c, 512, 160, pad_mode="edge").T, y[:1])
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / scale < 1e-6


def test_mel_spec_feature_parity(batch16k):
    y, sr = batch16k
    out = np.asarray(dsp.mel_spec_feature(jnp.asarray(y), sr=sr))
    ref = _golden_stack(lambda c: g.mel_spec_feature(c, sr=sr), y)
    err = np.max(np.abs(out - ref))
    assert err <= 1e-5, f"mel parity {err:.3e}"


def test_mel_spec_feature_masked_variable_length(batch16k):
    y, sr = batch16k
    lengths = np.array([80000, 72000, 48000, 80000, 16000, 60800, 80000, 33600], np.int32)
    padded = y.copy()
    for i, L in enumerate(lengths):
        padded[i, L:] = 0.0
    out = np.asarray(dsp.mel_spec_feature(jnp.asarray(padded), sr=sr, lengths=jnp.asarray(lengths)))
    for i, L in enumerate(lengths):
        T = 1 + L // 160
        ref = g.mel_spec_feature(y[i, :L], sr=sr)
        err = np.max(np.abs(out[i, :, :T] - ref))
        assert err <= 1e-5, f"clip {i}: {err:.3e}"


def test_mfcc_seq_parity(batch22k):
    y, sr = batch22k
    out = np.asarray(dsp.mfcc_seq_feature(jnp.asarray(y), sr=sr))
    ref = _golden_stack(lambda c: g.mfcc_seq_feature(c, sr=sr), y)
    err = np.max(np.abs(out - ref))
    assert err <= 1e-5, f"mfcc_seq parity {err:.3e}"  # measured 5.5e-6 (z-scored, f32)


def test_raw_mfcc_parity(batch22k):
    y, sr = batch22k
    out = np.asarray(dsp.mfcc(jnp.asarray(y), sr, 40, 1024, 512))
    ref = _golden_stack(lambda c: g.mfcc(c, sr, 40, 1024, 512), y)
    err = np.max(np.abs(out - ref))
    assert err <= 1e-3, f"raw mfcc (dB scale ~[-700,0]) parity {err:.3e}"
    rel = err / max(1.0, np.abs(ref).max())
    assert rel <= 1e-5


def test_delta_parity(batch22k):
    y, sr = batch22k
    M = _golden_stack(lambda c: g.mfcc(c, sr, 40, 1024, 512), y).astype(np.float32)
    for order in (1, 2):
        out = np.asarray(dsp.delta(jnp.asarray(M), order=order))
        ref = np.stack([g.delta(M[i].astype(np.float64), order=order) for i in range(len(M))])
        err = np.max(np.abs(out - ref))
        assert err <= 2e-3, f"delta{order} {err:.3e}"  # dB-scale inputs


def test_cqt_feature_parity(batch22k):
    y, sr = batch22k
    out = np.asarray(dsp.cqt_feature(jnp.asarray(y), sr=sr))
    ref = _golden_stack(lambda c: g.cqt_feature(c, sr=sr), y)
    err = np.max(np.abs(out - ref))
    # time-domain two-float kernels + chunked Kahan contraction: measured
    # ~7e-6 across seeds — meets the repo-wide <=1e-5 parity gate
    assert err <= 1e-5, f"cqt parity {err:.3e}"


def test_cqt_multirate_magnitude_parity(batch22k):
    """The multirate experiment (closed as precision-bound for the FEATURE
    gate — ops/dsp.py header + docs/EXTRACTION_PERF.md) must keep its
    measured magnitude-level parity: |CQT| within 1e-5 of the oracle
    relative to the global max. This pins the Poisson-subsampled kernels,
    cascade normalization, and two-float chain against rot."""
    y, sr = batch22k
    got = np.asarray(dsp.cqt_magnitude_multirate(jnp.asarray(y[:2]), sr, 512, 84))
    ref = _golden_stack(lambda c: g.cqt(c.astype(np.float64), sr, 512, 84), y[:2])
    err = np.max(np.abs(got - ref)) / ref.max()
    assert err <= 1e-5, f"multirate |CQT| parity {err:.3e}"


def test_cqt_batch_blocking_matches_direct(batch22k, monkeypatch):
    """Large batches run CQT in batch blocks under a scan (the direct
    path's frames tensor measured OOM at B=1024 on v5e); each block must
    reproduce the direct path's contraction. Shrinking the budget forces
    the blocked path on the test batch, including an uneven final block."""
    y4, sr = batch22k
    y = np.concatenate([y4, y4[:1]])  # B=5: prime, forces a padded block
    direct = np.asarray(dsp.cqt_magnitude(jnp.asarray(y), sr, 512, 84))
    n_fft = dsp.ref.cqt_time_basis(sr, dsp.ref.C1_HZ, 84, 12)[1]
    T = dsp.n_frames_for(y.shape[1], 512)
    # budget for 2.5 clips -> nb=2 (no divisor of 5 in [2, 4]), Bb=3,
    # final block padded with one zero row that must be sliced off
    monkeypatch.setattr(dsp, "_CQT_FRAMES_BUDGET", int(2.5 * T * n_fft))
    blocked = np.asarray(dsp.cqt_magnitude(jnp.asarray(y), sr, 512, 84))
    assert blocked.shape == direct.shape
    # same formulation at a smaller GEMM row count: tiny lowering jitter
    # only — far inside the 1e-5 feature gate
    assert np.max(np.abs(blocked - direct)) <= 2e-6

    # degenerate-divisor guard: at B=7 with a ~1.4-clip budget the only
    # divisor of B in [nb, 2nb] is 7 itself (Bb=1 — a sequential per-clip
    # scan); the guard must reject it in favor of the padded Bb=2 split,
    # and parity must hold through the extra pad row
    y7 = np.concatenate([y4, y4[:3]])
    monkeypatch.setattr(dsp, "_CQT_FRAMES_BUDGET", 512 * 1024 * 1024)
    direct7 = np.asarray(dsp.cqt_magnitude(jnp.asarray(y7), sr, 512, 84))
    monkeypatch.setattr(dsp, "_CQT_FRAMES_BUDGET", int(1.4 * T * n_fft))
    blocked7 = np.asarray(dsp.cqt_magnitude(jnp.asarray(y7), sr, 512, 84))
    assert np.max(np.abs(blocked7 - direct7)) <= 2e-6


def test_waveform_feature_parity(batch16k):
    y, sr = batch16k
    out = np.asarray(dsp.waveform_feature(jnp.asarray(y)))
    ref = _golden_stack(g.waveform_feature, y)
    assert np.max(np.abs(out - ref)) <= 1e-6


def test_classical_vector_parity(batch22k):
    y, sr = batch22k
    out = np.asarray(dsp.classical_feature_vector(jnp.asarray(y), sr=sr))
    ref = _golden_stack(lambda c: g.classical_feature_vector(c, sr=sr), y)
    assert out.shape == ref.shape == (4, 302)
    # mixed physical scales: compare per-dimension relative to golden scale
    scale = np.maximum(np.abs(ref), 1.0)
    rel = np.max(np.abs(out - ref) / scale)
    assert rel <= 1e-4, f"classical rel parity {rel:.3e}"


def test_stft_spectrum_conv_branch_parity(batch22k):
    """Odd n_fft and non-constant pad modes cannot take the folded
    half-size GEMMs (no symmetric fold) and route through the strided-conv
    DFT basis — pin that branch against the float64 oracle so the round-3
    even-fold rewrite can't silently break it."""
    y, _sr = batch22k
    y = y[:, :8000]
    yj = jnp.asarray(y)
    for n_fft, hop, pad in [(511, 256, "constant"), (512, 256, "edge")]:
        S = np.asarray(dsp.stft_spectrum(yj, n_fft, hop, power=1.0, pad_mode=pad))
        ref = np.stack([np.abs(g.stft(y[i], n_fft, hop, pad_mode=pad)) for i in range(4)])
        assert S.shape == ref.shape, (n_fft, pad, S.shape, ref.shape)
        # raw magnitude spans orders of magnitude; gate relative to the
        # per-clip peak like the primary stft parity tests
        scale = ref.max(axis=(1, 2), keepdims=True)
        assert np.max(np.abs(S - ref) / scale) <= 1e-6, (n_fft, pad)


def test_rms_zcr_odd_frame_lengths(batch22k):
    """Odd frame_length pads one sample less than even (2*(frame//2) =
    frame-1), so the librosa frame count drops when hop divides n. The rms
    hop-block fast path crashed on this (slice past the block array) and
    both paths overcounted frames before the round-3 fix."""
    y, _sr = batch22k
    y = y[:, :5000]
    yj = jnp.asarray(y)
    for frame, hop in [(5, 1), (1023, 341), (255, 51)]:
        r = np.asarray(dsp.rms(yj, frame, hop))
        r_ref = np.stack([g.rms(y[i], frame, hop)[0] for i in range(4)])
        assert r.shape == r_ref.shape, (frame, hop, r.shape, r_ref.shape)
        assert np.max(np.abs(r - r_ref)) <= 1e-5, (frame, hop)
    for frame, hop in [(2047, 512), (255, 64)]:
        z = np.asarray(dsp.zero_crossing_rate(yj, frame_length=frame, hop_length=hop))
        z_ref = np.stack(
            [g.zero_crossing_rate(y[i], frame_length=frame, hop_length=hop)[0] for i in range(4)]
        )
        assert z.shape == z_ref.shape, (frame, hop, z.shape, z_ref.shape)
        assert np.max(np.abs(z - z_ref)) <= 1e-6, (frame, hop)


def test_classical_vector_group_parity(batch22k):
    """Per-group absolute parity on the [0,1]-ish groups."""
    y, sr = batch22k
    yj = jnp.asarray(y)
    Smag = dsp.stft_spectrum(yj, 1024, 512, power=1.0)
    flat = np.asarray(dsp.spectral_flatness_from_mag(Smag))
    flat_ref = np.stack([g.spectral_flatness(y[i], 1024, 512)[0] for i in range(4)])
    assert np.max(np.abs(flat - flat_ref)) <= 1e-5
    z = np.asarray(dsp.zero_crossing_rate(yj, hop_length=512))
    z_ref = np.stack([g.zero_crossing_rate(y[i], hop_length=512)[0] for i in range(4)])
    assert np.max(np.abs(z - z_ref)) <= 1e-6
    r = np.asarray(dsp.rms(yj, 1024, 512))
    r_ref = np.stack([g.rms(y[i], 1024, 512)[0] for i in range(4)])
    assert np.max(np.abs(r - r_ref)) <= 1e-5
    ch = np.asarray(dsp.chroma_from_power(Smag * Smag, sr, 1024))
    ch_ref = np.stack([g.chroma_stft(y[i], sr, 1024, 512) for i in range(4)])
    assert np.max(np.abs(ch - ch_ref)) <= 1e-4
    tn = np.asarray(dsp.tonnetz_from_chroma(ch))
    tn_ref = np.stack([g.tonnetz(ch_ref[i]) for i in range(4)])
    assert np.max(np.abs(tn - tn_ref)) <= 1e-4
    sc = np.asarray(dsp.spectral_contrast_from_mag(Smag, sr, 1024))
    sc_ref = np.stack([g.spectral_contrast(y[i], sr, 1024, 512) for i in range(4)])
    # dB scale; valleys are means of the bottom-2% quantile of |STFT| so f32
    # log error is amplified — gate at 1e-2 dB absolute / 1e-4 relative
    assert np.max(np.abs(sc - sc_ref)) <= 1e-2
    assert np.max(np.abs(sc - sc_ref)) / max(1.0, np.abs(sc_ref).max()) <= 2e-4
    cen = np.asarray(dsp.spectral_centroid_from_mag(Smag, sr, 1024))
    cen_ref = np.stack([g.spectral_centroid(y[i], sr, 1024, 512)[0] for i in range(4)])
    assert np.max(np.abs(cen - cen_ref) / np.maximum(cen_ref, 1.0)) <= 1e-5
    ro = np.asarray(dsp.spectral_rolloff_from_mag(Smag, sr, 1024))
    ro_ref = np.stack([g.spectral_rolloff(y[i], sr, 1024, 512)[0] for i in range(4)])
    assert np.max(np.abs(ro - ro_ref)) <= 1e-3  # exact bin freqs; ties only
    bw = np.asarray(dsp.spectral_bandwidth_from_mag(Smag, sr, 1024))
    bw_ref = np.stack([g.spectral_bandwidth(y[i], sr, 1024, 512)[0] for i in range(4)])
    assert np.max(np.abs(bw - bw_ref) / np.maximum(bw_ref, 1.0)) <= 1e-4


def test_mel_parity_on_degenerate_signals():
    """Edge signals stress the per-clip reductions that random clips never
    do: all-zero (power_to_db ref=max hits the amin floor everywhere,
    min-max normalize divides by a zero range), DC (all energy in bin 0),
    full-scale square at Nyquist/4, and an impulse (center padding puts
    half the frame outside the signal). The JAX path must match the
    float64 oracle within the 1e-5 gate and stay NaN-free on all of them."""
    sr, n = 16000, 16000
    t = np.arange(n) / sr
    clips = np.stack([
        np.zeros(n, np.float32),
        np.full(n, 0.5, np.float32),
        np.sign(np.sin(2 * np.pi * 2000 * t)).astype(np.float32),
        np.concatenate([[1.0], np.zeros(n - 1)]).astype(np.float32),
        (1e-6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),  # near-silence
    ])
    out = np.asarray(dsp.mel_spec_feature(jnp.asarray(clips), sr=sr))
    assert np.isfinite(out).all()
    ref = _golden_stack(lambda y: g.mel_spec_feature(y, sr=sr), clips.astype(np.float64))
    assert np.isfinite(ref).all()
    assert np.max(np.abs(out - ref)) <= 1e-5


def test_classical_vector_on_degenerate_signals():
    """The 302-d classical stack divides by spectral sums (centroid,
    bandwidth, flatness) and clip RMS — silence and DC are the divide-by-
    zero corners. The full vector must be finite; parity is asserted with
    spectral_contrast excluded: contrast is log-ratios of SORTED bin
    magnitudes per band, and on a clip whose upper bands hold zero signal
    those magnitudes are pure float rounding noise — f32 and float64 noise
    floors differ by orders of magnitude, so the group is legitimately
    undefined there (librosa would be equally noise-determined; even an
    XLA codegen flag shifts the f32 values). Every other group is
    well-conditioned and must match."""
    sr, n = 22050, 22050
    t = np.arange(n) / sr
    clips = np.stack([
        np.zeros(n, np.float32),
        np.full(n, 0.25, np.float32),
        np.sign(np.sin(2 * np.pi * 1000 * t)).astype(np.float32),
    ])
    full = np.asarray(dsp.classical_feature_vector(jnp.asarray(clips), sr=sr))
    assert full.shape == (3, 302) and np.isfinite(full).all()

    from audio_edge_ml_pipeline_tpu.ops.golden import librosa_ref as lr

    feats = tuple(k for k in lr._ALL_CLASSICAL if k != "spectral_contrast")
    out = np.asarray(dsp.classical_feature_vector(jnp.asarray(clips), sr=sr, features=feats))
    ref = _golden_stack(
        lambda y: g.classical_feature_vector(y, sr=sr, features=feats),
        clips.astype(np.float64),
    )
    scale = np.maximum(np.abs(ref), 1.0)
    rel = np.max(np.abs(out - ref) / scale, axis=1)
    # silence and the full-scale square are well-conditioned everywhere;
    # the DC clip's spectral_bandwidth is (f-centroid)^2-weighted window
    # sidelobe leakage — high-bin noise floor amplified by f^2 — so f32 vs
    # float64 legitimately differ at the percent level there (measured
    # 1.2% on the bandwidth mean, everything else <= 6e-4)
    assert rel[0] <= 2e-4 and rel[2] <= 2e-4, rel
    assert rel[1] <= 2e-2, rel
