"""Batched TPU-native DSP kernels (JAX/XLA).

Everything here is a pure function over fixed-shape batches, designed to be
jit-compiled and pjit-sharded over the batch axis. This replaces the
reference's per-sample librosa loop (reference base.py:199-214, the
throughput bottleneck named in SURVEY.md §3.1):

- The STFT is a single strided convolution against windowed DFT bases
  (cos/sin), i.e. one big MXU matmul per hop — no Python loop, no FFT
  butterflies on the VPU. For large transforms (CQT) it falls back to
  XLA's native rFFT.
- The mel filterbank, DCT-II, chroma and tonnetz transforms are matmuls
  against constants built by ops.golden (single source of truth for
  filter numerics).
- All per-clip reductions (power_to_db ref=max, min-max normalization,
  mean/std aggregations) accept an optional valid-length mask so padded
  batches of variable-length clips reproduce the exact per-clip librosa
  semantics (SURVEY.md §7 hard part 4).

Numerical contract: float32 outputs must match ops.golden (float64) to
max|delta| <= 1e-5 (BASELINE.md). All matmuls use Precision.HIGHEST so the
TPU MXU runs the f32 passes rather than bf16.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .golden import librosa_ref as ref

HIGHEST = lax.Precision.HIGHEST

# ----------------------------------------------------------------------
# Constant builders (numpy, float64 -> device constants)
# ----------------------------------------------------------------------


def dft_bases(n_fft: int, window: str = "hann") -> np.ndarray:
    """Windowed DFT basis, shape (2 * n_freq, n_fft) float32.

    Row k < n_freq is w[n]*cos(2*pi*k*n/N); row n_freq+k is
    -w[n]*sin(2*pi*k*n/N) (the imaginary part of e^{-2pi i kn/N}).
    """
    n_freq = 1 + n_fft // 2
    if window == "hann":
        w = ref.hann_periodic(n_fft)
    elif window == "ones":
        w = np.ones(n_fft)
    else:
        raise ValueError(window)
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freq, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft
    basis = np.concatenate([np.cos(ang) * w[None, :], -np.sin(ang) * w[None, :]], axis=0)
    return basis.astype(np.float32)


def mel_fb(sr: float, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    return ref.mel_filterbank(sr, n_fft, n_mels, fmin=fmin, fmax=fmax).astype(np.float32)


def dct_mat(n_mfcc: int, n_mels: int) -> np.ndarray:
    return ref.dct_ii_ortho_matrix(n_mfcc, n_mels).astype(np.float32)


def chroma_fb(sr: float, n_fft: int, n_chroma: int = 12) -> np.ndarray:
    return ref.chroma_filterbank(sr, n_fft, n_chroma=n_chroma).astype(np.float32)


def tonnetz_basis(n_chroma: int = 12) -> np.ndarray:
    dim_map = np.linspace(0, 12, num=n_chroma, endpoint=False)
    scale = np.asarray([7.0 / 6, 7.0 / 6, 3.0 / 2, 3.0 / 2, 2.0 / 3, 2.0 / 3])
    V = np.multiply.outer(scale, dim_map)
    V[::2] -= 0.5
    R = np.array([1, 1, 1, 1, 0.5, 0.5])
    return (R[:, None] * np.cos(np.pi * V)).astype(np.float32)


def delta_coeffs(width: int = 9, order: int = 1) -> tuple[np.ndarray, float]:
    """(interior FIR coeffs, constant edge value factor).

    For savgol with deriv == polyorder the 'interp' edge values are constant
    across the edge region: order! * (pinv of the uncentered Vandermonde)
    [order] dotted with the edge window. Returns interior coeffs and the
    uncentered row used for both edges.
    """
    import math

    half = (width - 1) // 2
    t = np.arange(-half, half + 1, dtype=np.float64)
    A = np.vander(t, order + 1, increasing=True)
    interior = np.linalg.pinv(A)[order] * math.factorial(order)
    t0 = np.arange(width, dtype=np.float64)
    A0 = np.vander(t0, order + 1, increasing=True)
    edge_row = np.linalg.pinv(A0)[order] * math.factorial(order)
    return interior.astype(np.float32), edge_row.astype(np.float32)


# ----------------------------------------------------------------------
# Frame / STFT machinery
# ----------------------------------------------------------------------


def n_frames_for(n_samples: int, hop_length: int) -> int:
    """Frame count with center=True, even n_fft: 1 + n // hop (the contract
    the device C frontend also implements; reference model_to_c.py:562-568)."""
    return 1 + n_samples // hop_length


@functools.lru_cache(maxsize=None)
def _folded_dft_bases(n_fft: int, window: str):
    """MXU-aligned folded DFT bases (numpy constants, built once).

    The windowed real-DFT basis is symmetric about the frame midpoint for
    any symmetric window (periodic hann: h[n] = h[N-n]; cos even, sin odd),
    so with p[n] = x[n] + x[N-n] and m[n] = x[n] - x[N-n]:

        re = p_vec @ A.T + x[N/2] * wr_half        A:  (F, N/2)
        im = m_vec @ B.T                           B:  (F, N/2)

    — exactly half the MACs of the unfolded (2F, N) basis, and the N/2
    contraction dim tiles the 128-lane MXU with zero padding waste (the
    unfolded/odd layouts pad 257 -> 384). x[N/2] rides as a rank-1
    correction so the contraction stays a clean power of two. Measured on
    v5e (B=4096, 5 s clips): 54.0k clips/s vs 41.5k for the strided-conv
    formulation, parity 4.8e-7 (scripts/fold_dft_experiment.py).

    Returns (A_T, B_T, wr_half) as float32 numpy: (N/2, F), (N/2, F), (F,).
    """
    n_freq = 1 + n_fft // 2
    half = n_fft // 2
    basis = dft_bases(n_fft, window=window).astype(np.float64)
    Wr, Wi = basis[:n_freq], basis[n_freq:]
    assert np.allclose(Wr[:, 1:half], Wr[:, half + 1:][:, ::-1], atol=1e-12)
    assert np.allclose(Wi[:, 1:half], -Wi[:, half + 1:][:, ::-1], atol=1e-12)
    A = np.zeros((n_freq, half))
    A[:, 0] = Wr[:, 0]
    A[:, 1:] = Wr[:, 1:half]
    B = np.zeros((n_freq, half))
    B[:, 1:] = Wi[:, 1:half]
    # im(DC) and im(Nyquist) are identically zero for real input; the
    # numeric basis rows only carry sin(pi*n) rounding dust (~1e-13) — pin
    # them to exact zeros so those bins stay bit-clean.
    B[0, :] = 0.0
    B[n_freq - 1, :] = 0.0
    return (A.T.astype(np.float32), B.T.astype(np.float32),
            Wr[:, half].astype(np.float32))


def stft_re_im(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: str = "hann",
    pad_mode: str = "constant",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched windowed STFT via folded half-size GEMMs.

    y: (B, n) float32 -> (re, im) each (B, T, n_freq) float32 (note the
    frames-major layout: T before F keeps every GEMM transpose-free; the
    callers swap axes once at the very end).
    """
    assert y.ndim == 2, "stft_re_im expects a (B, n) batch"
    if n_fft % 2:
        raise ValueError(
            f"stft_re_im requires even n_fft (got {n_fft}): the fold pairs "
            "x[n] with x[n_fft-n]. Use stft_spectrum for odd sizes."
        )
    half = n_fft // 2
    A_T, B_T, wr_half = _folded_dft_bases(n_fft, window)
    pad = n_fft // 2
    if pad_mode == "constant":
        ypad = jnp.pad(y, ((0, 0), (pad, pad)))
    elif pad_mode == "edge":
        ypad = jnp.pad(y, ((0, 0), (pad, pad)), mode="edge")
    else:
        raise ValueError(pad_mode)
    T = n_frames_for(y.shape[1], hop_length)
    starts = np.arange(T) * hop_length
    # Gather the front half and the reversed back half of each frame
    # DIRECTLY from the padded signal — never materializing the (B, T,
    # n_fft) frames tensor (whose HBM round trip dominated: measured
    # 56.1k -> 77.1k clips/s on v5e, B=4096, scripts/fold_dft_experiment).
    # rev column 0 is structurally zero (x[start + n_fft] belongs to the
    # next frame); gather an in-bounds dummy there and mask it off.
    idx_front = jnp.asarray(starts[:, None] + np.arange(half)[None, :])
    rev_cols = np.concatenate([[n_fft], n_fft - np.arange(1, half)])
    idx_rev = jnp.asarray(np.minimum(starts[:, None] + rev_cols[None, :],
                                     ypad.shape[1] - 1))
    rmask = jnp.asarray(np.r_[0.0, np.ones(half - 1)].astype(np.float32))
    front = ypad[:, idx_front]                     # (B, T, half)
    rev = ypad[:, idx_rev] * rmask
    center = ypad[:, jnp.asarray(starts + half)]   # (B, T)
    re = lax.dot_general(front + rev, jnp.asarray(A_T),
                         (((2,), (0,)), ((), ())), precision=HIGHEST)
    re = re + center[..., None] * jnp.asarray(wr_half)
    im = lax.dot_general(front - rev, jnp.asarray(B_T),
                         (((2,), (0,)), ((), ())), precision=HIGHEST)
    return re, im


def stft_spectrum(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: str = "hann",
    power: float = 2.0,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Batched |STFT|^power. y: (B, n) float32 -> (B, n_freq, n_frames).

    Even n_fft routes through the folded half-size GEMMs of stft_re_im
    (2.3x faster than the strided-conv basis at n_fft=1024 on v5e: 9.6 vs
    22.0 ms at B=512). The conv basis remains for odd n_fft (no symmetric
    fold) and non-constant pad modes. Rolloff bin picks were re-verified
    flip-free vs the float64 oracle on both formulations across
    512/1024/2048 on CPU and TPU (2026-08-17) — the round-1 note that the
    folded path flips one-bin ties did not reproduce."""
    assert y.ndim == 2, "stft_spectrum expects a (B, n) batch"
    n_freq = 1 + n_fft // 2
    if n_fft % 2 == 0 and pad_mode == "constant" and window == "hann":
        re, im = stft_re_im(y, n_fft, hop_length)        # (B, T, F)
        mag_sq = jnp.swapaxes(re * re + im * im, 1, 2)   # (B, F, T)
    else:
        basis = jnp.asarray(dft_bases(n_fft, window=window))  # (2F, n_fft)
        pad = n_fft // 2
        if pad_mode == "constant":
            ypad = jnp.pad(y, ((0, 0), (pad, pad)))
        elif pad_mode == "edge":
            ypad = jnp.pad(y, ((0, 0), (pad, pad)), mode="edge")
        else:
            raise ValueError(pad_mode)
        out = lax.conv_general_dilated(
            ypad[:, None, :],  # (B, C=1, W)
            basis[:, None, :],  # (O=2F, I=1, W)
            window_strides=(hop_length,),
            padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            precision=HIGHEST,
        )  # (B, 2F, T)
        re, im = out[:, :n_freq, :], out[:, n_freq:, :]
        mag_sq = re * re + im * im
    if power == 2.0:
        return mag_sq
    if power == 1.0:
        return jnp.sqrt(mag_sq)
    return mag_sq ** (power / 2.0)


def stft_complex_fft(
    y: jnp.ndarray, n_fft: int, hop_length: int, window: str = "ones"
) -> jnp.ndarray:
    """Batched complex STFT via XLA rFFT (for large transforms, e.g. CQT).

    y: (B, n) -> (B, n_freq, n_frames) complex64.
    """
    pad = n_fft // 2
    ypad = jnp.pad(y, ((0, 0), (pad, pad)))
    T = n_frames_for(y.shape[1], hop_length)
    starts = np.arange(T) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = ypad[:, idx]  # (B, T, n_fft)
    if window == "hann":
        frames = frames * jnp.asarray(ref.hann_periodic(n_fft).astype(np.float32))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, T, F)
    return jnp.swapaxes(spec, 1, 2)


# ----------------------------------------------------------------------
# Precise transcendentals
#
# The TPU VPU's native log approximation carries ~4e-5 absolute error —
# alone enough to blow the 1e-5 parity budget for dB features. These
# versions decompose x = m * 2^e with m in [sqrt(1/2), sqrt(2)) and evaluate
# ln(m) by the atanh series (|r| <= 0.1716, 7 terms => < 1 ulp), combining
# e * log(2) with a two-float constant. Measured |err| ~1e-6 vs float64.
# ----------------------------------------------------------------------

_SQRT_HALF = 0.7071067811865476
_LOG10_2_HI = np.float32(0.30102998)
_LOG10_2_LO = np.float32(np.float64(0.30102999566398119521) - np.float64(np.float32(0.30102998)))
_LN2_HI = np.float32(0.6931472)
_LN2_LO = np.float32(np.float64(0.6931471805599453) - np.float64(np.float32(0.6931472)))
_INV_LN10 = np.float32(0.4342944819032518)


def _ln_mantissa(x):
    """(ln m, e) with x = m * 2^e, m in [sqrt(1/2), sqrt(2))."""
    m, e = jnp.frexp(x)
    shift = m < _SQRT_HALF
    m = jnp.where(shift, m * 2.0, m)
    e = jnp.where(shift, e - 1, e).astype(x.dtype)
    r = (m - 1.0) / (m + 1.0)
    r2 = r * r
    p = 1.0 + r2 * (1.0 / 3 + r2 * (1.0 / 5 + r2 * (1.0 / 7 + r2 * (1.0 / 9 + r2 * (1.0 / 11 + r2 / 13)))))
    return 2.0 * r * p, e


def log10_precise(x: jnp.ndarray) -> jnp.ndarray:
    """Accurate float32 log10 for x > 0 (use after an amin floor)."""
    ln_m, e = _ln_mantissa(x)
    return e * _LOG10_2_HI + (e * _LOG10_2_LO + ln_m * _INV_LN10)


def log_precise(x: jnp.ndarray) -> jnp.ndarray:
    """Accurate float32 natural log for x > 0."""
    ln_m, e = _ln_mantissa(x)
    return e * _LN2_HI + (e * _LN2_LO + ln_m)


# ----------------------------------------------------------------------
# Masked reductions
# ----------------------------------------------------------------------


def frame_mask(n_frames: int, lengths: jnp.ndarray | None, hop_length: int, batch: int) -> jnp.ndarray | None:
    """(B, n_frames) bool mask of valid frames, or None when lengths is None."""
    if lengths is None:
        return None
    valid = 1 + lengths // hop_length  # per-clip frame count
    t = jnp.arange(n_frames)[None, :]
    return t < valid[:, None]


def _masked_max(x: jnp.ndarray, mask: jnp.ndarray | None, axes: tuple[int, ...]) -> jnp.ndarray:
    if mask is None:
        return jnp.max(x, axis=axes, keepdims=True)
    neg = jnp.finfo(x.dtype).min
    return jnp.max(jnp.where(mask, x, neg), axis=axes, keepdims=True)


def _masked_min(x: jnp.ndarray, mask: jnp.ndarray | None, axes: tuple[int, ...]) -> jnp.ndarray:
    if mask is None:
        return jnp.min(x, axis=axes, keepdims=True)
    pos = jnp.finfo(x.dtype).max
    return jnp.min(jnp.where(mask, x, pos), axis=axes, keepdims=True)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None, axis: int) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def _masked_std(x: jnp.ndarray, mask: jnp.ndarray | None, axis: int) -> jnp.ndarray:
    mu = _masked_mean(x, mask, axis)
    mu_e = jnp.expand_dims(mu, axis)
    var = _masked_mean((x - mu_e) ** 2, mask, axis)
    return jnp.sqrt(var)


def power_to_db(
    S: jnp.ndarray,
    ref_mode: str | float = 1.0,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched power_to_db; S: (B, F, T). ref_mode: "max" (per-clip max over
    valid frames, librosa ref=np.max) or a scalar. Matches ops.golden."""
    m3 = None if mask is None else mask[:, None, :]
    log_spec = 10.0 * log10_precise(jnp.maximum(amin, S))
    if isinstance(ref_mode, str) and ref_mode == "max":
        ref_val = _masked_max(S, m3, (1, 2))
        log_spec = log_spec - 10.0 * log10_precise(jnp.maximum(amin, ref_val))
    else:
        log_spec = log_spec - 10.0 * np.log10(max(amin, abs(float(ref_mode))))
    if top_db is not None:
        peak = _masked_max(log_spec, m3, (1, 2))
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def amplitude_to_db(
    S: jnp.ndarray,
    ref_mode: str | float = 1.0,
    amin: float = 1e-5,
    top_db: float | None = 80.0,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    if isinstance(ref_mode, str):
        return power_to_db(S * S, ref_mode=ref_mode, amin=amin * amin, top_db=top_db, mask=mask)
    return power_to_db(S * S, ref_mode=float(ref_mode) ** 2, amin=amin * amin, top_db=top_db, mask=mask)


def minmax_normalize(x: jnp.ndarray, mask: jnp.ndarray | None = None, eps: float = 1e-8) -> jnp.ndarray:
    """Per-clip [0,1] normalization over (F, T); reference audio/deep.py:64-67."""
    m3 = None if mask is None else mask[:, None, :]
    lo = _masked_min(x, m3, (1, 2))
    hi = _masked_max(x, m3, (1, 2))
    return (x - lo) / (hi - lo + eps)


# ----------------------------------------------------------------------
# Mel / MFCC / deltas
# ----------------------------------------------------------------------


def melspectrogram(
    y: jnp.ndarray, sr: float, n_mels: int, n_fft: int, hop_length: int,
    fmin: float = 0.0, fmax: float | None = None,
) -> jnp.ndarray:
    """(B, n) -> (B, n_mels, T) mel power spectrogram.

    Stays in the frames-major (B, T, F) layout through power + mel so every
    GEMM is transpose-free; the single swap to the (B, M, T) contract
    layout happens on the small mel output. Odd n_fft (no symmetric fold)
    falls back to the strided-conv spectrum."""
    fb = jnp.asarray(mel_fb(sr, n_fft, n_mels, fmin=fmin, fmax=fmax))
    if n_fft % 2:
        S = stft_spectrum(y, n_fft, hop_length, power=2.0)   # (B, F, T)
        return jnp.einsum("mf,bft->bmt", fb, S, precision=HIGHEST)
    re, im = stft_re_im(y, n_fft, hop_length)
    pw = re * re + im * im                               # (B, T, F)
    mel = lax.dot_general(pw, fb.T, (((2,), (0,)), ((), ())), precision=HIGHEST)
    return jnp.swapaxes(mel, 1, 2)


def mel_spec_feature(
    y: jnp.ndarray,
    sr: float = 16000,
    n_mels: int = 40,
    n_fft: int = 512,
    hop_length: int = 160,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """audio_mel_spec contract (reference audio/deep.py:112-134), batched:
    mel power -> power_to_db(ref=max) -> [0,1]. Output (B, n_mels, T) f32."""
    mel = melspectrogram(y, sr, n_mels, n_fft, hop_length)
    mask = frame_mask(mel.shape[-1], lengths, hop_length, y.shape[0])
    log_mel = power_to_db(mel, ref_mode="max", mask=mask)
    return minmax_normalize(log_mel, mask=mask).astype(jnp.float32)


def mfcc(
    y: jnp.ndarray,
    sr: float,
    n_mfcc: int,
    n_fft: int,
    hop_length: int,
    n_mels: int = 128,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, n) -> (B, n_mfcc, T); log-mel (ref=1.0, top_db=80) -> ortho DCT-II."""
    mel = melspectrogram(y, sr, n_mels, n_fft, hop_length)
    S_db = power_to_db(mel, ref_mode=1.0, amin=1e-10, top_db=80.0, mask=mask)
    D = jnp.asarray(dct_mat(n_mfcc, n_mels))
    return jnp.einsum("km,bmt->bkt", D, S_db, precision=HIGHEST)


def mfcc_seq_feature(
    y: jnp.ndarray,
    sr: float = 22050,
    n_mfcc: int = 40,
    n_fft: int = 1024,
    hop_length: int = 512,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """audio_mfcc_seq contract (reference audio/deep.py:304-328), batched:
    per-coefficient z-score over time."""
    # exact frame count of the STFT path: for odd n_fft the center padding
    # is 2*(n_fft//2) = n_fft - 1, one frame fewer than n_frames_for when
    # hop divides n — a mask built from n_frames_for would not broadcast
    T = 1 + (y.shape[1] + 2 * (n_fft // 2) - n_fft) // hop_length
    mask = frame_mask(T, lengths, hop_length, y.shape[0])
    M = mfcc(y, sr, n_mfcc, n_fft, hop_length, mask=mask)
    m2 = None if mask is None else mask[:, None, :]
    mean = _masked_mean(M, m2, axis=2)[:, :, None]
    std = _masked_std(M, m2, axis=2)[:, :, None] + 1e-8
    return ((M - mean) / std).astype(jnp.float32)


def delta(x: jnp.ndarray, width: int = 9, order: int = 1) -> jnp.ndarray:
    """Batched savgol delta along the last axis; x: (B, K, T).

    Interior frames use the centered SG FIR; edge frames use the constant
    'interp' value (deriv == polyorder => the fitted derivative is constant
    over each edge window). Matches ops.golden.delta / scipy savgol interp.
    """
    interior, edge_row = delta_coeffs(width, order)
    B, K, T = x.shape
    half = (width - 1) // 2
    xi = x.reshape(B * K, 1, T)
    kern = jnp.asarray(interior)[None, None, :]
    mid = lax.conv_general_dilated(
        xi, kern, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"), precision=HIGHEST,
    ).reshape(B, K, T - width + 1)
    e = jnp.asarray(edge_row)
    first = jnp.einsum("bkw,w->bk", x[:, :, :width], e, precision=HIGHEST)
    last = jnp.einsum("bkw,w->bk", x[:, :, -width:], e, precision=HIGHEST)
    left = jnp.repeat(first[:, :, None], half, axis=2)
    right = jnp.repeat(last[:, :, None], half, axis=2)
    return jnp.concatenate([left, mid, right], axis=2)


# ----------------------------------------------------------------------
# CQT
# ----------------------------------------------------------------------


_CQT_CHUNK = 256  # MXU-aligned contraction chunks (2 x 128 lanes)
# frames-tensor budget per scan block: at most this many f32 elements of
# (Bb, T, n_fft) materialize at once (~2.1 GB); B=1024 5 s clips would
# otherwise build a 14.5 GB frames tensor (measured OOM on 16 GB v5e)
_CQT_FRAMES_BUDGET = 512 * 1024 * 1024


def _two_f32(a64: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split a float64 constant into (hi, lo) float32 words: hi + lo
    carries ~48 bits of the constant into the f32 compute path."""
    a0 = a64.astype(np.float32)
    return a0, (a64 - a0.astype(np.float64)).astype(np.float32)


def cqt_magnitude(
    y: jnp.ndarray,
    sr: float,
    hop_length: int,
    n_bins: int,
    bins_per_octave: int = 12,
    fmin: float | None = None,
) -> jnp.ndarray:
    """(B, n) -> (B, n_bins, T) |CQT| via a time-domain filterbank matmul
    (algorithm contract: ops.golden.cqt_basis / cqt_time_basis).

    Numerics: the 16k-sample correlation against oscillatory kernels
    cancels heavily for weak bins, and a single f32 contraction leaves
    ~1.5e-5 feature error — over the 1e-5 parity gate. Three measures pull
    it to ~7e-6 (measured across seeds, test_dsp_parity):
    - no FFT in the compute path: kernels are prepared by float64 FFTs at
      trace time (cqt_time_basis) and enter as constants;
    - the kernels enter as two-float (hi+lo) words, the lo word applied as
      a cheap full-length correction matmul;
    - the main contraction runs in 256-wide chunks whose partials are
      combined by Kahan summation over the chunk axis (lax.scan).
    """
    if fmin is None:
        fmin = ref.C1_HZ
    h, n_fft = ref.cqt_time_basis(sr, fmin, n_bins, bins_per_octave)
    hr0, hr1 = _two_f32(h.real)
    hi0, hi1 = _two_f32(h.imag)

    pad = n_fft // 2
    ypad = jnp.pad(y, ((0, 0), (pad, pad)))
    T = n_frames_for(y.shape[1], hop_length)
    idx = jnp.asarray(
        (np.arange(T)[:, None] * hop_length + np.arange(n_fft)[None, :]).astype(
            np.int32
        )
    )

    B = y.shape[0]
    K = h.shape[0]
    # high fmin / low sr configs yield n_fft below the chunk width (n_fft is
    # a power of two, so it divides the chunk evenly in that case)
    chunk = min(_CQT_CHUNK, n_fft)
    nc = n_fft // chunk
    kcw = [jnp.asarray(w.reshape(K, nc, chunk)) for w in (hr0, hr1, hi0, hi1)]

    def _contract(f_c, frames, kc0, k1):
        parts = jnp.einsum("btcn,kcn->bktc", f_c, kc0, precision=HIGHEST)
        corr = jnp.einsum("btn,kn->bkt", frames, k1, precision=HIGHEST)

        def kahan_add(carry, x):
            s, c = carry
            yv = x - c
            t_new = s + yv
            return (t_new, (t_new - s) - yv), None

        p = jnp.moveaxis(parts, -1, 0)  # (nc, Bb, K, T)
        (s, _), _ = lax.scan(kahan_add, (jnp.zeros_like(p[0]),) * 2, p)
        return s + corr

    def _block(yb):
        frames = yb[:, idx]  # (Bb, T, n_fft)
        f_c = frames.reshape(yb.shape[0], T, nc, chunk)
        Cr = _contract(f_c, frames, kcw[0], kcw[1].reshape(K, n_fft))
        Ci = _contract(f_c, frames, kcw[2], kcw[3].reshape(K, n_fft))
        return jnp.sqrt(Cr * Cr + Ci * Ci)  # (Bb, K, T)

    # Memory: the frames tensor is (B, T, n_fft) f32 — 14.5 GB at B=1024
    # for 5 s/22.05 kHz clips (measured OOM on 16 GB v5e). Large batches
    # are processed in batch blocks under a scan so at most
    # _CQT_FRAMES_BUDGET elements materialize per step; each clip sees the
    # exact same per-block contraction. Small batches (every CPU parity
    # test, and any B within budget) take the direct single-block path —
    # restructurings that shrink the einsum's GEMM rows (per-chunk dots or
    # frame blocks inside the scan body) measured 2.8e-5 / 5.4e-5 feature
    # error on XLA:CPU vs ~7e-6 for this batched-einsum formulation, so
    # the inner contraction must keep its shape.
    nb = max(1, -(-(B * T * n_fft) // _CQT_FRAMES_BUDGET))
    if nb == 1:
        return _block(ypad)
    # prefer a block count that divides B (Bb=147 at B=1024 measured ~2x
    # slower per clip than the even Bb=128 split — misaligned GEMM tiles
    # plus a wasted padded block)
    nb = min(nb, B)
    for cand in range(nb, min(2 * nb, B) + 1):
        # reject divisors that shrink blocks below half the padded split's
        # block size (e.g. B=7 needing nb=5: divisor 7 would run batch-1
        # scan steps — worse than the padded Bb=2 split)
        if B % cand == 0 and 2 * (B // cand) > -(-B // nb):
            nb = cand
            break
    Bb = -(-B // nb)
    pad_rows = nb * Bb - B
    if pad_rows:
        ypad = jnp.pad(ypad, ((0, pad_rows), (0, 0)))
    _, blocks = lax.scan(
        lambda _, yb: (None, _block(yb)),
        None,
        ypad.reshape(nb, Bb, ypad.shape[1]),
    )  # (nb, Bb, K, T)
    return blocks.reshape(nb * Bb, K, T)[:B]


# ----------------------------------------------------------------------
# CQT, multirate schedule — ATTEMPTED AND CLOSED as precision-bound
# (round-4 VERDICT item 4; measured table in docs/EXTRACTION_PERF.md)
# ----------------------------------------------------------------------
#
# The direct path correlates every frame against full-length (n_fft=16384)
# kernels — HBM- and FLOP-bound at ~4.2k clips/s. This schedule exploits
# the constant-Q structure: bins an octave down are narrowband at half the
# frequency, so the signal can be half-band decimated per octave and the
# GOLDEN kernels subsampled (not redefined) at stride 2^j. By Poisson
# summation, for sequences whose product spectrum stays below sr/2^j the
# subsampled correlation times 2^j equals the full-rate correlation
# exactly. The engineering controls implemented here:
#   (a) cascade passband deviation — killed by dividing each kernel by the
#       cascade's exact f64 frequency response at its center frequency,
#   (b) stopband leakage — bounded by the filter's ~180 dB stopband,
#   (c) kernel time-truncation — certified at prep time vs an L1 budget,
#   (d) f32 cascade rounding — the decimated signal is carried as
#       two-float (hi+lo) words, mirroring the two-float kernel trick.
#
# MEASURED OUTCOME: magnitude-level parity holds (6.5e-6 relative to the
# global max, pinned in tests/test_dsp_parity.py), but the FEATURE gate
# fails at every decimation depth (2.9e-5 at j_cap=0 up to 5.9e-3 at full
# depth) for two structural reasons: amplitude_to_db's top_db=80 clamp
# makes worst-case bins demand ~185 dB (31-bit) fidelity relative to the
# strongest bin — the golden kernels' hann-sidelobe folds under
# subsampling and each f32 anti-alias stage's ~1e-7 broadband rounding
# both sit ~50x over that budget — and even the undecimated per-octave
# 12-bin GEMM split re-triggers the XLA:CPU shrunken-GEMM in-chunk
# reduction loss (2.9e-5; the round-3 dot_general result, reproduced).
# cqt_feature therefore keeps the direct blocked path; this code stays as
# the documented experiment. Don't re-attempt without a fundamentally
# different precision mechanism.


def _design_halfband(a_db: float = 180.0, trans: float = 0.06) -> np.ndarray:
    """Kaiser-windowed half-band lowpass (float64): cutoff 0.25 x input
    rate, transition halfwidth `trans`/2 cycles, ~`a_db` dB stopband.
    Exact unit DC gain; linear phase (applied center-aligned)."""
    n_taps = int(np.ceil((a_db - 7.95) / (14.357 * trans)))
    half = n_taps // 2
    m = np.arange(-half, half + 1, dtype=np.float64)
    beta = 0.1102 * (a_db - 8.7)
    h = 0.5 * np.sinc(m / 2.0) * np.kaiser(2 * half + 1, beta)
    return h / h.sum()


def _cascade_response(hb: np.ndarray, f_hz: np.ndarray, sr: float, j: int) -> np.ndarray:
    """Exact (f64) real frequency response of j half-band stages at f_hz.
    Center-aligned symmetric taps -> zero phase."""
    half = len(hb) // 2
    m = np.arange(-half, half + 1, dtype=np.float64)
    resp = np.ones_like(np.asarray(f_hz, np.float64))
    for s in range(j):
        nu = np.asarray(f_hz, np.float64) / (sr / 2.0**s)
        resp *= (hb[None, :] * np.cos(2 * np.pi * nu[:, None] * m[None, :])).sum(axis=1)
    return resp


@functools.lru_cache(maxsize=8)
def _cqt_multirate_prep(sr: float, fmin: float, n_bins: int, bins_per_octave: int,
                        hop_length: int, tail_budget: float = 1e-7,
                        j_cap: int = 32):
    """Trace-time plan: per-octave decimation level, truncated+subsampled
    two-float kernel words, gather geometry, and the half-band filter."""
    h, n_fft = ref.cqt_time_basis(sr, fmin, n_bins, bins_per_octave)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    Q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    hb = _design_halfband()
    center = n_fft // 2
    groups = []
    j_max = 0
    for o in range(-(-n_bins // bins_per_octave)):
        ks = np.arange(o * bins_per_octave, min((o + 1) * bins_per_octave, n_bins))
        f_edge = freqs[ks].max() * (1.0 + 4.0 / Q)  # hann mainlobe + margin
        j = 0
        while j < j_cap and 2 ** (j + 1) <= hop_length and f_edge <= 0.22 * sr / 2.0**j:
            j += 1
        # smallest centered window with per-kernel L1 tails under budget
        # (the analytic-signal kernels are not compactly supported)
        l1 = np.abs(h[ks]).sum(axis=1)
        lengths = np.ceil(Q * sr / freqs[ks]).astype(int)
        halfw = int(lengths.max() // 2 + 1)
        while halfw < center:
            lo, hi = center - halfw, center + halfw
            tail = np.abs(h[ks, :lo]).sum(axis=1) + np.abs(h[ks, hi:]).sum(axis=1)
            if np.all(tail <= tail_budget * l1):
                break
            halfw = min(center, int(halfw * 1.25) + 64)
        step = 2**j
        # window start/width aligned so gather indices stay integral and the
        # subsampled tap count is a multiple of 128 (MXU lane alignment)
        Wd = -(-2 * halfw // step)
        Wd = -(-Wd // 128) * 128
        W = Wd * step
        c0 = max(0, center - W // 2)
        c0 -= c0 % step
        if c0 + W > n_fft:
            c0 = n_fft - W
            c0 -= c0 % step
        # subsample the golden kernels; fold in the Poisson factor and the
        # cascade's exact response at each bin's center frequency
        resp = _cascade_response(hb, freqs[ks], sr, j)
        sub = h[ks, c0 : c0 + W : step] * (step / resp[:, None])
        kr0, kr1 = _two_f32(np.ascontiguousarray(sub.real))
        ki0, ki1 = _two_f32(np.ascontiguousarray(sub.imag))
        groups.append({"ks": (int(ks[0]), int(ks[-1] + 1)), "j": j, "c0": c0,
                       "Wd": Wd, "k": (kr0, kr1, ki0, ki1)})
        j_max = max(j_max, j)
    hb0, hb1 = _two_f32(hb)
    return {"n_fft": n_fft, "groups": groups, "j_max": j_max, "hb": (hb0, hb1)}


def _decimate2_twofloat(x0: jnp.ndarray, x1: jnp.ndarray, hb0, hb1):
    """One half-band stage on a two-float signal: (B, n) -> (B, ceil(n/2)),
    output sample m centered on input sample 2m. The hi word's own conv
    rounding is the one uncompensated term (~1 ulp of the hi conv)."""
    half = hb0.shape[0] // 2

    def conv(x, f):
        xp = jnp.pad(x, ((0, 0), (half, half)))[:, None, :]
        return lax.conv_general_dilated(
            xp, f[None, None, :], window_strides=(2,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"), precision=HIGHEST,
        )[:, 0, :]

    y0 = conv(x0, hb0)
    # first-order corrections: lo-filter x hi-signal and hi-filter x lo-signal
    y1 = conv(x0, hb1) + conv(x1, hb0)
    return y0, y1


def cqt_magnitude_multirate(
    y: jnp.ndarray,
    sr: float,
    hop_length: int,
    n_bins: int,
    bins_per_octave: int = 12,
    fmin: float | None = None,
    j_cap: int = 32,
) -> jnp.ndarray:
    """(B, n) -> (B, n_bins, T) |CQT|, numerically matching cqt_magnitude
    (the ops.golden.cqt contract) through the multirate schedule above."""
    if fmin is None:
        fmin = ref.C1_HZ
    plan = _cqt_multirate_prep(float(sr), float(fmin), int(n_bins),
                               int(bins_per_octave), int(hop_length),
                               j_cap=int(j_cap))
    n_fft = plan["n_fft"]
    pad = n_fft // 2
    B = y.shape[0]
    T = n_frames_for(y.shape[1], hop_length)
    step_max = 2 ** plan["j_max"]
    # right-extend so every decimated stage is long enough for the last
    # frame's gather and stays stride-divisible
    extra = (-(y.shape[1] + 2 * pad)) % step_max + 4 * step_max
    x0 = jnp.pad(y, ((0, 0), (pad, pad + extra)))
    x1 = jnp.zeros_like(x0)
    hb0 = jnp.asarray(plan["hb"][0], jnp.float32)
    hb1 = jnp.asarray(plan["hb"][1], jnp.float32)

    # decimation pyramid up to j_max (shared across octave groups)
    pyramid = [(x0, x1)]
    for _ in range(plan["j_max"]):
        pyramid.append(_decimate2_twofloat(*pyramid[-1], hb0, hb1))

    def kahan_chunk_sum(parts):
        def kahan_add(carry, v):
            s, c = carry
            yv = v - c
            t_new = s + yv
            return (t_new, (t_new - s) - yv), None

        p = jnp.moveaxis(parts, -1, 0)
        (s, _), _ = lax.scan(kahan_add, (jnp.zeros_like(p[0]),) * 2, p)
        return s

    outs = []
    for g in plan["groups"]:
        xj0, xj1 = pyramid[g["j"]]
        stride = 2 ** g["j"]
        Wd = g["Wd"]
        starts = (np.arange(T) * hop_length + g["c0"]) // stride
        idx = jnp.asarray((starts[:, None] + np.arange(Wd)[None, :]).astype(np.int32))
        f0 = xj0[:, idx]  # (B, T, Wd)
        f1 = xj1[:, idx]
        chunk = min(_CQT_CHUNK, Wd)
        nc = Wd // chunk
        Kg = g["ks"][1] - g["ks"][0]
        kr0, kr1, ki0, ki1 = (jnp.asarray(w) for w in g["k"])
        f0c = f0.reshape(B, T, nc, chunk)

        def contract(k0c, k1, f0c=f0c, f1=f1, f0=f0):
            parts = jnp.einsum("btcn,kcn->bktc", f0c, k0c, precision=HIGHEST)
            s = kahan_chunk_sum(parts)
            corr = jnp.einsum("btn,kn->bkt", f0, k1, precision=HIGHEST)
            corr += jnp.einsum("btn,kn->bkt", f1, k0c.reshape(Kg, Wd), precision=HIGHEST)
            return s + corr

        Cr = contract(kr0.reshape(Kg, nc, chunk), kr1)
        Ci = contract(ki0.reshape(Kg, nc, chunk), ki1)
        outs.append(jnp.sqrt(Cr * Cr + Ci * Ci))
    return jnp.concatenate(outs, axis=1)


def cqt_feature(
    y: jnp.ndarray,
    sr: float = 22050,
    hop_length: int = 512,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    fmin: float | None = None,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """audio_cqt contract (reference audio/deep.py:235-260), batched."""
    C = cqt_magnitude(y, sr, hop_length, n_bins, bins_per_octave, fmin)
    mask = frame_mask(C.shape[-1], lengths, hop_length, y.shape[0])
    log_cqt = amplitude_to_db(C, ref_mode="max", mask=mask)
    return minmax_normalize(log_cqt, mask=mask).astype(jnp.float32)


def waveform_feature(y: jnp.ndarray, lengths: jnp.ndarray | None = None) -> jnp.ndarray:
    """audio_waveform contract (reference audio/deep.py:170-188): peak
    normalize to [-1, 1] per clip."""
    if lengths is not None:
        m = jnp.arange(y.shape[1])[None, :] < lengths[:, None]
        y = jnp.where(m, y, 0.0)
    peak = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    return jnp.where(peak > 0, y / jnp.maximum(peak, 1e-30), y).astype(jnp.float32)


# ----------------------------------------------------------------------
# Spectral descriptors (batched; share one |STFT|)
# ----------------------------------------------------------------------

_F32_TINY = float(np.finfo(np.float32).tiny)


def _l1_normalize_freq(S: jnp.ndarray) -> jnp.ndarray:
    """librosa.util.normalize(norm=1, axis=freq): tiny columns unchanged."""
    length = jnp.sum(jnp.abs(S), axis=1, keepdims=True)
    length = jnp.where(length < _F32_TINY, 1.0, length)
    return S / length


def spectral_centroid_from_mag(S: jnp.ndarray, sr: float, n_fft: int) -> jnp.ndarray:
    freq = jnp.asarray(ref.fft_frequencies(sr, n_fft).astype(np.float32))
    Sn = _l1_normalize_freq(S)
    return jnp.sum(freq[None, :, None] * Sn, axis=1)  # (B, T)


def spectral_rolloff_from_mag(
    S: jnp.ndarray, sr: float, n_fft: int, roll_percent: float = 0.85
) -> jnp.ndarray:
    freq = jnp.asarray(ref.fft_frequencies(sr, n_fft).astype(np.float32))
    total = jnp.cumsum(S, axis=1)
    threshold = roll_percent * total[:, -1:, :]
    big = jnp.finfo(S.dtype).max
    cand = jnp.where(total < threshold, big, freq[None, :, None])
    return jnp.min(cand, axis=1)  # (B, T)


def spectral_bandwidth_from_mag(
    S: jnp.ndarray, sr: float, n_fft: int, p: float = 2.0
) -> jnp.ndarray:
    freq = jnp.asarray(ref.fft_frequencies(sr, n_fft).astype(np.float32))
    centroid = spectral_centroid_from_mag(S, sr, n_fft)  # (B, T)
    deviation = jnp.abs(freq[None, :, None] - centroid[:, None, :])
    Sn = _l1_normalize_freq(S)
    return jnp.sum(Sn * deviation**p, axis=1) ** (1.0 / p)


def spectral_contrast_from_mag(
    S: jnp.ndarray,
    sr: float,
    n_fft: int,
    fmin: float = 200.0,
    n_bands: int = 6,
    quantile: float = 0.02,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(B, F, T) -> (B, n_bands+1, T). Band membership is static given
    sr/n_fft, so each band is a static slice + sort (unrolled)."""
    freq = ref.fft_frequencies(sr, n_fft)
    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))
    peaks, valleys = [], []
    for k, (f_low, f_high) in enumerate(zip(octa[:-1], octa[1:])):
        current_band = np.logical_and(freq >= f_low, freq <= f_high)
        idx = np.flatnonzero(current_band)
        if k > 0:
            current_band[idx[0] - 1] = True
        if k == n_bands:
            current_band[idx[-1] + 1 :] = True
        sel = np.flatnonzero(current_band)
        sub = S[:, jnp.asarray(sel), :]
        if k < n_bands:
            sub = sub[:, :-1, :]
        nsel = int(max(np.rint(quantile * current_band.sum()), 1))
        # full sort over the (small) static band axis: measured FASTER than
        # lax.top_k on this TPU (13.6 vs 21.1 ms at B=512) and than iterative
        # min/max peeling (28.3 ms) — see scripts/ benches; don't "optimize"
        sorted_sub = jnp.sort(sub, axis=1)
        valleys.append(jnp.mean(sorted_sub[:, :nsel, :], axis=1))
        peaks.append(jnp.mean(sorted_sub[:, -nsel:, :], axis=1))
    peak = jnp.stack(peaks, axis=1)  # (B, n_bands+1, T)
    valley = jnp.stack(valleys, axis=1)
    return power_to_db(peak, ref_mode=1.0, mask=mask) - power_to_db(valley, ref_mode=1.0, mask=mask)


def spectral_flatness_from_mag(S: jnp.ndarray, amin: float = 1e-10, power: float = 2.0) -> jnp.ndarray:
    S_thresh = jnp.maximum(amin, S**power)
    gmean = jnp.exp(jnp.mean(log_precise(S_thresh), axis=1))
    amean = jnp.mean(S_thresh, axis=1)
    return gmean / amean  # (B, T)


def chroma_from_power(Spow: jnp.ndarray, sr: float, n_fft: int, n_chroma: int = 12) -> jnp.ndarray:
    fb = jnp.asarray(chroma_fb(sr, n_fft, n_chroma))
    raw = jnp.einsum("cf,bft->bct", fb, Spow, precision=HIGHEST)
    peak = jnp.max(jnp.abs(raw), axis=1, keepdims=True)
    peak = jnp.where(peak < _F32_TINY, 1.0, peak)
    return raw / peak


def tonnetz_from_chroma(chroma: jnp.ndarray) -> jnp.ndarray:
    phi = jnp.asarray(tonnetz_basis(chroma.shape[1]))
    length = jnp.sum(jnp.abs(chroma), axis=1, keepdims=True)
    length = jnp.where(length < _F32_TINY, 1.0, length)
    return jnp.einsum("dc,bct->bdt", phi, chroma / length, precision=HIGHEST)


def _windowed_sum(x: jnp.ndarray, window: int, hop: int) -> jnp.ndarray:
    """Strided window sums via an all-ones convolution. (B, n) -> (B, T').

    A ones-kernel conv maps onto the MXU like the STFT conv does;
    lax.reduce_window with a large window blows TPU scoped VMEM (observed:
    39 MB requested for a (1, 2047) window vs the 16 MB limit)."""
    kern = jnp.ones((1, 1, window), x.dtype)
    out = lax.conv_general_dilated(
        x[:, None, :], kern, window_strides=(hop,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"), precision=HIGHEST,
    )
    return out[:, 0, :]


def _framed_count(n: int, frame_length: int, hop_length: int) -> int:
    """librosa frame count over the center-padded signal: even frame_length
    gives the canonical 1 + n//hop; odd frame_length pads one sample less
    (2*(frame//2) = frame-1), yielding 1 + (n-1)//hop like util.frame."""
    return 1 + (n + 2 * (frame_length // 2) - frame_length) // hop_length


def zero_crossing_rate(
    y: jnp.ndarray, frame_length: int = 2048, hop_length: int = 512, threshold: float = 1e-10
) -> jnp.ndarray:
    """(B, n) -> (B, T). Windowed crossing counts; no frame materialization:
    frame t's within-frame adjacent pairs are the global adjacent pairs at
    positions [t*hop, t*hop + frame_length - 1)."""
    ypad = jnp.pad(y, ((0, 0), (frame_length // 2, frame_length // 2)), mode="edge")
    yy = jnp.where(jnp.abs(ypad) <= threshold, 0.0, ypad)
    sb = jnp.signbit(yy)
    cross = jnp.abs(jnp.diff(sb.astype(jnp.float32), axis=1))  # (B, n_pad-1)
    T = _framed_count(y.shape[1], frame_length, hop_length)
    # crossing counts are 0/1, so a running f32 cumsum stays integral (and
    # exact) up to 2^24 >> any clip length: frame t's count is two gathered
    # prefix sums, not a frame_length-wide windowed conv (which cost more
    # than the whole mel GEMM at HIGHEST precision)
    csum = jnp.concatenate(
        [jnp.zeros((y.shape[0], 1), cross.dtype), jnp.cumsum(cross, axis=1)], axis=1
    )
    starts = jnp.arange(T, dtype=jnp.int32) * hop_length
    ends = jnp.minimum(starts + frame_length - 1, csum.shape[1] - 1)
    sums = csum[:, ends] - csum[:, starts]
    return sums / frame_length


def rms(y: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """(B, n) -> (B, T); center=True constant padding, window energy sums."""
    T = _framed_count(y.shape[1], frame_length, hop_length)
    ypad = jnp.pad(y, ((0, 0), (frame_length // 2, frame_length // 2)))
    sq = ypad * ypad
    if frame_length % hop_length == 0:
        # frame t is exactly hop-blocks [t, t + frame/hop): sum each block
        # once (f32, <= hop addends) and slide-add the r block sums — O(n)
        # instead of an O(n * frame/hop) frame_length-wide conv. The framed
        # count guarantees (T-1+r)*hop <= n_pad, so every slice is in range.
        r = frame_length // hop_length
        nb = -(-sq.shape[1] // hop_length)
        sq = jnp.pad(sq, ((0, 0), (0, nb * hop_length - sq.shape[1])))
        blocks = sq.reshape(y.shape[0], nb, hop_length).sum(axis=2)
        sums = sum(blocks[:, j : j + T] for j in range(r))
    else:
        sums = _windowed_sum(sq, frame_length, hop_length)[:, :T]
    return jnp.sqrt(sums / frame_length)


# ----------------------------------------------------------------------
# audio_classical: the full flat feature vector, batched
# ----------------------------------------------------------------------

_SCALAR_GROUPS = {"spectral_centroid", "spectral_rolloff", "spectral_bandwidth", "spectral_flatness", "zcr", "rms"}


def classical_feature_vector(
    y: jnp.ndarray,
    sr: float = 22050,
    n_mfcc: int = 40,
    n_mels: int = 128,
    n_fft: int = 1024,
    hop_length: int = 512,
    features: tuple[str, ...] | None = None,
    aggregations: tuple[str, ...] = ("mean", "std"),
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched audio_classical contract (reference audio/classical.py:272-355):
    per-group frame features aggregated (mean/std) in canonical order.

    Unlike the reference — which recomputes the STFT once per feature group —
    this computes one magnitude STFT and derives every group from it.
    (B, n) -> (B, feature_dim); 302-d for defaults.
    """
    if lengths is not None:
        # savgol deltas and per-band contrast sorts couple across frames, so
        # pad-masking cannot reproduce per-clip semantics near the boundary;
        # callers must batch by exact length instead (features/base.py).
        raise ValueError(
            "classical_feature_vector does not support masked variable-length "
            "batches; group clips by exact length (exact_length_batching)."
        )
    feats = tuple(ref._ALL_CLASSICAL) if features is None else tuple(
        k for k in ref._ALL_CLASSICAL if k in set(features)
    )
    aggs = tuple(a for a in ("mean", "std") if a in set(aggregations))
    active = set(feats)

    # lengths is always None past the guard above: masked aggregation is
    # explicitly unsupported here (exact-length batching instead), so the
    # _masked_* helpers below all run in their mask=None plain-mean mode
    mask = m2 = None

    need_stft = active & {
        "spectral_centroid", "spectral_rolloff", "spectral_bandwidth",
        "spectral_contrast", "spectral_flatness", "chroma", "tonnetz",
    }
    Smag = stft_spectrum(y, n_fft, hop_length, power=1.0) if need_stft else None
    Spow = Smag * Smag if (active & {"chroma", "tonnetz"}) else None

    cache: dict[str, jnp.ndarray] = {}
    if active & {"mfcc", "delta_mfcc", "delta2_mfcc"}:
        cache["mfcc"] = mfcc(y, sr, n_mfcc, n_fft, hop_length, n_mels=n_mels, mask=mask)
        if "delta_mfcc" in active:
            cache["delta_mfcc"] = delta(cache["mfcc"], order=1)
        if "delta2_mfcc" in active:
            cache["delta2_mfcc"] = delta(cache["mfcc"], order=2)
    if "spectral_centroid" in active or "spectral_bandwidth" in active:
        cache["spectral_centroid"] = spectral_centroid_from_mag(Smag, sr, n_fft)[:, None, :]
    if "spectral_rolloff" in active:
        cache["spectral_rolloff"] = spectral_rolloff_from_mag(Smag, sr, n_fft)[:, None, :]
    if "spectral_bandwidth" in active:
        cache["spectral_bandwidth"] = spectral_bandwidth_from_mag(Smag, sr, n_fft)[:, None, :]
    if "spectral_contrast" in active:
        cache["spectral_contrast"] = spectral_contrast_from_mag(Smag, sr, n_fft, mask=mask)
    if "spectral_flatness" in active:
        cache["spectral_flatness"] = spectral_flatness_from_mag(Smag)[:, None, :]
    if active & {"chroma", "tonnetz"}:
        cache["chroma"] = chroma_from_power(Spow, sr, n_fft)
        if "tonnetz" in active:
            cache["tonnetz"] = tonnetz_from_chroma(cache["chroma"])
    if "zcr" in active:
        cache["zcr"] = zero_crossing_rate(y, hop_length=hop_length)[:, None, :]
    if "rms" in active:
        cache["rms"] = rms(y, frame_length=n_fft, hop_length=hop_length)[:, None, :]

    parts = []
    for key in feats:
        x = cache[key]  # (B, K, T)
        scalar = key in _SCALAR_GROUPS
        mk = None if m2 is None else m2[:, None, :]
        if scalar:
            # aggregate over all values (librosa float(x.mean()) over (1, T))
            mean = _masked_mean(x.reshape(x.shape[0], -1), m2, axis=1)[:, None]
            std = _masked_std(x.reshape(x.shape[0], -1), m2, axis=1)[:, None]
        else:
            mean = _masked_mean(x, mk, axis=2)  # (B, K)
            std = _masked_std(x, mk, axis=2)
        if "mean" in aggs:
            parts.append(mean)
        if "std" in aggs:
            parts.append(std)
    return jnp.concatenate(parts, axis=1).astype(jnp.float32)
