"""Device-batched phase-vocoder time stretch / pitch shift.

TPU-first replacement for the augment stage's per-clip host vocoder
(ops/golden/effects.py, the float64 contract oracle; reference
augment.py:105-118): a whole batch of clips stretches in ONE compiled
program, each clip with its OWN rate.

Why this vectorizes at all: the classic vocoder loop looks sequential
(phase_acc += phi_advance + dphase each step), but dphase depends only on
the input STFT columns — never on phase_acc — so the recurrence is an
exclusive cumsum over steps:

    phase_i = angle(D[:, 0]) + sum_{j<i} (phi_advance + dphase_j)

Everything else is gathers (frame interpolation) and GEMMs (STFT via the
folded half-size bases in ops.dsp; inverse DFT as an explicit (F, n_fft)
basis matmul), which is exactly what the MXU wants.

f32 numerics: the UNWRAPPED accumulated phase reaches ~3e5 rad (phi_advance
tops out at pi*hop = 1608/step), where f32 cos/sin resolution is ~0.03 rad
— garbage audio. Each per-step delta is therefore wrapped to [-pi, pi)
BEFORE the cumsum (cos/sin are 2pi-periodic, so wrapping deltas preserves
the phase modulo 2pi); the wrapped cumsum stays under ~600 rad and the
measured waveform error vs the float64 oracle is ~1e-3 (test-pinned).
This path generates training data — it is NOT under the 1e-5 feature
parity gate (mel/MFCC extraction never routes through here).

All jitted callables are cached per static shape (CLAUDE.md invariant);
the step count S is quantized up to a multiple of 32 so nearby rate
minima reuse one compiled program.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_N_FFT = 2048
_HOP = 512


def _irfft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(re_basis, im_basis, window) for irfft-as-GEMM, float64 prep.

    irfft(X)_n = (1/N) [ X0.re + (-1)^n X_{N/2}.re
                         + sum_{k=1}^{N/2-1} 2 (re_k cos(2 pi k n / N)
                                                - im_k sin(2 pi k n / N)) ]
    """
    F = n_fft // 2 + 1
    k = np.arange(F)[:, None]
    n = np.arange(n_fft)[None, :]
    c = np.full(F, 2.0)
    c[0] = 1.0
    c[-1] = 1.0
    ang = 2.0 * np.pi * k * n / n_fft
    re_b = (c[:, None] * np.cos(ang)) / n_fft  # (F, n_fft)
    im_b = (-c[:, None] * np.sin(ang)) / n_fft
    im_b[0, :] = 0.0
    im_b[-1, :] = 0.0
    from .golden.librosa_ref import hann_periodic

    win = hann_periodic(n_fft)
    return re_b.astype(np.float32), im_b.astype(np.float32), win.astype(np.float32)


@lru_cache(maxsize=None)
def _device_consts(n_fft: int):
    """Device-resident irfft bases / windows, shared by every (n, S)
    kernel instance (one upload, not one per compiled shape)."""
    import jax.numpy as jnp

    re_b, im_b, win = _irfft_bases(n_fft)
    return (jnp.asarray(re_b), jnp.asarray(im_b), jnp.asarray(win),
            jnp.asarray((win.astype(np.float64) ** 2).astype(np.float32)))


_LEN_QUANT = 8 * _HOP  # pad clip lengths up to 4096-sample buckets


@lru_cache(maxsize=None)
def _stretch_kernel(n: int, S: int):
    """Jitted (y (B, n), lo, frac, valid, t_valid) -> (B, out_len) batch
    stretch, cached per static (PADDED clip length, padded step count).
    Clips shorter than n are zero-padded; t_valid carries each clip's true
    frame count and frames past it are masked to zero, so one compiled
    program serves a whole 4096-sample length bucket (variable-length
    folders and post-stretch pitch stages would otherwise compile per
    distinct length — 20-60 s each on a remote backend)."""
    import jax
    import jax.numpy as jnp

    from . import dsp

    HI = jax.lax.Precision.HIGHEST
    re_b_j, im_b_j, win_j, win_sq = _device_consts(_N_FFT)
    T = dsp.n_frames_for(n, _HOP)
    F = _N_FFT // 2 + 1
    phi_adv = jnp.asarray(np.linspace(0.0, np.pi * _HOP, F).astype(np.float32))
    two_pi = np.float32(2.0 * np.pi)

    @jax.jit
    def run(y, lo, frac, valid, t_valid):
        # lo / frac / valid are host-computed in float64 (module functions
        # below): an on-device f32 `i * rate` lands on the wrong side of
        # integer frame boundaries for rates like 1.05 (measured max|d|
        # 0.25 at the flipped steps vs the float64 oracle's arange)
        re, im = dsp.stft_re_im(y, _N_FFT, _HOP)  # (B, T, F)
        # frames at t >= the clip's true frame count are masked to zero:
        # the oracle's STFT has exactly t_valid frames (+ a zero pad
        # column), while the padded signal's boundary frames still overlap
        # the real tail
        fmask = (jnp.arange(T)[None, :] < t_valid[:, None])[:, :, None]
        re = jnp.where(fmask, re, 0.0)
        im = jnp.where(fmask, im, 0.0)
        ang = jnp.arctan2(im, re)
        mag = jnp.sqrt(re * re + im * im)
        # one zero column past the end, like the oracle's D_pad (its angle
        # is 0 and its magnitude 0, so the final interpolated steps match)
        ang = jnp.pad(ang, ((0, 0), (0, 1), (0, 0)))
        mag = jnp.pad(mag, ((0, 0), (0, 1), (0, 0)))

        def col(a, idx):  # gather along the frame axis: (B, S, F)
            return jnp.take_along_axis(a, idx[:, :, None], axis=1)

        mag_lo, mag_hi = col(mag, lo), col(mag, jnp.minimum(lo + 1, T))
        ang_lo, ang_hi = col(ang, lo), col(ang, jnp.minimum(lo + 1, T))
        mag_i = ((1.0 - frac)[:, :, None] * mag_lo + frac[:, :, None] * mag_hi)
        mag_i = jnp.where(valid[:, :, None], mag_i, 0.0)

        dphase = ang_hi - ang_lo - phi_adv[None, None, :]
        dphase = dphase - two_pi * jnp.round(dphase / two_pi)
        delta = phi_adv[None, None, :] + dphase
        # wrap each delta BEFORE the cumsum (see module docstring)
        delta = delta - two_pi * jnp.round(delta / two_pi)
        cum = jnp.cumsum(delta, axis=1)
        phase = ang[:, 0:1, :] + (cum - delta)  # exclusive cumsum

        fr_re = mag_i * jnp.cos(phase)
        fr_im = mag_i * jnp.sin(phase)
        frames = (
            jnp.matmul(fr_re, re_b_j, precision=HI)
            + jnp.matmul(fr_im, im_b_j, precision=HI)
        ) * win_j  # (B, S, n_fft)

        # overlap-add: n_fft = 4 * hop, so chunk q of frame s lands at
        # contiguous positions (s + q) * hop + r — four static-slice adds
        B = y.shape[0]
        out_len = (S + 3) * _HOP
        acc = jnp.zeros((B, out_len), jnp.float32)
        nrm = jnp.zeros((B, out_len), jnp.float32)
        w_frames = valid[:, :, None].astype(jnp.float32) * win_sq[None, None, :]
        for q in range(_N_FFT // _HOP):
            chunk = frames[:, :, q * _HOP:(q + 1) * _HOP].reshape(B, S * _HOP)
            acc = acc.at[:, q * _HOP:(q + S) * _HOP].add(chunk)
            wchunk = w_frames[:, :, q * _HOP:(q + 1) * _HOP].reshape(B, S * _HOP)
            nrm = nrm.at[:, q * _HOP:(q + S) * _HOP].add(wchunk)
        out = acc / jnp.maximum(nrm, 1e-8)
        return out[:, _N_FFT // 2:]  # undo center padding

    return run


def time_stretch_batch(y, rates: np.ndarray) -> list[np.ndarray]:
    """Stretch a batch of clips, each by its own rate.

    y: (B, n) array, or a list of 1-D clips with DIFFERING lengths (they
    share one compiled program per 4096-sample length bucket via zero
    padding + per-clip frame masks). rates (B,) in (0, inf). Returns a
    list of B float32 arrays of length round(n_b / rate_b) — the
    ops/golden/effects.py time_stretch contract, batched.
    """
    import jax

    if isinstance(y, np.ndarray):
        if y.ndim != 2:
            raise ValueError("time_stretch_batch expects a (B, n) batch or a list of clips")
        clips = [np.asarray(c, np.float32) for c in y]
    else:
        clips = [np.ascontiguousarray(np.asarray(c, np.float32)) for c in y]
        if any(c.ndim != 1 for c in clips):
            raise ValueError("time_stretch_batch expects a (B, n) batch or a list of 1-D clips")
    rates = np.asarray(rates, np.float64)
    if np.any(rates <= 0):
        raise ValueError("rates must be positive")
    from . import dsp

    B = len(clips)
    n_b = np.array([len(c) for c in clips])
    n_pad = int(-(-n_b.max() // _LEN_QUANT) * _LEN_QUANT)
    Y = np.zeros((B, n_pad), np.float32)
    for b, c in enumerate(clips):
        Y[b, : len(c)] = c
    T = dsp.n_frames_for(n_pad, _HOP)
    t_valid = np.array([dsp.n_frames_for(int(nb), _HOP) for nb in n_b], np.int32)
    # per-clip step grids in float64 — EXACTLY the oracle's
    # np.arange(0, T_b, rate), padded to a shared (compile-shared) S
    grids = [np.arange(0.0, float(tb), r) for tb, r in zip(t_valid, rates)]
    S = max(len(g) for g in grids)
    S = -(-S // 32) * 32  # quantize up: nearby rate minima share a compile
    lo = np.full((B, S), T, np.int32)  # padding reads the zero column
    frac = np.zeros((B, S), np.float32)
    valid = np.zeros((B, S), bool)
    for b, g in enumerate(grids):
        lo[b, : len(g)] = np.floor(g).astype(np.int32)
        frac[b, : len(g)] = (g - np.floor(g)).astype(np.float32)
        valid[b, : len(g)] = True
    out = np.asarray(jax.device_get(
        _stretch_kernel(n_pad, S)(Y, lo, frac, valid, t_valid)
    ))
    lengths = np.round(n_b / rates).astype(int)
    return [out[b, : lengths[b]] for b in range(B)]


def pitch_shift_batch(y, sr: int, n_steps: np.ndarray,
                      bins_per_octave: int = 12) -> list[np.ndarray]:
    """Shift each clip's pitch by its own semitone amount, duration
    preserved. Device-batched stretch + per-clip host polyphase resample
    (the resample ratio differs per clip, and audio_io.resample's
    snapped-ratio FIR is ~2 ms/clip — not worth a device program).

    y: (B, n) array or a list of 1-D clips with differing lengths.
    Returns a list of B float32 arrays, each its input clip's length.
    """
    from ..data.audio_io import resample

    clips = [np.asarray(c, np.float32) for c in y]
    n_steps = np.asarray(n_steps, np.float64)
    rates = 2.0 ** (-n_steps / bins_per_octave)
    stretched = time_stretch_batch(clips, rates)
    out = []
    for c, seg, rate in zip(clips, stretched, rates):
        n = len(c)
        shifted = resample(seg.astype(np.float32), int(round(sr / rate)), sr)
        if len(shifted) >= n:
            out.append(shifted[:n])
        else:
            out.append(np.pad(shifted, (0, n - len(shifted))))
    return out
