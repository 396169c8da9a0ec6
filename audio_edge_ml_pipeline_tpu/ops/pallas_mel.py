"""Fused Pallas TPU kernel for the mel-power-spectrogram hot path.

One kernel instance processes a (clip, frame-tile) grid cell entirely in
VMEM: it slices the center-padded audio row into a (TILE_T, n_fft) frame
matrix, multiplies by the windowed cos/sin DFT bases on the MXU, forms the
power spectrum, applies the slaney mel filterbank, and writes the (n_mels,
TILE_T) output tile — the (B, 2F, T) STFT intermediate never touches HBM
(SURVEY.md §7 "Pallas target: fused rFFT-as-matmul + mel matmul").

The per-clip dB + min-max normalization stages are global reductions over
each clip and stay in XLA (they fuse into a single cheap elementwise pass).

Numerics match ops.dsp.melspectrogram: f32 MXU matmuls
(preferred_element_type + HIGHEST precision), identical constants from
ops.golden. Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dsp
from .golden import librosa_ref as ref

TILE_T = 128  # frames per grid cell (MXU-friendly row count)


def _mel_kernel(frames_ref, basis_ref, fb_ref, out_ref, spec_scratch):
    """Grid: (B * T_pad / TILE_T,). Blocks:
    frames_ref (TILE_T, n_fft)   windowless frame tile (gathered by XLA)
    basis_ref  (n_fft, 2F)       windowed DFT bases (cos | sin)
    fb_ref     (F_pad, n_mels)   mel filterbank (transposed, freq-padded)
    out_ref    (TILE_T, n_mels)

    Mosaic note: in-kernel framing needs arbitrary-offset loads along the
    lane dimension, which the TPU vector ISA cannot express (hop=160 is not
    lane-aligned); XLA performs the gather and the kernel fuses
    DFT-matmul + power + mel so the (2F, T) spectrum never reaches HBM.
    """
    n_freq = basis_ref.shape[1] // 2

    # (TILE_T, n_fft) @ (n_fft, 2F) on the MXU, f32
    spec = jnp.dot(
        frames_ref[:, :], basis_ref[:, :],
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )
    re = spec[:, :n_freq]
    im = spec[:, n_freq:]
    power = re * re + im * im  # (TILE_T, F)
    spec_scratch[:, :n_freq] = power
    spec_scratch[:, n_freq:] = jnp.zeros_like(spec_scratch[:, n_freq:])
    # (TILE_T, F_pad) @ (F_pad, n_mels)
    out_ref[:, :] = jnp.dot(
        spec_scratch[:, :], fb_ref[:, :],
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("sr", "n_mels", "n_fft", "hop_length", "interpret"))
def mel_power_pallas(
    y: jnp.ndarray,
    sr: int = 16000,
    n_mels: int = 40,
    n_fft: int = 512,
    hop_length: int = 160,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, n) waveforms -> (B, n_mels, T) mel power spectrogram."""
    B, n = y.shape
    T = 1 + n // hop_length
    T_pad = _round_up(T, TILE_T)
    n_freq = 1 + n_fft // 2
    f_pad = _round_up(n_freq, 128)

    pad = n_fft // 2
    # right-pad so the last (padded) tile's frames stay in bounds
    right = pad + ((T_pad - 1) * hop_length + n_fft) - (n + pad)
    x = jnp.pad(y, ((0, 0), (pad, max(right, pad))))
    starts = np.arange(T_pad) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = x[:, idx].reshape(B * T_pad, n_fft)  # tiles never straddle clips

    basis = jnp.asarray(dsp.dft_bases(n_fft).T.copy())  # (n_fft, 2F)
    fb = ref.mel_filterbank(sr, n_fft, n_mels).astype(np.float32)  # (n_mels, F)
    fb_pad = np.zeros((f_pad, n_mels), np.float32)
    fb_pad[:n_freq, :] = fb.T
    fb_j = jnp.asarray(fb_pad)

    out = pl.pallas_call(
        _mel_kernel,
        grid=(B * T_pad // TILE_T,),
        in_specs=[
            pl.BlockSpec((TILE_T, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * n_freq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_T, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * T_pad, n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_T, f_pad), jnp.float32),
        ],
        interpret=interpret,
    )(frames, basis, fb_j)
    mel = out.reshape(B, T_pad, n_mels)[:, :T, :]
    return jnp.transpose(mel, (0, 2, 1))


def _mel_folded_kernel(p_ref, m_ref, c_ref, A_ref, B_ref, wr_ref, fb_ref, out_ref):
    """Folded-GEMM mel tile: (TILE_T, 256) p/m streams -> (TILE_T, n_mels).

    re/im/power live only in VMEM/registers — with the XLA path they are
    three (B, T, F) HBM round trips. Inputs are the same direct front/rev
    gathers the production stft_re_im uses (dsp.py), so no frames tensor
    materializes on the XLA side either.
    """
    re = jnp.dot(
        p_ref[:, :], A_ref[:, :],
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )
    re = re + c_ref[:, :1] * wr_ref[0:1, :]
    im = jnp.dot(
        m_ref[:, :], B_ref[:, :],
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )
    power = re * re + im * im  # (TILE_T, F_pad); lanes >= n_freq are zero
    out_ref[:, :] = jnp.dot(
        power, fb_ref[:, :],
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("sr", "n_mels", "n_fft", "hop_length", "interpret", "tile_t"))
def mel_power_pallas_folded(
    y: jnp.ndarray,
    sr: int = 16000,
    n_mels: int = 40,
    n_fft: int = 512,
    hop_length: int = 160,
    interpret: bool = False,
    tile_t: int = TILE_T,
) -> jnp.ndarray:
    """(B, n) -> (B, n_mels, T) mel power via the folded-GEMM Pallas core.

    tile_t: grid-cell row count. 128 was the v2 schedule; the v3 sweep
    (CLAUDE.md: ">=512-row tiles") raises it so Mosaic's per-tile overhead
    amortizes over more MXU work — VMEM per cell at 512 rows is ~4 MB
    (p/m/power tiles), well inside the 16 MB budget. The output block is
    lane-padded to 128 so every store is full-lane."""
    B, n = y.shape
    half = n_fft // 2
    n_freq = 1 + half
    T = 1 + n // hop_length
    T_pad = _round_up(T, tile_t)
    f_pad = _round_up(n_freq, 128)
    m_pad = _round_up(n_mels, 128)

    pad = n_fft // 2
    ypad = jnp.pad(y, ((0, 0), (pad, pad)))
    starts = np.arange(T_pad) * hop_length
    limit = n + 2 * pad - 1
    idx_front = np.minimum(starts[:, None] + np.arange(half)[None, :], limit)
    rev_cols = np.concatenate([[n_fft], n_fft - np.arange(1, half)])
    idx_rev = np.minimum(starts[:, None] + rev_cols[None, :], limit)
    idx_center = np.minimum(starts + half, limit)
    rmask = jnp.asarray(np.r_[0.0, np.ones(half - 1)].astype(np.float32))
    front = ypad[:, jnp.asarray(idx_front)]
    rev = ypad[:, jnp.asarray(idx_rev)] * rmask
    p = (front + rev).reshape(B * T_pad, half)
    m = (front - rev).reshape(B * T_pad, half)
    center = ypad[:, jnp.asarray(idx_center)].reshape(B * T_pad, 1)

    A_T, B_T, wr_half = dsp._folded_dft_bases(n_fft, "hann")
    A_pad = np.zeros((half, f_pad), np.float32); A_pad[:, :n_freq] = A_T
    B_pad = np.zeros((half, f_pad), np.float32); B_pad[:, :n_freq] = B_T
    wr_pad = np.zeros((1, f_pad), np.float32); wr_pad[0, :n_freq] = wr_half
    fb = ref.mel_filterbank(sr, n_fft, n_mels).astype(np.float32)  # (M, F)
    fb_pad = np.zeros((f_pad, m_pad), np.float32); fb_pad[:n_freq, :n_mels] = fb.T

    out = pl.pallas_call(
        _mel_folded_kernel,
        grid=(B * T_pad // tile_t,),
        in_specs=[
            pl.BlockSpec((tile_t, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * T_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(p, m, center, jnp.asarray(A_pad), jnp.asarray(B_pad), jnp.asarray(wr_pad), jnp.asarray(fb_pad))
    mel = out.reshape(B, T_pad, m_pad)[:, :T, :n_mels]
    return jnp.transpose(mel, (0, 2, 1))


def mel_spec_feature_pallas(
    y: jnp.ndarray,
    sr: int = 16000,
    n_mels: int = 40,
    n_fft: int = 512,
    hop_length: int = 160,
    lengths: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """audio_mel_spec contract with the fused Pallas mel core.

    EVALUATED AND REJECTED as the production path (5 schedules measured;
    scripts/pallas_sweep.py): tile_t 128/256/512 all land at 43-45k
    clips/s vs 86k for the XLA folded-gather path at the same batch. The
    loss is structural — pallas_call materializes the p/m gather operands
    in HBM (~2 MB/clip extra traffic) while XLA fuses those gathers into
    the GEMM operand reads. Kept as bench.py's honest A/B competitor."""
    mel = mel_power_pallas_folded(y, sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop_length, interpret=interpret)
    mask = dsp.frame_mask(mel.shape[-1], lengths, hop_length, y.shape[0])
    log_mel = dsp.power_to_db(mel, ref_mode="max", mask=mask)
    return dsp.minmax_normalize(log_mel, mask=mask).astype(jnp.float32)
