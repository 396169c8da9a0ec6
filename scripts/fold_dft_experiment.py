#!/usr/bin/env python
"""Measure a folded-DFT mel front end against the production conv path.

The Hann-windowed real-DFT basis is symmetric about the frame midpoint
(periodic hann: h[n] = h[N-n]; cos even, sin odd), so with
p[n] = x[n] + x[N-n] and m[n] = x[n] - x[N-n]:

    re[k] = A  @ [x0, p1..p_{N/2-1}, x_{N/2}]      A:  (F, N/2+1)
    im[k] = Bm @ [m1..m_{N/2-1}]                   Bm: (F, N/2-1)

i.e. exactly half the MACs of the unfolded (2F, N) basis, at the cost of
materializing frames (gather) and the elementwise fold. This script times
three variants on the current backend and checks parity vs the float64
oracle:

    conv      — production stft path (one strided conv, dsp.mel_spec_feature)
    gather    — frames via gather + unfolded (512 -> 514) matmul (control:
                isolates gather cost from the fold win)
    folded    — frames via gather + fold + half-size matmuls

Usage: python scripts/fold_dft_experiment.py [--batch 4096] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from audio_edge_ml_pipeline_tpu.ops import dsp, golden
    from audio_edge_ml_pipeline_tpu.ops.golden import librosa_ref as ref

    sr, seconds = 16000, 5.0
    n = int(sr * seconds)
    n_mels, n_fft, hop = 40, 512, 160
    F = 1 + n_fft // 2
    HI = lax.Precision.HIGHEST

    rng = np.random.default_rng(42)
    t = np.arange(n) / sr
    base = []
    for i in range(8):
        y = (0.5 * np.sin(2 * np.pi * (150 + 130 * i) * t)
             + 0.2 * np.sin(2 * np.pi * (430 + 310 * i) * t)
             + 0.06 * rng.standard_normal(n))
        base.append((0.8 * y / np.abs(y).max()).astype(np.float32))
    base = np.stack(base)

    # bases
    h = ref.hann_periodic(n_fft).astype(np.float64)
    k = np.arange(F)[:, None]
    nn = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * nn / n_fft
    Wr = (h * np.cos(ang))
    Wi = (h * -np.sin(ang))
    half = n_fft // 2
    # folded real basis: columns [0, 1..half-1 (x2 weight via fold), half]
    A = np.concatenate([Wr[:, :1], Wr[:, 1:half], Wr[:, half:half + 1]], axis=1)
    Bm = Wi[:, 1:half]
    A32 = jnp.asarray(A.astype(np.float32))           # (F, 257)
    B32 = jnp.asarray(Bm.astype(np.float32))          # (F, 255)
    fb = jnp.asarray(dsp.mel_fb(sr, n_fft, n_mels))   # (M, F)

    T = dsp.n_frames_for(n, hop)
    pad = n_fft // 2
    starts = np.arange(T) * hop
    idx = jnp.asarray(starts[:, None] + np.arange(n_fft)[None, :])  # (T, n_fft)

    def _post(mel_pow):
        logm = dsp.power_to_db(mel_pow, ref_mode="max")
        return dsp.minmax_normalize(logm).astype(jnp.float32)

    def conv_mel(y):
        # the original strided-conv formulation (dsp.mel_spec_feature now
        # routes through the folded-gather path — see prod_mel for that)
        S = dsp.stft_spectrum(y, n_fft, hop, power=2.0)
        mel = jnp.einsum("mf,bft->bmt", fb, S, precision=HI)
        return _post(mel)

    def gather_mel(y):
        ypad = jnp.pad(y, ((0, 0), (pad, pad)))
        frames = ypad[:, idx]                               # (B, T, n_fft)
        Wall = jnp.concatenate([jnp.asarray(Wr.astype(np.float32)),
                                jnp.asarray(Wi.astype(np.float32))], axis=0)  # (2F, n_fft)
        out = jnp.einsum("btn,fn->bft", frames, Wall, precision=HI)
        re, im = out[:, :F, :], out[:, F:, :]
        mel_pow = jnp.einsum("mf,bft->bmt", fb, re * re + im * im, precision=HI)
        return _post(mel_pow)

    def folded_mel(y):
        ypad = jnp.pad(y, ((0, 0), (pad, pad)))
        frames = ypad[:, idx]                               # (B, T, n_fft)
        head = frames[..., :1]
        mid = frames[..., 1:half]
        rev = frames[..., half + 1:][..., ::-1]
        center = frames[..., half:half + 1]
        p = jnp.concatenate([head, mid + rev, center], axis=-1)   # (B, T, 257)
        m = mid - rev                                             # (B, T, 255)
        re = jnp.einsum("btn,fn->bft", p, A32, precision=HI)
        im = jnp.einsum("btn,fn->bft", m, B32, precision=HI)
        mel_pow = jnp.einsum("mf,bft->bmt", fb, re * re + im * im, precision=HI)
        return _post(mel_pow)

    # --- production (dsp.stft_re_im folded path) and no-frames variants ---
    A_T, B_T, wr_half = dsp._folded_dft_bases(n_fft, "hann")
    A_Tj, B_Tj, wr_j = jnp.asarray(A_T), jnp.asarray(B_T), jnp.asarray(wr_half)
    fbT = jnp.asarray(np.asarray(fb).T)                     # (F, M)

    def prod_mel(y):
        return dsp.mel_spec_feature(y, sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop)

    # direct front/rev gathers from ypad — no (B, T, 512) frames tensor.
    # rev column 0 is structurally zero (x[N] belongs to the next frame);
    # gather an in-bounds dummy there and mask it off.
    idx_f = jnp.asarray(starts[:, None] + np.arange(half)[None, :])          # (T, 256)
    rev_cols = np.concatenate([[n_fft], n_fft - np.arange(1, half)])
    idx_r = jnp.asarray(starts[:, None] + rev_cols[None, :])                 # (T, 256)
    rmask = jnp.asarray(np.r_[0.0, np.ones(half - 1)].astype(np.float32))
    idx_c = jnp.asarray(starts + half)                                       # (T,)

    def nofr_mel(y):
        ypad = jnp.pad(y, ((0, 0), (pad, pad)))
        front = ypad[:, idx_f]
        rev = ypad[:, idx_r] * rmask
        center = ypad[:, idx_c]
        re = lax.dot_general(front + rev, A_Tj, (((2,), (0,)), ((), ())), precision=HI)
        re = re + center[..., None] * wr_j
        im = lax.dot_general(front - rev, B_Tj, (((2,), (0,)), ((), ())), precision=HI)
        mel = lax.dot_general(re * re + im * im, fbT, (((2,), (0,)), ((), ())), precision=HI)
        return _post(jnp.swapaxes(mel, 1, 2))

    # parity vs the float64 oracle on the 8-clip base
    want = np.stack([golden.mel_spec_feature(base[i], sr=sr, n_mels=n_mels,
                                             n_fft=n_fft, hop_length=hop)
                     for i in range(len(base))])
    variants = [("conv", conv_mel), ("gather", gather_mel), ("folded", folded_mel),
                ("prod", prod_mel), ("nofr", nofr_mel)]
    for name, fn in variants:
        got = np.asarray(jax.jit(fn)(jnp.asarray(base)))
        print(f"parity {name:7s} max|d| = {np.max(np.abs(got - want)):.3e}")

    B = args.batch
    waves = jax.device_put(jnp.asarray(np.tile(base, (B // len(base), 1))))

    def timed(fn):
        f = jax.jit(fn)
        f(waves).block_until_ready()
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(waves)
            out.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return B / best

    for name, fn in variants:
        print(f"throughput {name:7s} {timed(fn):,.0f} clips/s")

    # --- stage breakdown (each stage timed standalone; sums exceed the
    # fused whole because intermediates round-trip HBM here). Quarter batch:
    # holding p/m/re/im as real outputs at full B exhausts HBM. ---
    waves = waves[: max(args.batch // 4, 8)]
    def stage_fold(y):
        ypad = jnp.pad(y, ((0, 0), (pad, pad)))
        front = ypad[:, idx_f]
        rev = ypad[:, idx_r] * rmask
        return front + rev, front - rev, ypad[:, idx_c]

    f_fold = jax.jit(stage_fold)
    pm = f_fold(waves)
    jax.block_until_ready(pm)

    def stage_gemms(p, m, center):
        re = lax.dot_general(p, A_Tj, (((2,), (0,)), ((), ())), precision=HI)
        re = re + center[..., None] * wr_j
        im = lax.dot_general(m, B_Tj, (((2,), (0,)), ((), ())), precision=HI)
        return re, im

    f_gemms = jax.jit(stage_gemms)
    reim = f_gemms(*pm)
    jax.block_until_ready(reim)

    def stage_melpost(re, im):
        mel = lax.dot_general(re * re + im * im, fbT, (((2,), (0,)), ((), ())), precision=HI)
        return _post(jnp.swapaxes(mel, 1, 2))

    f_post = jax.jit(stage_melpost)
    f_post(*reim).block_until_ready()

    def timed_raw(f, *xs):
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(*xs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3

    print(f"stage fold (pad+gathers+fold)     {timed_raw(f_fold, waves):7.2f} ms")
    print(f"stage GEMMs (re/im, HIGHEST)      {timed_raw(f_gemms, *pm):7.2f} ms")
    print(f"stage mel+power+dB+norm           {timed_raw(f_post, *reim):7.2f} ms")


if __name__ == "__main__":
    main()
