"""Batched image descriptors on the accelerator: HOG, LBP, GLCM, histogram.

TPU-first redesign of the per-sample numpy descriptors in
``features/image.py`` (which mirror the reference's skimage usage,
image/classical.py:85-217): every stage is expressed as fixed-shape batched
array ops — one-hot orientation binning instead of ``np.add.at`` scatters,
trace-time-precomputed bilinear gather indices for the LBP ring, and a
one-hot GEMM for the co-occurrence matrix so the 32x32 joint histogram
rides the MXU. The numpy implementations remain the parity oracle
(tests/test_image_jax.py) and the single-sample ``extract()`` path.

Conventions: inputs are (B, H, W) float32 grayscale in [0, 1]; every
function returns float32. All geometry is static at trace time; callers
cache one jitted program per image-size/parameter combination
(CLAUDE.md: never rebuild jitted closures per call).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_LBP_WEIGHT_SCALE = 1024  # keep equal to features.image.LBP_WEIGHT_SCALE


def _gradient_1d(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """np.gradient contract: central differences interior, one-sided edges."""
    a = jnp.moveaxis(a, axis, -1)
    interior = (a[..., 2:] - a[..., :-2]) * 0.5
    first = (a[..., 1] - a[..., 0])[..., None]
    last = (a[..., -1] - a[..., -2])[..., None]
    return jnp.moveaxis(jnp.concatenate([first, interior, last], axis=-1), -1, axis)


def hog_features_batch(
    gray: jnp.ndarray,
    orientations: int = 9,
    cell: tuple[int, int] = (8, 8),
    block: tuple[int, int] = (2, 2),
) -> jnp.ndarray:
    """(B, H, W) -> (B, n_by * n_bx * bh * bw * orientations) L2-Hys HOG.

    Same definition as features.image.hog_features: unsigned gradients on
    np.gradient stencils, bilinear orientation binning, cell sums, and
    L2-Hys normalization of overlapping blocks, flattened in (by, bx,
    dy, dx, o) order.
    """
    ch, cw = cell
    bh, bw = block
    B, H, W = gray.shape
    gy = _gradient_1d(gray, 1)  # d/d(row): numpy's first output
    gx = _gradient_1d(gray, 2)
    mag = jnp.hypot(gx, gy)
    ang = jnp.rad2deg(jnp.arctan2(gy, gx)) % 180.0
    n_cy, n_cx = H // ch, W // cw
    mag = mag[:, : n_cy * ch, : n_cx * cw]
    ang = ang[:, : n_cy * ch, : n_cx * cw]
    bin_w = 180.0 / orientations
    t = ang / bin_w
    f = jnp.floor(t)
    b0 = f.astype(jnp.int32) % orientations
    frac = t - f
    b1 = (b0 + 1) % orientations
    o = jnp.arange(orientations, dtype=jnp.int32)
    # bilinear orientation split as one-hot weighting (replaces np.add.at)
    pix = mag[..., None] * (
        (1.0 - frac)[..., None] * (b0[..., None] == o)
        + frac[..., None] * (b1[..., None] == o)
    )  # (B, H', W', O)
    cells = pix.reshape(B, n_cy, ch, n_cx, cw, orientations).sum(axis=(2, 4))
    n_by, n_bx = n_cy - bh + 1, n_cx - bw + 1
    if n_by <= 0 or n_bx <= 0:  # image smaller than one block (oracle: empty)
        return jnp.zeros((B, 0), jnp.float32)
    windows = jnp.stack(
        [
            cells[:, dy : dy + n_by, dx : dx + n_bx, :]
            for dy in range(bh)
            for dx in range(bw)
        ],
        axis=3,
    )  # (B, n_by, n_bx, bh*bw, O) in the oracle's (dy, dx) ravel order
    v = windows.reshape(B, n_by, n_bx, bh * bw * orientations)
    v = v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)
    v = jnp.minimum(v, 0.2)
    v = v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)
    return v.reshape(B, n_by * n_bx * bh * bw * orientations)


def _lbp_ring_constants(H: int, W: int, P: int, R: float):
    """Trace-time bilinear gather indices/weights for the P-point ring —
    float64 prep identical to the numpy oracle, so the corner picks and
    weights agree exactly."""
    ys, xs = np.mgrid[0:H, 0:W]
    angles = 2 * np.pi * np.arange(P) / P
    idx = np.empty((P, 4, H * W), np.int32)
    wts = np.empty((P, 4, H * W), np.float32)
    for k in range(P):
        dy, dx = -R * np.sin(angles[k]), R * np.cos(angles[k])
        yy = np.clip(ys + dy, 0, H - 1)
        xx = np.clip(xs + dx, 0, W - 1)
        y0, x0 = np.floor(yy).astype(np.int64), np.floor(xx).astype(np.int64)
        y1, x1 = np.minimum(y0 + 1, H - 1), np.minimum(x0 + 1, W - 1)
        fy, fx = yy - y0, xx - x0
        idx[k, 0] = (y0 * W + x0).ravel()
        idx[k, 1] = (y1 * W + x0).ravel()
        idx[k, 2] = (y0 * W + x1).ravel()
        idx[k, 3] = (y1 * W + x1).ravel()
        # 10-bit fixed-point weights: integer-valued f32, so every
        # weight * level-difference product (and their 4-sum) is an exact
        # integer < 2^24 — see features.image.lbp_histogram's contract
        s = float(_LBP_WEIGHT_SCALE)
        wts[k, 0] = np.rint(((1 - fy) * (1 - fx)) * s).ravel()
        wts[k, 1] = np.rint((fy * (1 - fx)) * s).ravel()
        wts[k, 2] = np.rint(((1 - fy) * fx) * s).ravel()
        wts[k, 3] = np.rint((fy * fx) * s).ravel()
    return idx, wts


def lbp_histogram_batch(gray: jnp.ndarray, P: int = 24, R: float = 3.0) -> jnp.ndarray:
    """(B, H, W) -> (B, P + 2) normalized uniform-LBP histogram.

    Bit decisions are exact integer arithmetic in f32 (8-bit quantized
    levels x 10-bit fixed-point weights, features.image.lbp_histogram
    contract), so they are identical across numpy / XLA eager / XLA jit /
    TPU regardless of fusion or summation order — float-form deltas
    measured 4/1024 flipped bits between jit and eager on flat frames."""
    B, H, W = gray.shape
    idx, wts = _lbp_ring_constants(H, W, P, R)
    q = jnp.rint(gray.reshape(B, H * W) * 255.0)
    bits = []
    for k in range(P):
        delta = (
            jnp.asarray(wts[k, 0]) * (q[:, idx[k, 0]] - q)
            + jnp.asarray(wts[k, 1]) * (q[:, idx[k, 1]] - q)
            + jnp.asarray(wts[k, 2]) * (q[:, idx[k, 2]] - q)
            + jnp.asarray(wts[k, 3]) * (q[:, idx[k, 3]] - q)
        )
        bits.append((delta >= 0).astype(jnp.int32))
    bits_arr = jnp.stack(bits, axis=1)  # (B, P, HW)
    count_ones = bits_arr.sum(axis=1)
    transitions = (bits_arr != jnp.roll(bits_arr, 1, axis=1)).astype(jnp.int32).sum(axis=1)
    codes = jnp.where(transitions <= 2, count_ones, P + 1)  # (B, HW)
    bins = jnp.arange(P + 2, dtype=jnp.int32)
    hist = (codes[:, :, None] == bins).astype(jnp.float32).sum(axis=1)
    return hist / (H * W)


def glcm_stats_batch(gray: jnp.ndarray, levels: int = 32) -> jnp.ndarray:
    """(B, H, W) -> (B, 6): contrast, dissimilarity, homogeneity, energy,
    correlation, ASM of the symmetric distance-1/angle-0 co-occurrence
    matrix. The joint histogram is a one-hot GEMM (counts accumulate
    exactly in f32 — integer-valued and far below 2^24)."""
    B, H, W = gray.shape
    q = jnp.clip((gray * levels).astype(jnp.int32), 0, levels - 1)
    a = q[:, :, :-1].reshape(B, -1)
    b = q[:, :, 1:].reshape(B, -1)
    lv = jnp.arange(levels, dtype=jnp.int32)
    one_a = (a[:, :, None] == lv).astype(jnp.float32)
    one_b = (b[:, :, None] == lv).astype(jnp.float32)
    # DEFAULT matmul precision is exact here (no HIGHEST needed, unlike the
    # DSP paths): the operands are 0/1 one-hots — representable in bf16 —
    # and the MXU accumulates in f32, so the counts are integer-exact
    glcm = jnp.einsum("bnl,bnm->blm", one_a, one_b)
    glcm = glcm + jnp.swapaxes(glcm, 1, 2)
    glcm = glcm / jnp.maximum(glcm.sum(axis=(1, 2), keepdims=True), 1.0)
    i = jnp.arange(levels, dtype=jnp.float32)[:, None] * jnp.ones((1, levels), jnp.float32)
    j = i.T
    diff = i - j
    contrast = (glcm * diff**2).sum(axis=(1, 2))
    dissim = (glcm * jnp.abs(diff)).sum(axis=(1, 2))
    homog = (glcm / (1.0 + diff**2)).sum(axis=(1, 2))
    asm = (glcm**2).sum(axis=(1, 2))
    energy = jnp.sqrt(asm)
    mu_i = (glcm * i).sum(axis=(1, 2))
    mu_j = (glcm * j).sum(axis=(1, 2))
    ci = i[None] - mu_i[:, None, None]
    cj = j[None] - mu_j[:, None, None]
    si = jnp.sqrt((glcm * ci**2).sum(axis=(1, 2)))
    sj = jnp.sqrt((glcm * cj**2).sum(axis=(1, 2)))
    denom = si * sj
    corr = jnp.where(denom > 0, (glcm * ci * cj).sum(axis=(1, 2)) / jnp.where(denom > 0, denom, 1.0), 1.0)
    return jnp.stack([contrast, dissim, homog, energy, corr, asm], axis=1)


def gray_hist_batch(gray: jnp.ndarray, bins: int = 64) -> jnp.ndarray:
    """(B, H, W) -> (B, bins) normalized intensity histogram over [0, 1].

    Bin edges at k/bins are dyadic for power-of-two ``bins``, so the
    floor-based binning agrees exactly with np.histogram's edge
    searchsorted (the last bin closed on the right, matching clip)."""
    B, H, W = gray.shape
    q = jnp.clip((gray * bins).astype(jnp.int32), 0, bins - 1)
    bv = jnp.arange(bins, dtype=jnp.int32)
    hist = (q.reshape(B, -1)[:, :, None] == bv).astype(jnp.float32).sum(axis=1)
    return hist / jnp.maximum(hist.sum(axis=1, keepdims=True), 1.0)


def classical_image_vector_batch(
    gray: jnp.ndarray,
    orientations: int = 9,
    cell: tuple[int, int] = (8, 8),
    block: tuple[int, int] = (2, 2),
    lbp_points: int = 24,
    lbp_radius: float = 3.0,
    n_hist_bins: int = 64,
) -> jnp.ndarray:
    """(B, H, W) -> (B, D) batched HOG + LBP + gray-hist + GLCM vector;
    concat order matches features.image.classical_image_vector (8196-d at
    128x128 defaults)."""
    return jnp.concatenate(
        [
            hog_features_batch(gray, orientations=orientations, cell=cell, block=block),
            lbp_histogram_batch(gray, P=lbp_points, R=lbp_radius),
            gray_hist_batch(gray, bins=n_hist_bins),
            glcm_stats_batch(gray),
        ],
        axis=1,
    ).astype(jnp.float32)
