"""Pallas fused mel kernel: parity vs the float64 oracle (interpret mode on
CPU; the same kernel compiles through Mosaic on TPU — exercised by bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_edge_ml_pipeline_tpu.ops import golden as g
from audio_edge_ml_pipeline_tpu.ops import pallas_mel


def test_pallas_mel_parity(rng):
    sr, n = 16000, 80000
    t = np.arange(n) / sr
    clips = []
    for i in range(3):
        y = 0.4 * np.sin(2 * np.pi * (250 + 180 * i) * t) + 0.05 * rng.standard_normal(n)
        clips.append(y.astype(np.float32))
    y = np.stack(clips)
    out = np.asarray(pallas_mel.mel_spec_feature_pallas(jnp.asarray(y), sr=sr, interpret=True))
    ref = np.stack([g.mel_spec_feature(y[i], sr=sr) for i in range(3)])
    err = np.max(np.abs(out - ref))
    assert err <= 1e-5, f"pallas mel parity {err:.3e}"


def test_pallas_mel_non_tile_multiple_frames(rng):
    """T=201 frames (not a multiple of TILE_T=128): padded tiles trimmed."""
    sr, n = 16000, 32000
    y = (0.5 * np.sin(2 * np.pi * 500 * np.arange(n) / sr)).astype(np.float32)[None]
    out = np.asarray(pallas_mel.mel_spec_feature_pallas(jnp.asarray(y), sr=sr, interpret=True))
    assert out.shape == (1, 40, 201)
    ref = g.mel_spec_feature(y[0], sr=sr)
    assert np.max(np.abs(out[0] - ref)) <= 1e-5
