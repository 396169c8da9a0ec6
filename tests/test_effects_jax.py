"""Device-batched phase vocoder (ops/effects_jax) vs the float64 oracle,
and the augment stage's opt-in device backend.

The vocoder output is training DATA, not features — it is not under the
1e-5 DSP parity gate. The contract pinned here: per-clip lengths match the
oracle exactly (step grids are host-computed in float64), waveforms within
~2e-3 (f32 phase cumsum with pre-wrapped deltas), and the augment device
backend consumes the identical rng parameter stream as the host backend.
"""

from __future__ import annotations

import numpy as np
import pytest

from audio_edge_ml_pipeline_tpu.ops import effects_jax
from audio_edge_ml_pipeline_tpu.ops.golden import effects as gold


def _clips(B: int, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    y = 0.4 * np.sin(2 * np.pi * 440 * t)[None, :] + 0.1 * rng.standard_normal((B, n))
    return y.astype(np.float32)


def test_time_stretch_batch_matches_oracle():
    y = _clips(6, 24000)
    # 1.05/0.85: rates whose f32 step grid lands on the wrong side of
    # integer frame boundaries — the f64 host grids must keep index parity
    rates = np.array([0.85, 0.9, 1.0, 1.05, 1.1, 1.15])
    outs = effects_jax.time_stretch_batch(y, rates)
    for b in range(len(y)):
        ref = gold.time_stretch(y[b].astype(np.float64), float(rates[b]))
        assert len(outs[b]) == len(ref), "length contract must match the oracle"
        assert np.max(np.abs(outs[b] - ref)) < 2e-3
        assert np.corrcoef(outs[b], ref)[0, 1] > 0.9999


def test_pitch_shift_batch_matches_oracle():
    y = _clips(4, 24000, seed=1)
    steps = np.array([-3.0, -0.5, 1.7, 3.0])
    out = effects_jax.pitch_shift_batch(y, 16000, steps)
    assert all(len(o) == y.shape[1] for o in out)  # duration preserved
    for b in range(len(y)):
        ref = gold.pitch_shift(y[b].astype(np.float64), 16000, float(steps[b]))
        assert np.max(np.abs(out[b] - ref)) < 2e-3


def test_variable_length_batch_matches_oracle():
    """Clips of DIFFERING lengths share one padded program per 4096-sample
    bucket (per-clip frame masks); each clip must still match the oracle
    run at its own exact length."""
    rng = np.random.default_rng(3)
    lens = [15000, 17777, 24000, 24001]
    clips = [(0.3 * rng.standard_normal(n)).astype(np.float32) for n in lens]
    rates = np.array([0.9, 1.1, 0.85, 1.05])
    outs = effects_jax.time_stretch_batch(clips, rates)
    for c, r, o in zip(clips, rates, outs):
        ref = gold.time_stretch(c.astype(np.float64), float(r))
        assert len(o) == len(ref)
        assert np.max(np.abs(o - ref)) < 2e-3
    # pitch shift over the same ragged batch
    steps = np.array([2.0, -1.0, 0.7, -2.5])
    ps = effects_jax.pitch_shift_batch(clips, 16000, steps)
    for c, st, o in zip(clips, steps, ps):
        ref = gold.pitch_shift(c.astype(np.float64), 16000, float(st))
        assert len(o) == len(c)
        assert np.max(np.abs(o - ref)) < 2e-3


def test_time_stretch_batch_rejects_bad_input():
    with pytest.raises(ValueError, match="positive"):
        effects_jax.time_stretch_batch(_clips(2, 8000), np.array([1.0, -0.5]))
    with pytest.raises(ValueError, match="batch"):
        effects_jax.time_stretch_batch(np.zeros(100, np.float32), np.array([1.0]))


# ---------------------------------------------------------------------------
# augment backend=device
# ---------------------------------------------------------------------------


def _make_dataset(root, n_files=3, n=16000, classes=("a", "b")):
    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(7)
    for cls in classes:
        (root / cls).mkdir(parents=True)
        for i in range(n_files):
            y = (0.3 * rng.standard_normal(n)).astype(np.float32)
            write_wav(root / cls / f"{cls}{i}.wav", y, 16000)


def _run_backend(tmp_path, name, backend, augs, n_augments=2, device_batch=64):
    from audio_edge_ml_pipeline_tpu.features.augment import run

    out = tmp_path / name
    run({
        "output_dir": str(out), "audio_folder": str(tmp_path / "src"),
        "loader": "audio_folder", "split": "train", "seed": 11,
        "n_augments": n_augments, "preserve_length": True, "sample_rate": None,
        "level_match_db": 0.0, "augmentations": augs, "class_overrides": {},
        "backend": backend, "device_batch": device_batch, "workers": 1,
    })
    return out


def _wavs(root):
    from audio_edge_ml_pipeline_tpu.data.audio_io import load_audio

    return {
        str(p.relative_to(root)): load_audio(p)[0]
        for p in sorted(root.rglob("*.wav"))
    }


def test_device_backend_bit_identical_without_vocoder(tmp_path):
    """With no vocoder stages every augmentor applies the exact host
    arithmetic with the pre-drawn (identical) parameter stream — the device
    backend's output tree must be byte-identical to the host backend's."""
    _make_dataset(tmp_path / "src")
    augs = [
        {"type": "volume_scale"}, {"type": "gaussian_noise"},
        {"type": "time_shift"}, {"type": "pdm_hiss"},
    ]
    host = _wavs(_run_backend(tmp_path, "host_out", "host", augs))
    dev = _wavs(_run_backend(tmp_path, "dev_out", "device", augs))
    assert host.keys() == dev.keys() and len(host) == 2 * 3 * (1 + 2)
    for k in host:
        np.testing.assert_array_equal(host[k], dev[k], err_msg=k)


def test_device_backend_matches_host_with_vocoder(tmp_path):
    """Compound spec incl. a vocoder stage: identical parameters (the
    pre-draw mirrors the host rng order through data-length-dependent
    draws), waveforms within the f32 vocoder tolerance."""
    _make_dataset(tmp_path / "src", n_files=3)
    augs = [{"type": "volume_scale"}, {"type": "time_stretch"},
            {"type": "gaussian_noise"}]
    host = _wavs(_run_backend(tmp_path, "host_out", "host", augs))
    # device_batch=4 >= _DEVICE_MIN_GROUP so the batched kernel engages
    dev = _wavs(_run_backend(tmp_path, "dev_out", "device", augs, device_batch=4))
    assert host.keys() == dev.keys()
    n_aug = sum("_aug" in k for k in host)
    assert n_aug == 2 * 3 * 2
    for k in host:
        assert host[k].shape == dev[k].shape, k
        assert np.max(np.abs(host[k] - dev[k])) < 5e-3, k


def test_device_backend_stretch_then_pitch(tmp_path):
    """Chained vocoder stages: after time_stretch every copy has a distinct
    length (continuous random rates), and the following pitch_shift stage
    must STILL batch on device (ragged batching) rather than degrade to
    per-clip oracle calls — and match the host backend."""
    _make_dataset(tmp_path / "src", n_files=3)
    augs = [{"type": "time_stretch"}, {"type": "pitch_shift"}]
    host = _wavs(_run_backend(tmp_path, "host_out", "host", augs))
    dev = _wavs(_run_backend(tmp_path, "dev_out", "device", augs, device_batch=6))
    assert host.keys() == dev.keys()
    for k in host:
        assert host[k].shape == dev[k].shape, k
        # two chained f32 vocoder stages compound the ~1e-3 tolerance
        assert np.max(np.abs(host[k] - dev[k])) < 1e-2, k


def test_unknown_type_fails_before_any_output(tmp_path):
    """A programmatic cfg (run() without load_config) with an unknown
    augmentation type must fail with the descriptive ValueError BEFORE any
    file is written — the device backend used to KeyError mid-run after the
    originals were already on disk."""
    _make_dataset(tmp_path / "src", n_files=1)
    for backend in ("host", "device"):
        with pytest.raises(ValueError, match="Unknown augmentation type"):
            _run_backend(tmp_path, f"{backend}_bad", backend, [{"type": "reverb"}])
        assert not list((tmp_path / f"{backend}_bad").rglob("*.wav"))
