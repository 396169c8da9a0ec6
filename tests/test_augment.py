"""Augmentation stage: phase-vocoder effects + CLI output layout."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_time_stretch_length_and_pitch():
    from audio_edge_ml_pipeline_tpu.ops.golden import effects

    sr = 16000
    t = np.arange(2 * sr) / sr
    y = np.sin(2 * np.pi * 440 * t)
    fast = effects.time_stretch(y, 1.25)
    slow = effects.time_stretch(y, 0.8)
    assert abs(len(fast) - len(y) / 1.25) <= 2
    assert abs(len(slow) - len(y) / 0.8) <= 2
    # pitch preserved under stretch: dominant frequency still ~440
    for z in (fast, slow):
        seg = z[2000:-2000]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak_hz = spec.argmax() * sr / len(seg)
        assert abs(peak_hz - 440) < 8, peak_hz


def test_pitch_shift_frequency_and_duration():
    from audio_edge_ml_pipeline_tpu.ops.golden import effects

    sr = 16000
    t = np.arange(2 * sr) / sr
    y = np.sin(2 * np.pi * 440 * t)
    up = effects.pitch_shift(y, sr, n_steps=4)  # +4 semitones = x1.26
    assert len(up) == len(y)
    seg = up[2000:-2000]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = spec.argmax() * sr / len(seg)
    expected = 440 * 2 ** (4 / 12)
    assert abs(peak_hz - expected) < 12, (peak_hz, expected)


def test_simple_augmentors():
    from audio_edge_ml_pipeline_tpu.features.augment import AUGMENTORS

    y = (0.5 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)).astype(np.float32)
    r = np.random.default_rng(0)
    inv = AUGMENTORS["polarity_inversion"](y, 16000, r)
    np.testing.assert_array_equal(inv, -y)
    shifted = AUGMENTORS["time_shift"](y, 16000, r)
    assert len(shifted) == len(y) and not np.array_equal(shifted, y)
    noisy = AUGMENTORS["gaussian_noise"](y, 16000, r)
    assert 0 < np.abs(noisy - y).max() < 0.1
    hiss = AUGMENTORS["pdm_hiss"](y, 16000, r)
    assert np.abs(hiss - y).std() > 0.005  # audible noise floor added
    scaled = AUGMENTORS["volume_scale"](y, 16000, r, min_gain=0.5, max_gain=0.5)
    np.testing.assert_allclose(scaled, 0.5 * y, atol=1e-6)


def test_parallel_augment_is_deterministic(tmp_path):
    """The threaded stage must be a pure function of (config, file list):
    per-file child seeds are spawned sequentially from the config seed, so
    worker count and completion order cannot change any output byte."""
    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav
    from audio_edge_ml_pipeline_tpu.features.augment import load_config, run

    src = tmp_path / "src"
    rng = np.random.default_rng(3)
    for c in ("a", "b"):
        d = src / c
        d.mkdir(parents=True)
        for i in range(3):
            write_wav(d / f"{i}.wav", rng.standard_normal(8000).astype(np.float32) * 0.3, 16000)

    outs = []
    for workers in (1, 8):
        out = tmp_path / f"out_w{workers}"
        cfg = tmp_path / f"w{workers}.yaml"
        cfg.write_text(
            f"loader: audio_folder\naudio_folder: {src}\noutput_dir: {out}\n"
            f"n_augments: 2\nworkers: {workers}\nseed: 11\n"
            "augmentations:\n  - type: gaussian_noise\n  - type: time_shift\n  - type: volume_scale\n"
        )
        run(load_config(cfg))
        outs.append({p.relative_to(out): p.read_bytes() for p in sorted(out.rglob("*.wav"))})
    assert outs[0].keys() == outs[1].keys() and len(outs[0]) == 18
    assert all(outs[0][k] == outs[1][k] for k in outs[0])


def test_config_fails_fast_on_bad_specs(tmp_path):
    """Unknown kwargs and missing roots fail at config load, not per-file
    mid-run (a bad kwarg would TypeError after hours of valid output; a
    missing audio_folder key used to Path('')->'.'-scan the CWD and
    silently augment 0 files)."""
    import pytest

    from audio_edge_ml_pipeline_tpu.features.augment import _iter_samples, load_config

    bad_kwarg = tmp_path / "bad_kwarg.yaml"
    bad_kwarg.write_text(
        "output_dir: /tmp/x\naugmentations:\n  - type: pitch_shift\n    n_steps: 2\n"
    )
    with pytest.raises(ValueError, match="pitch_shift got unknown parameter.*n_steps.*max_steps"):
        load_config(bad_kwarg)

    bad_override = tmp_path / "bad_override.yaml"
    bad_override.write_text(
        "output_dir: /tmp/x\naugmentations: []\n"
        "class_overrides:\n  rain:\n    augmentations:\n      - type: gaussian_noise\n        snr_db: 10\n"
    )
    with pytest.raises(ValueError, match="class_overrides\\['rain'\\]: gaussian_noise"):
        load_config(bad_override)

    no_root = tmp_path / "no_root.yaml"
    no_root.write_text("output_dir: /tmp/x\naugmentations: [{type: polarity_inversion}]\n")
    with pytest.raises(ValueError, match="must include 'audio_folder'"):
        list(_iter_samples(load_config(no_root)))

    bare_string = tmp_path / "bare.yaml"
    bare_string.write_text("output_dir: /tmp/x\naugmentations: [gaussian_noise]\n")
    with pytest.raises(ValueError, match="must be a mapping with a 'type' key"):
        load_config(bare_string)

    # empty yaml keys parse as null and must normalize, not AttributeError
    nulls = tmp_path / "nulls.yaml"
    nulls.write_text("output_dir: /tmp/x\naugmentations:\nclass_overrides:\n")
    cfg = load_config(nulls)
    assert cfg["augmentations"] == [] and cfg["class_overrides"] == {}

    # ...and so do null PER-CLASS override keys: `dog:` (null override) and
    # `cat: {augmentations: }` (null list = "no augs for cat") used to
    # TypeError in validate_aug_specs instead of normalizing
    null_overrides = tmp_path / "null_overrides.yaml"
    null_overrides.write_text(
        "output_dir: /tmp/x\naugmentations: [{type: polarity_inversion}]\n"
        "class_overrides:\n  dog:\n  cat:\n    augmentations:\n"
    )
    cfg = load_config(null_overrides)
    assert cfg["class_overrides"]["dog"] == {}
    assert cfg["class_overrides"]["cat"]["augmentations"] == []


def test_same_stem_inputs_rejected(tmp_path):
    """Two inputs mapping to one output path were a silent serial overwrite
    and would race under the process pool — run() must reject them."""
    import pytest

    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav
    from audio_edge_ml_pipeline_tpu.features.augment import load_config, run

    src = tmp_path / "src" / "dog"
    src.mkdir(parents=True)
    y = np.zeros(4000, np.float32)
    write_wav(src / "0.wav", y, 16000)
    write_wav(src / "0.WAV", y, 16000)
    cfg = tmp_path / "aug.yaml"
    cfg.write_text(
        f"loader: audio_folder\naudio_folder: {tmp_path / 'src'}\n"
        f"output_dir: {tmp_path / 'out'}\naugmentations: [{{type: polarity_inversion}}]\n"
    )
    with pytest.raises(ValueError, match="same output dog/0.wav"):
        run(load_config(cfg))


def test_augment_cli(tmp_path):
    import os

    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav

    src = tmp_path / "src_audio"
    for c in ("dog", "rain"):
        d = src / c
        d.mkdir(parents=True)
        for i in range(2):
            t = np.arange(16000) / 16000
            write_wav(d / f"{i}.wav", (0.4 * np.sin(2 * np.pi * (300 + 100 * i) * t)).astype(np.float32), 16000)
    cfg = tmp_path / "aug.yaml"
    out = tmp_path / "aug_out"
    cfg.write_text(
        f"""
loader: audio_folder
audio_folder: {src}
output_dir: {out}
n_augments: 2
level_match_db: -6.0
augmentations:
  - type: volume_scale
  - type: gaussian_noise
  - type: time_shift
class_overrides:
  rain:
    augmentations:
      - type: polarity_inversion
"""
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "audio_edge_ml_pipeline_tpu.features.augment", "--config", str(cfg)],
        capture_output=True, text=True, env=env, cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    # 2 originals + 4 augmented per class
    assert len(list((out / "dog").glob("*.wav"))) == 6
    assert len(list((out / "rain").glob("*.wav"))) == 6
    # level_match applied to originals (-6 dB = x0.501)
    from audio_edge_ml_pipeline_tpu.data.audio_io import load_audio

    y0, _ = load_audio(src / "dog" / "0.wav")
    y1, _ = load_audio(out / "dog" / "0.wav")
    assert abs(np.abs(y1).max() / np.abs(y0).max() - 0.501) < 0.01
    # rain class override: polarity inversion only -> aug = -original
    ya, _ = load_audio(out / "rain" / "0_aug001.wav")
    yo, _ = load_audio(out / "rain" / "0.wav")
    np.testing.assert_allclose(ya, -yo, atol=2.0 / 32768)


def test_augmented_tree_extracts_with_split_all(tmp_path):
    """The augment CLI writes a FLAT class-per-dir tree (no train/ level).
    Feeding it back through the feature pipeline requires `split: all` —
    the experiment default `split: train` points the audio_folder loader at
    a nonexistent <out>/train and must fail loudly, not scan nothing.
    Codifies the config-4 chain bug found on chip (docs/CONFIG_MATRIX.md;
    reference augment.py:24-30 documents the same feed-back contract)."""
    import json

    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav
    from audio_edge_ml_pipeline_tpu.features.augment import load_config, run
    from audio_edge_ml_pipeline_tpu.features.config import ExperimentConfig
    from audio_edge_ml_pipeline_tpu.features.pipeline import _run_experiment

    src = tmp_path / "src"
    rng = np.random.default_rng(9)
    for c in ("a", "b"):
        d = src / c
        d.mkdir(parents=True)
        for i in range(2):
            write_wav(d / f"{i}.wav", rng.standard_normal(8000).astype(np.float32) * 0.3, 16000)
    out = tmp_path / "augmented"
    cfg = tmp_path / "aug.yaml"
    cfg.write_text(
        f"loader: audio_folder\naudio_folder: {src}\noutput_dir: {out}\n"
        "n_augments: 1\nseed: 4\npreserve_length: true\n"
        "augmentations:\n  - type: volume_scale\n"
    )
    run(load_config(cfg))

    feats = tmp_path / "feats"
    exp = ExperimentConfig(
        name="aug_all", loader="audio_folder", dataset=str(out), split="all",
        extractor="audio_waveform", output=str(feats),
        extractor_params={"sample_rate": 16000, "duration": 0.5},
    )
    _run_experiment(exp)
    info = json.loads((feats / "info.json").read_text())
    assert info["n_samples"] == 8  # 2 classes x (2 originals + 2 augmented)
    assert info["n_classes"] == 2

    bad = ExperimentConfig(
        name="aug_train", loader="audio_folder", dataset=str(out), split="train",
        extractor="audio_waveform", output=str(tmp_path / "feats_bad"),
        extractor_params={"sample_rate": 16000, "duration": 0.5},
    )
    with pytest.raises(NotADirectoryError):
        _run_experiment(bad)
