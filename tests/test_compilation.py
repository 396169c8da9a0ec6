"""Stage 7 compilation: real TFLite export via jax2tf + XLA AOT benchmark."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _cpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture(scope="module")
def mlp_setup(tmp_path_factory):
    from audio_edge_ml_pipeline_tpu.features.base import FeatureSet
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline
    from audio_edge_ml_pipeline_tpu.models import get_model

    root = tmp_path_factory.mktemp("comp")
    r = np.random.default_rng(2)
    X, y = [], []
    for c in range(3):
        mu = np.zeros(12)
        mu[c * 4 : c * 4 + 4] = 2.0
        X.append(r.normal(mu, 0.7, size=(40, 12)))
        y.append(np.full(40, c))
    X = np.concatenate(X).astype(np.float32)
    y = np.concatenate(y).astype(np.int32)
    idx = r.permutation(len(X))
    X, y = X[idx], y[idx]
    trainer = get_model("mlp")(epochs=25, batch_size=16, hidden_units=[16], learning_rate=5e-3)
    trainer.fit(X[:90], y[:90], X[90:], y[90:], ["a", "b", "c"], "m", root / "run", None)
    FeaturePipeline.save(
        FeatureSet(features=X[90:], feature_type="classical", modality="audio",
                   metadata=[{} for _ in X[90:]], labels=y[90:], label_names=["a", "b", "c"]),
        root / "val",
    )
    return root


def test_to_tflite_cli(mlp_setup, tmp_path):
    """Reference deploy layout + report schema (to_tflite.py:8-19, 300-332)."""
    root = mlp_setup
    out = tmp_path / "compiled"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.compilation.to_tflite",
            "--model", str(root / "run" / "model.flax.npz"),
            "--features", str(root / "val"), "--features-val", str(root / "val"),
            "--output", str(out), "--max-accuracy-drop", "0.05",
        ],
        capture_output=True, text=True, env=_cpu_env(), cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    # per-mode artifacts at the output root
    assert (out / "model_fp32.tflite").exists()
    # deployment bundle under deploy/
    deploy = out / "deploy"
    assert (deploy / "model.tflite").exists()
    assert json.loads((deploy / "label_names.json").read_text()) == ["a", "b", "c"]
    mel = json.loads((deploy / "mel_params.json").read_text())
    assert mel["sample_rate"] == 16000 and mel["input_shape"] == [40, 501]
    fb = np.load(deploy / "mel_filterbank.npy")
    assert fb.shape == (40, 257) and fb.dtype == np.float32
    report = json.loads((out / "compilation_report.json").read_text())
    assert "fp32" in report["modes"]
    assert report["modes"]["fp32"]["accuracy"] > 0.7
    assert report["fp32_accuracy"] == report["modes"]["fp32"]["accuracy"]
    assert report["n_classes"] == 3 and report["n_val_samples"] == 30
    assert "dynamic" in report["modes"], "dynamic-range int8 mode missing from report"
    assert report["modes"]["dynamic"]["size_kb"] <= report["modes"]["fp32"]["size_kb"]
    best = report["best_mode"]
    assert report["fp32_accuracy"] - report["modes"][best]["accuracy"] <= 0.05 + 1e-9
    assert report["best_size_kb"] == report["modes"][best]["size_kb"]


def test_to_tflite_forced_mode_and_config(mlp_setup, tmp_path):
    """--config YAML drives the run; --mode overrides auto-selection."""
    root = mlp_setup
    out = tmp_path / "forced"
    cfg = tmp_path / "compilation.yaml"
    cfg.write_text(
        "model: {m}\nfeatures: {f}\nfeatures_val: {f}\noutput: {o}\n"
        "max_accuracy_drop: 0.5\nn_mels: 32\nduration: 2.0\n".format(
            m=root / "run" / "model.flax.npz", f=root / "val", o=out
        )
    )
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.compilation.to_tflite",
            "--config", str(cfg), "--mode", "fp32",
        ],
        capture_output=True, text=True, env=_cpu_env(), cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    report = json.loads((out / "compilation_report.json").read_text())
    assert report["best_mode"] == "fp32"
    assert report["mel_params"]["n_mels"] == 32
    assert report["mel_params"]["input_shape"] == [32, 201]
    assert np.load(out / "deploy" / "mel_filterbank.npy").shape == (32, 257)


def test_to_tflite_class_filter_missing_val_class(mlp_setup, tmp_path):
    """A filtered class absent from the val set must NOT shift label codes:
    the canonical list comes from the training-time filter, and val labels
    are re-encoded by name against it (regression: deriving the list from
    the val set mapped class 'c' to code 1 while the model emits it at 2)."""
    from audio_edge_ml_pipeline_tpu.features.base import FeatureSet
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline

    root = mlp_setup
    val = FeaturePipeline.load(root / "val")
    keep = val.labels != 1  # drop every 'b' sample
    FeaturePipeline.save(
        FeatureSet(features=val.features[keep], feature_type="classical",
                   modality="audio", metadata=[{} for _ in range(int(keep.sum()))],
                   labels=val.labels[keep], label_names=["a", "b", "c"]),
        tmp_path / "val_no_b",
    )
    out = tmp_path / "cf"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.compilation.to_tflite",
            "--model", str(root / "run" / "model.flax.npz"),
            "--features", str(root / "val"),
            "--features-val", str(tmp_path / "val_no_b"),
            "--output", str(out), "--max-accuracy-drop", "0.05",
            "--class-filter", "a", "b", "c",
        ],
        capture_output=True, text=True, env=_cpu_env(), cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    report = json.loads((out / "compilation_report.json").read_text())
    assert report["n_classes"] == 3  # canonical training-time list, not val's 2
    assert json.loads((out / "deploy" / "label_names.json").read_text()) == ["a", "b", "c"]
    # with correct codes the model scores well; the shifted encoding scored ~0 on 'c'
    assert report["modes"]["fp32"]["accuracy"] > 0.7


def test_to_tflite_rejects_any_class_count_mismatch(mlp_setup, tmp_path):
    """ADVICE r2: the no-filter guard must fire for ANY class-count mismatch,
    including a model with MORE classes than the feature set (previously only
    fewer-than was caught, letting extra argmax classes skew accuracy and
    write a too-short deploy label_names.json)."""
    from audio_edge_ml_pipeline_tpu.compilation.to_tflite import compile_model
    from audio_edge_ml_pipeline_tpu.features.base import FeatureSet
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline

    root = mlp_setup
    val = FeaturePipeline.load(root / "val")
    keep = val.labels != 2  # two-class feature set vs the 3-class model
    FeaturePipeline.save(
        FeatureSet(features=val.features[keep], feature_type="classical",
                   modality="audio", metadata=[{} for _ in range(int(keep.sum()))],
                   labels=val.labels[keep], label_names=["a", "b"]),
        tmp_path / "val_ab",
    )
    with pytest.raises(ValueError, match="3 output classes .* 2"):
        compile_model(
            root / "run" / "model.flax.npz", tmp_path / "val_ab",
            tmp_path / "val_ab", tmp_path / "out",
            class_filter=None, mel_params={},
        )


def test_compile_xla_cli(mlp_setup, tmp_path):
    root = mlp_setup
    out = tmp_path / "xla_report.json"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.compilation.compile_xla",
            "--model", str(root / "run" / "model.flax.npz"),
            "--features", str(root / "val"), "--output", str(out), "--batch", "16",
        ],
        capture_output=True, text=True, env=_cpu_env(), cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    report = json.loads(out.read_text())
    assert report["xla_latency_ms_per_sample"] > 0
    assert report["compile_seconds"] > 0
    assert report["backend"] == "cpu"


def test_compile_xla_flag_search(mlp_setup, tmp_path):
    """--tune-flags: the XLA-option grid is searched, every candidate is
    recorded, and the report carries the winning flag set (the reference's
    MetaSchedule-tuning role, compile_tvm.py:1-50)."""
    root = mlp_setup
    out = tmp_path / "xla_report.json"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.compilation.compile_xla",
            "--model", str(root / "run" / "model.flax.npz"),
            "--features", str(root / "val"), "--output", str(out), "--batch", "16",
            "--tune-flags",
        ],
        capture_output=True, text=True, env=_cpu_env(), cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    report = json.loads(out.read_text())
    search = report["flag_search"]
    assert search["platform"] == "cpu"
    assert len(search["candidates"]) >= 3
    assert any("latency_ms_per_sample" in c for c in search["candidates"])
    assert search["best_latency_ms_per_sample"] > 0
    # the headline latency is the tuned winner's
    assert report["xla_latency_ms_per_sample"] > 0
