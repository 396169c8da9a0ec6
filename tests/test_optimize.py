"""Stage 6 quantization emulation + optimize CLI + post-opt selection."""

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


def test_fake_quant_int8_roundtrip():
    from audio_edge_ml_pipeline_tpu.optimize.quantize import fake_quant_int8

    arr = np.linspace(-2, 2, 1000).astype(np.float32)
    deq, scale, nbytes, q = fake_quant_int8(arr)
    assert nbytes == 1004
    assert q.dtype == np.int8
    assert np.max(np.abs(deq - arr)) <= scale / 2 + 1e-7
    # artifact and evaluated view derive from the same rounding
    np.testing.assert_allclose(q.astype(np.float64) * scale, deq, rtol=1e-6)
    z, s0, _, _ = fake_quant_int8(np.zeros(10, np.float32))
    assert s0 == 0.0 and (z == 0).all()


def test_classical_int8_is_weight_only():
    """Classical dynamic_int8 quantizes only >=2-D weight matrices
    (onnxruntime quantize_dynamic semantics: MatMul initializers), never
    normalization/bias vectors — per-tensor int8 on a scaler_scale whose
    feature stds span decades zeroed small stds and collapsed pca_svm to
    chance accuracy (measured 0.17 -> 1.00 after this rule)."""
    from audio_edge_ml_pipeline_tpu.models.registry import get_model
    from audio_edge_ml_pipeline_tpu.optimize.quantize import _quantize_classical

    rng = np.random.default_rng(5)
    K, per, D = 4, 25, 30
    # heterogeneous feature scales: stds spanning 1e-3 .. 1e3 like the
    # classical 302-d audio vector (mel energies vs zcr vs tonnetz)
    scales = np.logspace(-3, 3, D)
    means = rng.standard_normal((K, D)) * 2.0
    Xtr = (np.concatenate([means[k] + rng.standard_normal((per, D)) for k in range(K)]) * scales).astype(np.float32)
    ytr = np.repeat(np.arange(K), per).astype(np.int32)

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        trainer = get_model("pca_svm")(n_components=8, iters=300)
        trainer.fit(Xtr, ytr, Xtr[:8], ytr[:8], ["a", "b", "c", "d"], "t", Path(td), None)
        base_acc = (trainer.predict(Xtr) == ytr).mean()
        assert base_acc >= 0.95
        mp = Path(td) / "pca_svm.npz"
        trainer.save(mp)
        view, size_kb = _quantize_classical(trainer, "dynamic_int8", mp, Path(td) / "q.npz")
        orig_kb = mp.stat().st_size / 1024
    # 1-D normalization params stayed float (bit-identical to the fit)
    np.testing.assert_array_equal(view._state["scaler_scale"], trainer._state["scaler_scale"])
    # the weight matrices were genuinely quantized ...
    assert not np.array_equal(view._state["pca_components"], trainer._state["pca_components"])
    assert size_kb < 0.75 * orig_kb  # small model: 1-D float params + npz overhead keep a floor
    # ... and predictions survive
    q_acc = (view.predict(Xtr) == ytr).mean()
    assert q_acc >= base_acc - 0.05


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    """Train a small CNN + an SVM on synthetic spectrogram-ish data; build a
    shortlist pointing at them."""
    from audio_edge_ml_pipeline_tpu.features.base import FeatureSet
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline
    from audio_edge_ml_pipeline_tpu.models import get_model

    root = tmp_path_factory.mktemp("opt")
    r = np.random.default_rng(7)

    def make(n):
        X, y = [], []
        for c in range(3):
            for _ in range(n):
                img = r.normal(0, 0.3, size=(12, 20))
                img[c * 4 : c * 4 + 3, :] += 2.0
                X.append(img)
                y.append(c)
        X = np.stack(X).astype(np.float32)
        y = np.array(y, np.int32)
        idx = r.permutation(len(X))
        return X[idx], y[idx]

    Xtr, ytr = make(25)
    Xev, yev = make(8)
    names = ["a", "b", "c"]
    for nm, (X, y) in [("calib", (Xtr, ytr)), ("eval", (Xev, yev))]:
        FeaturePipeline.save(
            FeatureSet(features=X, feature_type="deep", modality="audio",
                       metadata=[{} for _ in X], labels=y, label_names=names),
            root / nm,
        )
    cnn = get_model("cnn")(epochs=12, batch_size=16, filters=[8, 8], learning_rate=5e-3)
    cnn.fit(Xtr, ytr, Xev, yev, names, "cnn", root / "cnn_run", None)
    svm = get_model("svm")()
    svm.fit(Xtr.reshape(len(Xtr), -1), ytr, Xev.reshape(len(Xev), -1), yev, names, "svm", root / "svm_run", None)
    shortlist = {
        "experiment": "opt-test",
        "metric": "val_f1_macro",
        "n_candidates": 2,
        "generated_at": "now",
        "candidates": [
            {"rank": 1, "run_id": "r1", "run_name": "cnn", "model": "cnn",
             "val_accuracy": 0.9, "val_f1_macro": 0.9, "model_size_kb": 10,
             "params": {}, "artifact_uri": str(root / "cnn_run"),
             "features_dir": str(root / "calib"), "features_eval_dir": str(root / "eval"),
             "class_filter": None},
            {"rank": 2, "run_id": "r2", "run_name": "svm", "model": "svm",
             "val_accuracy": 0.9, "val_f1_macro": 0.9, "model_size_kb": 10,
             "params": {}, "artifact_uri": str(root / "svm_run"),
             "features_dir": str(root / "calib"), "features_eval_dir": str(root / "eval"),
             "class_filter": None},
        ],
    }
    (root / "shortlist.json").write_text(json.dumps(shortlist))
    return root


@pytest.fixture(scope="module")
def optimized_out(trained_setup, tmp_path_factory):
    """Run the optimize CLI once over the 2-candidate shortlist."""
    root = trained_setup
    out = tmp_path_factory.mktemp("optimized")
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.optimize.optimize",
            "--shortlist", str(root / "shortlist.json"),
            "--output", str(out), "--max-accuracy-drop", "0.05", "--no-tracking",
        ],
        capture_output=True, text=True, cwd=out, env=_cpu_env(),
    )
    assert r.returncode == 0, r.stderr
    return out


def test_int8_emulation_predicts_real_tflite_int8(trained_setup, tmp_path):
    """SURVEY hard part 6 (INT8 emulation fidelity): the emulated
    static-int8 accuracy drop must predict the REAL TFLite full-integer
    drop on the same model + eval set, so post-opt selection picks
    deployable models. Emulation: per-tensor fake-quant weights + input
    quant grid (optimize/quantize.py). Real: jax2tf -> TFLite int8 with a
    representative dataset (compilation/to_tflite.py)."""
    from audio_edge_ml_pipeline_tpu.compilation.to_tflite import (
        convert_modes,
        evaluate_tflite,
    )
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline
    from audio_edge_ml_pipeline_tpu.models.deep import load_any_model
    from audio_edge_ml_pipeline_tpu.optimize.quantize import build_mode, evaluate_model

    root = trained_setup
    calib = FeaturePipeline.load(root / "calib")
    ev = FeaturePipeline.load(root / "eval")
    names = list(ev.label_names)
    model_path = root / "cnn_run" / "model.flax.npz"
    trainer = load_any_model(model_path)

    acc_fp32 = evaluate_model(trainer, ev.features, ev.labels, names)["accuracy"]
    view, _, _ = build_mode(trainer, model_path, "static_int8", tmp_path, calib.features)
    acc_emu = evaluate_model(view, ev.features, ev.labels, names)["accuracy"]

    Xc = trainer._prepare_input(np.asarray(calib.features, np.float32))
    Xv = trainer._prepare_input(np.asarray(ev.features, np.float32))
    paths = convert_modes(trainer, Xv.shape[1:], Xc, tmp_path)
    assert "int8" in paths, "real TFLite full-int8 conversion failed"
    acc_real = evaluate_tflite(paths["int8"], Xv, ev.labels)["accuracy"]

    assert acc_fp32 > 0.8  # the synthetic task is separable; drops are meaningful
    # the two int8 schemes differ (per-tensor emulation vs TFLite per-axis),
    # but their accuracy drops must agree closely enough that the stage-6
    # accept/reject decision (0.05 gate) transfers to the deployed artifact
    assert abs((acc_fp32 - acc_emu) - (acc_fp32 - acc_real)) <= 0.1, (
        f"emulated drop {acc_fp32 - acc_emu:.3f} vs real drop {acc_fp32 - acc_real:.3f}"
    )


def test_optimize_cli_and_postopt(trained_setup, optimized_out, tmp_path):
    root = trained_setup
    out = optimized_out
    for name in ("cnn", "svm"):
        report = json.loads((out / name / "optimization_report.json").read_text())
        # full schema contract (reference optimize.py:229-249)
        for key in (
            "run_id", "run_name", "model_name", "original_model_path",
            "optimized_model_path", "original_size_kb", "optimized_size_kb",
            "compression_ratio", "quantization_method", "target_device",
            "val_accuracy_original", "val_accuracy_optimized", "accuracy_drop",
            "latency_ms", "timestamp", "benchmark_results",
        ):
            assert key in report, (name, key)
        assert report["accuracy_drop"] <= 0.05 + 1e-9
        assert report["optimized_size_kb"] <= report["original_size_kb"] + 1e-6
        assert "fp32" in report["benchmark_results"]
    cnn_report = json.loads((out / "cnn" / "optimization_report.json").read_text())
    assert "dynamic_int8" in cnn_report["benchmark_results"]
    assert "static_int8" in cnn_report["benchmark_results"]
    # int8 artifact shrinks by ~3 bytes/param; container overhead dominates
    # for this tiny model, so assert strict shrink rather than a 4x ratio
    bench = cnn_report["benchmark_results"]
    assert bench["dynamic_int8"]["size_kb"] < 0.8 * bench["fp32"]["size_kb"]
    assert bench["float16"]["size_kb"] < bench["fp32"]["size_kb"]

    # post-opt selection over the real reports
    r2 = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.train.select",
            "--post-opt", "--shortlist", str(root / "shortlist.json"),
            "--opt-dir", str(out), "--output", str(tmp_path / "best_model.json"),
        ],
        capture_output=True, text=True, cwd=tmp_path, env=_cpu_env(),
    )
    assert r2.returncode == 0, r2.stderr
    best = json.loads((tmp_path / "best_model.json").read_text())
    assert best["model"] in ("cnn", "svm")
    assert best["optimized_model_path"]
    assert "Best post-optimisation model" in r2.stdout


def test_bf16_artifact_holds_evaluated_values(trained_setup, optimized_out):
    """The bfloat16 artifact must dequantize to EXACTLY the bf16-rounded
    weights whose accuracy the report measured (regression: it used to
    store an fp16 cast instead — different rounding, inf above 65504)."""
    from audio_edge_ml_pipeline_tpu.models.deep import load_model_bundle
    from audio_edge_ml_pipeline_tpu.optimize.quantize import fake_cast, load_any_bundle

    art = optimized_out / "cnn" / "model_bfloat16.npz"
    assert art.exists()
    _, flat_q, _, _, mode, _ = load_any_bundle(art)
    assert mode == "bfloat16"
    bundles = list((trained_setup / "cnn_run").glob("*.npz"))
    _, flat0, _, _ = load_model_bundle(bundles[0])
    for k, arr in flat0.items():
        want = fake_cast(arr, "bfloat16")[0].astype(np.float32)
        np.testing.assert_array_equal(flat_q[k], want, err_msg=k)


def test_postopt_max_size_kb_filter(trained_setup, optimized_out, tmp_path):
    """--max-size-kb is a hard gate (reference select.py post-opt): an
    impossible budget must leave no qualifying model and write no file."""
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.train.select",
            "--post-opt", "--shortlist", str(trained_setup / "shortlist.json"),
            "--opt-dir", str(optimized_out), "--max-size-kb", "0.001",
            "--output", str(tmp_path / "best_model.json"),
        ],
        capture_output=True, text=True, cwd=tmp_path, env=_cpu_env(),
    )
    assert r.returncode == 0, r.stderr
    assert "No model qualified" in r.stdout
    assert not (tmp_path / "best_model.json").exists()


def test_single_model_mode_cli(trained_setup, tmp_path):
    """--model-path bypasses the shortlist (reference optimize.py single-model
    mode) and still emits the full report schema."""
    root = trained_setup
    bundles = list((root / "cnn_run").glob("*.npz"))
    assert bundles, "expected a persisted cnn bundle"
    out = tmp_path / "single"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.optimize.optimize",
            "--model-path", str(bundles[0]), "--model-name", "cnn",
            "--features", str(root / "calib"), "--features-eval", str(root / "eval"),
            "--output", str(out), "--no-tracking",
        ],
        capture_output=True, text=True, cwd=tmp_path, env=_cpu_env(),
    )
    assert r.returncode == 0, r.stderr
    report = json.loads((out / "cnn" / "optimization_report.json").read_text())
    assert report["model_name"] == "cnn"
    assert "dynamic_int8" in report["benchmark_results"]


def test_eval_set_by_name_reencoding(trained_setup, tmp_path):
    """An eval FeatureSet whose loader ordered label_names differently (and
    grew an extra class) must be re-encoded by NAME against the calibration
    order, dropping unknown classes (reference optimize.py:509-527)."""
    from audio_edge_ml_pipeline_tpu.features.base import FeatureSet
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline
    from audio_edge_ml_pipeline_tpu.optimize.optimize import _load_eval_set

    rng = np.random.default_rng(3)
    X = rng.normal(size=(8, 4)).astype(np.float32)
    # eval loader order: c, a, d(unknown), b
    y = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int32)
    FeaturePipeline.save(
        FeatureSet(features=X, feature_type="classical", modality="audio",
                   metadata=[{} for _ in X], labels=y,
                   label_names=["c", "a", "d", "b"]),
        tmp_path / "eval_shuffled",
    )
    X_eval, y_eval = _load_eval_set(
        str(tmp_path / "eval_shuffled"), ["a", "b", "c"], None, "test")
    assert len(X_eval) == 6                      # the two 'd' rows dropped
    # rows were c,a,b,c,a,b under training order a=0,b=1,c=2
    assert y_eval.tolist() == [2, 0, 1, 2, 0, 1]
