"""Trainer layer: registry, flax deep trainers, JAX/sklearn classical
trainers — small separable synthetic data, save/load round-trips."""

from pathlib import Path

import numpy as np
import pytest

from audio_edge_ml_pipeline_tpu.models import get_model, list_models
from audio_edge_ml_pipeline_tpu.utils import tracking


@pytest.fixture(scope="module")
def flat_data():
    """3 gaussian blobs in 20-d."""
    X, y = [], []
    r = np.random.default_rng(3)
    for c in range(3):
        mu = np.zeros(20)
        mu[c * 5 : c * 5 + 5] = 3.0
        X.append(r.normal(mu, 1.0, size=(40, 20)))
        y.append(np.full(40, c))
    X = np.concatenate(X).astype(np.float32)
    y = np.concatenate(y).astype(np.int32)
    idx = r.permutation(len(X))
    X, y = X[idx], y[idx]
    return X[:90], y[:90], X[90:], y[90:]


@pytest.fixture(scope="module")
def spec_data():
    """3-class synthetic 'spectrograms' (16, 32) with class-specific bands."""
    r = np.random.default_rng(4)
    X, y = [], []
    for c in range(3):
        for _ in range(30):
            img = r.normal(0, 0.3, size=(16, 32))
            img[c * 5 : c * 5 + 4, :] += 2.5
            X.append(img)
            y.append(c)
    X = np.stack(X).astype(np.float32)
    y = np.array(y, np.int32)
    idx = r.permutation(len(X))
    X, y = X[idx], y[idx]
    return X[:70], y[:70], X[70:], y[70:]


def test_registry_names():
    names = list_models()
    for expected in [
        "mlp", "cnn", "ds_cnn", "rnn", "transformer", "efficientnet_teacher", "distillation_cnn",
        "svm", "lda", "decision_tree", "random_forest", "knn", "kmeans",
        "pca_svm", "pca_lda", "pca_knn",
    ]:
        assert expected in names, expected
    with pytest.raises(KeyError):
        get_model("nope")


@pytest.mark.parametrize("name", ["svm", "lda", "decision_tree", "random_forest", "knn"])
def test_classical_trainers(name, flat_data, tmp_path):
    Xtr, ytr, Xva, yva = flat_data
    trainer = get_model(name)()
    res = trainer.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], f"test_{name}", tmp_path / name, None)
    assert res.metrics["val_accuracy"] > 0.8, name
    assert res.model_size_kb > 0
    assert (tmp_path / name / "model_info.json").exists()
    assert (tmp_path / name / "classification_report.txt").exists()
    # save/load round trip preserves predictions
    files = list((tmp_path / name).glob(f"{name}.*"))
    assert files
    loaded = get_model(name).load(files[0])
    np.testing.assert_array_equal(loaded.predict(Xva), trainer.predict(Xva))
    proba = trainer.predict_proba(Xva)
    if proba is not None:
        assert proba.shape == (len(Xva), 3)
        np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)


def test_knn_predict_does_not_retrace(flat_data, tmp_path):
    """Repeated same-shape predicts must hit JAX's trace cache — a fresh
    jitted closure per call means a full XLA recompile per predict
    (CLAUDE.md invariant; VERDICT r1 weak #1)."""
    from audio_edge_ml_pipeline_tpu.models import classical

    Xtr, ytr, Xva, yva = flat_data
    trainer = get_model("knn")(n_neighbors=3)
    trainer.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "knn_rt", tmp_path / "knn_rt", None)
    trainer.predict(Xva)  # warm the (shape, k, n_classes) signature
    before = classical._knn_trace_count
    trainer.predict(Xva)
    trainer.predict_proba(Xva)
    trainer.predict(Xva)
    assert classical._knn_trace_count == before, "KNN retraced on a warm signature"


def test_knn_cosine_metric(flat_data, tmp_path):
    """metric='cosine' matches sklearn's cosine KNN (reference tuning grid
    values minkowski | cosine, classical.py:339-352) and survives a
    save/load round trip."""
    from sklearn.neighbors import KNeighborsClassifier

    Xtr, ytr, Xva, yva = flat_data
    trainer = get_model("knn")(n_neighbors=5, metric="cosine")
    trainer.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "knn_cos", tmp_path / "knn_cos", None)
    ref = KNeighborsClassifier(n_neighbors=5, metric="cosine").fit(Xtr, ytr)
    np.testing.assert_array_equal(trainer.predict(Xva), ref.predict(Xva))
    loaded = get_model("knn").load(tmp_path / "knn_cos" / "knn.npz")
    assert loaded.metric == "cosine"
    np.testing.assert_array_equal(loaded.predict(Xva), trainer.predict(Xva))


def test_pca_pipelines(flat_data, tmp_path):
    Xtr, ytr, Xva, yva = flat_data
    trainer = get_model("pca_svm")(n_components=5)
    res = trainer.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "pca_svm", tmp_path / "pca_svm", None)
    assert res.metrics["val_accuracy"] > 0.8


def test_pca_lda_reference_knobs(flat_data, tmp_path):
    """n_components_pca / n_components_lda are honored, not silently
    swallowed by **_ (reference classical.py:448-470)."""
    Xtr, ytr, Xva, yva = flat_data
    trainer = get_model("pca_lda")(n_components_pca=4, n_components_lda=1)
    trainer.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "pca_lda_k", tmp_path / "pl", None)
    assert trainer.n_components == 4
    assert trainer.n_components_lda == 1
    # the fitted PCA basis really is 4-dimensional
    assert trainer._state["pca_components"].shape[1] == 4


def test_kmeans(flat_data, tmp_path):
    Xtr, ytr, Xva, yva = flat_data
    trainer = get_model("kmeans")(n_init=3)
    res = trainer.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "kmeans", tmp_path / "km", None)
    assert "note" in res.metrics
    clusters = trainer.predict(Xva)
    assert set(np.unique(clusters)) <= {0, 1, 2}
    # clusters must align with true classes up to a permutation (clean blobs)
    from itertools import permutations

    best = max(
        np.mean([p[int(c)] for c in clusters] == yva) for p in permutations(range(3))
    )
    assert best > 0.9, f"best permutation-aligned accuracy {best:.2f}"


@pytest.mark.parametrize("name", ["mlp", "cnn", "ds_cnn", "rnn", "transformer"])
def test_deep_trainers(name, flat_data, spec_data, tmp_path):
    if name in ("mlp",):
        Xtr, ytr, Xva, yva = flat_data
        kw = {"hidden_units": [32, 16]}
    elif name == "cnn":
        Xtr, ytr, Xva, yva = spec_data
        kw = {"filters": [8, 16]}
    elif name == "ds_cnn":
        Xtr, ytr, Xva, yva = spec_data
        kw = {"filters": [8, 16], "first_stride": 1, "pool": "avg"}
    elif name == "rnn":
        Xtr, ytr, Xva, yva = spec_data  # (16, 32) treated as (T=16, D=32)
        kw = {"units": 16}
    else:
        # transformer has no positional encoding (reference deep.py:514-585):
        # permutation-invariant after GAP, so encode class in feature dims
        # (transpose puts the hot bands on the feature axis)
        Xtr, ytr, Xva, yva = spec_data
        Xtr, Xva = Xtr.transpose(0, 2, 1), Xva.transpose(0, 2, 1)
        kw = {"num_heads": 2, "ff_dim": 32, "n_blocks": 1}
    trainer = get_model(name)(epochs=15, batch_size=16, learning_rate=3e-3, **kw)
    run = tracking.start_run(run_name=f"test_{name}", experiment="unit_tests")
    with run:
        res = trainer.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], f"test_{name}", tmp_path / name, run)
    assert res.metrics["val_accuracy"] > 0.7, (name, res.metrics["val_accuracy"])
    assert res.run_id == run.info.run_id
    # save/load
    model_file = tmp_path / name / "model.flax.npz"
    assert model_file.exists()
    loaded = get_model(name).load(model_file)
    np.testing.assert_array_equal(loaded.predict(Xva), trainer.predict(Xva))
    proba = loaded.predict_proba(Xva)
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)
    # tracking store recorded per-epoch metrics
    rec = tracking.get_run(run.info.run_id)
    assert rec is not None and rec.status == "FINISHED"
    assert "val_accuracy" in rec.metrics


def test_distillation(spec_data, tmp_path, monkeypatch):
    Xtr, ytr, Xva, yva = spec_data
    teacher = get_model("cnn")(epochs=10, batch_size=16, filters=[8, 16], learning_rate=3e-3)
    tres = teacher.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "teacher", tmp_path / "teacher", None)
    student = get_model("distillation_cnn")(
        epochs=10, batch_size=16, filters=[4, 4], learning_rate=3e-3,
        teacher_model=str(tmp_path / "teacher" / "model.flax.npz"),
    )
    sres = student.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "student", tmp_path / "student", None)
    assert sres.metrics["val_accuracy"] > 0.6
    assert sres.model_size_kb < tres.model_size_kb


def test_pretrained_warm_start(spec_data, tmp_path):
    Xtr, ytr, Xva, yva = spec_data
    base = get_model("cnn")(epochs=8, batch_size=16, filters=[8, 16], learning_rate=3e-3)
    base.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "base", tmp_path / "base", None)
    warm = get_model("cnn")(
        epochs=1, batch_size=16, filters=[8, 16],
        pretrained_model=str(tmp_path / "base" / "model.flax.npz"),
    )
    res = warm.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "warm", tmp_path / "warm", None)
    # 1 epoch from pretrained should already be good
    assert res.metrics["val_accuracy"] > 0.7


def test_efficientnet_teacher_two_phase(spec_data, tmp_path):
    """2-phase teacher fine-tune: batch_stats collections must survive init,
    apply, save and load (regression: ScopeCollectionNotFound)."""
    Xtr, ytr, Xva, yva = spec_data
    trainer = get_model("efficientnet_teacher")(
        epochs=3, warmup_epochs=2, batch_size=16, learning_rate=3e-3, image_size=32,
    )
    run = tracking.start_run(run_name="teacher", experiment="unit_tests")
    with run:
        res = trainer.fit(Xtr[:40], ytr[:40], Xva, yva, ["a", "b", "c"], "t", tmp_path / "t", run)
    assert np.isfinite(res.metrics["val_accuracy"])
    # phase-2 metric steps continue after phase 1 (no step collisions)
    rec = tracking.get_run(run.info.run_id)
    assert rec is not None
    loaded = get_model("efficientnet_teacher").load(tmp_path / "t" / "model.flax.npz")
    np.testing.assert_array_equal(loaded.predict(Xva), trainer.predict(Xva))


def test_transfer_rejects_legacy_teacher_bundle(tmp_path):
    """A relu6-era efficientnet_teacher bundle has byte-identical module
    names + shapes, so a by-name warm start would silently transfer weights
    that then compute through silu — transfer_pretrained must apply the same
    arch-revision gate as load_model."""
    from audio_edge_ml_pipeline_tpu.models.deep import (
        save_model_bundle_flat, transfer_pretrained,
    )

    p = tmp_path / "legacy_teacher.npz"
    save_model_bundle_flat(
        p, {"type": "efficientnet_teacher", "n_classes": 3, "dropout": 0.2},
        {"p/head/kernel": np.zeros((4, 3), np.float32)},
        np.zeros(4, np.float32), np.ones(4, np.float32),
    )
    with pytest.raises(ValueError, match="arch revision"):
        transfer_pretrained({}, {}, p)
