"""Hyperparameter search engine + tune CLI."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from audio_edge_ml_pipeline_tpu.train import search

REPO = Path(__file__).resolve().parent.parent


def test_tpe_beats_random_on_quadratic():
    def run(sampler):
        study = search.create_study(direction="maximize", sampler=sampler, pruner=search.NopPruner())

        def obj(trial):
            x = trial.suggest_float("x", -10, 10)
            y = trial.suggest_float("y", -10, 10)
            return -((x - 3.0) ** 2) - (y + 2.0) ** 2

        study.optimize(obj, n_trials=60)
        return study.best_value

    tpe = run(search.TPESampler(seed=0, n_startup_trials=10))
    rnd = run(search.RandomSampler(seed=0))
    assert tpe > -1.5, f"TPE best {tpe}"
    assert tpe >= rnd - 1e-9


def test_tpe_categorical_and_int_and_log():
    study = search.create_study(sampler=search.TPESampler(seed=1, n_startup_trials=8), pruner=search.NopPruner())

    def obj(trial):
        kind = trial.suggest_categorical("kind", ["a", "b", "c"])
        n = trial.suggest_int("n", 1, 64)
        lr = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
        score = {"a": 0.0, "b": 1.0, "c": 0.2}[kind]
        score -= abs(n - 32) / 64.0
        score -= abs(np.log10(lr) + 3.0) / 4.0  # optimum at 1e-3
        return score

    study.optimize(obj, n_trials=60)
    best = study.best_trial.params
    assert best["kind"] == "b"
    assert 1 <= best["n"] <= 64
    assert study.best_value > 0.5


def test_median_pruner_prunes():
    study = search.create_study(pruner=search.MedianPruner(n_startup_trials=2, n_warmup_steps=2))
    pruned = []

    def obj(trial):
        good = trial.number < 3  # first trials good, later ones bad
        for step in range(10):
            val = (0.9 if good else 0.1) + 0.01 * step
            trial.report(val, step)
            if trial.should_prune():
                pruned.append(trial.number)
                raise search.TrialPruned()
        return val

    study.optimize(obj, n_trials=8)
    states = [t.state for t in study.trials]
    assert states.count(search.TrialState.PRUNED) >= 3
    assert all(n >= 3 for n in pruned), f"pruned an early GOOD trial: {pruned}"
    assert study.best_value > 0.9


def test_successive_halving_pruner():
    study = search.create_study(pruner=search.SuccessiveHalvingPruner(min_resource=2, eta=2))

    def obj(trial):
        quality = 1.0 - trial.number * 0.1
        for step in range(8):
            trial.report(quality + 0.01 * step, step)
            if trial.should_prune():
                raise search.TrialPruned()
        return quality

    study.optimize(obj, n_trials=10)
    assert any(t.state == search.TrialState.PRUNED for t in study.trials)
    assert study.best_trial.number == 0


def test_hyperband_bracket_allocation():
    hb = search.HyperbandPruner(min_resource=2, max_resource=8, eta=2)
    assert hb.n_brackets == 3  # first rungs 2, 4, 8
    counts = [0, 0, 0]
    for n in range(70):
        counts[hb.bracket_of(n)] += 1
    # weights eta^(s_max-s) = 4:2:1 over every 7 consecutive trials
    assert counts == [40, 20, 10]


def test_hyperband_lenient_bracket_keeps_slow_starter():
    """The trial Hyperband exists for: one that looks bad at the early rungs
    but ends best. Single-bracket SHA culls it at the first rung; the same
    reporting schedule in a lenient Hyperband bracket survives to the end."""

    def run(pruner, slow_number):
        study = search.create_study(direction="maximize", pruner=pruner)

        def obj(trial):
            slow = trial.number == slow_number
            val = 0.0
            for step in range(8):
                # slow starter: near-zero until late, then the best of all
                val = (0.01 * step if step < 6 else 1.5) if slow else 0.5 + 0.005 * trial.number
                trial.report(val, step)
                if trial.should_prune():
                    raise search.TrialPruned()
            return val

        study.optimize(obj, n_trials=8)
        return study

    # baseline: single-bracket SHA prunes the slow starter at its first rung
    sha = run(search.SuccessiveHalvingPruner(min_resource=2, eta=2), slow_number=6)
    assert sha.trials[6].state == search.TrialState.PRUNED

    # Hyperband: trial 6 lands in the most lenient bracket (first rung 8,
    # past its 8-step budget) and survives to post the winning value
    hb = search.HyperbandPruner(min_resource=2, max_resource=8, eta=2)
    assert hb.bracket_of(6) == hb.n_brackets - 1
    study = run(hb, slow_number=6)
    assert study.trials[6].state == search.TrialState.COMPLETE
    assert study.best_trial.number == 6
    assert study.best_value == 1.5


def test_catch_failures():
    study = search.create_study(pruner=search.NopPruner())

    def obj(trial):
        if trial.number % 2 == 0:
            raise RuntimeError("boom")
        return float(trial.number)

    study.optimize(obj, n_trials=6, catch=(Exception,))
    assert sum(t.state == search.TrialState.FAIL for t in study.trials) == 3
    assert study.best_value == 5.0


def test_encode_labels_by_name_cross_loader_order():
    """Two loaders ordering the same classes differently must agree after
    by-name re-encoding (guard of reference optimize.py:509-527)."""
    from audio_edge_ml_pipeline_tpu.train.tune import encode_labels_by_name

    train_names = ["bird", "cat", "dog"]            # e.g. alphabetical loader
    test_names = ["dog", "bird", "cat", "emu"]      # metadata-order loader + extra class
    y_test = np.array([0, 1, 2, 3, 1, 0], dtype=np.int32)
    keep, y_mapped = encode_labels_by_name(y_test, test_names, train_names)
    # "emu" has no slot in the training encoding -> dropped
    assert keep.tolist() == [True, True, True, False, True, True]
    # dog->2, bird->0, cat->1 under the training order
    assert y_mapped.tolist() == [2, 0, 1, 0, 2]


def test_class_filter_canonical_name_sorted():
    from audio_edge_ml_pipeline_tpu.train.tune import apply_class_filter_canonical

    X = np.arange(12, dtype=np.float32).reshape(6, 2)
    y = np.array([0, 1, 2, 2, 1, 0], dtype=np.int32)
    names = ["zebra", "ant", "mole"]  # loader order != name order
    Xf, yf, kept = apply_class_filter_canonical(X, y, names, ["zebra", "ant"], "t")
    assert kept == ["ant", "zebra"]  # canonical = sorted by name
    assert yf.tolist() == [1, 0, 0, 1]  # zebra->1, ant->0
    assert Xf.shape == (4, 2)
    with pytest.raises(ValueError):
        apply_class_filter_canonical(X, y, names, ["absent"], "t")


def _cpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture(scope="module")
def feature_dirs(tmp_path_factory):
    from audio_edge_ml_pipeline_tpu.features.base import FeatureSet
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline

    root = tmp_path_factory.mktemp("tunefeats")

    def make(n, seed):
        rr = np.random.default_rng(seed)
        X, y = [], []
        for c in range(3):
            mu = np.zeros(16)
            mu[c * 5 : c * 5 + 5] = 2.0
            X.append(rr.normal(mu, 1.0, size=(n, 16)))
            y.append(np.full(n, c))
        X, y = np.concatenate(X).astype(np.float32), np.concatenate(y).astype(np.int32)
        idx = rr.permutation(len(X))
        return X[idx], y[idx]

    for name, seed, n in [("train", 1, 25), ("val", 2, 8)]:
        X, y = make(n, seed)
        fs = FeatureSet(
            features=X, feature_type="classical", modality="audio",
            metadata=[{} for _ in range(len(X))], labels=y, label_names=["a", "b", "c"],
        )
        FeaturePipeline.save(fs, root / name)
    return root


def test_tune_cli_classical_and_deep(feature_dirs, tmp_path):
    out = tmp_path / "tuned"
    cfg = tmp_path / "tuning.yaml"
    cfg.write_text(
        f"""
output_dir: {out}
experiment: tune-test
features_dir: {feature_dirs / 'train'}
features_test: {feature_dirs / 'val'}
cv: 3
n_trials: 3
sweep_epochs: 8
pruner: none
runs:
  - model: lda
    grid:
      solver: [svd, lsqr]
  - model: mlp
    params: {{batch_size: 16, learning_rate: 0.005}}
    search_space:
      hidden_units: [[8], [16]]
      dropout: {{type: float, low: 0.0, high: 0.3}}
"""
    )
    r = subprocess.run(
        [sys.executable, "-m", "audio_edge_ml_pipeline_tpu.train.tune", "--config", str(cfg)],
        capture_output=True, text=True, cwd=tmp_path, env=_cpu_env(),
    )
    assert r.returncode == 0, r.stderr
    sl = json.loads((out / "shortlist.json").read_text())
    assert sl["n_candidates"] == 2
    models = {c["model"] for c in sl["candidates"]}
    assert models == {"lda", "mlp"}
    # grid best recorded, trial summary written for deep run
    summary = json.loads((out / "mlp" / "trial_summary.json").read_text())
    assert summary["n_trials"] == 3 and summary["n_completed"] >= 1
    assert "hidden_units" in summary["best_params"]
    assert (out / "lda" / "lda.npz").exists()  # lda tunes JAX-native now
    # best trial test metrics surfaced
    best = [c for c in sl["candidates"] if c["model"] == "lda"][0]
    assert best["val_accuracy"] > 0.6


def test_tune_cli_deep_batched_parallel(feature_dirs, tmp_path):
    """tune_parallel=2: deep trials run through the device-batched ask-tell
    path (train/tune_batched.py) and the winner is refit with full
    artifacts — same shortlist/trial_summary contract as sequential."""
    out = tmp_path / "tuned"
    cfg = tmp_path / "tuning.yaml"
    cfg.write_text(
        f"""
output_dir: {out}
experiment: tune-batched-test
features_dir: {feature_dirs / 'train'}
features_test: {feature_dirs / 'val'}
n_trials: 4
sweep_epochs: 4
pruner: none
tune_parallel: 2
runs:
  - model: mlp
    params: {{batch_size: 16}}
    search_space:
      hidden_units: [[8], [16]]
      learning_rate: {{type: loguniform, low: 0.001, high: 0.02}}
      dropout: {{type: float, low: 0.0, high: 0.3}}
      epochs: [7]
"""
    )
    r = subprocess.run(
        [sys.executable, "-m", "audio_edge_ml_pipeline_tpu.train.tune", "--config", str(cfg)],
        capture_output=True, text=True, cwd=tmp_path, env=_cpu_env(),
    )
    assert r.returncode == 0, r.stderr
    # sampled `epochs` must not collide with the sweep budget (was a
    # TypeError failing every trial); sweep trains sweep_epochs, the
    # winner refit honors the sampled value
    assert "search space samples `epochs`" in r.stderr
    summary = json.loads((out / "mlp" / "trial_summary.json").read_text())
    assert summary["n_trials"] == 4 and summary["n_completed"] >= 1
    # EVERY completed trial is recorded in the summary, not just the winner
    assert len(summary["trials"]) == summary["n_completed"]
    # the refit winner has real artifacts in its trial dir
    best = summary["best_trial"]
    assert (out / "mlp" / f"trial_{best:02d}" / "model.flax.npz").exists()
    sl = json.loads((out / "shortlist.json").read_text())
    assert sl["n_candidates"] == 1
