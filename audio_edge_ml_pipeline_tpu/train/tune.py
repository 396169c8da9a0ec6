"""Stage 4 — unified hyperparameter search CLI.

Dispatch by registered model_type (contract of reference tune.py:111-818):
  classical -> estimator factories + friendly->Pipeline param remap
               (_PARAM_PREFIXES) + GridSearchCV(StratifiedKFold, n_jobs=-1)
  deep      -> TPE search (train/search.py) + median/successive-halving
               pruner with per-epoch pruning callbacks, search-space DSL
               (list -> categorical; dict {type: categorical/float/
               loguniform/int}), JSON-encoded list-valued categoricals

plus: canonical class-name-sorted label encoding in the class filter
(tune.py:189-196), held-out test eval of the best trial, unified
shortlist.json writer, per-run catch-all error handling.

CLI: python -m audio_edge_ml_pipeline_tpu.train.tune --config tuning.yaml
"""

from __future__ import annotations

import argparse
import json
import logging
import math
import shutil
import sys
from datetime import datetime
from pathlib import Path
from typing import Optional

import numpy as np
import yaml

from ..features.pipeline import FeaturePipeline
from ..models import get_model
from ..utils import tracking
from ..utils.logging import setup_logging
from . import search
from .evaluate import (
    compute_metrics,
    log_run_to_mlflow,
    save_classification_report,
    save_confusion_matrix_png,
    save_model_info,
)

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Classical — GridSearchCV
# ---------------------------------------------------------------------------


def _build_estimator(model_name: str):
    from sklearn.decomposition import PCA
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.neighbors import KNeighborsClassifier
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC
    from sklearn.tree import DecisionTreeClassifier

    factories = {
        "svm": lambda: SVC(probability=True, class_weight="balanced"),
        "lda": lambda: LinearDiscriminantAnalysis(),
        "decision_tree": lambda: DecisionTreeClassifier(class_weight="balanced"),
        "random_forest": lambda: RandomForestClassifier(class_weight="balanced", n_jobs=-1, random_state=42),
        "knn": lambda: KNeighborsClassifier(),
        "pca_svm": lambda: Pipeline(
            [("scaler", StandardScaler()), ("pca", PCA(random_state=42)),
             ("svm", SVC(probability=True, class_weight="balanced"))]
        ),
        "pca_lda": lambda: Pipeline(
            [("scaler", StandardScaler()), ("pca", PCA(random_state=42)), ("lda", LinearDiscriminantAnalysis())]
        ),
        "pca_knn": lambda: Pipeline(
            [("scaler", StandardScaler()), ("pca", PCA(random_state=42)), ("knn", KNeighborsClassifier())]
        ),
    }
    if model_name not in factories:
        raise ValueError(f"No estimator factory for {model_name!r}. Supported: {sorted(factories)}")
    return factories[model_name]


_PARAM_PREFIXES: dict[str, dict[str, str]] = {
    "pca_svm": {"n_components": "pca__n_components", "C": "svm__C", "kernel": "svm__kernel", "gamma": "svm__gamma"},
    "pca_lda": {"n_components": "pca__n_components", "n_components_lda": "lda__n_components", "solver": "lda__solver"},
    "pca_knn": {"n_components": "pca__n_components", "n_neighbors": "knn__n_neighbors", "metric": "knn__metric"},
}


def _remap_param_grid(model_name: str, param_grid: dict) -> dict:
    mapping = _PARAM_PREFIXES.get(model_name, {})
    return {mapping.get(k, k): v for k, v in param_grid.items()}


def apply_class_filter_canonical(X, y, label_names, class_filter, run_label: str):
    """Class filter with **class-name-sorted** canonical integer encoding so
    train and eval sets built by different loaders agree (reference
    tune.py:189-212)."""
    if not class_filter:
        return X, y, label_names
    filter_set = set(class_filter)
    allowed_pairs = sorted(
        [(i, n) for i, n in enumerate(label_names) if n in filter_set], key=lambda p: p[1]
    )
    allowed_indices = [i for i, _ in allowed_pairs]
    if not allowed_indices:
        raise ValueError(f"[{run_label}] class_filter {sorted(filter_set)} matched no classes in {label_names}")
    missing = filter_set - {label_names[i] for i in allowed_indices}
    if missing:
        logger.warning("[%s] class_filter: classes not found in dataset: %s", run_label, sorted(missing))
    mask = np.isin(y, allowed_indices)
    X, y = X[mask], y[mask]
    idx_map = {old: new for new, old in enumerate(allowed_indices)}
    y = np.array([idx_map[int(v)] for v in y], dtype=np.int32)
    label_names = [label_names[i] for i in allowed_indices]
    logger.info("[%s] class_filter applied — %d classes, %d samples", run_label, len(label_names), len(X))
    return X, y, label_names


def _split(X, y, val_split, seed=42):
    from sklearn.model_selection import train_test_split

    try:
        return train_test_split(X, y, test_size=val_split, random_state=seed, stratify=y)
    except ValueError:
        return train_test_split(X, y, test_size=val_split, random_state=seed)


def _tune_classical(run_cfg: dict, default_cfg: dict) -> Optional[dict]:
    import joblib

    model_name = run_cfg["model"]
    run_label = run_cfg.get("name") or model_name
    features_dir = Path(run_cfg.get("features_dir") or default_cfg.get("features_dir", ""))
    features_test_raw = run_cfg.get("features_test") or default_cfg.get("features_test")
    output_dir = Path(run_cfg.get("output_dir") or default_cfg["output_dir"]) / run_label
    val_split = float(run_cfg.get("val_split") or default_cfg.get("val_split", 0.2))
    cv = int(run_cfg.get("cv") or default_cfg.get("cv", 5))
    scoring = str(run_cfg.get("scoring") or default_cfg.get("scoring", "f1_macro"))
    param_grid = run_cfg.get("grid") or {}
    class_filter = run_cfg.get("class_filter") or default_cfg.get("class_filter") or None

    fs = FeaturePipeline.load(features_dir)
    X, y, label_names = fs.features, fs.labels, fs.label_names or []
    if y is None:
        logger.error("[%s] FeatureSet has no labels — skipping.", run_label)
        return None
    X, y, label_names = apply_class_filter_canonical(X, y, label_names, class_filter, run_label)
    X_flat = X.reshape(len(X), -1).astype(np.float32)
    X_train, X_val, y_train, y_val = _split(X_flat, y, val_split)
    n_combos = math.prod(len(v) for v in param_grid.values()) if param_grid else 1
    logger.info("[%s] GridSearchCV: %d combination(s) x %d folds = %d fits", run_label, n_combos, cv, n_combos * cv)

    best_estimator, best_params, cv_best_score = search.grid_search_cv(
        _build_estimator(model_name), _remap_param_grid(model_name, param_grid),
        X_train, y_train, cv=cv, scoring=scoring,
    )
    logger.info("[%s] Best CV %s = %.4f -> %s", run_label, scoring, cv_best_score, dict(best_params))

    y_pred_val = best_estimator.predict(X_val)
    y_proba_val = None
    if hasattr(best_estimator, "predict_proba"):
        try:
            y_proba_val = best_estimator.predict_proba(X_val)
        except Exception:
            pass
    val_metrics = compute_metrics(y_val, y_pred_val, y_proba_val, label_names)

    test_metrics: dict = {}
    if features_test_raw and Path(features_test_raw).exists():
        test_fs = FeaturePipeline.load(features_test_raw)
        if test_fs.labels is not None:
            X_test_f, y_test_f, _ = apply_class_filter_canonical(
                test_fs.features.reshape(len(test_fs.features), -1).astype(np.float32),
                test_fs.labels, test_fs.label_names or [], class_filter, run_label,
            )
            test_metrics = compute_metrics(y_test_f, best_estimator.predict(X_test_f), None, label_names)
            logger.info(
                "[%s] Test accuracy=%.4f f1_macro=%.4f (n=%d)",
                run_label, test_metrics["val_accuracy"], test_metrics["val_f1_macro"], len(y_test_f),
            )

    output_dir.mkdir(parents=True, exist_ok=True)
    model_path = output_dir / f"{model_name}.joblib"
    joblib.dump(best_estimator, model_path)
    model_size_kb = model_path.stat().st_size / 1024

    run_name = f"{run_label}_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
    params_str = {"model": model_name, **{k: str(v) for k, v in best_params.items()}}
    save_classification_report(y_val, y_pred_val, label_names, output_dir / "classification_report.txt")
    save_confusion_matrix_png(val_metrics.get("confusion_matrix", []), label_names, output_dir / "confusion_matrix.png")
    save_model_info(output_dir, model_name, run_name, val_metrics, params_str, model_size_kb)

    with tracking.start_run(run_name=run_name) as active_run:
        log_run_to_mlflow(
            active_run,
            {"model": model_name, "cv_folds": str(cv), "cv_scoring": scoring,
             "features_dir": str(features_dir), **params_str},
            {**val_metrics, "cv_best_score": cv_best_score, "model_size_kb": model_size_kb},
            output_dir,
        )
        for k, v in test_metrics.items():
            if isinstance(v, (int, float)):
                active_run.log_metric(f"test_{k}", float(v))
        active_run.log_artifact(model_path)
        run_id = active_run.info.run_id

    return {
        "model": model_name, "run_name": run_name, "run_id": run_id,
        "val_accuracy": val_metrics.get("val_accuracy", 0.0),
        "val_f1_macro": val_metrics.get("val_f1_macro", 0.0),
        "cv_best_score": cv_best_score, "model_size_kb": model_size_kb,
        "best_params": params_str, "artifact_uri": str(output_dir),
        "features_dir": str(features_dir), "features_test": str(features_test_raw or ""),
        "class_filter": class_filter or None,
    }


# ---------------------------------------------------------------------------
# Deep — TPE search
# ---------------------------------------------------------------------------


def sample_search_space(trial: search.Trial, search_space: dict) -> dict:
    """Search-space DSL -> suggest_* calls (reference tune.py:382-436);
    list-valued categorical choices are JSON-encoded/decoded."""

    def _cat(key, choices):
        encoded = [json.dumps(c) if isinstance(c, (list, tuple)) else c for c in choices]
        value = trial.suggest_categorical(key, encoded)
        if isinstance(value, str):
            try:
                decoded = json.loads(value)
                if isinstance(decoded, list):
                    return decoded
            except (ValueError, TypeError):
                pass
        return value

    params: dict = {}
    for key, spec in search_space.items():
        if isinstance(spec, list):
            params[key] = _cat(key, spec)
        elif isinstance(spec, dict):
            kind = str(spec.get("type", "categorical")).lower()
            if kind == "categorical":
                params[key] = _cat(key, spec["choices"])
            elif kind in ("float", "uniform"):
                params[key] = trial.suggest_float(key, float(spec["low"]), float(spec["high"]), step=spec.get("step"))
            elif kind == "loguniform":
                params[key] = trial.suggest_float(key, float(spec["low"]), float(spec["high"]), log=True)
            elif kind == "int":
                params[key] = trial.suggest_int(key, int(spec["low"]), int(spec["high"]), step=int(spec.get("step", 1)))
            else:
                raise ValueError(f"Unknown search_space type {kind!r} for {key!r}.")
        else:
            raise ValueError(f"Invalid search_space spec for {key!r}: {spec!r}")
    return params


def _tune_deep(run_cfg: dict, default_cfg: dict) -> Optional[dict]:
    model_name = run_cfg["model"]
    run_label = run_cfg.get("name") or model_name
    features_dir = Path(run_cfg.get("features_dir") or default_cfg.get("features_dir", ""))
    features_test_raw = run_cfg.get("features_test") or default_cfg.get("features_test")
    output_dir = Path(run_cfg.get("output_dir") or default_cfg["output_dir"]) / run_label
    val_split = float(run_cfg.get("val_split") or default_cfg.get("val_split", 0.2))
    n_trials = int(run_cfg.get("n_trials") or default_cfg.get("n_trials", 20))
    sweep_epochs = int(run_cfg.get("sweep_epochs") or default_cfg.get("sweep_epochs", 25))
    seed = int(default_cfg.get("seed", 42))
    pruner_name = str(run_cfg.get("pruner") or default_cfg.get("pruner", "median")).lower()
    search_space = run_cfg.get("search_space") or {}
    class_filter = run_cfg.get("class_filter") or default_cfg.get("class_filter") or None

    fs = FeaturePipeline.load(features_dir)
    X, y, label_names = fs.features, fs.labels, fs.label_names or []
    if y is None:
        logger.error("[%s] FeatureSet has no labels — skipping.", run_label)
        return None
    X, y, label_names = apply_class_filter_canonical(X, y, label_names, class_filter, run_label)
    X_train, X_val, y_train, y_val = _split(X, y, val_split, seed)

    pruner_map = {
        "median": lambda: search.MedianPruner(n_startup_trials=5, n_warmup_steps=10),
        "hyperband": lambda: search.SuccessiveHalvingPruner(),
        "none": lambda: search.NopPruner(),
        "nop": lambda: search.NopPruner(),
    }
    study = search.create_study(
        direction="maximize", sampler=search.TPESampler(seed=seed),
        pruner=pruner_map.get(pruner_name, pruner_map["median"])(), study_name=run_label,
    )
    trial_records: dict[int, dict] = {}

    def objective(trial: search.Trial) -> float:
        sampled = sample_search_space(trial, search_space) if search_space else {}
        fixed = run_cfg.get("params") or {}
        trial_params = {**fixed, **sampled}
        trial_num = trial.number
        trial_run_name = f"{run_label}_t{trial_num:02d}_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
        trial_dir = output_dir / f"trial_{trial_num:02d}"
        logger.info("[%s] Trial %d/%d  %s", run_label, trial_num + 1, n_trials, trial_params)

        pruned = {"flag": False}

        def epoch_cb(epoch, logs):
            trial.report(logs.get("val_accuracy", 0.0), step=epoch)
            if trial.should_prune():
                pruned["flag"] = True
                return True
            return False

        trainer = get_model(model_name)(epochs=sweep_epochs, **trial_params)
        with tracking.start_run(run_name=trial_run_name) as active_run:
            active_run.log_param("optuna_trial", trial_num)
            active_run.log_param("features_dir", str(features_dir))
            result = trainer.fit(
                X_train, y_train, X_val, y_val,
                label_names=label_names, run_name=trial_run_name,
                output_dir=trial_dir, mlflow_run=active_run, epoch_callback=epoch_cb,
            )
            run_id = active_run.info.run_id
        if pruned["flag"]:
            raise search.TrialPruned()
        score = result.metrics.get("val_f1_macro", 0.0)
        trial.report(score, step=sweep_epochs)
        trial_records[trial_num] = {
            "trial": trial_num, "run_id": run_id, "run_name": trial_run_name,
            "model": model_name,
            "val_accuracy": result.metrics.get("val_accuracy", 0.0),
            "val_f1_macro": score, "cv_best_score": None,
            "model_size_kb": result.model_size_kb,
            "best_params": {k: str(v) for k, v in sampled.items()},
            "artifact_uri": str(trial_dir), "features_dir": str(features_dir),
            "features_test": str(features_test_raw or ""),
            "class_filter": class_filter or None,
        }
        logger.info(
            "[%s] Trial %d  val_accuracy=%.4f  val_f1_macro=%.4f",
            run_label, trial_num + 1, result.metrics.get("val_accuracy", float("nan")), score,
        )
        return score

    logger.info(
        "[%s] TPE study: %d trial(s)  pruner=%s  epochs/trial=%d",
        run_label, n_trials, pruner_name, sweep_epochs,
    )
    study.optimize(objective, n_trials=n_trials, catch=(Exception,))

    completed = [t for t in study.trials if t.state == search.TrialState.COMPLETE]
    n_pruned = sum(1 for t in study.trials if t.state == search.TrialState.PRUNED)
    logger.info("[%s] Completed: %d  Pruned: %d", run_label, len(completed), n_pruned)
    if not completed:
        logger.error("[%s] All %d trials failed or were pruned.", run_label, n_trials)
        return None

    best_trial = study.best_trial
    logger.info("[%s] Best trial #%d  val_f1_macro=%.4f  params=%s",
                run_label, best_trial.number + 1, best_trial.value, best_trial.params)

    output_dir.mkdir(parents=True, exist_ok=True)
    (output_dir / "trial_summary.json").write_text(
        json.dumps(
            {
                "run_name": run_label, "model": model_name, "n_trials": n_trials,
                "n_completed": len(completed), "n_pruned": n_pruned,
                "sweep_epochs": sweep_epochs, "best_trial": best_trial.number,
                "best_val_f1_macro": best_trial.value,
                "best_params": {k: str(v) for k, v in best_trial.params.items()},
                "trials": [trial_records[t.number] for t in study.trials if t.number in trial_records],
            },
            indent=2,
        )
    )

    # held-out test eval of the best trial (reload from disk)
    if features_test_raw and best_trial.number in trial_records and Path(features_test_raw).exists():
        try:
            test_fs = FeaturePipeline.load(features_test_raw)
            if test_fs.labels is not None:
                X_test_f, y_test_f, _ = apply_class_filter_canonical(
                    test_fs.features, test_fs.labels, test_fs.label_names or [], class_filter, run_label
                )
                from ..models.deep import MODEL_FILENAME

                best_dir = output_dir / f"trial_{best_trial.number:02d}"
                best_trainer = get_model(model_name).load(best_dir / MODEL_FILENAME)
                test_metrics = compute_metrics(
                    y_test_f, best_trainer.predict(X_test_f), best_trainer.predict_proba(X_test_f), label_names
                )
                logger.info(
                    "[%s] Best trial test accuracy=%.4f f1_macro=%.4f (n=%d)",
                    run_label, test_metrics["val_accuracy"], test_metrics["val_f1_macro"], len(y_test_f),
                )
                trial_records[best_trial.number]["test_accuracy"] = test_metrics.get("val_accuracy", 0.0)
                trial_records[best_trial.number]["test_f1_macro"] = test_metrics.get("val_f1_macro", 0.0)
        except Exception as exc:
            logger.warning("[%s] Test evaluation of best trial failed: %s", run_label, exc)

    return trial_records.get(best_trial.number)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv=None) -> None:
    setup_logging()
    parser = argparse.ArgumentParser(
        prog="python -m audio_edge_ml_pipeline_tpu.train.tune",
        description="Stage 4 — Hyperparameter search (GridSearchCV classical, TPE deep)",
    )
    parser.add_argument("--config", metavar="YAML", required=True)
    args = parser.parse_args(argv)

    cfg_path = Path(args.config)
    if not cfg_path.exists():
        logger.error("Config not found: %s", cfg_path)
        sys.exit(1)
    raw = yaml.safe_load(cfg_path.read_text()) or {}
    for key in ("output_dir", "runs"):
        if key not in raw:
            logger.error("tuning.yaml must include %r.", key)
            sys.exit(1)

    output_dir = Path(raw["output_dir"])
    experiment = raw.get("experiment", "ml-pipeline-tuning")
    experiments_dir = Path("config/experiments")
    experiments_dir.mkdir(parents=True, exist_ok=True)
    safe_name = experiment.replace("/", "_").replace(" ", "_")
    archive = experiments_dir / f"{safe_name}.yaml"
    if cfg_path.resolve() != archive.resolve():
        shutil.copy2(cfg_path, archive)

    tracking.set_tracking_uri(raw.get("mlflow_uri"))
    tracking.set_experiment(experiment)

    runs: list = raw.get("runs") or []
    allowed_models = None
    if raw.get("shortlist"):
        sl = json.loads(Path(raw["shortlist"]).read_text())
        allowed_models = {c["model"] for c in sl.get("candidates", [])}
        logger.info("Shortlist filter active — tuning only: %s", sorted(allowed_models))
    eligible = [r for r in runs if allowed_models is None or r.get("model") in allowed_models]
    if not eligible:
        logger.error("No eligible runs (check shortlist vs. run model names).")
        sys.exit(1)

    results = []
    for run_cfg in eligible:
        model_name = run_cfg.get("model", "?")
        run_label = run_cfg.get("name") or model_name
        try:
            model_type = get_model(model_name).model_type
        except (KeyError, ValueError) as exc:
            logger.error("Unknown model %r: %s", model_name, exc)
            continue
        logger.info("Run: %-20s  type=%s", run_label, model_type)
        try:
            if model_type == "classical":
                if "grid" not in run_cfg:
                    logger.warning("[%s] No 'grid:' key — skipping.", run_label)
                    continue
                result = _tune_classical(run_cfg, raw)
            else:
                if "search_space" not in run_cfg:
                    logger.warning("[%s] No 'search_space:' key — skipping.", run_label)
                    continue
                result = _tune_deep(run_cfg, raw)
            if result:
                results.append(result)
        except Exception as exc:
            logger.error("Run %r failed: %s", run_label, exc, exc_info=True)

    if not results:
        logger.error("All runs failed.")
        sys.exit(1)

    results.sort(key=lambda r: r.get("val_f1_macro", 0.0), reverse=True)
    output_dir.mkdir(parents=True, exist_ok=True)
    shortlist_doc = {
        "experiment": experiment,
        "metric": "val_f1_macro",
        "n_candidates": len(results),
        "generated_at": datetime.now().isoformat(timespec="seconds"),
        "candidates": [
            {
                "rank": rank,
                "run_id": r.get("run_id", ""),
                "run_name": r.get("run_name", ""),
                "model": r.get("model", ""),
                "val_accuracy": r.get("val_accuracy", 0.0),
                "val_f1_macro": r.get("val_f1_macro", 0.0),
                "cv_best_score": r.get("cv_best_score"),
                "model_size_kb": r.get("model_size_kb", 0.0),
                "best_params": r.get("best_params", {}),
                "artifact_uri": r.get("artifact_uri", ""),
                "features_dir": r.get("features_dir", ""),
                "features_eval_dir": r.get("features_test") or None,
                "class_filter": r.get("class_filter") or None,
            }
            for rank, r in enumerate(results, 1)
        ],
    }
    (output_dir / "shortlist.json").write_text(json.dumps(shortlist_doc, indent=2))
    scoped = output_dir / f"shortlists/shortlist_{safe_name}.json"
    scoped.parent.mkdir(parents=True, exist_ok=True)
    scoped.write_text(json.dumps(shortlist_doc, indent=2))
    logger.info("Shortlist (%d candidates) -> %s", len(results), output_dir / "shortlist.json")

    logger.info("  %-22s  %-12s  %8s  %8s", "run", "model", "val_acc", "f1_macro")
    for r in results:
        logger.info(
            "  %-22s  %-12s  %8.4f  %8.4f",
            r.get("run_name", "")[:22], r.get("model", ""), r.get("val_accuracy", 0.0), r.get("val_f1_macro", 0.0),
        )


if __name__ == "__main__":
    main()
