"""Every YAML shipped under configs/ must parse and resolve through its
stage's loader — the shipped examples are the schema-parity demonstration
(reference config/ + config/experiments/), so a drifting field name would
ship a broken quick-start."""

import yaml
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
CONFIGS = sorted((REPO / "configs").rglob("*.yaml"))


def _raw(path: Path) -> dict:
    return yaml.safe_load(path.read_text()) or {}


def _stage(path: Path) -> str:
    d = _raw(path)
    if "experiments" in d or ("extractor" in d and "loader" in d):
        return "features"
    if "augmentations" in d or "n_augments" in d:
        return "augment"
    runs = d.get("runs") or []
    if any("grid" in r or "search_space" in r for r in runs):
        return "tune"
    if runs or "features_dir" in d:
        return "train"
    raise AssertionError(f"cannot classify {path}")


def test_config_dir_is_nonempty():
    assert len(CONFIGS) >= 8


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.name)
def test_shipped_config_parses(path):
    stage = _stage(path)
    if stage == "features":
        from audio_edge_ml_pipeline_tpu.features.config import load_config
        from audio_edge_ml_pipeline_tpu.features.registry import get as get_extractor

        cfg = load_config(path)
        exps = cfg.resolved_experiments()
        assert exps
        for exp in exps:
            assert exp.loader and exp.extractor
            get_extractor(exp.extractor)  # registered name
    elif stage == "augment":
        from audio_edge_ml_pipeline_tpu.features.augment import AUGMENTORS, load_config

        cfg = load_config(path)
        for aug in cfg["augmentations"]:
            assert aug["type"] in AUGMENTORS, aug
        for override in cfg["class_overrides"].values():
            for aug in override.get("augmentations", []):
                assert aug["type"] in AUGMENTORS, aug
    elif stage == "train":
        from audio_edge_ml_pipeline_tpu.models import get_model
        from audio_edge_ml_pipeline_tpu.train.config import load_train_config

        cfg = load_train_config(path)
        runs = cfg.resolved_runs()
        assert runs
        for run in runs:
            get_model(run.model)  # registered trainer + ctor kwargs accepted
            get_model(run.model)(**(run.params or {}))
    elif stage == "tune":
        from audio_edge_ml_pipeline_tpu.models import get_model
        from audio_edge_ml_pipeline_tpu.train import search, tune

        d = _raw(path)
        assert d.get("runs"), "tuning config must list runs"
        pruner = d.get("pruner", "median")
        assert pruner in ("median", "hyperband", "none", None)
        for run in d["runs"]:
            cls = get_model(run["model"])
            if cls.model_type == "classical":
                grid = run.get("grid") or {}
                assert grid, f"classical run {run.get('name')} needs a grid"
                # friendly keys must remap onto pipeline params without error
                tune._remap_param_grid(run["model"], grid)
                assert all(isinstance(v, list) and v for v in grid.values())
            else:
                space = run.get("search_space") or {}
                assert space, f"deep run {run.get('name')} needs a search_space"

                # sampling one trial end-to-end validates every DSL entry
                def objective(trial):
                    tune.sample_search_space(trial, space)
                    return 0.0

                study = search.Study(sampler=search.TPESampler(seed=0))
                study.optimize(objective, n_trials=1)
