"""Training YAML config: defaults-merge + cv_folds fan-out.

Schema-compatible with reference training/config.py:57-264 (top-level
defaults, per-run overrides, cv_folds int-or-list fanning out into _cvK
runs, auto_select knobs, species_filter alias).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Union

import yaml


@dataclass
class ModelRunConfig:
    model: str
    name: Optional[str] = None
    features_dir: Optional[str] = None
    features_test_dir: Optional[str] = None
    output_dir: Optional[str] = None
    # None = "not set on this run" -> inherit the top-level value; using the
    # default VALUE as the sentinel silently discarded an explicit 0.2 / 42
    val_split: Optional[float] = None
    cv_folds: Optional[Union[int, list[int]]] = None
    cv_random_state: Optional[int] = None
    params: dict = field(default_factory=dict)
    class_filter: Optional[list[str]] = None


@dataclass
class TrainConfig:
    features_dir: str
    output_dir: str
    experiment: str = "ml-pipeline"
    mlflow_uri: Optional[str] = None
    val_split: float = 0.2
    features_test_dir: Optional[str] = None
    cv_folds: Union[int, list[int]] = 0
    cv_random_state: int = 42
    class_filter: Optional[list[str]] = None
    runs: list[ModelRunConfig] = field(default_factory=list)
    auto_select: bool = True
    auto_select_top_n: int = 5
    auto_select_metric: str = "val_f1_macro"
    auto_select_min_accuracy: Optional[float] = None

    # run fields that inherit the top-level value when left as None
    _INHERITED = ("features_dir", "features_test_dir", "output_dir",
                  "val_split", "cv_random_state", "class_filter")

    def resolved_runs(self) -> list[ModelRunConfig]:
        """Merge defaults into each run; a list-valued cv_folds fans out one
        run per fold count with a _cvK name suffix."""
        resolved = []
        for run in self.runs:
            base_name = run.name or run.model
            inherited = {
                k: getattr(run, k) if getattr(run, k) is not None else getattr(self, k)
                for k in self._INHERITED
            }
            effective = run.cv_folds if run.cv_folds is not None else self.cv_folds
            fold_list = effective if isinstance(effective, list) else [effective]
            for k in fold_list:
                name = f"{base_name}_cv{k}" if len(fold_list) > 1 and k > 0 else base_name
                resolved.append(
                    ModelRunConfig(model=run.model, name=name, cv_folds=k,
                                   params=run.params, **inherited)
                )
        return resolved


def load_train_config(path: Path) -> TrainConfig:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Training config not found: {path}")
    raw = yaml.safe_load(path.read_text()) or {}
    features_dir = raw.get("features_dir", "")
    if not features_dir:
        raise ValueError("TrainConfig requires 'features_dir' at the top level.")
    _cv = raw.get("cv_folds", 0)
    runs: list[ModelRunConfig] = []
    for item in raw.get("runs", []):
        if "model" not in item:
            raise ValueError(f"Each run must specify a 'model' key. Got: {item}")
        runs.append(
            ModelRunConfig(
                model=item["model"],
                name=item.get("name"),
                features_dir=item.get("features_dir"),
                # `features_test` is the key the reference's archived run
                # configs use (its tune.py key); accept it as an alias here
                features_test_dir=item.get("features_test_dir") or item.get("features_test"),
                output_dir=item.get("output_dir"),
                val_split=float(item["val_split"]) if "val_split" in item else None,
                cv_folds=(
                    [int(k) for k in item["cv_folds"]]
                    if isinstance(item.get("cv_folds"), list)
                    else (int(item["cv_folds"]) if "cv_folds" in item else None)
                ),
                cv_random_state=int(item["cv_random_state"]) if "cv_random_state" in item else None,
                params=item.get("params") or {},
                class_filter=item.get("class_filter") or item.get("species_filter") or None,
            )
        )
    amin = raw.get("auto_select_min_accuracy", None)
    return TrainConfig(
        features_dir=features_dir,
        output_dir=raw.get("output_dir", "data/models"),
        experiment=raw.get("experiment", "ml-pipeline"),
        mlflow_uri=raw.get("mlflow_uri", None),
        val_split=float(raw.get("val_split", 0.2)),
        features_test_dir=raw.get("features_test_dir") or raw.get("features_test"),
        cv_folds=[int(k) for k in _cv] if isinstance(_cv, list) else int(_cv),
        cv_random_state=int(raw.get("cv_random_state", 42)),
        class_filter=raw.get("class_filter") or raw.get("species_filter") or None,
        runs=runs,
        auto_select=bool(raw.get("auto_select", True)),
        auto_select_top_n=int(raw.get("auto_select_top_n", 5)),
        auto_select_metric=str(raw.get("auto_select_metric", "val_f1_macro")),
        auto_select_min_accuracy=float(amin) if amin is not None else None,
    )
