"""YAML pipeline configuration: top-level defaults merged into per-experiment
overrides, species_filter legacy alias, unknown-key tolerance.

Schema-compatible with the reference (preprocessing/config.py:64-341) so
existing feature_extraction.yaml files work unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields as dc_fields
from pathlib import Path
from typing import Optional

import yaml


@dataclass
class ExperimentConfig:
    extractor: str
    loader: str
    name: Optional[str] = None
    dataset: Optional[str] = None
    split: Optional[str] = None
    output: Optional[str] = None
    max_samples: Optional[int] = None
    label_col: Optional[str] = None
    text_col: str = "text"
    audio_folder: Optional[str] = None
    image_folder: Optional[str] = None
    text_folder: Optional[str] = None
    video_folder: Optional[str] = None
    extractor_params: dict = field(default_factory=dict)
    class_filter: Optional[list[str]] = None
    label_map: Optional[dict[str, str]] = None
    manifest: Optional[str] = None
    manifest_split: Optional[str] = None

    def resolved_name(self) -> str:
        return self.name or f"{self.loader}_{self.extractor}_{self.split}"

    def resolved_output(self) -> str:
        return self.output or f"data/processed/{self.resolved_name()}"


@dataclass
class PipelineConfig:
    dataset: str = "data/raw/BIRDeep_AudioAnnotations"
    split: str = "train"
    extractor: Optional[str] = None
    loader: Optional[str] = None
    output: Optional[str] = None
    max_samples: Optional[int] = None
    label_col: Optional[str] = None
    text_col: str = "text"
    audio_folder: Optional[str] = None
    image_folder: Optional[str] = None
    text_folder: Optional[str] = None
    video_folder: Optional[str] = None
    extractor_params: dict = field(default_factory=dict)
    class_filter: Optional[list[str]] = None
    label_map: Optional[dict[str, str]] = None
    manifest: Optional[str] = None
    manifest_split: Optional[str] = None
    experiments: list[ExperimentConfig] = field(default_factory=list)

    # Fields where a falsy experiment value (0, [], {}) is still an explicit
    # override — only literal None falls through to the top-level default.
    # Everything else (strings/paths) inherits on any falsy value.
    _NONE_FALLTHROUGH = frozenset(
        {"split", "max_samples", "class_filter", "label_map"}
    )

    def _shared_field_names(self) -> list[str]:
        exp_only = {"name"}
        return [f.name for f in dc_fields(ExperimentConfig) if f.name not in exp_only]

    def resolved_experiments(self) -> list[ExperimentConfig]:
        """Merge top-level defaults into each experiment; synthesize a single
        experiment in single-run mode. Raises ValueError on missing
        extractor/loader."""
        shared = self._shared_field_names()
        if not self.experiments:
            if not self.extractor or not self.loader:
                raise ValueError(
                    "PipelineConfig: 'extractor' and 'loader' are required "
                    "when no 'experiments' list is provided."
                )
            return [ExperimentConfig(**{k: getattr(self, k) for k in shared})]

        out: list[ExperimentConfig] = []
        for i, exp in enumerate(self.experiments):
            kw: dict = {"name": exp.name}
            for k in shared:
                v = getattr(exp, k)
                inherit = (v is None) if k in self._NONE_FALLTHROUGH else (not v)
                kw[k] = getattr(self, k) if inherit else v
            merged = ExperimentConfig(**kw)
            for required in ("extractor", "loader"):
                if not getattr(merged, required):
                    raise ValueError(f"Experiment #{i} is missing {required!r}.")
            out.append(merged)
        return out


def _alias_species_filter(d: dict) -> dict:
    if "species_filter" in d and "class_filter" not in d:
        d["class_filter"] = d.pop("species_filter")
    else:
        d.pop("species_filter", None)
    return d


def load_config(path: Path | str) -> PipelineConfig:
    """Parse YAML -> validated PipelineConfig (unknown keys tolerated,
    species_filter aliased to class_filter)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {path}")
    raw: dict = yaml.safe_load(path.read_text()) or {}
    raw_experiments: list[dict] = raw.pop("experiments", []) or []
    raw = _alias_species_filter(raw)
    top_keys = {f.name for f in dc_fields(PipelineConfig)}
    cfg = PipelineConfig(**{k: v for k, v in raw.items() if k in top_keys})
    exp_keys = {f.name for f in dc_fields(ExperimentConfig)}
    for raw_exp in raw_experiments:
        raw_exp = _alias_species_filter(dict(raw_exp))
        kw = {k: v for k, v in raw_exp.items() if k in exp_keys}
        cfg.experiments.append(
            ExperimentConfig(extractor=kw.pop("extractor", ""), loader=kw.pop("loader", ""), **kw)
        )
    cfg.resolved_experiments()  # validate
    return cfg
