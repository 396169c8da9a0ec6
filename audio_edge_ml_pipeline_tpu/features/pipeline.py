"""FeaturePipeline: loader x extractor orchestration + FeatureSet
persistence + the feature-extraction CLI.

On-disk format and CLI surface match the reference (pipeline.py:29-39,
126-235, 537-577): features.npy / labels.npy / label_names.json /
metadata.json / info.json / optional cluster_assignments.npy + archived
config.yaml. Execution is the batched device path in features.base.

CLI:
    python -m audio_edge_ml_pipeline_tpu.features.pipeline --config cfg.yaml
    python -m audio_edge_ml_pipeline_tpu.features.pipeline \
        --loader fsc22 --dataset data/raw/fsc22 --extractor audio_mel_spec \
        --split train --output data/processed/fsc22_mel_train
"""

from __future__ import annotations

import argparse
import json
import logging
import shutil
from pathlib import Path
from typing import Optional

import numpy as np

from ..data.loaders import build_loader
from .base import BaseDatasetLoader, BaseFeatureExtractor, FeatureSet
from .registry import get
from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)

_LOADER_CHOICES = [
    "birdeep", "birdeep_image", "fsc22", "audio_folder", "image_folder",
    "video_folder", "text_folder", "text_json", "text_csv", "tabular",
]


class FeaturePipeline:
    """Ties a loader to an extractor; owns FeatureSet persistence."""

    def __init__(self, loader: BaseDatasetLoader, extractor: BaseFeatureExtractor) -> None:
        self.loader = loader
        self.extractor = extractor

    def run(self, max_samples: Optional[int] = None) -> FeatureSet:
        logger.info(
            "Starting extraction: loader=%s (%d samples), extractor=%s",
            type(self.loader).__name__, len(self.loader), self.extractor.name,
        )
        from ..utils.profiling import stage_timer

        with stage_timer(f"extract:{self.extractor.name}"):
            fs = self.extractor.extract_dataset(self.loader, max_samples=max_samples)
        logger.info("Extraction complete: %s", fs)
        return fs

    @staticmethod
    def save(fs: FeatureSet, output_dir: Path | str) -> None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        np.save(output_dir / "features.npy", fs.features)
        if fs.labels is not None:
            np.save(output_dir / "labels.npy", fs.labels)
        if fs.label_names is not None:
            (output_dir / "label_names.json").write_text(json.dumps(fs.label_names, indent=2))
        if fs.cluster_assignments is not None:
            np.save(output_dir / "cluster_assignments.npy", fs.cluster_assignments)
        (output_dir / "metadata.json").write_text(json.dumps(fs.metadata, indent=2, default=str))
        info = {
            "feature_type": fs.feature_type,
            "modality": fs.modality,
            "n_samples": fs.n_samples,
            "feature_shape": list(fs.feature_shape),
            "n_classes": fs.n_classes,
            "is_supervised": fs.is_supervised,
        }
        (output_dir / "info.json").write_text(json.dumps(info, indent=2))
        logger.info("FeatureSet saved to %s", output_dir)

    @staticmethod
    def load(output_dir: Path | str) -> FeatureSet:
        output_dir = Path(output_dir)
        features_path = output_dir / "features.npy"
        info_path = output_dir / "info.json"
        for p in (features_path, info_path):
            if not p.exists():
                raise FileNotFoundError(
                    f"Expected file not found: {p}. Was this directory written by FeaturePipeline.save()?"
                )
        info = json.loads(info_path.read_text())
        labels_p = output_dir / "labels.npy"
        names_p = output_dir / "label_names.json"
        clusters_p = output_dir / "cluster_assignments.npy"
        meta_p = output_dir / "metadata.json"
        return FeatureSet(
            features=np.load(features_path),
            feature_type=info["feature_type"],
            modality=info["modality"],
            metadata=json.loads(meta_p.read_text()) if meta_p.exists() else [],
            labels=np.load(labels_p) if labels_p.exists() else None,
            label_names=json.loads(names_p.read_text()) if names_p.exists() else None,
            cluster_assignments=np.load(clusters_p) if clusters_p.exists() else None,
        )


def apply_label_map(fs: FeatureSet, label_map: dict[str, str]) -> FeatureSet:
    """Remap/collapse class labels (first-occurrence order for new names);
    contract of reference pipeline._apply_label_map:242-294."""
    if fs.labels is None or fs.label_names is None:
        return fs
    old_names = fs.label_names
    new_per_sample = [label_map.get(old_names[i], old_names[i]) for i in fs.labels]
    seen: dict[str, int] = {}
    unique_new: list[str] = []
    for name in new_per_sample:
        if name not in seen:
            seen[name] = len(unique_new)
            unique_new.append(name)
    new_labels = np.array([seen[n] for n in new_per_sample], dtype=np.int32)
    if len(old_names) != len(unique_new):
        logger.info("label_map collapsed %d classes -> %d classes: %s", len(old_names), len(unique_new), unique_new)
    return FeatureSet(
        features=fs.features,
        feature_type=fs.feature_type,
        modality=fs.modality,
        metadata=fs.metadata,
        labels=new_labels,
        label_names=unique_new,
        cluster_assignments=fs.cluster_assignments,
    )


def _run_experiment(exp, config_path: Optional[Path] = None) -> None:
    loader = build_loader(
        loader_name=exp.loader,
        dataset=exp.dataset or "data/raw/BIRDeep_AudioAnnotations",
        split=exp.split,
        label_col=exp.label_col,
        text_col=exp.text_col,
        audio_folder=exp.audio_folder,
        image_folder=exp.image_folder,
        text_folder=exp.text_folder,
        video_folder=exp.video_folder,
        class_filter=exp.class_filter,
        manifest=exp.manifest,
        manifest_split=exp.manifest_split,
    )
    extractor = get(exp.extractor)(**exp.extractor_params)
    output_dir = Path(exp.resolved_output())
    pipeline = FeaturePipeline(loader, extractor)
    fs = pipeline.run(max_samples=exp.max_samples)
    if exp.label_map:
        fs = apply_label_map(fs, exp.label_map)
    FeaturePipeline.save(fs, output_dir)
    if config_path is not None:
        shutil.copy2(config_path, output_dir / "config.yaml")
    print(f"[{exp.resolved_name()}] {fs}")
    print(f"  -> {output_dir}")


def _build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Run the batched feature extraction pipeline (flags for a single run, or --config YAML).",
    )
    p.add_argument("--config", default=None, metavar="YAML")
    p.add_argument("--dataset", default="data/raw/BIRDeep_AudioAnnotations")
    p.add_argument("--loader", default="birdeep", choices=_LOADER_CHOICES)
    p.add_argument("--audio-folder", default=None)
    p.add_argument("--image-folder", default=None)
    p.add_argument("--text-folder", default=None)
    p.add_argument("--video-folder", default=None)
    p.add_argument("--label-col", default=None)
    p.add_argument("--text-col", default="text")
    p.add_argument("--split", default="train", choices=["train", "test", "validation", "all"])
    p.add_argument("--extractor", default="audio_classical")
    p.add_argument("--output", default=None)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--classes", nargs="+", default=None, metavar="CLASS")
    return p


def main() -> None:
    setup_logging()
    args = _build_arg_parser().parse_args()
    if args.config:
        from .config import load_config

        cfg = load_config(args.config)
        experiments = cfg.resolved_experiments()
        print(f"Config: {args.config}  ({len(experiments)} experiment(s))")
        for exp in experiments:
            print(f"\nRunning: {exp.resolved_name()} ...")
            _run_experiment(exp, config_path=Path(args.config))
        from ..utils.profiling import log_timing_report

        log_timing_report()
        print("\nAll experiments complete.")
    else:
        from .config import ExperimentConfig

        exp = ExperimentConfig(
            extractor=args.extractor,
            loader=args.loader,
            dataset=args.dataset,
            split=args.split,
            output=args.output,
            max_samples=args.max_samples,
            label_col=args.label_col,
            text_col=args.text_col,
            audio_folder=args.audio_folder,
            image_folder=args.image_folder,
            text_folder=args.text_folder,
            video_folder=args.video_folder,
            class_filter=args.classes,
        )
        _run_experiment(exp)


if __name__ == "__main__":
    main()
