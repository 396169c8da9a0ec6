#!/usr/bin/env python
"""Load a FeatureSet exactly as the training CLI does (split, class filter)
and inspect the resulting batches (role of reference
scripts/verify_training_data.py + diagnose_training.py).

Usage: python scripts/verify_training_data.py <featureset dir> [--val-split 0.2]
           [--classes A B ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline  # noqa: E402
from audio_edge_ml_pipeline_tpu.train.train import apply_class_filter, stratified_train_val_split  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("features_dir")
    ap.add_argument("--val-split", type=float, default=0.2)
    ap.add_argument("--classes", nargs="+", default=None)
    args = ap.parse_args()

    fs = FeaturePipeline.load(args.features_dir)
    X, y, names = fs.features, fs.labels, fs.label_names or []
    print(fs)
    if args.classes:
        X, y, names = apply_class_filter(X, y, names, args.classes)
        print(f"after class_filter: {len(X)} samples, classes {names}")
    X_train, X_val, y_train, y_val = stratified_train_val_split(X, y, args.val_split)
    print(f"train: {X_train.shape}  val: {X_val.shape}")
    print(f"train label counts: {np.bincount(y_train, minlength=len(names)).tolist()}")
    print(f"val   label counts: {np.bincount(y_val, minlength=len(names)).tolist()}")
    batch = X_train[:32]
    print(f"first batch: shape {batch.shape} range [{batch.min():.4f}, {batch.max():.4f}]")
    assert np.isfinite(batch).all(), "non-finite values in training batch!"
    print("OK: batches are finite and stratified.")


if __name__ == "__main__":
    main()
