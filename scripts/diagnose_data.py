#!/usr/bin/env python
"""Inspect a FeatureSet directory: label distribution, shapes, value ranges,
NaN/Inf screening (role of reference scripts/diagnose_data.py).

Usage: python scripts/diagnose_data.py <featureset dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline  # noqa: E402


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit("usage: python scripts/diagnose_data.py <featureset dir>")
    fs = FeaturePipeline.load(sys.argv[1])
    print(fs)
    X = fs.features
    print(f"dtype={X.dtype}  min={X.min():.4f}  max={X.max():.4f}  mean={X.mean():.4f}  std={X.std():.4f}")
    n_nan, n_inf = int(np.isnan(X).sum()), int(np.isinf(X).sum())
    print(f"NaN: {n_nan}  Inf: {n_inf}" + ("  <-- PROBLEM" if n_nan or n_inf else ""))
    if fs.labels is not None:
        counts = np.bincount(fs.labels, minlength=fs.n_classes or 0)
        print("label distribution:")
        for i, name in enumerate(fs.label_names or map(str, range(len(counts)))):
            bar = "#" * int(40 * counts[i] / max(counts.max(), 1))
            print(f"  {name:<24} {counts[i]:>5}  {bar}")
        if counts.min() == 0:
            print("WARNING: empty classes present")
        elif counts.max() / max(counts.min(), 1) > 3:
            print("WARNING: class imbalance > 3x")


if __name__ == "__main__":
    main()
