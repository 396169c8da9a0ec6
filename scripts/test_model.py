#!/usr/bin/env python
"""Manual inference sanity check: load a saved model and run it on N random
samples from a FeatureSet (role of reference scripts/test_model.py).

Usage: python scripts/test_model.py <model file> <featureset dir> [--n 10]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline  # noqa: E402
from audio_edge_ml_pipeline_tpu.optimize.quantize import load_trainer_any  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("features_dir")
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--model-name", default="cnn", help="registry name when loading classical files")
    args = ap.parse_args()

    trainer = load_trainer_any(Path(args.model), args.model_name)
    fs = FeaturePipeline.load(args.features_dir)
    rng = np.random.default_rng(0)
    idx = rng.choice(len(fs.features), size=min(args.n, len(fs.features)), replace=False)
    preds = trainer.predict(fs.features[idx])
    proba = trainer.predict_proba(fs.features[idx])
    names = fs.label_names or [str(i) for i in range(int(preds.max()) + 1)]
    correct = 0
    for j, i in enumerate(idx):
        true = names[fs.labels[i]] if fs.labels is not None else "?"
        pred = names[preds[j]] if preds[j] < len(names) else str(preds[j])
        conf = f"{proba[j].max():.3f}" if proba is not None else "n/a"
        mark = "OK " if true == pred else "BAD"
        correct += int(true == pred)
        print(f"[{mark}] sample {i}: true={true:<20} pred={pred:<20} conf={conf}")
    print(f"{correct}/{len(idx)} correct")


if __name__ == "__main__":
    main()
