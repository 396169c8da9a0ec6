#!/usr/bin/env python
"""Count raw vs processed artifacts at every pipeline stage (role of
reference scripts/debug_pipeline.py).

Usage: python scripts/debug_pipeline.py [--root .]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("."))
    args = ap.parse_args()
    root = args.root

    def count(pattern: str, base: Path) -> int:
        return len(list(base.rglob(pattern))) if base.exists() else 0

    print("== pipeline artifact census ==")
    print(f"raw wav files:          {count('*.wav', root / 'data' / 'raw')}")
    print(f"uploads:                {count('*.wav', root / 'data' / 'raw' / 'uploads')}")
    proc = root / "data" / "processed"
    n_sets = 0
    if proc.exists():
        for d in sorted(proc.iterdir()):
            info = d / "info.json"
            if info.exists():
                n_sets += 1
                meta = json.loads(info.read_text())
                print(f"featureset {d.name}: {meta['n_samples']} samples {tuple(meta['feature_shape'])} "
                      f"({meta['n_classes']} classes)")
    print(f"featuresets:            {n_sets}")
    models = root / "data" / "models"
    print(f"model bundles:          {count('model.flax.npz', models) + count('*.joblib', models)}")
    print(f"optimization reports:   {count('optimization_report.json', models)}")
    print(f"shortlists:             {count('shortlist*.json', models)}")
    print(f"tracking runs:          {count('meta.yaml', root / 'mlruns') - len(list((root / 'mlruns').glob('*/meta.yaml'))) if (root / 'mlruns').exists() else 0}")
    print(f"telemetry files:        {count('*_telemetry.jsonl', root / 'data' / 'telemetry')}")


if __name__ == "__main__":
    main()
