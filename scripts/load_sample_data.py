#!/usr/bin/env python
"""Upload sample WAV clips to a running ingestion API (role of reference
scripts/load_sample_data.py; the downloader counterpart is
scripts/download_data.py).

Usage: python scripts/load_sample_data.py --dataset <audio_folder>
           [--api-url http://localhost:8000] [--n 5]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, type=Path)
    ap.add_argument("--api-url", default="http://localhost:8000")
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    import requests

    clips = sorted(args.dataset.rglob("*.wav"))[: args.n]
    if not clips:
        raise SystemExit(f"no .wav under {args.dataset}")
    for clip in clips:
        with open(clip, "rb") as f:
            r = requests.post(
                f"{args.api_url}/upload",
                files={"file": (clip.name, f, "audio/wav")},
                data={"true_class": clip.parent.name, "source": "load_sample_data"},
                timeout=15,
            )
        print(f"{clip.name}: {r.status_code} {r.json()}")


if __name__ == "__main__":
    main()
