#!/usr/bin/env python
"""Fetch a public benchmark dataset for smoke runs (role of reference
scripts/download_data.py, which pulls Google Speech Commands).

In air-gapped environments (no egress) use --synthetic to generate the local
synthetic fsc22-style dataset instead (tools/make_synth_dataset.py).

Usage:
    python scripts/download_data.py --out data/raw/speech_commands
    python scripts/download_data.py --synthetic --out data/raw/synth
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tarfile
import urllib.request
from pathlib import Path

SPEECH_COMMANDS_URL = "http://download.tensorflow.org/data/speech_commands_v0.02.tar.gz"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--url", default=SPEECH_COMMANDS_URL)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    if args.synthetic:
        repo = Path(__file__).resolve().parent.parent
        subprocess.run([sys.executable, str(repo / "tools/make_synth_dataset.py"), str(args.out)], check=True)
        print(f"synthetic datasets -> {args.out}")
        return

    args.out.mkdir(parents=True, exist_ok=True)
    archive = args.out / "dataset.tar.gz"
    print(f"downloading {args.url} ...")
    try:
        urllib.request.urlretrieve(args.url, archive)
    except Exception as exc:
        raise SystemExit(
            f"download failed ({exc}). In offline environments run with --synthetic."
        )
    with tarfile.open(archive) as tar:
        try:
            tar.extractall(args.out, filter="data")  # no path traversal
        except TypeError:  # Python < 3.12 without the filter parameter
            tar.extractall(args.out)
    archive.unlink()
    print(f"extracted -> {args.out}")


if __name__ == "__main__":
    main()
