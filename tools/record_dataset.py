#!/usr/bin/env python
"""Record labelled clips from a device over serial into an audio_folder
layout (contract of reference tools/record_dataset.py): the device streams
magic-framed PCM captures (PCM_DUMP_MODE firmware); the operator names the
class being recorded and each capture is saved under
<out>/<class>/rec_NNN.wav.

Usage: python tools/record_dataset.py --port /dev/ttyACM0 --out data/raw/fsc22_device \
           --label Chainsaw [--count 10] [--sample-rate 16000]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav  # noqa: E402
from tools import serial_proto  # noqa: E402


def record(ser, out_dir: Path, label: str, count: int, sample_rate: int, interactive: bool = True) -> list[Path]:
    class_dir = out_dir / label
    class_dir.mkdir(parents=True, exist_ok=True)
    existing = len(list(class_dir.glob("rec_*.wav")))
    saved = []
    for i in range(count):
        if interactive:
            input(f"[{label}] press Enter to capture clip {i + 1}/{count} ...")
        pcm = serial_proto.read_pcm_frame(ser)
        path = class_dir / f"rec_{existing + i:03d}.wav"
        write_wav(path, pcm.astype("float32") / 32768.0, sample_rate)
        print(f"saved {path}  ({len(pcm)} samples, peak {abs(pcm).max()})")
        saved.append(path)
    return saved


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", required=True)
    ap.add_argument("--baud", type=int, default=115200)
    ap.add_argument("--out", type=Path, default=Path("data/raw/fsc22_device"))
    ap.add_argument("--label", required=True)
    ap.add_argument("--count", type=int, default=10)
    ap.add_argument("--sample-rate", type=int, default=16000)
    ap.add_argument("--no-prompt", action="store_true")
    args = ap.parse_args()
    ser = serial_proto.open_serial(args.port, args.baud, timeout=120)
    record(ser, args.out, args.label, args.count, args.sample_rate, interactive=not args.no_prompt)


if __name__ == "__main__":
    main()
