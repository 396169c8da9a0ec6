#!/usr/bin/env python
"""Receive magic-framed PCM dumps from a device running PCM_DUMP_MODE and
save them as WAV files (pairs with the firmware's PCM_DUMP_MODE; contract of
reference tools/receive_wav.py).

Usage: python tools/receive_wav.py --port /dev/ttyACM0 [--out data/raw/device_dumps]
       [--count 1] [--sample-rate 16000]
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav  # noqa: E402
from tools import serial_proto  # noqa: E402


def receive(ser, out_dir: Path, count: int, sample_rate: int) -> list[Path]:
    out_dir.mkdir(parents=True, exist_ok=True)
    saved = []
    for i in range(count):
        pcm = serial_proto.read_pcm_frame(ser)
        path = out_dir / f"capture_{datetime.now().strftime('%Y%m%d_%H%M%S')}_{i:02d}.wav"
        write_wav(path, pcm.astype("float32") / 32768.0, sample_rate)
        print(f"saved {path}  ({len(pcm)} samples)")
        saved.append(path)
    return saved


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", required=True)
    ap.add_argument("--baud", type=int, default=115200)
    ap.add_argument("--out", type=Path, default=Path("data/raw/device_dumps"))
    ap.add_argument("--count", type=int, default=1)
    ap.add_argument("--sample-rate", type=int, default=16000)
    args = ap.parse_args()
    ser = serial_proto.open_serial(args.port, args.baud, timeout=30)
    receive(ser, args.out, args.count, args.sample_rate)


if __name__ == "__main__":
    main()
