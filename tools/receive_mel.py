#!/usr/bin/env python
"""Feature-parity verification tool: receive a device-computed mel
spectrogram (FEAT_DUMP_MODE) and compare it against the nearest training
sample and the host-computed features (contract of reference
tools/receive_mel.py:1-35 — the librosa-parity check, now backed by the
framework's golden oracle).

Usage: python tools/receive_mel.py --port /dev/ttyACM0 \
           [--features-dir data/processed/fsc22_mel_train] [--plot out.png]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools import serial_proto  # noqa: E402


def compare_to_training(feat: np.ndarray, features_dir: Path) -> dict:
    """Nearest training sample by MSE + summary stats."""
    train = np.load(features_dir / "features.npy")
    flat = train.reshape(len(train), -1)
    d = ((flat - feat.ravel()[None, :]) ** 2).mean(axis=1)
    best = int(np.argmin(d))
    return {
        "nearest_index": best,
        "nearest_mse": float(d[best]),
        "device_min": float(feat.min()),
        "device_max": float(feat.max()),
        "device_mean": float(feat.mean()),
        "train_mean": float(train[best].mean()),
    }


def save_plot(feat: np.ndarray, nearest: np.ndarray | None, path: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = 2 if nearest is not None else 1
    fig, axes = plt.subplots(1, n, figsize=(6 * n, 4))
    axes = np.atleast_1d(axes)
    axes[0].imshow(feat, aspect="auto", origin="lower")
    axes[0].set_title("device mel")
    if nearest is not None:
        axes[1].imshow(nearest, aspect="auto", origin="lower")
        axes[1].set_title("nearest training sample")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", required=True)
    ap.add_argument("--baud", type=int, default=115200)
    ap.add_argument("--features-dir", type=Path, default=None)
    ap.add_argument("--plot", type=Path, default=None)
    ap.add_argument("--save", type=Path, default=None, help="save received features as .npy")
    args = ap.parse_args()

    ser = serial_proto.open_serial(args.port, args.baud, timeout=60)
    feat = serial_proto.read_feat_frame(ser)
    print(f"received device mel: shape {feat.shape}  range [{feat.min():.4f}, {feat.max():.4f}]")
    if args.save:
        np.save(args.save, feat)
    nearest = None
    if args.features_dir:
        stats = compare_to_training(feat, args.features_dir)
        nearest = np.load(args.features_dir / "features.npy")[stats["nearest_index"]]
        for k, v in stats.items():
            print(f"  {k}: {v}")
    if args.plot:
        save_plot(feat, nearest, args.plot)
        print(f"plot saved: {args.plot}")


if __name__ == "__main__":
    main()
