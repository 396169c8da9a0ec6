#!/usr/bin/env python
"""Feature-parity verification tool: receive a device-computed mel
spectrogram (FEAT_DUMP_MODE) and compare it against the nearest training
sample (contract of reference tools/receive_mel.py:1-35, 167-183 — the
librosa-parity check, backed here by the framework's golden oracle).

Usage: python tools/receive_mel.py [--port /dev/ttyACM0] \
           [--features data/processed/fsc22_mel_train] [--label Chainsaw] \
           [--save cmp.png] [--load feat.npy | --no-device] [--experiment name]
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools import serial_proto  # noqa: E402


def compare_to_training(feat: np.ndarray, features_dir: Path,
                        label: str | None = None) -> dict:
    """Nearest training sample by MSE + summary stats; optional class filter."""
    train = np.load(features_dir / "features.npy")
    indices = np.arange(len(train))
    if label:
        labels = np.load(features_dir / "labels.npy")
        names = json.loads((features_dir / "label_names.json").read_text())
        if label not in names:
            raise SystemExit(f"--label {label!r} not in {names}")
        indices = indices[labels == names.index(label)]
        if not len(indices):
            raise SystemExit(f"no training samples with label {label!r}")
        train = train[indices]
    flat = train.reshape(len(train), -1)
    d = ((flat - feat.ravel()[None, :]) ** 2).mean(axis=1)
    best = int(np.argmin(d))
    return {
        "nearest_index": int(indices[best]),
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
    ap.add_argument("--port", default=None, help="serial port (default: auto-detect)")
    ap.add_argument("--baud", type=int, default=115200)
    ap.add_argument("--features", "--features-dir", dest="features", type=Path, default=None,
                    help="processed FeatureSet dir for nearest-sample comparison")
    ap.add_argument("--experiment", default="default",
                    help="experiment name — received features land in data/debug/<experiment>/mel/")
    ap.add_argument("--label", default=None, help="filter training samples to this class")
    ap.add_argument("--save", "--plot", dest="save", type=Path, default=None,
                    help="save comparison plot to this PNG path")
    ap.add_argument("--load", type=Path, default=None,
                    help="load device features from .npy instead of serial")
    ap.add_argument("--no-device", action="store_true",
                    help="don't open serial; requires --load")
    args = ap.parse_args()

    if args.load:
        feat = np.load(args.load)
    elif args.no_device:
        raise SystemExit("--no-device requires --load <features.npy>")
    else:
        ser = serial_proto.open_serial(args.port or serial_proto.autodetect_port(),
                                       args.baud, timeout=60)
        feat = serial_proto.read_feat_frame(ser)
        dump_dir = Path("data/debug") / args.experiment / "mel"
        dump_dir.mkdir(parents=True, exist_ok=True)
        dump = dump_dir / f"mel_{datetime.now().strftime('%Y%m%d_%H%M%S')}.npy"
        np.save(dump, feat)
        print(f"device features saved: {dump}")
    print(f"device mel: shape {feat.shape}  range [{feat.min():.4f}, {feat.max():.4f}]")

    nearest = None
    if args.features:
        stats = compare_to_training(feat, args.features, label=args.label)
        nearest = np.load(args.features / "features.npy")[stats["nearest_index"]]
        for k, v in stats.items():
            print(f"  {k}: {v}")
    if args.save:
        save_plot(feat, nearest, args.save)
        print(f"plot saved: {args.save}")


if __name__ == "__main__":
    main()
