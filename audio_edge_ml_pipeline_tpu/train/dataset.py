"""Legacy ingestion-path spectrogram dataset (role of reference
training/dataset.py:10-115): iterates .npy mel spectrograms written by the
ingestion AudioPreprocessor (optionally with JSON metadata sidecars carrying
labels) as a tf.data pipeline for ad-hoc scripts. The main training path
uses FeatureSet directories instead."""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


class SpectrogramDataset:
    """Directory of <id>.npy spectrograms (+ optional <id>.json sidecars
    with a label field)."""

    def __init__(self, data_dir: Path | str, label_key: str = "true_class") -> None:
        self.data_dir = Path(data_dir)
        self.label_key = label_key
        self._items: list[tuple[Path, Optional[str]]] = []
        for npy in sorted(self.data_dir.glob("*.npy")):
            label = None
            sidecar = npy.with_suffix(".json")
            if sidecar.exists():
                try:
                    label = json.loads(sidecar.read_text()).get(label_key)
                except json.JSONDecodeError:
                    pass
            self._items.append((npy, label))
        labels = sorted({l for _, l in self._items if l is not None})
        self.label_names = labels
        self._label_to_idx = {l: i for i, l in enumerate(labels)}
        logger.info("SpectrogramDataset: %d files, %d labelled classes", len(self._items), len(labels))

    def __len__(self) -> int:
        return len(self._items)

    def load_arrays(self) -> tuple[np.ndarray, Optional[np.ndarray]]:
        feats = [np.load(p) for p, _ in self._items]
        X = np.stack(feats).astype(np.float32)
        if self.label_names:
            y = np.array(
                [self._label_to_idx.get(l, -1) for _, l in self._items], dtype=np.int32
            )
            return X, y
        return X, None

    def to_tf_dataset(self, batch_size: int = 32, shuffle: bool = False, seed: Optional[int] = None):
        import tensorflow as tf

        X, y = self.load_arrays()
        ds = tf.data.Dataset.from_tensor_slices((X, y) if y is not None else X)
        if shuffle:
            ds = ds.shuffle(len(X), seed=seed)
        return ds.batch(batch_size).prefetch(tf.data.AUTOTUNE)
