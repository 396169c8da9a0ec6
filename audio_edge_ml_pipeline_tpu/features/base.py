"""Core abstractions of the feature layer.

Same public surface as the reference (FeatureSet / BaseFeatureExtractor /
BaseDatasetLoader, reference base.py:27-257) with one structural change:
``BatchedAudioExtractor`` replaces the per-sample Python hot loop with a
pipelined host-decode -> padded-batch -> jit-on-device path (SURVEY.md §2c:
vmap/batching as the first-class axis).
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class FeatureSet:
    """Uniform feature container for supervised / unsupervised / semi-
    supervised workflows (labels None => unsupervised; -1 => unlabelled in
    semi-supervised sets). Field-compatible with the reference container
    (base.py:27-134) and its on-disk directory format."""

    features: np.ndarray  # (N, *feature_dims)
    feature_type: str  # "classical" | "deep"
    modality: str  # "audio" | "image" | "text" | "tabular" | "video"
    metadata: list[dict]
    labels: Optional[np.ndarray] = None
    label_names: Optional[list[str]] = None
    cluster_assignments: Optional[np.ndarray] = None

    @property
    def n_samples(self) -> int:
        return len(self.features)

    @property
    def feature_shape(self) -> tuple:
        return self.features.shape[1:]

    @property
    def is_supervised(self) -> bool:
        return self.labels is not None

    @property
    def n_classes(self) -> Optional[int]:
        if self.label_names is not None:
            return len(self.label_names)
        if self.labels is not None:
            return int(self.labels.max()) + 1
        return None

    def to_sklearn(self) -> tuple[np.ndarray, Optional[np.ndarray]]:
        """(X, y): ground-truth labels, else cluster assignments, else None."""
        if self.labels is not None:
            return self.features, self.labels
        if self.cluster_assignments is not None:
            return self.features, self.cluster_assignments
        return self.features, None

    def to_jax(self, sharding=None):
        """Device arrays (features, labels|None); optionally placed with a
        NamedSharding (batch-axis sharding over the mesh)."""
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(self.features, dtype=jnp.float32)
        y = None if self.labels is None else jnp.asarray(self.labels, dtype=jnp.int32)
        if sharding is not None:
            x = jax.device_put(x, sharding)
            if y is not None:
                y = jax.device_put(y, sharding)
        return x, y

    def to_tf_dataset(self, batch_size: int = 32, shuffle: bool = False, seed: Optional[int] = None):
        """Batched, prefetched tf.data.Dataset (lazy TF import; parity with
        reference base.py:92-115)."""
        import tensorflow as tf

        if self.labels is not None:
            ds = tf.data.Dataset.from_tensor_slices(
                (self.features.astype(np.float32), self.labels.astype(np.int32))
            )
        else:
            ds = tf.data.Dataset.from_tensor_slices(self.features.astype(np.float32))
        if shuffle:
            ds = ds.shuffle(buffer_size=self.n_samples, seed=seed)
        return ds.batch(batch_size).prefetch(tf.data.AUTOTUNE)

    def __repr__(self) -> str:
        label_info = f"labels={self.n_classes} classes" if self.is_supervised else "unsupervised"
        return (
            f"FeatureSet(modality={self.modality!r}, feature_type={self.feature_type!r}, "
            f"n_samples={self.n_samples}, feature_shape={self.feature_shape}, {label_info})"
        )


class BaseDatasetLoader(ABC):
    """Iterating yields (sample_path | None, label | None, metadata dict)."""

    @abstractmethod
    def __iter__(self) -> Iterator[tuple[Optional[Path], Optional[str], dict]]: ...

    @abstractmethod
    def __len__(self) -> int: ...


def _collect(
    all_features: list[np.ndarray],
    all_labels: list[int],
    all_meta: list[dict],
    label_to_idx: dict[str, int],
    feature_type: str,
    modality: str,
) -> FeatureSet:
    if not all_features:
        raise RuntimeError("No features were successfully extracted.")
    features = np.stack(all_features)
    if all_labels and len(all_labels) != len(all_features):
        # a partially-labelled dataset would silently shift every label
        # after the first unlabelled sample onto the wrong row
        raise ValueError(
            f"{len(all_labels)} label(s) for {len(all_features)} samples — "
            "the dataset mixes labelled and unlabelled items; label all "
            "samples or none."
        )
    labels = np.array(all_labels, dtype=np.int32) if all_labels else None
    label_names = (
        [k for k, _ in sorted(label_to_idx.items(), key=lambda kv: kv[1])] if label_to_idx else None
    )
    return FeatureSet(
        features=features,
        feature_type=feature_type,
        modality=modality,
        metadata=all_meta,
        labels=labels,
        label_names=label_names,
    )


def auto_device_batch(flag: Optional[bool]) -> bool:
    """None = auto: device-batch on accelerators, per-sample host path on
    CPU (where the one-hot/GEMM formulations measured slower than numpy)."""
    if flag is not None:
        return flag
    import jax

    return jax.default_backend() != "cpu"


def pad_stack(decoded: list[np.ndarray], batch: int) -> np.ndarray:
    """Stack per-item arrays and zero-pad the leading axis to ``batch`` so
    every device call sees one fixed jit shape (padded rows are computed
    and discarded by the caller)."""
    x = np.stack(decoded)
    pad = batch - len(x)
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def _overlap_device(chunks, process):
    """Depth-1 software pipeline: yield ``(chunk, process(chunk))`` in
    order, running ``process`` (pack + device dispatch + blocking fetch) on
    a single-slot device thread. Advancing ``chunks`` — where the caller
    decodes — happens while the previous chunk computes, so host decode
    overlaps device work with at most ONE chunk in flight."""
    with ThreadPoolExecutor(max_workers=1) as device_thread:
        pending = None
        for good in chunks:
            fut = device_thread.submit(process, good)
            if pending is not None:
                yield pending[1], pending[0].result()
            pending = (fut, good)
        if pending is not None:
            yield pending[1], pending[0].result()


def _device_batched_dataset(
    loader: "BaseDatasetLoader",
    max_samples: Optional[int],
    decode,  # (path, meta) -> decoded array; raises to skip the sample
    pack,  # list[decoded] -> fixed-shape device input
    run,  # device input -> device output (jitted, cached by the caller)
    unpack,  # (np.ndarray output, list[decoded]) -> per-item feature vectors
    chunk: int,
    feature_type: str,
    modality: str,
    workers: int = 8,
) -> FeatureSet:
    """Shared chunked decode->pad->device->collect loop for the batched
    extractor paths (image/video descriptors, backbone embeddings): host
    threads decode with skip-and-continue (reference base.py:203-206
    contract), the device runs fixed-shape batches, labels intern in first
    occurrence order exactly like BaseFeatureExtractor.extract_dataset."""
    samples = []
    for i, item in enumerate(loader):
        if max_samples is not None and i >= max_samples:
            break
        samples.append(item)

    feats: list[np.ndarray] = []
    labels: list[int] = []
    metas: list[dict] = []
    label_to_idx: dict[str, int] = {}

    def _decode(item):
        path, label, meta = item
        try:
            out = decode(path, meta)
        except Exception as exc:
            logger.warning("Skipping %s: %s", path, exc)
            return None, label, meta
        if out is None or (hasattr(out, "__len__") and len(out) == 0):
            logger.warning("Skipping %s: empty decode", path)
            return None, label, meta
        return out, label, meta

    def _process(good):
        decoded = [g for g, _, _ in good]
        return unpack(np.asarray(run(pack(decoded))), decoded)

    with ThreadPoolExecutor(max_workers=workers) as pool:

        def _chunks():
            for s in range(0, len(samples), chunk):
                out = list(pool.map(_decode, samples[s : s + chunk]))
                good = [(g, l, m) for g, l, m in out if g is not None]
                if good:
                    yield good

        for good, vecs in _overlap_device(_chunks(), _process):
            for vec, (_, label, meta) in zip(vecs, good):
                feats.append(np.asarray(vec, np.float32))
                metas.append(meta)
                if label is not None:
                    if label not in label_to_idx:
                        label_to_idx[label] = len(label_to_idx)
                    labels.append(label_to_idx[label])
    return _collect(feats, labels, metas, label_to_idx, feature_type, modality)


class BaseFeatureExtractor(ABC):
    """Extractor ABC. Subclasses set ``name`` / ``feature_type`` /
    ``modality`` and implement ``extract``. ``extract_dataset`` is the
    skip-and-continue loop with first-occurrence label interning (contract of
    reference base.py:176-234)."""

    name: str
    feature_type: str
    modality: str

    @abstractmethod
    def extract(self, sample_path: Optional[Path], **kwargs) -> np.ndarray: ...

    def extract_dataset(self, loader: BaseDatasetLoader, max_samples: Optional[int] = None) -> FeatureSet:
        all_features: list[np.ndarray] = []
        all_labels: list[int] = []
        all_meta: list[dict] = []
        label_to_idx: dict[str, int] = {}
        for i, (sample_path, label, meta) in enumerate(loader):
            if max_samples is not None and i >= max_samples:
                break
            try:
                feat = self.extract(sample_path, **meta)
            except Exception as exc:
                logger.warning("Skipping %s: %s", sample_path, exc)
                continue
            all_features.append(np.asarray(feat))
            all_meta.append(meta)
            if label is not None:
                if label not in label_to_idx:
                    label_to_idx[label] = len(label_to_idx)
                all_labels.append(label_to_idx[label])
        return _collect(all_features, all_labels, all_meta, label_to_idx, self.feature_type, self.modality)


class BatchedAudioExtractor(BaseFeatureExtractor):
    """Audio extractor with a batched accelerator path.

    Subclasses implement:
      - ``target_samples()`` -> int | None  (fixed clip length, or None)
      - ``min_samples()`` -> int            (zero-pad floor per clip)
      - ``batch_feature(waves (B, n) f32, lengths (B,) i32) -> (B, ...)``
        a jit-compiled device function; when lengths is not None the padded
        region must be masked out of per-clip reductions
      - ``frames_for(n_samples)`` -> per-clip time size (for trimming), or
        None for non-framed outputs

    ``extract_dataset`` pipelines: host WAV decode+resample on a thread pool
    (I/O bound) while the previous batch runs on device — replacing the
    reference's sequential librosa loop.
    """

    modality = "audio"
    sample_rate: int
    duration: Optional[float] = None
    batch_size: int = 256
    decode_workers: int = 8
    # Masked padded batches are exact for per-frame features (mel/cqt/
    # mfcc_seq: per-frame ops + masked reductions). Features with
    # cross-frame couplings (savgol deltas, per-band sorts in the classical
    # stack) are contaminated near the valid/pad boundary, so those
    # extractors set exact_length_batching: clips are grouped by exact
    # length and processed unmasked (one compile per distinct length).
    exact_length_batching: bool = False

    # -- subclass hooks -------------------------------------------------
    def target_samples(self) -> Optional[int]:
        if self.duration is None:
            return None
        return int(self.duration * self.sample_rate)

    def min_samples(self) -> int:
        return 1

    def frames_for(self, n_samples: int) -> Optional[int]:
        return None

    def batch_feature(self, waves, lengths):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- single-sample API (parity with the reference extract()) --------
    def _load_clip(self, sample_path, start_time=None, end_time=None, min_duration: float = 0.1):
        from ..data.audio_io import load_audio

        offset = float(start_time) if start_time is not None else 0.0
        duration = None
        if end_time is not None:
            duration = max(float(end_time) - offset, min_duration)
        y, _ = load_audio(sample_path, sr=self.sample_rate, offset=offset, duration=duration)
        tgt = self.target_samples()
        if tgt is not None:
            y = y[:tgt] if len(y) >= tgt else np.pad(y, (0, tgt - len(y)))
        if len(y) < self.min_samples():
            y = np.pad(y, (0, self.min_samples() - len(y)))
        return y

    # Framed extractors (mel/cqt/mfcc_seq) produce (B, T, F) on DEVICE —
    # XLA's natural output layout — and swap to the (B, F, T) contract on
    # host. Fetching a device-side-transposed result costs a relayout on
    # the remote runtime (measured 3.3-5 s per 41 MB fetch vs 1.5 s for
    # the time-major layout on the tunneled v5e); a host numpy swapaxes is
    # free by comparison.
    _time_major_device = False

    def _jit_time_major(self, fn):
        """jit ``fn(waves, lengths) -> (B, F, T)`` with a trailing swap to
        (B, T, F) INSIDE the jit (XLA cancels fn's own internal transpose,
        so the compiled program's output is the natural layout) and set the
        flag that makes ``_host_layout`` swap back on host — one call sets
        both sides of the contract so they cannot drift apart."""
        import jax
        import jax.numpy as jnp

        self._time_major_device = True
        return jax.jit(lambda w, l: jnp.swapaxes(fn(w, l), 1, 2))

    def _host_layout(self, out: np.ndarray) -> np.ndarray:
        if self._time_major_device and out.ndim == 3:
            return np.swapaxes(out, 1, 2)
        return out

    def extract(self, sample_path, start_time=None, end_time=None, **_kw) -> np.ndarray:
        y = self._load_clip(sample_path, start_time, end_time)
        out = self._host_layout(np.asarray(self.batch_feature(y[None, :], None)))[0]
        return out.astype(np.float32)

    # -- batched dataset path -------------------------------------------
    def _device_batch(self, waves, lengths):
        """Run batch_feature with the batch axis sharded over all devices
        (rows padded to a device-count multiple; SURVEY.md §2c: data
        parallelism is the first-class axis). Single device: direct call."""
        import jax

        n_dev = jax.device_count()
        if n_dev <= 1:
            return self._host_layout(np.asarray(self.batch_feature(waves, lengths)))
        from ..parallel.mesh import batch_sharding, get_mesh

        mesh = getattr(self, "_mesh", None)
        if mesh is None or int(np.prod(mesh.devices.shape)) != n_dev:
            mesh = get_mesh(model_parallel=1)
            self._mesh = mesh
        n = len(waves)
        pad = (-n) % n_dev
        if pad:
            waves = np.concatenate([waves, np.zeros((pad,) + waves.shape[1:], waves.dtype)])
            if lengths is not None:
                lengths = np.concatenate([lengths, np.full(pad, waves.shape[1], lengths.dtype)])
        sharding = batch_sharding(mesh)
        waves_d = jax.device_put(waves, sharding)
        lengths_d = jax.device_put(lengths, sharding) if lengths is not None else None
        out = self._host_layout(np.asarray(self.batch_feature(waves_d, lengths_d)))
        return out[:n]

    def _pad_bucket(self, n: int) -> int:
        """Round variable lengths up to 1s steps to bound recompilation."""
        step = self.sample_rate
        return int(-(-n // step) * step)

    def extract_dataset(self, loader: BaseDatasetLoader, max_samples: Optional[int] = None) -> FeatureSet:
        samples = []
        for i, item in enumerate(loader):
            if max_samples is not None and i >= max_samples:
                break
            samples.append(item)

        all_features: list[np.ndarray] = []
        all_labels: list[int] = []
        all_meta: list[dict] = []
        label_to_idx: dict[str, int] = {}
        tgt = self.target_samples()

        def decode(item):
            path, label, meta = item
            try:
                y = self._load_clip(path, meta.get("start_time"), meta.get("end_time"))
                return y, label, meta, None
            except Exception as exc:  # skip-and-continue (reference base.py:203-206)
                return None, label, meta, (path, exc)

        def process(good):
            """Pack + device dispatch + fetch for one decoded chunk; runs on
            the single-slot device thread so the main thread can decode the
            next chunk while this one computes (depth-1 software pipeline —
            the fetch in _device_batch blocks, and on the tunneled chip it
            is the dominant per-chunk cost)."""
            if tgt is not None:
                # fixed (batch_size, tgt) shape for every chunk (short
                # final chunks are zero-row-padded): ONE compiled program
                # per extractor config instead of one per chunk size
                rows = len(good)
                waves = np.zeros((self.batch_size, tgt), np.float32)
                for j, (y, _, _) in enumerate(good):
                    waves[j, : len(y)] = y[:tgt]
                feats = self._device_batch(waves, None).astype(np.float32)[:rows]
                return list(feats)
            if self.exact_length_batching:
                # Group by exact length; each group runs unmasked. Only
                # valid for extractors whose output shape is length-
                # independent (flat vectors): framed outputs would be
                # ragged across groups.
                if self.frames_for(self.min_samples()) is not None:
                    raise TypeError(
                        f"{self.name}: exact_length_batching requires a "
                        "length-independent output shape (frames_for must return None)"
                    )
                feat_per_item = [None] * len(good)
                groups: dict[int, list[int]] = {}
                for j, (y, _, _) in enumerate(good):
                    groups.setdefault(len(y), []).append(j)
                if len(groups) > 16 and not getattr(self, "_warned_lengths", False):
                    self._warned_lengths = True
                    logger.warning(
                        "%s: %d distinct clip lengths in one batch — each costs an XLA "
                        "compile. Pass duration=... (pad/trim) to fix the shape.",
                        self.name, len(groups),
                    )
                for length, idxs in sorted(groups.items()):
                    # pad the batch dim to a fixed size so group-size
                    # variance does not retrigger compiles per chunk
                    rows = max(len(idxs), 1)
                    row_pad = min(self.batch_size, 1 << (rows - 1).bit_length()) - rows
                    waves = np.zeros((rows + max(row_pad, 0), length), np.float32)
                    for k, j in enumerate(idxs):
                        waves[k] = good[j][0]
                    feats = self._device_batch(waves, None).astype(np.float32)
                    for k, j in enumerate(idxs):
                        feat_per_item[j] = feats[k]
                return feat_per_item
            # rows fixed at batch_size; pad rows carry a FULL-length mask
            # over all-zero audio (cheap, well-defined) and are sliced away
            # below — nothing downstream reads them. sample dim bucketed
            # to 1 s steps
            max_n = self._pad_bucket(max(len(y) for y, _, _ in good))
            waves = np.zeros((self.batch_size, max_n), np.float32)
            lens = np.full(self.batch_size, max_n, np.int32)
            for j, (y, _, _) in enumerate(good):
                waves[j, : len(y)] = y
                lens[j] = len(y)
            feats = self._device_batch(waves, lens).astype(np.float32)
            feat_per_item = []
            for j in range(len(good)):
                f = feats[j]
                t = self.frames_for(int(lens[j]))
                if t is not None:
                    f = f[..., :t]
                elif f.ndim == 1 and f.shape[0] == waves.shape[1]:
                    f = f[: int(lens[j])]  # waveform features
                feat_per_item.append(f)
            return feat_per_item

        with ThreadPoolExecutor(max_workers=self.decode_workers) as pool:

            def chunks():
                for start in range(0, len(samples), self.batch_size):
                    decoded = list(pool.map(decode, samples[start : start + self.batch_size]))
                    for y, l, m, err in decoded:
                        if err is not None:
                            logger.warning("Skipping %s: %s", err[0], err[1])
                    good = [(y, l, m) for y, l, m, err in decoded if y is not None]
                    if good:
                        yield good

            for good, feat_per_item in _overlap_device(chunks(), process):
                for feat, (_, label, meta) in zip(feat_per_item, good):
                    all_features.append(np.ascontiguousarray(feat))
                    all_meta.append(meta)
                    if label is not None:
                        if label not in label_to_idx:
                            label_to_idx[label] = len(label_to_idx)
                        all_labels.append(label_to_idx[label])

        return _collect(all_features, all_labels, all_meta, label_to_idx, self.feature_type, self.modality)
