"""Augment backend A/B: host per-clip vocoder vs device-batched vocoder.

Measures the full augment run (decode -> stretch/pitch copies -> WAV
write) both ways on a synthetic class-per-folder dataset, plus the bare
vocoder-kernel throughput at a larger batch. On the tunneled single-chip
environment the device win is transfer-bound (~2x one host core for the
kernel; CLAUDE.md "tunnel pathologies"); on a locally-attached TPU the
same program is compute-bound and the batched win is structural.

Usage: python scripts/augment_backend_bench.py [--files 24] [--copies 2]
       [--duration 2.0] [--kernel-batch 64]
"""
from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_dataset(root: Path, n_files: int, duration: float, sr: int = 16000) -> None:
    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    n = int(sr * duration)
    t = np.arange(n) / sr
    for cls in ("chainsaw", "rain", "fire"):
        (root / cls).mkdir(parents=True)
        for i in range(n_files // 3):
            y = 0.4 * np.sin(2 * np.pi * (200 + 37 * i) * t) + 0.1 * rng.standard_normal(n)
            write_wav(root / cls / f"{cls}{i}.wav", y.astype(np.float32), sr)


def run_backend(src: Path, out: Path, backend: str, copies: int) -> float:
    from audio_edge_ml_pipeline_tpu.features.augment import run

    cfg = {
        "output_dir": str(out), "audio_folder": str(src), "loader": "audio_folder",
        "split": "train", "seed": 3, "n_augments": copies, "preserve_length": True,
        "sample_rate": None, "level_match_db": 0.0, "class_overrides": {},
        "augmentations": [{"type": "time_stretch"}, {"type": "pitch_shift"}],
        "backend": backend, "device_batch": 64, "workers": 1,
    }
    t0 = time.perf_counter()
    run(cfg)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=24)
    ap.add_argument("--copies", type=int, default=2)
    ap.add_argument("--duration", type=float, default=2.0)
    ap.add_argument("--kernel-batch", type=int, default=64)
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}")
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        make_dataset(root / "src", args.files, args.duration)
        # count what make_dataset actually wrote (3 * (files // 3))
        n_written = sum(1 for _ in (root / "src").rglob("*.wav"))
        n_copies = n_written * args.copies

        t_host = run_backend(root / "src", root / "host_out", "host", args.copies)
        # first device run pays the vocoder compile; run twice, report warm
        run_backend(root / "src", root / "dev_cold", "device", args.copies)
        t_dev = run_backend(root / "src", root / "dev_out", "device", args.copies)
        print(f"host backend:   {t_host:6.2f} s  ({n_copies / t_host:6.1f} copies/s)")
        print(f"device backend: {t_dev:6.2f} s  ({n_copies / t_dev:6.1f} copies/s)  [warm]")

        # bare kernel throughput at a larger batch (no decode/write)
        from audio_edge_ml_pipeline_tpu.ops import effects_jax

        B, n = args.kernel_batch, int(16000 * args.duration)
        y = (0.2 * np.random.default_rng(1).standard_normal((B, n))).astype(np.float32)
        rates = np.random.default_rng(2).uniform(0.85, 1.15, B)
        effects_jax.time_stretch_batch(y, rates)  # compile
        t0 = time.perf_counter()
        effects_jax.time_stretch_batch(y, rates)
        t1 = time.perf_counter()
        print(f"kernel stretch B={B}: {t1 - t0:5.2f} s  ({B / (t1 - t0):6.1f} clips/s)")


if __name__ == "__main__":
    main()
