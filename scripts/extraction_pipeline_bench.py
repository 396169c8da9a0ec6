"""Real-pipeline extraction throughput: WAV files on disk -> FeatureSet.

Unlike bench.py (device-resident tiles, pure kernel throughput), this
measures the full extract_dataset path — threaded WAV decode + resample,
chunk packing, device dispatch, fetch — i.e. what the pipeline CLI actually
does, and what the depth-1 decode/compute software pipeline (features/
base.py) is supposed to speed up.

Usage: python scripts/extraction_pipeline_bench.py [--clips 2048] [--duration 5.0]
       [--extractor audio_mel_spec|audio_classical] [--serial]

--serial disables the overlap (device work inline on the main thread) for
an A/B of the pipelining itself.
"""
from __future__ import annotations

import argparse
import sys
import tempfile
import time
import wave
from pathlib import Path

import numpy as np


def make_wavs(root: Path, n: int, duration: float, sr: int) -> None:
    rng = np.random.default_rng(0)
    classes = [f"class_{c}" for c in range(8)]
    t = np.arange(int(sr * duration)) / sr
    for i in range(n):
        d = root / classes[i % len(classes)]
        d.mkdir(parents=True, exist_ok=True)
        f0 = 200.0 + 37.0 * (i % 40)
        y = 0.3 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(t.shape)
        pcm = (np.clip(y, -1, 1) * 32767).astype(np.int16)
        with wave.open(str(d / f"clip_{i:05d}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=2048)
    ap.add_argument("--duration", type=float, default=5.0)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--extractor", default="audio_mel_spec")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--serial", action="store_true",
                    help="disable decode/compute overlap (A/B baseline)")
    ap.add_argument("--keep", default=None, help="reuse/keep WAVs at this dir")
    args = ap.parse_args(argv)

    import jax

    from audio_edge_ml_pipeline_tpu.data.loaders import AudioFolderLoader
    from audio_edge_ml_pipeline_tpu.features import audio as _audio  # register
    from audio_edge_ml_pipeline_tpu.features.registry import get

    root = Path(args.keep) if args.keep else Path(tempfile.mkdtemp(prefix="extbench_"))
    if not any(root.glob("class_*/clip_*.wav")):
        print(f"writing {args.clips} wavs to {root} ...", file=sys.stderr)
        make_wavs(root, args.clips, args.duration, args.sr)

    kw = {"duration": args.duration}
    if args.extractor == "audio_mel_spec":
        kw.update(sample_rate=args.sr, n_mels=40, n_fft=512, hop_length=160)
    else:
        kw.update(sample_rate=22050)
    ext = get(args.extractor)(**kw)
    ext.batch_size = args.batch_size
    if args.serial:
        # monkeypatch: single-slot device thread becomes a same-thread call
        import audio_edge_ml_pipeline_tpu.features.base as fb
        from concurrent.futures import Future, ThreadPoolExecutor

        class Inline(ThreadPoolExecutor):
            """Runs submit() inline — but only the SINGLE-SLOT device
            executor is replaced; the decode pool keeps real threads so the
            A/B isolates the cross-chunk overlap, not intra-chunk decode."""

            def submit(self, fn, *a, **k):
                f = Future()
                try:
                    f.set_result(fn(*a, **k))
                except BaseException as exc:  # pragma: no cover
                    f.set_exception(exc)
                return f

        real = ThreadPoolExecutor

        def pick(max_workers=None):
            cls = Inline if max_workers == 1 else real
            return cls(max_workers=max_workers)

        fb.ThreadPoolExecutor = pick

    print(f"backend: {jax.devices()}", file=sys.stderr)
    loader = AudioFolderLoader(root)
    ext.extract_dataset(loader, max_samples=min(512, args.clips))  # warmup/compile
    t0 = time.perf_counter()
    fs = ext.extract_dataset(loader)
    dt = time.perf_counter() - t0
    n = len(fs.features)
    mode = "serial" if args.serial else "pipelined"
    print(f"{args.extractor} [{mode}] {n} clips in {dt:.2f} s -> {n / dt:.0f} clips/s "
          f"(feature shape {fs.features.shape[1:]})")


if __name__ == "__main__":
    main()
