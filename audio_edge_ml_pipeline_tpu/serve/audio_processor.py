"""Ingestion-side batch preprocessor.

Walks an uploads directory of WAV files with JSON metadata sidecars (as
written by the ingestion API) and extracts mel-spectrogram features to .npy,
delegating to the registered audio_mel_spec extractor so ingestion-path
features are bit-identical to pipeline features (parity note of reference
audio_processor.py:1-11, 26-124).

CLI: python -m audio_edge_ml_pipeline_tpu.serve.audio_processor \
        --input data/raw/uploads --output data/processed/uploads
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

from ..features import get
from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)


class AudioPreprocessor:
    def __init__(self, sample_rate: int = 16000, n_mels: int = 40, n_fft: int = 512,
                 hop_length: int = 160, duration: float | None = 5.0) -> None:
        self.extractor = get("audio_mel_spec")(
            sample_rate=sample_rate, n_mels=n_mels, n_fft=n_fft,
            hop_length=hop_length, duration=duration,
        )

    def process_file(self, wav_path: Path, out_dir: Path) -> Path:
        feat = self.extractor.extract(wav_path)
        out = Path(out_dir) / (wav_path.stem + ".npy")
        np.save(out, feat)
        return out

    def process_dataset(self, input_dir: Path, output_dir: Path) -> int:
        input_dir, output_dir = Path(input_dir), Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        n = 0
        for wav in sorted(input_dir.glob("*.wav")):
            meta_path = wav.with_suffix(".json")
            meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
            try:
                out = self.process_file(wav, output_dir)
                if meta:
                    (output_dir / (wav.stem + ".json")).write_text(json.dumps(meta, indent=2))
                n += 1
                logger.info("processed %s -> %s", wav.name, out.name)
            except Exception as exc:
                logger.warning("skipping %s: %s", wav, exc)
        return n


def main(argv=None) -> None:
    setup_logging()
    p = argparse.ArgumentParser(prog="python -m audio_edge_ml_pipeline_tpu.serve.audio_processor")
    p.add_argument("--input", default="data/raw/uploads")
    p.add_argument("--output", default="data/processed/uploads")
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--n-mels", type=int, default=40)
    p.add_argument("--duration", type=float, default=5.0)
    args = p.parse_args(argv)
    proc = AudioPreprocessor(sample_rate=args.sample_rate, n_mels=args.n_mels, duration=args.duration)
    n = proc.process_dataset(args.input, args.output)
    print(f"Processed {n} uploads -> {args.output}")


if __name__ == "__main__":
    main()
