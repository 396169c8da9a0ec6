"""Stage 7b — XLA AOT compile + latency benchmark CLI.

The reference compiles ONNX models with TVM (baseline relay.build or
MetaSchedule tuning) and benchmarks compiled latency against onnxruntime
(compile_tvm.py:1-502). TVM is not available here and XLA *is* the native
compiler, so this stage AOT-lowers the jitted forward pass (optionally with
autotuned XLA flags), benchmarks it against the TFLite interpreter baseline,
and writes an xla_report.json with the same latency-comparison role as
tvm_report.json.

CLI:
    python -m audio_edge_ml_pipeline_tpu.compilation.compile_xla \
        --model model.flax.npz --features <featureset dir> \
        [--output xla_report.json] [--batch 32] [--tflite deploy/model.tflite]
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from datetime import datetime
from pathlib import Path

import numpy as np

from ..features.pipeline import FeaturePipeline
from ..models.deep import load_any_model
from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)


def _bench(fn, *args, iters: int = 20) -> float:
    fn(*args)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        if hasattr(out, "block_until_ready"):
            out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(argv=None) -> None:
    setup_logging()
    p = argparse.ArgumentParser(
        prog="python -m audio_edge_ml_pipeline_tpu.compilation.compile_xla",
        description="Stage 7b — XLA AOT compile + latency benchmark",
    )
    p.add_argument("--model", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--tflite", default=None, help="optional TFLite baseline to compare against")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    trainer = load_any_model(Path(args.model))
    fs = FeaturePipeline.load(args.features)
    X = trainer._prepare_input(fs.features.astype(np.float32))
    B = min(args.batch, len(X))
    xb = jnp.asarray(X[:B])

    module = trainer._module()
    params = trainer._params
    collections = dict(getattr(trainer, "_collections", None) or {})
    nm, nv = trainer._norm_mean, trainer._norm_var

    def forward(p, x):
        xn = (x - nm) / jnp.sqrt(nv + 1e-6)
        return module.apply({"params": p, **collections}, xn, train=False)

    jitted = jax.jit(forward)
    # AOT: explicit lower + compile (reports compiler stats)
    lowered = jitted.lower(params, xb)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    mem = {}
    try:
        analysis = compiled.memory_analysis()
        mem = {
            "argument_size_bytes": int(getattr(analysis, "argument_size_in_bytes", 0)),
            "output_size_bytes": int(getattr(analysis, "output_size_in_bytes", 0)),
            "temp_size_bytes": int(getattr(analysis, "temp_size_in_bytes", 0)),
        }
    except Exception:
        pass

    xla_batch_s = _bench(lambda: compiled(params, xb))
    xla_per_sample_ms = xla_batch_s * 1000.0 / B
    logger.info("XLA compiled: compile=%.2fs  latency=%.4f ms/sample (batch %d)", compile_s, xla_per_sample_ms, B)

    baseline_ms = None
    if args.tflite and Path(args.tflite).exists():
        from .to_tflite import evaluate_tflite

        y = fs.labels[:B] if fs.labels is not None else np.zeros(B, np.int32)
        baseline = evaluate_tflite(Path(args.tflite), X[:B], y)
        baseline_ms = baseline["latency_ms"]
        logger.info("TFLite baseline: %.4f ms/sample", baseline_ms)

    report = {
        "model": str(args.model),
        "backend": jax.devices()[0].platform,
        "batch": B,
        "compile_seconds": compile_s,
        "xla_latency_ms_per_sample": xla_per_sample_ms,
        "tflite_latency_ms_per_sample": baseline_ms,
        "speedup_vs_tflite": (baseline_ms / xla_per_sample_ms) if baseline_ms else None,
        "memory_analysis": mem,
        "timestamp": datetime.now().isoformat(timespec="seconds"),
    }
    out = Path(args.output or Path(args.model).parent / "xla_report.json")
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
