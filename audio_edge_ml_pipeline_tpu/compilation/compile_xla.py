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


def _flag_candidates(platform: str) -> list[dict]:
    """Per-backend XLA compiler-option grid for the flag search — the
    XLA-native analog of the reference's MetaSchedule tuning mode
    (compile_tvm.py:1-50): instead of searching loop schedules, search the
    compiler knobs that change the generated schedule."""
    base: list[dict] = [{}]
    if platform in ("tpu", "axon"):
        base += [
            {"xla_tpu_enable_latency_hiding_scheduler": "true"},
            {"xla_tpu_enable_latency_hiding_scheduler": "false"},
            {"xla_enable_async_all_gather": "true"},
            {"xla_tpu_licm_size_inflation_ratio": "1"},
        ]
    elif platform == "cpu":
        base += [
            {"xla_cpu_enable_fast_math": "true"},
            {"xla_cpu_enable_fast_math": "false"},
            {"xla_cpu_enable_concurrency_optimized_scheduler": "true"},
        ]
    return base


def flag_search(lowered, params, xb, batch: int) -> tuple[object, dict]:
    """Compile the lowered computation under each candidate option set,
    benchmark each, and return (fastest_compiled, search_record). Invalid
    options on this backend are recorded, not fatal."""
    import jax

    platform = jax.devices()[0].platform
    results = []
    best = None
    for opts in _flag_candidates(platform):
        label = ",".join(f"{k}={v}" for k, v in opts.items()) or "(default)"
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
            latency_ms = _bench(lambda: compiled(params, xb)) * 1000.0 / batch
            results.append({"flags": opts, "latency_ms_per_sample": latency_ms,
                            "compile_seconds": round(compile_s, 3)})
            if best is None or latency_ms < best[1]:
                best = (compiled, latency_ms, opts)
        except Exception as exc:
            results.append({"flags": opts, "error": str(exc).splitlines()[0][:160]})
    if best is None:
        raise RuntimeError("no XLA flag candidate compiled successfully")
    record = {
        "platform": platform,
        "candidates": results,
        "best_flags": best[2],
        "best_latency_ms_per_sample": best[1],
    }
    logger.info("flag search: best %s -> %.4f ms/sample",
                best[2] or "(default)", best[1])
    return best[0], record


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
    p.add_argument("--tune-flags", action="store_true",
                   help="search a small grid of XLA compiler options and keep the fastest "
                        "(the MetaSchedule-tuning role of the reference's compile stage)")
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
    search_record = None
    t0 = time.perf_counter()
    if args.tune_flags:
        compiled, search_record = flag_search(lowered, params, xb, B)
    else:
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
        "flag_search": search_record,
        "timestamp": datetime.now().isoformat(timespec="seconds"),
    }
    out = Path(args.output or Path(args.model).parent / "xla_report.json")
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
