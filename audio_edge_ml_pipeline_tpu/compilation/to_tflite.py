"""Stage 7a — TFLite export CLI.

Converts a flax .npz bundle to TFLite via jax2tf in four modes (fp32,
dynamic-range int8, full-integer int8 with a representative dataset and
int8 I/O, fp16), evaluates each on a validation FeatureSet, selects the
best mode within --max-accuracy-drop (default 0.02, reference
to_tflite.py:41), and writes the deployment layout:

    <output>/
        model.tflite          best mode
        label_names.json
        mel_params.json       frontend geometry for the device
        compilation_report.json

CLI:
    python -m audio_edge_ml_pipeline_tpu.compilation.to_tflite \
        --model model.flax.npz --features <val featureset dir> \
        --output deploy/ [--max-accuracy-drop 0.02] [--mel-params k=v ...]
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


def _tf_function_from_bundle(trainer, input_shape):
    """Wrap the trainer's normalized forward pass as a TF concrete fn."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    module = trainer._module()
    params = trainer._params
    norm_mean, norm_var = trainer._norm_mean, trainer._norm_var

    def forward(x):
        import jax.numpy as jnp

        xn = (x - norm_mean) / jnp.sqrt(norm_var + 1e-6)
        logits = module.apply({"params": params}, xn, train=False)
        return jnp.asarray(jnp.exp(logits) / jnp.sum(jnp.exp(logits), -1, keepdims=True))

    tf_fn = jax2tf.convert(forward, with_gradient=False)
    spec = tf.TensorSpec((1, *input_shape), tf.float32)
    return tf.function(tf_fn, autograph=False).get_concrete_function(spec)


def convert_modes(trainer, input_shape, calib_X, out_dir: Path) -> dict[str, Path]:
    import tensorflow as tf

    concrete = _tf_function_from_bundle(trainer, input_shape)
    paths: dict[str, Path] = {}

    def _convert(mode: str):
        conv = tf.lite.TFLiteConverter.from_concrete_functions([concrete])
        if mode == "dynamic_int8":
            conv.optimizations = [tf.lite.Optimize.DEFAULT]
        elif mode == "int8":
            conv.optimizations = [tf.lite.Optimize.DEFAULT]

            def rep():
                for i in range(min(100, len(calib_X))):
                    yield [calib_X[i : i + 1].astype(np.float32)]

            conv.representative_dataset = rep
            conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
            conv.inference_input_type = tf.int8
            conv.inference_output_type = tf.int8
        elif mode == "float16":
            conv.optimizations = [tf.lite.Optimize.DEFAULT]
            conv.target_spec.supported_types = [tf.float16]
        blob = conv.convert()
        p = out_dir / f"model_{mode}.tflite"
        p.write_bytes(blob)
        return p

    for mode in ("fp32", "dynamic_int8", "int8", "float16"):
        try:
            paths[mode] = _convert(mode)
            logger.info("tflite %s: %.1f KB", mode, paths[mode].stat().st_size / 1024)
        except Exception as exc:
            logger.warning("tflite mode %r failed: %s", mode, exc)
    return paths


def evaluate_tflite(path: Path, X: np.ndarray, y: np.ndarray) -> dict:
    """Sample-by-sample interpreter eval with int8 quant/dequant I/O
    (matches edge-device behavior; reference quantize.py:539-585)."""
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=str(path))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    correct = 0
    t0 = time.perf_counter()
    for i in range(len(X)):
        x = X[i : i + 1].astype(np.float32)
        if inp["dtype"] == np.int8:
            scale, zp = inp["quantization"]
            x = np.clip(np.round(x / scale + zp), -128, 127).astype(np.int8)
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        o = interp.get_tensor(out["index"])
        if out["dtype"] == np.int8:
            scale, zp = out["quantization"]
            o = (o.astype(np.float32) - zp) * scale
        if int(np.argmax(o)) == int(y[i]):
            correct += 1
    latency_ms = (time.perf_counter() - t0) * 1000.0 / max(len(X), 1)
    return {"accuracy": correct / max(len(X), 1), "latency_ms": latency_ms,
            "size_kb": path.stat().st_size / 1024}


def main(argv=None) -> None:
    setup_logging()
    p = argparse.ArgumentParser(
        prog="python -m audio_edge_ml_pipeline_tpu.compilation.to_tflite",
        description="Stage 7a — TFLite export (fp32 / dynamic int8 / full int8 / fp16)",
    )
    p.add_argument("--model", required=True)
    p.add_argument("--features", required=True, help="validation FeatureSet dir")
    p.add_argument("--output", required=True)
    p.add_argument("--max-accuracy-drop", type=float, default=0.02)
    p.add_argument("--mel-params", nargs="*", default=[], metavar="KEY=VALUE")
    args = p.parse_args(argv)

    trainer = load_any_model(Path(args.model))
    fs = FeaturePipeline.load(args.features)
    X = trainer._prepare_input(fs.features.astype(np.float32))
    y = fs.labels
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    paths = convert_modes(trainer, X.shape[1:], X, out_dir)
    if "fp32" not in paths:
        raise SystemExit("fp32 TFLite conversion failed — cannot proceed")
    results = {}
    for mode, path in paths.items():
        results[mode] = evaluate_tflite(path, X, y)
        logger.info("%-13s acc=%.4f latency=%.3f ms size=%.1f KB",
                    mode, results[mode]["accuracy"], results[mode]["latency_ms"], results[mode]["size_kb"])

    ref_acc = results["fp32"]["accuracy"]
    eligible = {k: v for k, v in results.items() if ref_acc - v["accuracy"] <= args.max_accuracy_drop}
    if not eligible:
        eligible = {"fp32": results["fp32"]}
    best = min(eligible, key=lambda k: eligible[k]["size_kb"])
    logger.info("best mode: %s", best)

    import shutil

    shutil.copy2(paths[best], out_dir / "model.tflite")
    if fs.label_names:
        (out_dir / "label_names.json").write_text(json.dumps(fs.label_names, indent=2))
    mel_params = {"sample_rate": 16000, "n_mels": 40, "n_fft": 512, "hop_length": 160, "duration": 5.0}
    for kv in args.mel_params:
        k, _, v = kv.partition("=")
        mel_params[k] = float(v) if "." in v else int(v)
    (out_dir / "mel_params.json").write_text(json.dumps(mel_params, indent=2))
    report = {
        "model": str(args.model),
        "best_mode": best,
        "max_accuracy_drop": args.max_accuracy_drop,
        "results": results,
        "deploy_model": str(out_dir / "model.tflite"),
        "timestamp": datetime.now().isoformat(timespec="seconds"),
    }
    (out_dir / "compilation_report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps({"best_mode": best, **{k: v["size_kb"] for k, v in results.items()}}, indent=2))


if __name__ == "__main__":
    main()
