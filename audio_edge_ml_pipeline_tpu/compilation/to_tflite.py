"""Stage 7a — TFLite export CLI (reference contract: to_tflite.py:1-433).

Converts a flax ``.npz`` bundle to TFLite via jax2tf in four modes (fp32,
dynamic-range int8, full-integer int8 calibrated on the training features,
fp16), evaluates each on a held-out validation FeatureSet, selects the best
(smallest within ``--max-accuracy-drop`` of fp32, reference to_tflite.py:41)
unless ``--mode`` forces one, and writes the reference deployment layout
(to_tflite.py:8-19):

    <output>/
        model_fp32.tflite
        model_dynamic.tflite
        model_int8.tflite
        model_float16.tflite
        deploy/
            model.tflite          best mode
            label_names.json      class names in label-index order
            mel_params.json       frontend geometry for the device runtime
            mel_filterbank.npy    (n_mels, 1 + n_fft//2) float32
        compilation_report.json

CLI (flags mirror reference to_tflite.py:344-368):
    python -m audio_edge_ml_pipeline_tpu.compilation.to_tflite \
        --model <bundle.npz> --features <calib dir> --features-val <val dir> \
        --output <dir> [--class-filter A B ...] [--max-accuracy-drop 0.02] \
        [--mode fp32|dynamic|int8|float16] [--sample-rate ...] [--config YAML]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from datetime import datetime
from pathlib import Path
from typing import Optional

import numpy as np

from ..features.pipeline import FeaturePipeline
from ..models.deep import load_any_model
from ..ops.golden.librosa_ref import mel_filterbank
from ..train.tune import apply_class_filter_canonical, encode_labels_by_name
from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)

MODES = ("fp32", "dynamic", "int8", "float16")


def _tf_function_from_bundle(trainer, input_shape):
    """Wrap the trainer's normalized forward pass as a TF concrete fn."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    module = trainer._module()
    params = trainer._params
    # non-param collections (BatchNorm batch_stats for ds_cnn etc.) must
    # ride along or flax raises ScopeCollectionNotFound at apply time
    collections = dict(getattr(trainer, "_collections", None) or {})
    norm_mean, norm_var = trainer._norm_mean, trainer._norm_var

    def forward(x):
        import jax.numpy as jnp

        xn = (x - norm_mean) / jnp.sqrt(norm_var + 1e-6)
        logits = module.apply({"params": params, **collections}, xn, train=False)
        return jnp.asarray(jnp.exp(logits) / jnp.sum(jnp.exp(logits), -1, keepdims=True))

    tf_fn = jax2tf.convert(forward, with_gradient=False)
    spec = tf.TensorSpec((1, *input_shape), tf.float32)
    return tf.function(tf_fn, autograph=False).get_concrete_function(spec)


def convert_modes(trainer, input_shape, calib_X, out_dir: Path) -> dict:
    """Emit all four TFLite artifacts; a failed mode is logged and skipped."""
    import tensorflow as tf

    concrete = _tf_function_from_bundle(trainer, input_shape)
    paths: dict[str, Path] = {}

    def _convert(mode: str):
        conv = tf.lite.TFLiteConverter.from_concrete_functions([concrete])
        if mode == "dynamic":
            conv.optimizations = [tf.lite.Optimize.DEFAULT]
        elif mode == "int8":
            conv.optimizations = [tf.lite.Optimize.DEFAULT]

            def rep():
                # 100-sample representative dataset (reference quantize.py:451-496)
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

    for mode in MODES:
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


def compile_model(
    model_path: Path,
    features_dir: Path,
    features_val_dir: Path,
    output_dir: Path,
    class_filter: Optional[list],
    mel_params: dict,
    max_accuracy_drop: float = 0.02,
    forced_mode: Optional[str] = None,
) -> dict:
    """Convert all modes, evaluate, pick the winner, write the deploy bundle.

    Mirrors reference compile_model (to_tflite.py:159-332): calibration
    features come from the *training* FeatureSet, evaluation from the held-out
    one, and the class filter uses the canonical name-sorted encoding so both
    sets agree with the training-time label order.
    """
    output_dir.mkdir(parents=True, exist_ok=True)
    trainer = load_any_model(model_path)

    calib_fs = FeaturePipeline.load(features_dir)
    val_fs = FeaturePipeline.load(features_val_dir)
    if val_fs.labels is None:
        raise ValueError("Validation FeatureSet has no labels.")
    label_names = list(calib_fs.label_names or [])

    # No-filter sanity guard: a model trained on a filtered subset cannot be
    # evaluated against the full label set (reference to_tflite.py:191-199).
    n_model_classes = int(trainer._arch_dict.get("n_classes", 0))
    if not class_filter and n_model_classes and label_names and n_model_classes != len(label_names):
        raise ValueError(
            f"Model has {n_model_classes} output classes but the feature set has "
            f"{len(label_names)}; pass --class-filter with the training-time classes."
        )

    if class_filter:
        if calib_fs.labels is not None:
            X_calib, _, filtered_labels = apply_class_filter_canonical(
                calib_fs.features, calib_fs.labels, label_names, class_filter, "tflite-calib"
            )
        else:
            X_calib = calib_fs.features
            filtered_labels = sorted(set(class_filter) & set(label_names)) or sorted(class_filter)
        # Encode val labels BY NAME against the canonical (training-time)
        # list: deriving the list from the val set instead would shift every
        # label code whenever a filtered class happens to be absent there.
        keep, y_val = encode_labels_by_name(
            val_fs.labels, list(val_fs.label_names or []), filtered_labels
        )
        X_val = val_fs.features[keep]
    else:
        X_calib, filtered_labels = calib_fs.features, label_names
        X_val, y_val = val_fs.features, val_fs.labels
        val_names = list(val_fs.label_names or [])
        if val_names and label_names and val_names != label_names:
            # loaders may order labels differently — re-encode by class name
            keep, y_val = encode_labels_by_name(y_val, val_names, label_names)
            X_val = X_val[keep]

    X_calib = trainer._prepare_input(np.asarray(X_calib, np.float32))
    X_val = trainer._prepare_input(np.asarray(X_val, np.float32))
    logger.info("validation: %d samples, %d classes, shape %s",
                len(X_val), len(filtered_labels), X_val.shape[1:])

    paths = convert_modes(trainer, X_val.shape[1:], X_calib, output_dir)
    if "fp32" not in paths:
        raise RuntimeError("fp32 TFLite conversion failed — cannot proceed")

    results = {}
    for mode, path in paths.items():
        results[mode] = evaluate_tflite(path, X_val, y_val)
        logger.info("%-9s acc=%.4f latency=%.3f ms size=%.1f KB", mode,
                    results[mode]["accuracy"], results[mode]["latency_ms"],
                    results[mode]["size_kb"])
    fp32_accuracy = results["fp32"]["accuracy"]

    if forced_mode:
        if forced_mode not in results:
            raise ValueError(f"--mode {forced_mode!r} unavailable; got {sorted(results)}")
        best_mode = forced_mode
    else:
        best_mode = "fp32"
        for mode in ("int8", "dynamic", "float16"):
            if mode not in results:
                continue
            if fp32_accuracy - results[mode]["accuracy"] <= max_accuracy_drop and \
                    results[mode]["size_kb"] < results[best_mode]["size_kb"]:
                best_mode = mode
    best = results[best_mode]
    logger.info("best mode: %s (acc=%.4f drop=%.4f size=%.1f KB)", best_mode,
                best["accuracy"], fp32_accuracy - best["accuracy"], best["size_kb"])

    import shutil

    deploy_dir = output_dir / "deploy"
    deploy_dir.mkdir(parents=True, exist_ok=True)
    shutil.copy2(paths[best_mode], deploy_dir / "model.tflite")
    (deploy_dir / "label_names.json").write_text(json.dumps(filtered_labels, indent=2))
    (deploy_dir / "mel_params.json").write_text(json.dumps(mel_params, indent=2))
    fb = mel_filterbank(
        sr=mel_params["sample_rate"], n_fft=mel_params["n_fft"], n_mels=mel_params["n_mels"]
    ).astype(np.float32)
    np.save(deploy_dir / "mel_filterbank.npy", fb)
    logger.info("deployment bundle -> %s", deploy_dir)

    report = {
        "timestamp": datetime.now().isoformat(timespec="seconds"),
        "model_path": str(model_path),
        "features_dir": str(features_dir),
        "features_val_dir": str(features_val_dir),
        "class_filter": list(class_filter) if class_filter else None,
        "label_names": filtered_labels,
        "n_classes": len(filtered_labels),
        "n_val_samples": int(len(y_val)),
        "max_accuracy_drop": max_accuracy_drop,
        "fp32_accuracy": fp32_accuracy,
        "best_mode": best_mode,
        "best_accuracy": best["accuracy"],
        "best_accuracy_drop": float(fp32_accuracy - best["accuracy"]),
        "best_size_kb": best["size_kb"],
        "best_latency_ms": best["latency_ms"],
        "mel_params": mel_params,
        "modes": results,
        "deploy_dir": str(deploy_dir),
    }
    (output_dir / "compilation_report.json").write_text(json.dumps(report, indent=2))
    return report


def main(argv=None) -> None:
    setup_logging()
    p = argparse.ArgumentParser(
        prog="python -m audio_edge_ml_pipeline_tpu.compilation.to_tflite",
        description="Stage 7a — TFLite export (fp32 / dynamic / int8 / float16)",
    )
    p.add_argument("--config", metavar="YAML", help="YAML config file.")
    p.add_argument("--model", metavar="PATH", help="Path to model bundle (.npz).")
    p.add_argument("--features", metavar="DIR", help="Calibration features dir.")
    p.add_argument("--features-val", metavar="DIR", help="Validation features dir.")
    p.add_argument("--output", metavar="DIR", help="Output directory.")
    p.add_argument("--class-filter", metavar="CLASS", nargs="+",
                   help="Class names to include (must match training-time filter).")
    p.add_argument("--max-accuracy-drop", type=float, default=None,
                   help="Max tolerated accuracy drop vs fp32 (default 0.02).")
    p.add_argument("--mode", metavar="MODE", choices=list(MODES),
                   help="Force a specific TFLite mode instead of auto-selecting.")
    p.add_argument("--sample-rate", type=int, default=None)
    p.add_argument("--n-mels", type=int, default=None)
    p.add_argument("--n-fft", type=int, default=None)
    p.add_argument("--hop-length", type=int, default=None)
    p.add_argument("--duration", type=float, default=None)
    args = p.parse_args(argv)

    cfg: dict = {}
    if args.config:
        import yaml

        cfg = yaml.safe_load(Path(args.config).read_text()) or {}

    def _get(key, cli_val, default=None):
        return cli_val if cli_val is not None else cfg.get(key, default)

    model = _get("model", args.model)
    features = _get("features", args.features)
    output = _get("output", args.output)
    if not (model and features and output):
        p.error("--model, --features and --output are required (via CLI or --config)")
    model_path = Path(model)
    features_dir = Path(features)
    # validation defaults to the calibration dir when not given separately
    features_val_dir = Path(_get("features_val", args.features_val, features))
    output_dir = Path(output)
    class_filter = args.class_filter or cfg.get("class_filter") or None
    max_drop = float(_get("max_accuracy_drop", args.max_accuracy_drop, 0.02))
    forced_mode = args.mode or cfg.get("mode") or None

    mel_params = {
        "sample_rate": int(_get("sample_rate", args.sample_rate, 16000)),
        "n_mels": int(_get("n_mels", args.n_mels, 40)),
        "n_fft": int(_get("n_fft", args.n_fft, 512)),
        "hop_length": int(_get("hop_length", args.hop_length, 160)),
        "duration": float(_get("duration", args.duration, 5.0)),
    }
    mel_params["input_shape"] = [
        mel_params["n_mels"],
        int(mel_params["duration"] * mel_params["sample_rate"] / mel_params["hop_length"]) + 1,
    ]

    for label, path in [("model", model_path), ("features", features_dir),
                        ("features_val", features_val_dir)]:
        if not path.exists():
            logger.error("%s not found: %s", label, path)
            sys.exit(1)

    report = compile_model(
        model_path=model_path,
        features_dir=features_dir,
        features_val_dir=features_val_dir,
        output_dir=output_dir,
        class_filter=class_filter,
        mel_params=mel_params,
        max_accuracy_drop=max_drop,
        forced_mode=forced_mode,
    )
    print(json.dumps({"best_mode": report["best_mode"],
                      **{k: v["size_kb"] for k, v in report["modes"].items()}}, indent=2))


if __name__ == "__main__":
    main()
