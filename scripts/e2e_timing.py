#!/usr/bin/env python
"""End-to-end pipeline timing: synth dataset -> extract train/val -> train
sweep -> TPE tune -> quantization benchmark -> post-opt selection, each
stage through its real CLI in a fresh subprocess (so every stage pays
process-fresh jit and exercises the persistent compilation cache exactly
like production use). Prints a stage table + one JSON line and writes
e2e_timing.json into the workdir.

The driver target (BASELINE.md row 3) is train->tune->optimize < 10 min on
one chip. Shape discipline keeps that robust on a COLD compile cache: every
shape-affecting hyperparameter (filters/strides/batch_size) is a small
categorical whose values the train stage already compiled, so TPE trials
only explore shape-free knobs (lr, dropout) and hit the cache; run
`--cold` to clear the cache first and measure the worst case.

Usage: python scripts/e2e_timing.py [--workdir /tmp/aep_e2e] [--cold]
       [--classes 27] [--per-class 75] [--trials 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def tunnel_probe(timeout_s: float = 700.0):
    """Objective tunnel-congestion marker: TWO consecutive fixed 8 MB
    host->device->host round trips (upload + trivial compute + fetch) in one
    KILLABLE subprocess, so a wedged backend can't hang the harness.

    Two trips because the tunnel has a documented per-process pathology that
    a single trip conflates with congestion: the FIRST synced fetch in a
    process can stall 20-300+ s on server-side program load/warmup even when
    the window is otherwise healthy (CLAUDE.md "tunnel pathologies"; measured
    2026-08-20: first trip 546 s, then 0.31 s steady-state in the same
    process). The SECOND trip is the real congestion signal. The default
    timeout therefore exceeds the worst measured warmup stall (546 s) —
    a 420 s default was observed mislabeling a window "dead" purely on
    warmup, while a direct probe minutes earlier read steady 0.39 s.

    Returns {"first_s": x, "steady_s": y} where each is seconds (float) or
    'timeout'/'failed rc=N'. Import/backend-init time is excluded — only the
    round trips are timed. Measured context: a healthy window fetches ~41 MB
    in ~1.5 s, so steady <= ~2 s is healthy; congested windows run
    10x-100x that."""
    trip = (
        "t0 = time.perf_counter();"
        "d = jax.device_put(x);"
        "y = np.asarray(jax.device_get(d + 1));"
        "print(round(time.perf_counter() - t0, 3), flush=True);"
    )
    code = (
        "import time, numpy as np, jax;"
        "x = np.ones((1024, 2048), np.float32);"  # 8 MB
        "jax.device_put(np.zeros(8, np.float32));"  # backend init outside the clock
        + trip + trip
    )
    out, fail = "", None
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True, env=os.environ.copy())
        out = r.stdout or ""
        if r.returncode != 0:
            fail = f"failed rc={r.returncode}"
    except subprocess.TimeoutExpired as exc:
        # partial output survives the kill: a completed first trip is still
        # a valid warmup measurement even when the second never ran
        out = exc.stdout or ""
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
        fail = "timeout"
    vals = []
    for ln in out.splitlines():
        try:
            vals.append(float(ln.strip()))
        except ValueError:
            pass
    return {"first_s": vals[0] if len(vals) > 0 else (fail or "unparseable"),
            "steady_s": vals[1] if len(vals) > 1 else (fail or "unparseable")}


def tunnel_health_label(probe) -> str:
    """Window label from a probe result (new two-trip dict or legacy float).
    Steady-state drives the label; a probe where even the first trip never
    completed is 'dead'. A completed-but-slow first trip with a healthy
    steady trip is the warmup pathology, NOT congestion — labeled healthy."""
    if isinstance(probe, dict):
        steady, first = probe.get("steady_s"), probe.get("first_s")
        if not isinstance(steady, float):
            # second trip never ran; all we know comes from the first
            steady = first
        probe = steady
    if not isinstance(probe, float):
        return "dead"
    if probe <= 2.0:
        return "healthy"
    if probe <= 10.0:
        return "moderate"
    return "congested"


def probe_steady(probe):
    """Steady-state seconds from a probe result, or None if unavailable."""
    if isinstance(probe, dict):
        probe = probe.get("steady_s")
    return probe if isinstance(probe, float) else None


def run_stage(name: str, argv: list[str], cwd: Path, timings: dict,
              env: dict | None = None) -> None:
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, *argv], cwd=cwd, text=True, env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    dt = time.perf_counter() - t0
    timings[name] = round(dt, 1)
    print(f"[{name:>22}] {dt:7.1f} s  rc={r.returncode}")
    if r.returncode != 0:
        print(r.stdout[-4000:])
        raise SystemExit(f"stage {name} failed")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/aep_e2e")
    p.add_argument("--cold", action="store_true", help="clear the persistent XLA cache first")
    p.add_argument("--cache-dir", default=None, help="persistent XLA cache location override")
    p.add_argument("--classes", type=int, default=27)  # the BASELINE.md target workload (fsc22: 27 x 75)
    p.add_argument("--per-class", type=int, default=75)
    p.add_argument("--trials", type=int, default=4)
    args = p.parse_args()

    work = Path(args.workdir)
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)
    cache_dir = Path(args.cache_dir) if args.cache_dir else Path.home() / ".cache" / "aep_tpu_jax"
    os.environ["JAX_COMPILATION_CACHE_DIR"] = str(cache_dir)
    if args.cold and cache_dir.exists():
        shutil.rmtree(cache_dir)
    existing = os.environ.get("PYTHONPATH", "")
    if str(REPO) not in existing.split(os.pathsep):
        # prepend the repo, keep the rest (the axon sitecustomize provides the TPU platform)
        os.environ["PYTHONPATH"] = str(REPO) + (os.pathsep + existing if existing else "")

    raw = work / "raw"
    feats = work / "processed"
    (work / "config").mkdir()

    # one canonical device-CNN shape family: the train stage compiles it,
    # every tune trial reuses it (filters/strides/batch fixed categorical)
    cnn_shapes = {"filters": [16, 64, 64], "first_stride": 4, "second_stride": 2, "batch_size": 32}

    extract_cfg = work / "extract.yaml"
    extract_cfg.write_text(f"""
dataset: {raw}/fsc22
loader: fsc22
experiments:
  - name: mel_train
    extractor: audio_mel_spec
    split: train
    output: {feats}/mel_train
    extractor_params: {{sample_rate: 16000, n_mels: 40, n_fft: 512, hop_length: 160, duration: 5.0}}
  - name: mel_val
    extractor: audio_mel_spec
    split: validation
    output: {feats}/mel_val
    extractor_params: {{sample_rate: 16000, n_mels: 40, n_fft: 512, hop_length: 160, duration: 5.0}}
""")

    train_cfg = work / "train.yaml"
    train_cfg.write_text(f"""
features_dir: {feats}/mel_train
features_test_dir: {feats}/mel_val
output_dir: {work}/models
experiment: e2e-timing
val_split: 0.2
mlflow_uri: {work}/mlruns
auto_select: true
auto_select_top_n: 3
runs:
  - model: cnn
    name: cnn_device
    params:
      filters: {cnn_shapes['filters']}
      first_stride: {cnn_shapes['first_stride']}
      second_stride: {cnn_shapes['second_stride']}
      batch_size: {cnn_shapes['batch_size']}
      epochs: 30
      learning_rate: 0.001
  - model: knn
    params: {{n_neighbors: 5}}
""")

    tune_cfg = work / "tune.yaml"
    tune_cfg.write_text(f"""
output_dir: {work}/tuned
experiment: e2e-timing-tune
features_dir: {feats}/mel_train
features_test: {feats}/mel_val
mlflow_uri: {work}/mlruns
n_trials: {args.trials}
sweep_epochs: 10
seed: 42
pruner: median
runs:
  - model: cnn
    search_space:
      # shape-affecting knobs pinned to the train-stage-compiled family;
      # TPE explores the shape-free continuous knobs
      filters: [{cnn_shapes['filters']}]
      first_stride: [{cnn_shapes['first_stride']}]
      second_stride: [{cnn_shapes['second_stride']}]
      batch_size: [{cnn_shapes['batch_size']}]
      dropout: {{type: float, low: 0.1, high: 0.5}}
      learning_rate: {{type: loguniform, low: 0.0005, high: 0.01}}
""")

    timings: dict = {}
    probe_before = tunnel_probe()
    print(f"[tunnel probe: before] {probe_before} s  ({tunnel_health_label(probe_before)})")
    t_all = time.perf_counter()
    run_stage("synth dataset",["tools/make_synth_dataset.py", str(raw),
                                "--classes", str(args.classes), "--per-class", str(args.per_class)],
              REPO, timings)
    run_stage("extract train+val", ["-m", "audio_edge_ml_pipeline_tpu.features.pipeline",
                                    "--config", str(extract_cfg)], work, timings)
    run_stage("train (cnn+knn)", ["-m", "audio_edge_ml_pipeline_tpu.train.train",
                                  "--config", str(train_cfg)], work, timings)
    run_stage(f"tune ({args.trials} trials)", ["-m", "audio_edge_ml_pipeline_tpu.train.tune",
                                               "--config", str(tune_cfg)], work, timings)
    # Quantized-model evaluation runs on HOST CPU: the reference's latency
    # convention is the onnxruntime CPU EP (quantize.py:345-352), the
    # emulated-quantization numerics are backend-identical, and the tiny
    # edge models make device dispatch pure overhead (through the shared
    # tunnel the same stage measured 27 s and 873 s on identical code).
    cpu_env = dict(os.environ)
    cpu_env["JAX_PLATFORMS"] = "cpu"
    cpu_env["PYTHONPATH"] = os.pathsep.join(
        x for x in cpu_env.get("PYTHONPATH", "").split(os.pathsep)
        if x and "axon" not in x
    )
    run_stage("optimize", ["-m", "audio_edge_ml_pipeline_tpu.optimize.optimize",
                           "--shortlist", str(work / "tuned" / "shortlist.json"),
                           "--output", str(work / "optimized"),
                           "--mlflow-uri", str(work / "mlruns")], work, timings,
              env=cpu_env)
    run_stage("select post-opt", ["-m", "audio_edge_ml_pipeline_tpu.train.select", "--post-opt",
                                  "--shortlist", str(work / "tuned" / "shortlist.json"),
                                  "--opt-dir", str(work / "optimized"),
                                  "--output", str(work / "best_model.json")], work, timings)

    core = sum(v for k, v in timings.items() if k.split(" ")[0] in ("train", "tune", "optimize"))
    total = round(time.perf_counter() - t_all, 1)
    probe_after = tunnel_probe()
    print(f"[tunnel probe: after ] {probe_after} s  ({tunnel_health_label(probe_after)})")
    # the worse of the two probes labels the window — congestion arriving
    # mid-run must not hide behind a healthy start
    s_before, s_after = probe_steady(probe_before), probe_steady(probe_after)
    if s_before is not None and s_after is not None:
        window = tunnel_health_label(max(s_before, s_after))
    else:
        window = "dead"
    summary = {
        "timings_s": timings,
        "tunnel_probe_s": {"before": probe_before, "after": probe_after,
                           "window": window, "probe_bytes": 8 * 1024 * 1024},
        "train_tune_optimize_s": round(core, 1),
        "train_tune_optimize_min": round(core / 60, 2),
        "target_met": core < 600,
        "total_s": total,
        "cold_cache": args.cold,
        "best_model": json.loads((work / "best_model.json").read_text()),
    }
    (work / "e2e_timing.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: summary[k] for k in
                      ("train_tune_optimize_min", "target_met", "cold_cache", "total_s",
                       "tunnel_probe_s")}))


if __name__ == "__main__":
    main()
