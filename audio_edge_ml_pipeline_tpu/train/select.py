"""Stage 5 — model selection (two-checkpoint design).

1. Pre-optimisation: rank FINISHED tracking runs by a quality metric with an
   optional accuracy floor -> shortlist.json (schema of reference
   select.py:234-260, including the `_train -> _val` features_eval_dir
   convention inference, select.py:127-134).
2. Post-optimisation: read Stage 6 optimization_report.json files, apply the
   hard --max-size-kb bound against real optimized sizes, rank (ascending
   for latency metrics), write best_model.json (select.py:270-448).

CLI:
    python -m audio_edge_ml_pipeline_tpu.train.select --experiment <name>
        [--min-accuracy 0.7] [--metric val_f1_macro] [--top-n 5]
        [--output shortlist.json]
    python -m audio_edge_ml_pipeline_tpu.train.select --post-opt
        --shortlist shortlist.json --opt-dir data/models/optimized
        [--max-size-kb 256] [--metric val_accuracy_optimized] [--ascending]
"""

from __future__ import annotations

import argparse
import json
import logging
from datetime import datetime
from pathlib import Path
from typing import Optional

from ..utils import tracking
from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)


def _fetch_runs(experiment: str, mlflow_uri: Optional[str]) -> list[dict]:
    tracking.set_tracking_uri(mlflow_uri)
    records = []
    for run in tracking.search_runs(experiment, status="FINISHED", max_results=500):
        p, m = run.params, run.metrics
        features_dir = p.get("features_dir")
        features_eval_dir = p.get("features_eval_dir")
        if features_eval_dir is None and features_dir:
            candidate = features_dir.replace("_train", "_val")
            if candidate != features_dir and Path(candidate).exists():
                features_eval_dir = candidate
        records.append(
            {
                "run_id": run.run_id,
                "run_name": run.run_name or run.run_id[:8],
                "model": p.get("model", "unknown"),
                "val_accuracy": m.get("val_accuracy"),
                "val_f1_macro": m.get("val_f1_macro"),
                "model_size_kb": m.get("model_size_kb"),
                "params": p,
                "metrics": m,
                "artifact_uri": run.artifact_uri,
                "features_dir": features_dir,
                "features_eval_dir": features_eval_dir,
                "class_filter": p.get("class_filter"),
            }
        )
    return records


def _rank_runs(records: list[dict], metric: str, min_accuracy: Optional[float]) -> list[dict]:
    survivors = []
    for r in records:
        if r.get("val_accuracy") is None:
            continue
        if min_accuracy is not None and (r["val_accuracy"] or 0.0) < min_accuracy:
            continue
        rank_val = r.get("metrics", {}).get(metric) or r.get(metric)
        if rank_val is None:
            continue
        r["_rank_metric"] = float(rank_val)
        survivors.append(r)
    survivors.sort(key=lambda r: r["_rank_metric"], reverse=True)
    return survivors


def select_preopt(
    experiment: str,
    mlflow_uri: Optional[str] = None,
    metric: str = "val_f1_macro",
    min_accuracy: Optional[float] = None,
    top_n: int = 5,
) -> list[dict]:
    records = _fetch_runs(experiment, mlflow_uri)
    return _rank_runs(records, metric, min_accuracy)[:top_n]


def write_shortlist(
    records: list[dict],
    path: Path,
    experiment: str,
    metric: str = "val_f1_macro",
    features_eval_dir_override: Optional[str] = None,
) -> None:
    candidates = [
        {
            "rank": i + 1,
            "run_id": r["run_id"],
            "run_name": r.get("run_name"),
            "model": r.get("model"),
            "val_accuracy": r.get("val_accuracy"),
            "val_f1_macro": r.get("val_f1_macro"),
            "model_size_kb": r.get("model_size_kb"),
            "params": r.get("params", {}),
            "artifact_uri": r.get("artifact_uri"),
            "features_dir": r.get("features_dir"),
            "features_eval_dir": features_eval_dir_override or r.get("features_eval_dir"),
            "class_filter": r.get("class_filter"),
        }
        for i, r in enumerate(records)
    ]
    out = {
        "experiment": experiment,
        "metric": metric,
        "n_candidates": len(candidates),
        "generated_at": datetime.now().isoformat(timespec="seconds"),
        "candidates": candidates,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2))
    logger.info("Shortlist (%d candidates) written: %s", len(candidates), path)


def select_postopt(
    shortlist_path: Path,
    opt_dir: Path,
    max_size_kb: Optional[float] = None,
    metric: str = "val_accuracy_optimized",
    ascending: bool = False,
) -> Optional[dict]:
    shortlist_path = Path(shortlist_path)
    if not shortlist_path.exists():
        raise FileNotFoundError(f"Shortlist not found: {shortlist_path}")
    shortlist = json.loads(shortlist_path.read_text()).get("candidates", [])
    if not shortlist:
        logger.warning("Shortlist is empty — nothing to evaluate.")
        return None
    results = []
    for candidate in shortlist:
        model_name = candidate.get("model", "unknown")
        run_name = candidate.get("run_name") or model_name
        report_path = Path(opt_dir) / run_name / "optimization_report.json"
        if not report_path.exists():
            report_path = Path(opt_dir) / model_name / "optimization_report.json"
        if not report_path.exists():
            logger.warning("No optimization_report.json for %r — skipping.", run_name)
            continue
        report = json.loads(report_path.read_text())
        if max_size_kb is not None:
            opt_size = report.get("optimized_size_kb")
            if opt_size is not None and opt_size > max_size_kb:
                continue
        rank_val = report.get(metric)
        if rank_val is None:
            continue
        report["_rank_metric"] = float(rank_val)
        report["_shortlist_candidate"] = candidate
        results.append(report)
    if not results:
        return None
    results.sort(key=lambda r: r["_rank_metric"], reverse=not ascending)
    _print_postopt_table(results, metric, ascending)
    return results[0]


def _fmt_float(v, width: int) -> str:
    return "N/A".rjust(width) if v is None else f"{float(v):.4f}".rjust(width)


def print_preopt_table(records: list[dict], metric: str, top_n: int) -> None:
    header = (
        f"{'#':>4}  {'Model':<16}  {'Run name':<32}  {'Accuracy':>10}  "
        f"{'F1-macro':>10}  {'Size (KB)':>10}  {'Rank (' + metric[:12] + ')':>18}  {'Run ID':<12}"
    )
    sep = "-" * len(header)
    print(f"\n{sep}\n{header}\n{sep}")
    for i, r in enumerate(records[:top_n], start=1):
        mark = " *" if i == 1 else "  "
        print(
            f"{i:>4}{mark}{r.get('model', '?'):<16}  {(r.get('run_name') or '')[:32]:<32}  "
            f"{_fmt_float(r.get('val_accuracy'), 10)}  {_fmt_float(r.get('val_f1_macro'), 10)}  "
            f"{_fmt_float(r.get('model_size_kb'), 10)}  {_fmt_float(r.get('_rank_metric'), 18)}  "
            f"{r['run_id'][:12]}"
        )
    print(sep)
    print(f"  * Shortlist #1  |  Top {min(top_n, len(records))} of {len(records)} qualifying run(s).\n")


def _print_postopt_table(results: list[dict], metric: str, ascending: bool = False) -> None:
    direction = "asc" if ascending else "desc"
    header = (
        f"{'#':>4}  {'Run name':<32}  {'Opt size (KB)':>14}  {'Orig size (KB)':>15}  "
        f"{'Acc (opt)':>10}  {'Acc drop':>10}  {'Rank (' + metric[:10] + ') ' + direction:>22}"
    )
    sep = "-" * len(header)
    print(f"\n{sep}\n{header}\n{sep}")
    for i, r in enumerate(results, start=1):
        mark = " *" if i == 1 else "  "
        label = r.get("run_name") or r.get("model_name", "?")
        print(
            f"{i:>4}{mark}{label[:32]:<32}  {_fmt_float(r.get('optimized_size_kb'), 14)}  "
            f"{_fmt_float(r.get('original_size_kb'), 15)}  {_fmt_float(r.get('val_accuracy_optimized'), 10)}  "
            f"{_fmt_float(r.get('accuracy_drop'), 10)}  {_fmt_float(r.get('_rank_metric'), 22)}"
        )
    print(sep)
    print(f"  * Best post-optimisation model  |  {len(results)} model(s) evaluated.\n")


def write_best(report: dict, path: Path, experiment: str) -> None:
    candidate = report.get("_shortlist_candidate", {})
    out = {
        "run_id": report.get("run_id") or candidate.get("run_id"),
        "run_name": report.get("run_name") or candidate.get("run_name"),
        "model": report.get("model_name") or candidate.get("model"),
        "optimized_model_path": report.get("optimized_model_path"),
        "original_size_kb": report.get("original_size_kb"),
        "optimized_size_kb": report.get("optimized_size_kb"),
        "compression_ratio": report.get("compression_ratio"),
        "quantization_method": report.get("quantization_method"),
        "val_accuracy_original": report.get("val_accuracy_original"),
        "val_accuracy_optimized": report.get("val_accuracy_optimized"),
        "accuracy_drop": report.get("accuracy_drop"),
        "latency_ms": report.get("latency_ms"),
        "params": candidate.get("params", {}),
        "experiment": experiment,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2))
    logger.info("Best model written: %s", path)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m audio_edge_ml_pipeline_tpu.train.select",
        description="Stage 5 — Model Selection (two-checkpoint design)",
    )
    p.add_argument("--post-opt", action="store_true")
    p.add_argument("--experiment", default="ml-pipeline")
    p.add_argument("--mlflow-uri", default=None)
    p.add_argument("--metric", default=None)
    p.add_argument("--min-accuracy", type=float, default=None)
    p.add_argument("--top-n", type=int, default=5)
    p.add_argument("--output", default=None)
    p.add_argument("--shortlist", default=None)
    p.add_argument("--opt-dir", default=None)
    p.add_argument("--max-size-kb", type=float, default=None)
    p.add_argument("--ascending", action="store_true")
    return p


def main(argv=None) -> None:
    setup_logging()
    args = build_parser().parse_args(argv)
    if args.post_opt:
        if not args.shortlist or not args.opt_dir:
            build_parser().error("--post-opt requires --shortlist and --opt-dir")
        metric = args.metric or "val_accuracy_optimized"
        best = select_postopt(
            Path(args.shortlist), Path(args.opt_dir),
            max_size_kb=args.max_size_kb, metric=metric, ascending=args.ascending,
        )
        if best is None:
            print("No model qualified post-optimisation.")
            return
        out = Path(args.output or Path(args.opt_dir) / "best_model.json")
        experiment = json.loads(Path(args.shortlist).read_text()).get("experiment", "")
        write_best(best, out, experiment)
    else:
        metric = args.metric or "val_f1_macro"
        candidates = select_preopt(
            experiment=args.experiment, mlflow_uri=args.mlflow_uri,
            metric=metric, min_accuracy=args.min_accuracy, top_n=args.top_n,
        )
        print_preopt_table(candidates, metric, args.top_n)
        if candidates:
            out = Path(args.output or "data/models/shortlist.json")
            write_shortlist(candidates, out, args.experiment, metric)


if __name__ == "__main__":
    main()
