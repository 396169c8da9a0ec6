"""REST-backend tracking tests against an in-process stub MLflow server.

The stub implements the slice of the MLflow REST protocol the framework's
tracker speaks (experiments/create + get-by-name, runs/create + update,
runs/log-batch + log-metric + log-parameter + set-tag, runs/search,
runs/get, and the mlflow-artifacts HTTP proxy) — the same surface the
reference uses against its dockerized server (reference
docker/docker-compose.yaml:1-70, src/training/train.py:74,
src/training/select.py:106-150).
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from audio_edge_ml_pipeline_tpu.utils import tracking


class _StubState:
    def __init__(self):
        self.experiments = {}  # id -> {"experiment_id", "name"}
        self.runs = {}  # run_id -> {"info": {...}, "params": {}, "metrics": {}, "tags": {}}
        self.artifacts = {}  # path -> bytes
        self.next_exp = 1
        self.next_run = 1
        self.batch_calls = 0


class _Handler(BaseHTTPRequestHandler):
    state: _StubState = None  # set per server
    # When set, runs/create hands out artifact_uri as a LOCAL path under this
    # root (a server started with --default-artifact-root /shared/fs); when
    # None, the mlflow-artifacts: HTTP-proxy scheme is used.
    artifact_root: str = None

    def log_message(self, *a):  # silence
        pass

    def _json(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _payload(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n) or b"{}")

    def do_GET(self):
        st = self.state
        url = urllib.parse.urlparse(self.path)
        q = dict(urllib.parse.parse_qsl(url.query))
        if url.path.endswith("/experiments/get-by-name"):
            name = q.get("experiment_name")
            for e in st.experiments.values():
                if e["name"] == name:
                    return self._json(200, {"experiment": e})
            return self._json(
                404, {"error_code": "RESOURCE_DOES_NOT_EXIST", "message": f"no experiment {name}"}
            )
        if url.path.endswith("/runs/get"):
            run = st.runs.get(q.get("run_id"))
            if run is None:
                return self._json(404, {"error_code": "RESOURCE_DOES_NOT_EXIST", "message": "no run"})
            return self._json(200, {"run": self._run_obj(run)})
        return self._json(404, {"error_code": "ENDPOINT_NOT_FOUND", "message": url.path})

    def do_PUT(self):
        st = self.state
        marker = "/api/2.0/mlflow-artifacts/artifacts/"
        if marker in self.path:
            rel = urllib.parse.unquote(self.path.split(marker, 1)[1])
            n = int(self.headers.get("Content-Length") or 0)
            st.artifacts[rel] = self.rfile.read(n)
            return self._json(200, {})
        return self._json(404, {"error_code": "ENDPOINT_NOT_FOUND", "message": self.path})

    def _run_obj(self, run: dict) -> dict:
        return {
            "info": run["info"],
            "data": {
                "params": [{"key": k, "value": v} for k, v in run["params"].items()],
                "metrics": [{"key": k, "value": v} for k, v in run["metrics"].items()],
                "tags": [{"key": k, "value": v} for k, v in run["tags"].items()],
            },
        }

    def do_POST(self):
        st = self.state
        p = self._payload()
        path = self.path
        if path.endswith("/experiments/create"):
            for e in st.experiments.values():
                if e["name"] == p["name"]:
                    return self._json(
                        400, {"error_code": "RESOURCE_ALREADY_EXISTS", "message": p["name"]}
                    )
            eid = str(st.next_exp)
            st.next_exp += 1
            st.experiments[eid] = {"experiment_id": eid, "name": p["name"]}
            return self._json(200, {"experiment_id": eid})
        if path.endswith("/runs/create"):
            rid = f"r{st.next_run:08d}"
            st.next_run += 1
            exp_id = str(p["experiment_id"])
            if self.artifact_root:
                art_uri = f"{self.artifact_root}/{exp_id}/{rid}/artifacts"
            else:
                art_uri = f"mlflow-artifacts:/{exp_id}/{rid}/artifacts"
            info = {
                "run_id": rid,
                "run_uuid": rid,
                "experiment_id": exp_id,
                "run_name": p.get("run_name", rid[:8]),
                "status": "RUNNING",
                "start_time": p.get("start_time", 0),
                "artifact_uri": art_uri,
            }
            tags = {t["key"]: t["value"] for t in p.get("tags", [])}
            st.runs[rid] = {"info": info, "params": {}, "metrics": {}, "tags": tags}
            return self._json(200, {"run": {"info": info}})
        if path.endswith("/runs/update"):
            run = st.runs[p["run_id"]]
            run["info"]["status"] = p.get("status", run["info"]["status"])
            run["info"]["end_time"] = p.get("end_time")
            return self._json(200, {"run_info": run["info"]})
        if path.endswith("/runs/log-metric"):
            st.runs[p["run_id"]]["metrics"][p["key"]] = float(p["value"])
            return self._json(200, {})
        if path.endswith("/runs/log-parameter"):
            st.runs[p["run_id"]]["params"][p["key"]] = str(p["value"])
            return self._json(200, {})
        if path.endswith("/runs/set-tag"):
            st.runs[p["run_id"]]["tags"][p["key"]] = str(p["value"])
            return self._json(200, {})
        if path.endswith("/runs/log-batch"):
            st.batch_calls += 1
            run = st.runs[p["run_id"]]
            for m in p.get("metrics", []):
                run["metrics"][m["key"]] = float(m["value"])
            for pr in p.get("params", []):
                run["params"][pr["key"]] = str(pr["value"])
            for t in p.get("tags", []):
                run["tags"][t["key"]] = str(t["value"])
            return self._json(200, {})
        if path.endswith("/runs/search"):
            exp_ids = set(str(e) for e in p.get("experiment_ids", []))
            want_status = None
            filt = p.get("filter", "")
            if "attributes.status" in filt:
                want_status = filt.split("'")[1]
            runs = [
                self._run_obj(r)
                for r in st.runs.values()
                if str(r["info"]["experiment_id"]) in exp_ids
                and (want_status is None or r["info"]["status"] == want_status)
            ]
            runs.sort(key=lambda r: -int(r["info"].get("start_time") or 0))
            return self._json(200, {"runs": runs[: int(p.get("max_results", 500))]})
        return self._json(404, {"error_code": "ENDPOINT_NOT_FOUND", "message": path})


@pytest.fixture()
def stub_server():
    state = _StubState()
    handler = type("H", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    uri = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield uri, state
    finally:
        srv.shutdown()
        srv.server_close()
        tracking.set_tracking_uri(None)


def test_rest_round_trip_log_then_query(stub_server, tmp_path):
    uri, state = stub_server
    tracking.set_tracking_uri(uri)
    exp_id = tracking.set_experiment("rest-exp")
    assert exp_id == "1"

    art = tmp_path / "report.json"
    art.write_text('{"ok": true}')
    with tracking.start_run(run_name="svm_c1") as run:
        tracking.log_params({"model": "svm", "features_dir": "/tmp/f_train"})
        tracking.log_metrics({"val_accuracy": 0.91, "val_f1_macro": 0.90})
        tracking.set_tag("stage", "train")
        tracking.log_artifact(art)
    # second run, worse metric, to exercise ranking
    with tracking.start_run(run_name="svm_c2"):
        tracking.log_params({"model": "svm"})
        tracking.log_metrics({"val_accuracy": 0.80, "val_f1_macro": 0.78})

    # set_experiment resolves to the SAME id second time (get-by-name path)
    assert tracking.set_experiment("rest-exp") == exp_id

    recs = tracking.search_runs("rest-exp", status="FINISHED")
    assert [r.run_name for r in recs][:2] and len(recs) == 2
    by_name = {r.run_name: r for r in recs}
    assert by_name["svm_c1"].metrics["val_accuracy"] == pytest.approx(0.91)
    assert by_name["svm_c1"].params["model"] == "svm"
    assert by_name["svm_c1"].tags["stage"] == "train"
    assert by_name["svm_c1"].status == "FINISHED"
    # batching actually used (one batch per log_params/log_metrics call)
    assert state.batch_calls >= 3
    # artifact went through the mlflow-artifacts proxy
    art_keys = [k for k in state.artifacts if k.endswith("report.json")]
    assert art_keys and state.artifacts[art_keys[0]] == b'{"ok": true}'
    assert by_name["svm_c1"].run_id in art_keys[0]

    got = tracking.get_run(by_name["svm_c1"].run_id)
    assert got is not None and got.metrics["val_f1_macro"] == pytest.approx(0.90)
    assert tracking.get_run("does-not-exist") is None


def test_rest_failed_run_status_and_artifact_dir(stub_server, tmp_path):
    uri, state = stub_server
    tracking.set_tracking_uri(uri)
    tracking.set_experiment("rest-exp2")
    with pytest.raises(RuntimeError, match="boom"):
        with tracking.start_run(run_name="bad"):
            raise RuntimeError("boom")
    recs = tracking.search_runs("rest-exp2", status="FAILED")
    assert len(recs) == 1 and recs[0].run_name == "bad"
    # directory artifacts upload recursively under <dirname>/…
    d = tmp_path / "bundle"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_text("A")
    (d / "sub" / "b.txt").write_text("B")
    with tracking.start_run(run_name="arts") as run:
        run.log_artifact(d)
    assert any(k.endswith("bundle/a.txt") for k in state.artifacts)
    assert any(k.endswith("bundle/sub/b.txt") for k in state.artifacts)


def test_select_preopt_ranks_against_rest_backend(stub_server):
    uri, _ = stub_server
    tracking.set_tracking_uri(uri)
    tracking.set_experiment("sel-exp")
    for name, acc, f1 in [("m_lo", 0.70, 0.65), ("m_hi", 0.95, 0.94), ("m_mid", 0.85, 0.83)]:
        with tracking.start_run(run_name=name):
            tracking.log_params({"model": name})
            tracking.log_metrics({"val_accuracy": acc, "val_f1_macro": f1})
    from audio_edge_ml_pipeline_tpu.train.select import select_preopt

    ranked = select_preopt("sel-exp", mlflow_uri=uri, min_accuracy=0.75, top_n=5)
    assert [r["run_name"] for r in ranked] == ["m_hi", "m_mid"]


def test_unreachable_server_raises_tracking_error():
    tracking.set_tracking_uri("http://127.0.0.1:1")  # port 1: nothing listens
    try:
        with pytest.raises(tracking.TrackingServerError, match="unreachable"):
            tracking.set_experiment("nope")
    finally:
        tracking.set_tracking_uri(None)


# ---------------------------------------------------------------------------
# REST-mode full pipeline: the real stage CLIs (train sweep -> select ->
# optimize) in fresh subprocesses with MLFLOW_TRACKING_URI=http://<stub> and
# a shared-fs artifact root — the composition the reference runs against its
# dockerized server (reference train.py:74, select.py:106-150) — compared
# field-for-field against the identical pipeline on the file store.
# ---------------------------------------------------------------------------

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _cpu_env(tracking_uri: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)  # drop .axon_site -> no TPU plugin preimport
    env["JAX_PLATFORMS"] = "cpu"
    env["MLFLOW_TRACKING_URI"] = tracking_uri  # the reference's env contract
    return env


def _make_featuresets(root: Path) -> None:
    from audio_edge_ml_pipeline_tpu.features.base import FeatureSet
    from audio_edge_ml_pipeline_tpu.features.pipeline import FeaturePipeline

    def make(n_per_class, seed):
        rr = np.random.default_rng(seed)
        X, y = [], []
        for c in range(3):
            mu = np.zeros(24)
            mu[c * 8 : c * 8 + 8] = 1.3  # overlapping blobs: distinct model scores
            X.append(rr.normal(mu, 1.0, size=(n_per_class, 24)))
            y.append(np.full(n_per_class, c))
        X = np.concatenate(X).astype(np.float32)
        y = np.concatenate(y).astype(np.int32)
        idx = rr.permutation(len(X))
        return X[idx], y[idx]

    for name, (X, y) in [("synth_train", make(30, 1)), ("synth_val", make(8, 2))]:
        fs = FeatureSet(
            features=X, feature_type="classical", modality="audio",
            metadata=[{} for _ in range(len(X))], labels=y, label_names=["a", "b", "c"],
        )
        FeaturePipeline.save(fs, root / name)


def _run_pipeline(workdir: Path, feats: Path, tracking_uri: str) -> dict:
    """train(config sweep) -> select -> optimize via the production CLIs,
    each a fresh subprocess with MLFLOW_TRACKING_URI set. Returns the three
    JSON contracts."""
    env = _cpu_env(tracking_uri)
    workdir.mkdir(parents=True, exist_ok=True)
    out = workdir / "models"
    cfg = workdir / "training.yaml"
    cfg.write_text(
        f"""
features_dir: {feats / 'synth_train'}
output_dir: {out}
experiment: rest-pipe
val_split: 0.2
auto_select_top_n: 2
runs:
  - model: lda
  - model: knn
"""
    )

    def run(argv):
        r = subprocess.run([sys.executable, "-m", *argv], capture_output=True,
                           text=True, cwd=workdir, env=env)
        assert r.returncode == 0, f"{argv[0]} failed:\n{r.stdout}\n{r.stderr}"
        return r

    run(["audio_edge_ml_pipeline_tpu.train.train", "--config", str(cfg)])
    sl_train = json.loads((out / "shortlist.json").read_text())

    sl2_path = workdir / "sl2.json"
    run(["audio_edge_ml_pipeline_tpu.train.select",
         "--experiment", "rest-pipe", "--top-n", "2",
         "--output", str(sl2_path),
         "--features-eval-dir", str(feats / "synth_val")])
    sl2 = json.loads(sl2_path.read_text())

    opt_dir = workdir / "optimized"
    run(["audio_edge_ml_pipeline_tpu.optimize.optimize",
         "--shortlist", str(sl2_path),
         "--features", str(feats / "synth_train"),
         "--features-eval", str(feats / "synth_val"),
         "--output", str(opt_dir), "--experiment", "rest-pipe-opt"])
    reports = {}
    for p in sorted(opt_dir.glob("*/optimization_report.json")):
        rep = json.loads(p.read_text())
        reports[rep["model_name"]] = rep
    return {"shortlist": sl_train, "select": sl2, "reports": reports}


def test_rest_mode_full_pipeline_matches_file_mode(tmp_path):
    feats = tmp_path / "feats"
    _make_featuresets(feats)

    # REST mode: stub server with a shared-fs artifact root (the client's
    # local-path artifact branch; optimize reads model bundles back from the
    # same paths, exactly like a --default-artifact-root /shared/fs server)
    art_root = tmp_path / "artifacts_sharedfs"
    state = _StubState()
    handler = type("H", (_Handler,), {"state": state, "artifact_root": str(art_root)})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rest = _run_pipeline(tmp_path / "rest", feats, f"http://127.0.0.1:{srv.server_address[1]}")
    finally:
        srv.shutdown()
        srv.server_close()

    # identical pipeline on the default file store
    filed = _run_pipeline(tmp_path / "filed", feats, str(tmp_path / "filed" / "mlruns"))

    # schema parity: identical key sets in every contract file
    for key in ("shortlist", "select"):
        assert set(rest[key]) == set(filed[key])
        assert all(set(c) == set(filed[key]["candidates"][0]) for c in rest[key]["candidates"])

    # ranking parity: same models, same order, same metrics
    def ranking(doc):
        return [(c["rank"], c["model"], round(c["val_accuracy"], 6), round(c["val_f1_macro"], 6))
                for c in doc["candidates"]]

    assert ranking(rest["shortlist"]) == ranking(filed["shortlist"])
    assert ranking(rest["select"]) == ranking(filed["select"])
    assert len(rest["shortlist"]["candidates"]) == 2

    # the REST run's models were trained, logged, and re-read through the
    # shared-fs artifact root the stub handed out
    assert any(art_root.rglob("*.npz")) or any(art_root.rglob("*.joblib"))
    for c in rest["shortlist"]["candidates"]:
        assert c["artifact_uri"].startswith(str(art_root))

    # optimization reports: same models optimized, same schema, same
    # quantization modes evaluated, same selected method
    assert set(rest["reports"]) == set(filed["reports"]) == {"lda", "knn"}
    for m in rest["reports"]:
        assert set(rest["reports"][m]) == set(filed["reports"][m])
        rb, fb = rest["reports"][m]["benchmark_results"], filed["reports"][m]["benchmark_results"]
        assert set(rb) == set(fb)
        assert (rest["reports"][m]["quantization_method"]
                == filed["reports"][m]["quantization_method"])

    # and the REST store actually holds the whole composition's runs
    names = {r["info"]["run_name"] for r in (
        {"info": run["info"]} for run in state.runs.values())}
    assert any("lda" in n for n in names) and any("knn" in n for n in names)
