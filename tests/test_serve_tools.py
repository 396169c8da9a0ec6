"""Serving layer (ingestion API, dashboard, edge simulator) + device tools
(generate_split, serial protocol, export_svm bundle)."""

import json
import os
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# Ingestion API
# ---------------------------------------------------------------------------


def test_ingestion_api_upload_and_health(tmp_path):
    import requests

    from audio_edge_ml_pipeline_tpu.serve.api import create_server

    server = create_server(tmp_path / "uploads", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        r = requests.get(f"http://127.0.0.1:{port}/health", timeout=5)
        assert r.status_code == 200 and r.json() == {"status": "ok"}
        wav_bytes = b"RIFF" + b"\x00" * 40  # content is opaque to the API
        r = requests.post(
            f"http://127.0.0.1:{port}/upload",
            files={"file": ("clip.wav", wav_bytes, "audio/wav")},
            data={"device_id": "sim0", "confidence": "0.42"},
            timeout=5,
        )
        assert r.status_code == 200, r.text
        file_id = r.json()["id"]
        stored = tmp_path / "uploads" / f"{file_id}.wav"
        assert stored.exists() and stored.read_bytes() == wav_bytes
        meta = json.loads((tmp_path / "uploads" / f"{file_id}.json").read_text())
        assert meta["device_id"] == "sim0" and meta["filename"] == "clip.wav"
        # probe: bad route + missing file field
        assert requests.get(f"http://127.0.0.1:{port}/nope", timeout=5).status_code == 404
        r = requests.post(f"http://127.0.0.1:{port}/upload", files={"other": ("x", b"1")}, timeout=5)
        assert r.status_code == 400
    finally:
        server.shutdown()


# ---------------------------------------------------------------------------
# Dashboard
# ---------------------------------------------------------------------------


def test_dashboard_render(tmp_path):
    from audio_edge_ml_pipeline_tpu.serve.dashboard import load_stats, load_telemetry, render

    tdir = tmp_path / "telemetry"
    sdir = tmp_path / "stats"
    tdir.mkdir()
    sdir.mkdir()
    events = [
        {"timestamp": "t1", "prediction": "Fire", "confidence": 0.9, "uploaded": False},
        {"timestamp": "t2", "prediction": "Rain", "confidence": 0.4, "uploaded": True},
    ]
    (tdir / "dev1_telemetry.jsonl").write_text("\n".join(json.dumps(e) for e in events))
    (sdir / "dev1_stats.json").write_text(json.dumps({"total_inferences": 2, "avg_confidence": 0.65, "uploads": 1}))
    page = render(load_telemetry(tdir), load_stats(sdir))
    assert "dev1" in page and "Fire" in page and "Rain" in page
    assert "0.650" in page


def test_dashboard_png_charts(tmp_path):
    """The graphical panels (fleet overview + per-device timeline/histogram/
    distribution) render as embedded base64 PNGs from sample telemetry and
    decode back to real PNG bytes."""
    import base64
    import re

    pytest.importorskip("matplotlib")
    from audio_edge_ml_pipeline_tpu.serve.dashboard import (
        load_stats,
        load_telemetry,
        render,
        render_device_charts,
        render_fleet_charts,
    )

    tdir = tmp_path / "telemetry"
    tdir.mkdir()
    rng = np.random.default_rng(3)
    classes = ["Fire", "Rain", "Wind"]
    for dev in ("devA", "devB"):
        events = []
        for i in range(30):
            c = classes[int(rng.integers(0, 3))]
            events.append(
                {
                    "timestamp": f"2026-08-19T10:{i // 60:02d}:{i % 60:02d}",
                    "device_id": dev,
                    "true_class": c,
                    "prediction": c if rng.random() > 0.2 else classes[0],
                    "confidence": float(rng.uniform(0.2, 1.0)),
                    "uploaded": bool(rng.random() < 0.1),
                }
            )
        (tdir / f"{dev}_telemetry.jsonl").write_text("\n".join(json.dumps(e) for e in events))

    telemetry = load_telemetry(tdir)
    fleet = render_fleet_charts(telemetry)
    dev = render_device_charts("devA", telemetry["devA"])
    for fragment in (fleet, dev):
        m = re.search(r"base64,([A-Za-z0-9+/=]+)", fragment)
        assert m, "no embedded PNG in chart fragment"
        png = base64.b64decode(m.group(1))
        assert png[:8] == b"\x89PNG\r\n\x1a\n" and len(png) > 2000

    page = render(telemetry, load_stats(tmp_path / "nostats"))
    # one fleet panel + one panel per device, all inline PNGs
    assert page.count("base64,") == 3
    # the text tables survive as the data fallback alongside the charts
    assert "class distribution" in page and "recent events" in page


# ---------------------------------------------------------------------------
# Edge simulator
# ---------------------------------------------------------------------------


def test_edge_simulator(tmp_path):
    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav
    from audio_edge_ml_pipeline_tpu.models import get_model
    from audio_edge_ml_pipeline_tpu.ops import dsp
    from audio_edge_ml_pipeline_tpu.serve.edge_simulator import EdgeDeviceSimulator

    # tiny dataset of 1 s clips + a CNN trained on their mel features
    sr, dur = 16000, 1.0
    ds = tmp_path / "clips"
    feats, labels = [], []
    for c, name in enumerate(["low", "high"]):
        d = ds / name
        d.mkdir(parents=True)
        for i in range(6):
            t = np.arange(int(sr * dur)) / sr
            y = (0.5 * np.sin(2 * np.pi * (250 + 900 * c) * t)).astype(np.float32)
            y += 0.02 * np.random.default_rng(c * 10 + i).standard_normal(len(y)).astype(np.float32)
            write_wav(d / f"{i}.wav", y, sr)
            mel = np.asarray(dsp.mel_spec_feature(y[None], sr=sr, n_mels=16, n_fft=512, hop_length=160))[0]
            feats.append(mel)
            labels.append(c)
    X = np.stack(feats).astype(np.float32)
    y = np.array(labels, np.int32)
    trainer = get_model("cnn")(epochs=8, batch_size=8, filters=[8], learning_rate=5e-3)
    trainer.fit(X[:10], y[:10], X[10:], y[10:], ["low", "high"], "sim", tmp_path / "run", None)

    sim = EdgeDeviceSimulator(
        tmp_path / "run" / "model.flax.npz", ["low", "high"], ds,
        device_id="dev9", api_url=None, upload_threshold=0.0,
        telemetry_dir=tmp_path / "telemetry", stats_dir=tmp_path / "stats",
        mel_params={"sample_rate": sr, "n_mels": 16, "n_fft": 512, "hop_length": 160, "duration": dur},
    )
    sim.run(5)
    lines = (tmp_path / "telemetry" / "dev9_telemetry.jsonl").read_text().strip().splitlines()
    assert len(lines) == 5
    ev = json.loads(lines[0])
    assert ev["prediction"] in ("low", "high") and 0 <= ev["confidence"] <= 1
    stats = json.loads((tmp_path / "stats" / "dev9_stats.json").read_text())
    assert stats["total_inferences"] == 5

    # fleet mode (ADVICE r2): ids get an explicit "-N" suffix — plain
    # concatenation made "sim0"+1 == "sim01", ambiguous with a real sim01
    from audio_edge_ml_pipeline_tpu.serve import edge_simulator

    labels_f = tmp_path / "label_names.json"
    labels_f.write_text(json.dumps(["low", "high"]))
    mel_f = tmp_path / "mel_params.json"
    mel_f.write_text(json.dumps(
        {"sample_rate": sr, "n_mels": 16, "n_fft": 512, "hop_length": 160, "duration": dur}))
    cwd = os.getcwd()
    os.chdir(tmp_path)  # default telemetry dirs are cwd-relative
    try:
        edge_simulator.main([
            "--model", str(tmp_path / "run" / "model.flax.npz"),
            "--labels", str(labels_f), "--dataset", str(ds),
            "--mel-params", str(mel_f), "--num-devices", "3", "--n", "2",
        ])
    finally:
        os.chdir(cwd)
    seen = sorted(p.name for p in (tmp_path / "data" / "telemetry").glob("*.jsonl"))
    assert seen == ["sim0-1_telemetry.jsonl", "sim0-2_telemetry.jsonl", "sim0_telemetry.jsonl"]


# ---------------------------------------------------------------------------
# Tools: split manifest, serial protocol, export_svm
# ---------------------------------------------------------------------------


def test_generate_split_cli_and_drift_guard(tmp_path):
    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav

    root = tmp_path / "audio"
    for c in ("a", "b"):
        d = root / c
        d.mkdir(parents=True)
        for i in range(10):
            write_wav(d / f"{i}.wav", np.zeros(800, np.float32), 16000)
    cmd = [sys.executable, str(REPO / "tools/generate_split.py"), "--dataset", str(root)]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    manifest = json.loads((root / "split_manifest.json").read_text())
    # per class of 10: round(7)=7 train, round(1.5)=2 val, remainder 1 test
    assert len(manifest["train"]) == 14 and len(manifest["val"]) == 4 and len(manifest["test"]) == 2
    # identical rerun: no drift, succeeds
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0
    # different seed would drift -> guard refuses without --force
    r = subprocess.run(cmd + ["--seed", "7"], capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 1 and "DRIFT GUARD" in r.stdout
    r = subprocess.run(cmd + ["--seed", "7", "--force"], capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0


def test_serial_protocol_roundtrip():
    import serial_proto as sp

    ser = sp.LoopbackSerial()
    feat = np.random.default_rng(0).random((8, 11)).astype(np.float32)
    sp.write_feat_frame(ser, feat)
    # garbage before the frame must be skipped by magic sync
    ser._rx[:0] = b"junkbytes"
    got = sp.read_feat_frame(ser)
    np.testing.assert_array_equal(got, feat)

    pcm = (np.random.default_rng(1).integers(-3000, 3000, 640)).astype(np.int16)
    sp.write_pcm_frame(ser, pcm)
    got_pcm = sp.read_pcm_frame(ser)
    np.testing.assert_array_equal(got_pcm, pcm)

    # EVAL protocol: fake device replies on 'R'
    def on_write(s, data):
        if data == b"R":
            s.feed(b"PRED Fire\nSCORES 0.1 0.7 0.2\nEVAL_DONE\n")

    dev = sp.LoopbackSerial(on_write=on_write)
    pred, scores = sp.eval_roundtrip(dev)
    assert pred == "Fire"
    np.testing.assert_allclose(scores, [0.1, 0.7, 0.2])


def test_evaluate_device_with_loopback(tmp_path):
    import serial_proto as sp
    from evaluate_device import evaluate

    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav

    ds = tmp_path / "audio"
    clips = []
    for c in ("a", "b"):
        d = ds / c
        d.mkdir(parents=True)
        for i in range(3):
            p = d / f"{i}.wav"
            write_wav(p, np.zeros(160, np.float32), 16000)
            clips.append((p, c))

    answers = iter([c for _, c in clips])

    def on_write(s, data):
        if data == b"R":
            label = next(answers)
            s.feed(f"PRED {label}\nSCORES 0.9 0.1\nEVAL_DONE\n".encode())

    ser = sp.LoopbackSerial(on_write=on_write)
    metrics = evaluate(ser, clips, ["a", "b"], playback=False, output_dir=tmp_path / "eval")
    assert metrics["val_accuracy"] == 1.0
    assert (tmp_path / "eval" / "classification_report.txt").exists()


def test_export_svm_bundle_matches_sklearn(tmp_path):
    from sklearn.decomposition import PCA
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    import joblib

    from audio_edge_ml_pipeline_tpu.deploy.export_svm import export_bundle

    r = np.random.default_rng(0)
    X = np.concatenate([r.normal(c * 2, 1, (40, 30)) for c in range(3)]).astype(np.float64)
    y = np.concatenate([np.full(40, c) for c in range(3)])
    pipe = Pipeline(
        [("scaler", StandardScaler()), ("pca", PCA(n_components=8, random_state=0)),
         ("svm", SVC(kernel="linear"))]
    )
    pipe.fit(X, y)
    joblib.dump(pipe, tmp_path / "pca_svm.joblib")
    out = export_bundle(tmp_path / "pca_svm.joblib", tmp_path / "bundle", ["a", "b", "c"])
    for f in ("scaler_mean.npy", "pca_components.npy", "svm_coef.npy", "mel_fb.npy", "dct.npy",
              "label_names.json", "feature_params.json", "nicla_main.py"):
        assert (out / f).exists(), f
    # reimplement the ulab runtime's predict in numpy and compare to sklearn
    sm = np.load(out / "scaler_mean.npy")
    ss = np.load(out / "scaler_scale.npy")
    pc = np.load(out / "pca_components.npy")
    pm = np.load(out / "pca_mean.npy")
    coef = np.load(out / "svm_coef.npy")
    inter = np.load(out / "svm_intercept.npy")
    n_classes = 3
    correct = 0
    for i in range(len(X)):
        z = pc @ (((X[i] - sm) / ss) - pm)
        d = coef @ z + inter
        votes = np.zeros(n_classes)
        k = 0
        for a in range(n_classes):
            for b in range(a + 1, n_classes):
                votes[a if d[k] > 0 else b] += 1
                k += 1
        if votes.argmax() == pipe.predict(X[i : i + 1])[0]:
            correct += 1
    assert correct / len(X) >= 0.975  # OvO tie-breaks may differ on ~1 sample

    # RBF kernel must be rejected
    pipe_rbf = Pipeline([("scaler", StandardScaler()), ("pca", PCA(n_components=8)), ("svm", SVC())])
    pipe_rbf.fit(X, y)
    joblib.dump(pipe_rbf, tmp_path / "rbf.joblib")
    with pytest.raises(ValueError, match="linear"):
        export_bundle(tmp_path / "rbf.joblib", tmp_path / "bundle2", ["a", "b", "c"])


def test_gen_prototypes_skips_empty_class_consistently(tmp_path):
    """ADVICE r2: a requested class with no samples must drop from BOTH the
    name list and the emitted arrays, keeping PROTO_N_CLASSES / proto_N /
    PROTOTYPES consistent (previously the header referenced undefined
    symbols)."""
    import sys
    sys.path.insert(0, str(REPO / "tools"))
    import gen_prototypes

    feats = tmp_path / "fs"
    feats.mkdir()
    np.save(feats / "features.npy", np.random.default_rng(0).random((6, 4)).astype(np.float32))
    np.save(feats / "labels.npy", np.array([0, 0, 1, 1, 1, 0], np.int64))  # class 2 empty
    (feats / "label_names.json").write_text(json.dumps(["a", "b", "c"]))

    out = tmp_path / "prototypes.h"
    gen_prototypes.generate(feats, out, classes=["a", "c", "b"])
    text = out.read_text()
    assert "#define PROTO_N_CLASSES 2" in text
    assert "proto_0" in text and "proto_1" in text and "proto_2" not in text
    assert "/* a */" in text and "/* b */" in text and "/* c */" not in text

    # all requested classes empty -> explicit error, not an IndexError
    with pytest.raises(SystemExit):
        gen_prototypes.generate(feats, out, classes=["c"])


def test_serve_loop_simulator_api_telemetry_dashboard(tmp_path):
    """The reference's monitoring topology run once AS A LOOP (reference
    edge_simulator.py:15-386 POSTing to api.py:12-46, dashboard.py:12-70
    reading what the simulator wrote): edge simulator -> live HTTP ingestion
    API (confidence-gated upload) -> telemetry JSONL + device stats ->
    dashboard rendered from those files."""
    import threading

    from audio_edge_ml_pipeline_tpu.data.audio_io import write_wav
    from audio_edge_ml_pipeline_tpu.models import get_model
    from audio_edge_ml_pipeline_tpu.ops import dsp
    from audio_edge_ml_pipeline_tpu.serve.api import create_server
    from audio_edge_ml_pipeline_tpu.serve.dashboard import load_stats, load_telemetry, render
    from audio_edge_ml_pipeline_tpu.serve.edge_simulator import EdgeDeviceSimulator

    sr, dur = 16000, 1.0
    ds = tmp_path / "clips"
    feats, labels = [], []
    for c, name in enumerate(["low", "high"]):
        d = ds / name
        d.mkdir(parents=True)
        for i in range(4):
            t = np.arange(int(sr * dur)) / sr
            y = (0.5 * np.sin(2 * np.pi * (250 + 900 * c) * t)).astype(np.float32)
            y += 0.02 * np.random.default_rng(c * 10 + i).standard_normal(len(y)).astype(np.float32)
            write_wav(d / f"{i}.wav", y, sr)
            mel = np.asarray(dsp.mel_spec_feature(y[None], sr=sr, n_mels=16, n_fft=512, hop_length=160))[0]
            feats.append(mel)
            labels.append(c)
    X = np.stack(feats).astype(np.float32)
    y = np.array(labels, np.int32)
    trainer = get_model("cnn")(epochs=4, batch_size=8, filters=[8], learning_rate=5e-3)
    trainer.fit(X[:6], y[:6], X[6:], y[6:], ["low", "high"], "loop", tmp_path / "run", None)

    server = create_server(tmp_path / "uploads", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        sim = EdgeDeviceSimulator(
            tmp_path / "run" / "model.flax.npz", ["low", "high"], ds,
            device_id="loopdev", api_url=f"http://127.0.0.1:{port}",
            upload_threshold=1.1,  # every inference is below threshold -> POSTs
            telemetry_dir=tmp_path / "telemetry", stats_dir=tmp_path / "stats",
            mel_params={"sample_rate": sr, "n_mels": 16, "n_fft": 512,
                        "hop_length": 160, "duration": dur},
        )
        sim.run(6)
    finally:
        server.shutdown()

    # telemetry: every event marked uploaded (the live POST succeeded)
    lines = (tmp_path / "telemetry" / "loopdev_telemetry.jsonl").read_text().strip().splitlines()
    events = [json.loads(l) for l in lines]
    assert len(events) == 6 and all(e["uploaded"] for e in events)

    # API side: one stored wav + sidecar per upload, sidecars carrying the
    # simulator's device/prediction/confidence fields that match telemetry
    sidecars = sorted((tmp_path / "uploads").glob("*.json"))
    wavs = sorted((tmp_path / "uploads").glob("*.wav"))
    assert len(sidecars) == len(wavs) == 6
    metas = [json.loads(p.read_text()) for p in sidecars]
    assert all(m["device_id"] == "loopdev" for m in metas)
    assert sorted(m["filename"] for m in metas) == sorted(e["clip"] for e in events)
    assert {m["prediction"] for m in metas} <= {"low", "high"}
    assert all(0.0 <= float(m["confidence"]) <= 1.0 for m in metas)

    # dashboard renders from the very files the loop wrote
    telemetry = load_telemetry(tmp_path / "telemetry")
    stats = load_stats(tmp_path / "stats")
    page = render(telemetry, stats)
    assert "loopdev" in page
    assert any(e["prediction"] in page for e in events)
    assert "6" in page  # total_inferences reflected
    try:
        import matplotlib  # noqa: F401
        assert page.count("base64,") >= 2  # fleet panel + device panel PNGs
    except ImportError:
        pass
