"""Codegen: generate a C project from a trained CNN bundle, compile the host
harness with gcc, and verify numerical parity of (a) the C mel frontend vs
the float64 oracle and (b) the full C forward pass vs the JAX trainer —
the host-executable replacement for the reference's device-only parity loop
(SURVEY.md §4 item e)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def cnn_bundle(tmp_path_factory):
    """Train a tiny CNN on synthetic mel features (shape (n_mels=16, T=51))."""
    from audio_edge_ml_pipeline_tpu.models import get_model

    root = tmp_path_factory.mktemp("cg")
    r = np.random.default_rng(5)
    X, y = [], []
    for c in range(3):
        for _ in range(30):
            img = r.uniform(0, 0.3, size=(16, 51)).astype(np.float32)
            img[c * 5 : c * 5 + 4, :] += 0.6
            X.append(np.clip(img, 0, 1))
            y.append(c)
    X = np.stack(X).astype(np.float32)
    y = np.array(y, np.int32)
    idx = r.permutation(len(X))
    X, y = X[idx], y[idx]
    trainer = get_model("cnn")(epochs=10, batch_size=16, filters=[8, 8], first_stride=2, learning_rate=5e-3)
    trainer.fit(X[:70], y[:70], X[70:], y[70:], ["a", "b", "c"], "cg", root / "run", None)
    return root / "run" / "model.flax.npz", trainer, X[70:]


@pytest.fixture(scope="module")
def generated(cnn_bundle, tmp_path_factory):
    from audio_edge_ml_pipeline_tpu.deploy.codegen import ModelToC

    bundle, trainer, Xv = cnn_bundle
    out = tmp_path_factory.mktemp("cproj")
    # frontend sized to the model input: n_mels=16, T=51 -> n_samples = 50*hop
    gen = ModelToC(
        bundle, ["a", "b", "c"], sample_rate=16000, n_mels=16, n_fft=512,
        hop_length=160, duration=50 * 160 / 16000, board="nicla_vision", max_ram_kb=180,
    )
    gen.generate(out)
    # compile host harness
    srcs = [out / "host_main.c"] + sorted((out / "src").glob("*.c"))
    exe = out / "host_runner"
    r = subprocess.run(
        ["gcc", "-O2", "-std=c99", f"-I{out/'src'}", "-o", str(exe), *map(str, srcs), "-lm"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return out, exe, gen


def test_project_layout(generated):
    out, exe, gen = generated
    for f in [
        "src/main.cpp", "src/model.c", "src/model.h", "src/frontend.c",
        "src/feat_data.c", "src/weights.c", "src/ml_kernels.c", "src/audio.cpp",
        "platformio.ini", "nicla_vision.ld", "codegen_report.json",
    ]:
        assert (out / f).exists(), f
    report = json.loads((out / "codegen_report.json").read_text())
    assert report["arena_peak_kb"] < 180
    ini = (out / "platformio.ini").read_text()
    assert "nicla_vision" in ini and "ldscript" in ini


def test_c_mel_frontend_parity(generated):
    """C frontend vs float64 oracle on a realistic clip."""
    from audio_edge_ml_pipeline_tpu.ops import golden

    out, exe, gen = generated
    n = gen.n_samples
    rng = np.random.default_rng(3)
    t = np.arange(n) / 16000
    wav = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)).astype(np.float32)
    wav_file = out / "wav.f32"
    wav_file.write_bytes(wav.tobytes())
    r = subprocess.run([str(exe), "--features", str(wav_file)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    c_feat = np.array([float(x) for x in r.stdout.split()]).reshape(gen.n_mels, gen.n_frames)
    ref = golden.mel_spec_feature(wav, sr=16000, n_mels=16, n_fft=512, hop_length=160)
    err = np.max(np.abs(c_feat - ref))
    assert err <= 5e-5, f"C mel parity {err:.2e}"  # float32 C vs float64 oracle


def test_c_pcm_frontend_matches_float_path(generated, tmp_path):
    """features_extract_pcm (int16 straight from capture, the firmware path
    since the wavbuf removal) must produce bit-identical features to
    features_extract on the dequantized waveform."""
    out, exe, gen = generated
    n = gen.n_samples
    harness = tmp_path / "pcm_check.c"
    harness.write_text(
        '#include <stdio.h>\n#include <stdlib.h>\n#include "frontend.h"\n'
        '#include "feat_data.h"\n'
        f"#define NS {n}\n#define NF {gen.n_mels * gen.n_frames}\n"
        "int main(void) {\n"
        "  static short pcm[NS]; static float wav[NS];\n"
        "  static float a[NF], b[NF];\n"
        "  unsigned s = 12345;\n"
        "  for (int i = 0; i < NS; ++i) {\n"
        "    s = s * 1103515245u + 12345u;\n"
        "    pcm[i] = (short)((s >> 16) & 0xFFFF);\n"
        "    wav[i] = (float)pcm[i] / 32768.0f;\n"
        "  }\n"
        "  features_extract_pcm(pcm, a);\n"
        "  features_extract(wav, b);\n"
        "  double mx = 0;\n"
        "  for (int i = 0; i < NF; ++i) { double d = a[i] - b[i]; if (d < 0) d = -d; if (d > mx) mx = d; }\n"
        '  printf("%g\\n", mx);\n'
        "  return mx == 0.0 ? 0 : 1;\n"
        "}\n"
    )
    srcs = [harness, out / "src" / "frontend.c", out / "src" / "feat_data.c"]
    exe2 = tmp_path / "pcm_check"
    r = subprocess.run(
        ["gcc", "-O2", "-std=c99", f"-I{out/'src'}", "-o", str(exe2), *map(str, srcs), "-lm"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run([str(exe2)], capture_output=True, text=True)
    assert r.returncode == 0, f"pcm/float paths diverge: max|d|={r.stdout.strip()}"


def test_c_forward_parity(generated, cnn_bundle):
    """Full C forward pass vs the JAX trainer on the same features."""
    out, exe, gen = generated
    _, trainer, Xv = cnn_bundle
    feat = Xv[0]  # (16, 51) in [0,1]
    feat_file = out / "feat.f32"
    feat_file.write_bytes(feat.astype(np.float32).tobytes())
    r = subprocess.run([str(exe), "--predict-feat", str(feat_file)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    c_scores = np.array([float(x) for x in r.stdout.split()])
    jax_scores = trainer.predict_proba(feat[None])[0]
    assert c_scores.shape == jax_scores.shape == (3,)
    err = np.max(np.abs(c_scores - jax_scores))
    assert err <= 1e-4, f"C forward parity {err:.2e}"
    assert c_scores.argmax() == jax_scores.argmax()


def test_arena_estimator_budget():
    from audio_edge_ml_pipeline_tpu.deploy.arena import estimate_arena

    # reference numerology: first_stride=4 conv1 on (40,501,1) -> (10,126,16)
    est = estimate_arena(
        [
            ("normalize", (40, 501, 1), (40, 501, 1)),
            ("conv1", (40, 501, 1), (10, 126, 16)),
            ("conv2", (10, 126, 16), (5, 63, 64)),
        ]
    )
    # peak = normalize in+out = 2 * 40*501*4 = 156.6 KB (fits in 180)
    assert 150 < est.peak_bytes / 1024 < 180
    est.check_max_ram(180)
    with pytest.raises(MemoryError):
        est.check_max_ram(100)


def test_deploy_cli(cnn_bundle, tmp_path):
    import os

    bundle, trainer, _ = cnn_bundle
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.deploy.deploy",
            "--model", str(bundle), "--output", str(tmp_path / "proj"),
            "--labels", "a", "b", "c", "--n-mels", "16",
            "--duration", str(50 * 160 / 16000), "--board", "esp32s3",
        ],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "proj" / "src" / "main.cpp").exists()
    assert "espressif32" in (tmp_path / "proj" / "platformio.ini").read_text()
    assert "i2s" in (tmp_path / "proj" / "src" / "audio.cpp").read_text().lower()
