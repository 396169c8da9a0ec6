"""Extended codegen coverage (VERDICT r1 items 3 + 8):

- per-kernel gcc parity for the kernels beyond the basic CNN set
  (dwconv2d, avgpool2d, batchnorm, conv valid, int8-weight variants)
  against JAX/numpy references;
- ds_cnn end-to-end codegen parity (exercises every new kernel in one
  generated forward pass);
- deployment of Stage-6 quantized artifacts: int8 kernels stay int8 in
  flash, static_int8 reproduces the calibrated input grid, and the deploy
  CLI routes --report -> optimized_model_path.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

KERNEL_DRIVER_C = """\
#include "ml_kernels.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static void *slurp(const char *p, size_t n, size_t el) {
    FILE *f = fopen(p, "rb");
    if (!f) { fprintf(stderr, "open %s\\n", p); exit(2); }
    void *b = malloc(n * el);
    if (fread(b, el, n, f) != n) { fprintf(stderr, "read %s\\n", p); exit(2); }
    fclose(f);
    return b;
}

static void dump(const float *y, size_t n) {
    for (size_t i = 0; i < n; ++i) printf("%.9g\\n", y[i]);
}

int main(int argc, char **argv) {
    static float y[4096];
    if (argc < 2) return 2;
    if (!strcmp(argv[1], "conv_valid")) {
        float *x = slurp("x.f32", 5*7*3, 4), *w = slurp("w.f32", 3*3*3*4, 4), *b = slurp("b.f32", 4, 4);
        ml_conv2d(x, y, w, b, 5, 7, 3, 4, 3, 3, 1, 1, 0, 0, 3, 5, 0);
        dump(y, 3*5*4);
    } else if (!strcmp(argv[1], "dwconv_same")) {
        float *x = slurp("x.f32", 5*7*3, 4), *w = slurp("w.f32", 3*3*3, 4), *b = slurp("b.f32", 3, 4);
        ml_dwconv2d(x, y, w, b, 5, 7, 3, 3, 3, 1, 1, 1, 1, 5, 7, 1);
        dump(y, 5*7*3);
    } else if (!strcmp(argv[1], "avgpool")) {
        float *x = slurp("x.f32", 6*8*3, 4);
        ml_avgpool2d(x, y, 6, 8, 3, 2, 2, 2, 2, 3, 4);
        dump(y, 3*4*3);
    } else if (!strcmp(argv[1], "batchnorm")) {
        float *x = slurp("x.f32", 4*5*3, 4), *s = slurp("s.f32", 3, 4), *sh = slurp("sh.f32", 3, 4);
        ml_batchnorm(x, y, 4*5, 3, s, sh, 1);
        dump(y, 4*5*3);
    } else if (!strcmp(argv[1], "conv_q8")) {
        float *x = slurp("x.f32", 5*7*3, 4), *b = slurp("b.f32", 4, 4);
        signed char *w = slurp("w.i8", 3*3*3*4, 1);
        ml_conv2d_q8(x, y, w, 0.05f, b, 5, 7, 3, 4, 3, 3, 1, 1, 0, 0, 3, 5, 1);
        dump(y, 3*5*4);
    } else if (!strcmp(argv[1], "dense_q8")) {
        float *x = slurp("x.f32", 10, 4), *b = slurp("b.f32", 4, 4);
        signed char *w = slurp("w.i8", 10*4, 1);
        ml_dense_q8(x, y, w, 0.02f, b, 10, 4, 0);
        dump(y, 4);
    } else if (!strcmp(argv[1], "quant_dequant")) {
        float *x = slurp("x.f32", 32, 4);
        ml_quant_dequant(x, y, 32, -1.5f, 0.01f);
        dump(y, 32);
    } else {
        return 2;
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def kernel_exe(tmp_path_factory):
    from audio_edge_ml_pipeline_tpu.deploy import ckernels

    d = tmp_path_factory.mktemp("kern")
    (d / "ml_kernels.h").write_text(ckernels.ML_KERNELS_H)
    (d / "ml_kernels.c").write_text(ckernels.ML_KERNELS_C)
    (d / "driver.c").write_text(KERNEL_DRIVER_C)
    exe = d / "driver"
    r = subprocess.run(
        ["gcc", "-O2", "-std=c99", "-o", str(exe), str(d / "driver.c"), str(d / "ml_kernels.c"), "-lm"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return d, exe


def _run_case(d, exe, case):
    r = subprocess.run([str(exe), case], capture_output=True, text=True, cwd=d)
    assert r.returncode == 0, r.stderr
    return np.array([float(v) for v in r.stdout.split()], np.float32)


def test_kernel_conv_valid_parity(kernel_exe):
    import jax

    d, exe = kernel_exe
    r = np.random.default_rng(0)
    x = r.normal(0, 1, (5, 7, 3)).astype(np.float32)
    w = r.normal(0, 0.5, (3, 3, 3, 4)).astype(np.float32)
    b = r.normal(0, 0.1, 4).astype(np.float32)
    (d / "x.f32").write_bytes(x.tobytes())
    (d / "w.f32").write_bytes(w.tobytes())
    (d / "b.f32").write_bytes(b.tobytes())
    got = _run_case(d, exe, "conv_valid").reshape(3, 5, 4)
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            x[None], w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )[0]
    ) + b
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_kernel_dwconv_same_parity(kernel_exe):
    import jax

    d, exe = kernel_exe
    r = np.random.default_rng(1)
    x = r.normal(0, 1, (5, 7, 3)).astype(np.float32)
    w = r.normal(0, 0.5, (3, 3, 1, 3)).astype(np.float32)
    b = r.normal(0, 0.1, 3).astype(np.float32)
    (d / "x.f32").write_bytes(x.tobytes())
    (d / "w.f32").write_bytes(w.tobytes())
    (d / "b.f32").write_bytes(b.tobytes())
    got = _run_case(d, exe, "dwconv_same").reshape(5, 7, 3)
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            x[None], w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3,
        )[0]
    ) + b
    np.testing.assert_allclose(got, np.maximum(ref, 0.0), atol=1e-5)


def test_kernel_avgpool_parity(kernel_exe):
    import flax.linen as nn

    d, exe = kernel_exe
    r = np.random.default_rng(2)
    x = r.normal(0, 1, (6, 8, 3)).astype(np.float32)
    (d / "x.f32").write_bytes(x.tobytes())
    got = _run_case(d, exe, "avgpool").reshape(3, 4, 3)
    ref = np.asarray(nn.avg_pool(x[None], (2, 2), strides=(2, 2))[0])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_kernel_batchnorm_parity(kernel_exe):
    d, exe = kernel_exe
    r = np.random.default_rng(3)
    x = r.normal(0, 1, (4, 5, 3)).astype(np.float32)
    scale = r.normal(1, 0.2, 3).astype(np.float32)
    shift = r.normal(0, 0.3, 3).astype(np.float32)
    for name, arr in [("x", x), ("s", scale), ("sh", shift)]:
        (d / f"{name}.f32").write_bytes(arr.tobytes())
    got = _run_case(d, exe, "batchnorm").reshape(4, 5, 3)
    ref = np.maximum(x * scale + shift, 0.0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_kernel_q8_parity(kernel_exe):
    d, exe = kernel_exe
    r = np.random.default_rng(4)
    x = r.normal(0, 1, (5, 7, 3)).astype(np.float32)
    q = r.integers(-127, 128, (3, 3, 3, 4)).astype(np.int8)
    b = r.normal(0, 0.1, 4).astype(np.float32)
    (d / "x.f32").write_bytes(x.tobytes())
    (d / "w.i8").write_bytes(q.tobytes())
    (d / "b.f32").write_bytes(b.tobytes())
    got = _run_case(d, exe, "conv_q8").reshape(3, 5, 4)
    # reference: float conv over dequantized weights
    import jax

    deq = q.astype(np.float32) * 0.05
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            x[None], deq, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )[0]
    ) + b
    np.testing.assert_allclose(got, np.maximum(ref, 0.0), atol=1e-4)

    xd = r.normal(0, 1, 10).astype(np.float32)
    qd = r.integers(-127, 128, (10, 4)).astype(np.int8)
    bd = r.normal(0, 0.1, 4).astype(np.float32)
    (d / "x.f32").write_bytes(xd.tobytes())
    (d / "w.i8").write_bytes(qd.tobytes())
    (d / "b.f32").write_bytes(bd.tobytes())
    got = _run_case(d, exe, "dense_q8")
    ref = xd @ (qd.astype(np.float32) * 0.02) + bd
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_kernel_quant_dequant_parity(kernel_exe):
    d, exe = kernel_exe
    r = np.random.default_rng(5)
    x = r.normal(0, 1, 32).astype(np.float32)
    (d / "x.f32").write_bytes(x.tobytes())
    got = _run_case(d, exe, "quant_dequant")
    q = np.clip(np.round((x - (-1.5)) / 0.01), 0, 255)
    ref = (q * 0.01 - 1.5).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# ds_cnn end-to-end: every new kernel in one generated forward pass
# ---------------------------------------------------------------------------


def _compile_project(out: Path) -> Path:
    srcs = [out / "host_main.c"] + sorted((out / "src").glob("*.c"))
    exe = out / "host_runner"
    r = subprocess.run(
        ["gcc", "-O2", "-std=c99", f"-I{out/'src'}", "-o", str(exe), *map(str, srcs), "-lm"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return exe


def _spec_blobs(seed=6, n_per=25, shape=(16, 51)):
    r = np.random.default_rng(seed)
    X, y = [], []
    for c in range(3):
        for _ in range(n_per):
            img = r.uniform(0, 0.3, size=shape).astype(np.float32)
            img[c * 5 : c * 5 + 4, :] += 0.6
            X.append(np.clip(img, 0, 1))
            y.append(c)
    X = np.stack(X).astype(np.float32)
    y = np.array(y, np.int32)
    idx = r.permutation(len(X))
    return X[idx], y[idx]


@pytest.fixture(scope="module")
def ds_cnn_bundle(tmp_path_factory):
    from audio_edge_ml_pipeline_tpu.models import get_model

    root = tmp_path_factory.mktemp("dscg")
    X, y = _spec_blobs()
    trainer = get_model("ds_cnn")(
        epochs=8, batch_size=16, filters=[8, 16], first_stride=2, pool="avg",
        batch_norm=True, learning_rate=5e-3,
    )
    trainer.fit(X[:60], y[:60], X[60:], y[60:], ["a", "b", "c"], "ds", root / "run", None)
    return root / "run" / "model.flax.npz", trainer, X[60:]


def test_ds_cnn_codegen_parity(ds_cnn_bundle, tmp_path):
    from audio_edge_ml_pipeline_tpu.deploy.codegen import ModelToC

    bundle, trainer, Xv = ds_cnn_bundle
    gen = ModelToC(
        bundle, ["a", "b", "c"], sample_rate=16000, n_mels=16, n_fft=512,
        hop_length=160, duration=50 * 160 / 16000, board="generic", max_ram_kb=180,
    )
    ops = [p["op"] for p in gen.plan]
    assert "dwconv2d" in ops and "avgpool2d" in ops and "batchnorm" in ops
    # the 1x1 pointwise conv runs VALID (zero pads)
    pw = [p for p in gen.plan if p["op"] == "conv2d" and p["k"] == 1]
    assert pw and pw[0]["pt"] == 0 and pw[0]["pl"] == 0
    out = tmp_path / "proj"
    gen.generate(out)
    exe = _compile_project(out)
    feat = Xv[0]
    (out / "feat.f32").write_bytes(feat.astype(np.float32).tobytes())
    r = subprocess.run([str(exe), "--predict-feat", str(out / "feat.f32")], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    c_scores = np.array([float(v) for v in r.stdout.split()])
    jax_scores = trainer.predict_proba(feat[None])[0]
    err = np.max(np.abs(c_scores - jax_scores))
    assert err <= 1e-4, f"ds_cnn C parity {err:.2e}"
    assert c_scores.argmax() == jax_scores.argmax()


# ---------------------------------------------------------------------------
# Stage-6 quantized artifact deployment
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cnn_for_quant(tmp_path_factory):
    from audio_edge_ml_pipeline_tpu.models import get_model

    root = tmp_path_factory.mktemp("q8src")
    X, y = _spec_blobs(seed=7)
    trainer = get_model("cnn")(epochs=8, batch_size=16, filters=[8, 8], first_stride=2, learning_rate=5e-3)
    trainer.fit(X[:60], y[:60], X[60:], y[60:], ["a", "b", "c"], "q8", root / "run", None)
    return root / "run" / "model.flax.npz", trainer, X[60:]


@pytest.mark.parametrize("mode", ["dynamic_int8", "static_int8"])
def test_quantized_artifact_deploys(cnn_for_quant, tmp_path, mode):
    """Stage-6 int8 artifact -> ModelToC -> host parity vs the exact trainer
    view the optimization report's accuracy was measured on."""
    from audio_edge_ml_pipeline_tpu.deploy.codegen import ModelToC
    from audio_edge_ml_pipeline_tpu.optimize.quantize import _quantize_deep_bundle

    bundle, _trainer, Xv = cnn_for_quant
    art = tmp_path / f"model_{mode}.npz"
    view = _quantize_deep_bundle(Path(bundle), mode, art, calib_X=Xv)
    gen = ModelToC(
        art, ["a", "b", "c"], sample_rate=16000, n_mels=16, n_fft=512,
        hop_length=160, duration=50 * 160 / 16000, board="generic", max_ram_kb=180,
    )
    assert gen.quant_mode == mode
    if mode == "static_int8":
        assert gen.plan[0]["op"] == "quant_dequant"
    out = tmp_path / "proj"
    gen.generate(out)
    # int8 kernels live in flash as signed char with a per-tensor scale
    weights_c = (out / "src" / "weights.c").read_text()
    assert "signed char wt_conv0_k" in weights_c
    assert "wt_conv0_k_scale" in weights_c
    exe = _compile_project(out)
    feat = Xv[1]
    (out / "feat.f32").write_bytes(feat.astype(np.float32).tobytes())
    r = subprocess.run([str(exe), "--predict-feat", str(out / "feat.f32")], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    c_scores = np.array([float(v) for v in r.stdout.split()])
    view_scores = view.predict_proba(feat[None])[0]
    err = np.max(np.abs(c_scores - view_scores))
    assert err <= 1e-4, f"{mode} C parity vs evaluated view {err:.2e}"
    assert c_scores.argmax() == view_scores.argmax()


def test_quantized_ds_cnn_deploys(ds_cnn_bundle, tmp_path):
    """int8 ds_cnn: the dwconv2d_q8 / dense_q8 emission path plus folded
    BatchNorm from dequantized stats, parity vs the evaluated int8 view."""
    from audio_edge_ml_pipeline_tpu.deploy.codegen import ModelToC
    from audio_edge_ml_pipeline_tpu.optimize.quantize import _quantize_deep_bundle

    bundle, _trainer, Xv = ds_cnn_bundle
    art = tmp_path / "ds_dynamic_int8.npz"
    view = _quantize_deep_bundle(Path(bundle), "dynamic_int8", art, calib_X=Xv)
    gen = ModelToC(
        art, ["a", "b", "c"], sample_rate=16000, n_mels=16, n_fft=512,
        hop_length=160, duration=50 * 160 / 16000, board="generic", max_ram_kb=180,
    )
    out = tmp_path / "proj"
    gen.generate(out)
    model_c = (out / "src" / "model.c").read_text()
    assert "ml_dwconv2d_q8" in model_c and "ml_dense_q8" in model_c and "ml_batchnorm" in model_c
    exe = _compile_project(out)
    feat = Xv[2]
    (out / "feat.f32").write_bytes(feat.astype(np.float32).tobytes())
    r = subprocess.run([str(exe), "--predict-feat", str(out / "feat.f32")], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    c_scores = np.array([float(v) for v in r.stdout.split()])
    view_scores = view.predict_proba(feat[None])[0]
    err = np.max(np.abs(c_scores - view_scores))
    assert err <= 1e-4, f"int8 ds_cnn C parity {err:.2e}"


def test_kd_student_full_deploy_chain(tmp_path):
    """The last untested cross-stage composition (round-3 review stretch
    item 8): teacher CNN -> KD student (distillation_cnn, reference
    deep.py:912-1217) -> int8 optimize -> ModelToC -> gcc -> C inference
    parity vs the evaluated int8 view."""
    from audio_edge_ml_pipeline_tpu.deploy.codegen import ModelToC
    from audio_edge_ml_pipeline_tpu.models import get_model
    from audio_edge_ml_pipeline_tpu.optimize.quantize import _quantize_deep_bundle

    X, y = _spec_blobs(seed=9)
    Xtr, ytr, Xv, yv = X[:60], y[:60], X[60:], y[60:]
    teacher = get_model("cnn")(epochs=8, batch_size=16, filters=[8, 16],
                               first_stride=2, learning_rate=5e-3)
    teacher.fit(Xtr, ytr, Xv, yv, ["a", "b", "c"], "teacher", tmp_path / "teacher", None)
    student = get_model("distillation_cnn")(
        epochs=8, batch_size=16, filters=[8, 8], first_stride=2, learning_rate=5e-3,
        teacher_model=str(tmp_path / "teacher" / "model.flax.npz"),
    )
    sres = student.fit(Xtr, ytr, Xv, yv, ["a", "b", "c"], "student", tmp_path / "student", None)
    assert sres.metrics["val_accuracy"] > 0.5  # KD actually learned

    art = tmp_path / "student_dynamic_int8.npz"
    view = _quantize_deep_bundle(Path(tmp_path / "student" / "model.flax.npz"),
                                 "dynamic_int8", art, calib_X=Xv)
    gen = ModelToC(
        art, ["a", "b", "c"], sample_rate=16000, n_mels=16, n_fft=512,
        hop_length=160, duration=50 * 160 / 16000, board="generic", max_ram_kb=180,
    )
    assert gen.quant_mode == "dynamic_int8"
    out = tmp_path / "proj"
    gen.generate(out)
    weights_c = (out / "src" / "weights.c").read_text()
    assert "signed char" in weights_c  # int8 weights stayed int8 in flash
    exe = _compile_project(out)
    feat = Xv[0]
    (out / "feat.f32").write_bytes(feat.astype(np.float32).tobytes())
    r = subprocess.run([str(exe), "--predict-feat", str(out / "feat.f32")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    c_scores = np.array([float(v) for v in r.stdout.split()])
    view_scores = view.predict_proba(feat[None])[0]
    err = np.max(np.abs(c_scores - view_scores))
    assert err <= 1e-4, f"KD-student int8 C parity {err:.2e}"
    assert c_scores.argmax() == view_scores.argmax()


def test_deploy_cli_routes_report_artifact(cnn_for_quant, tmp_path):
    """deploy --report (no --model) must ship the report's optimized model."""
    import os

    from audio_edge_ml_pipeline_tpu.optimize.quantize import _quantize_deep_bundle

    bundle, _trainer, Xv = cnn_for_quant
    art = tmp_path / "model_dynamic_int8.npz"
    _quantize_deep_bundle(Path(bundle), "dynamic_int8", art, calib_X=Xv)
    report = {
        "optimized_model_path": str(art),
        "quantization_method": "dynamic_int8",
        "class_filter": None,
        "feature_params": {"sample_rate": 16000, "n_mels": 16, "n_fft": 512,
                           "hop_length": 160, "duration": 50 * 160 / 16000},
    }
    (tmp_path / "optimization_report.json").write_text(json.dumps(report))
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "-m", "audio_edge_ml_pipeline_tpu.deploy.deploy",
            "--report", str(tmp_path / "optimization_report.json"),
            "--output", str(tmp_path / "proj"), "--labels", "a", "b", "c",
            "--board", "generic",
        ],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr
    rep = json.loads((tmp_path / "proj" / "codegen_report.json").read_text())
    assert rep["quantization"] == "dynamic_int8"
    assert "signed char" in (tmp_path / "proj" / "src" / "weights.c").read_text()
