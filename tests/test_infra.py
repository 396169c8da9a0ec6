"""Infrastructure: checkpoint/resume, native WAV decoder, stage timers,
graft entry points."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _blobs(seed, n=40):
    r = np.random.default_rng(seed)
    X, y = [], []
    for c in range(3):
        mu = np.zeros(10)
        mu[c * 3 : c * 3 + 3] = 2.5
        X.append(r.normal(mu, 0.8, (n, 10)))
        y.append(np.full(n, c))
    X = np.concatenate(X).astype(np.float32)
    y = np.concatenate(y).astype(np.int32)
    idx = r.permutation(len(X))
    return X[idx], y[idx]


def test_checkpoint_resume(tmp_path):
    from audio_edge_ml_pipeline_tpu.models import get_model

    X, y = _blobs(0)
    Xtr, ytr, Xva, yva = X[:90], y[:90], X[90:], y[90:]
    names = ["a", "b", "c"]

    # full run
    full = get_model("mlp")(epochs=12, hidden_units=[12], batch_size=16, seed=3)
    rfull = full.fit(Xtr, ytr, Xva, yva, names, "full", tmp_path / "full", None)

    # interrupted run: 5 epochs with checkpointing, then resume to 12
    part = get_model("mlp")(epochs=5, hidden_units=[12], batch_size=16, seed=3,
                            checkpoint_dir=str(tmp_path / "ckpt"))
    part.fit(Xtr, ytr, Xva, yva, names, "part", tmp_path / "part", None)
    assert (tmp_path / "ckpt" / "train_state.npz").exists()

    resumed = get_model("mlp")(epochs=12, hidden_units=[12], batch_size=16, seed=3,
                               checkpoint_dir=str(tmp_path / "ckpt"), resume=True)
    rres = resumed.fit(Xtr, ytr, Xva, yva, names, "res", tmp_path / "res", None)
    # resumed training continues improving and ends in the same ballpark
    assert rres.metrics["val_accuracy"] >= 0.7
    assert abs(rres.metrics["val_accuracy"] - rfull.metrics["val_accuracy"]) <= 0.25

    # corrupted/missing checkpoint falls back to fresh training — and the
    # fresh fit must actually LEARN (not silently resume from garbage or
    # skip training) and persist a loadable model
    (tmp_path / "ckpt2").mkdir()
    (tmp_path / "ckpt2" / "train_state.npz").write_bytes(b"garbage")
    fresh = get_model("mlp")(epochs=12, hidden_units=[12], batch_size=16, seed=3,
                             checkpoint_dir=str(tmp_path / "ckpt2"), resume=True)
    fres = fresh.fit(Xtr, ytr, Xva, yva, names, "fresh", tmp_path / "fresh", None)
    assert fres.metrics["val_accuracy"] >= 0.7
    assert (tmp_path / "fresh" / "model.flax.npz").exists()


def test_native_wavio_parity(tmp_path):
    from audio_edge_ml_pipeline_tpu.data import audio_io, native_wavio

    if not native_wavio.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    paths = []
    for i, (ch, sr) in enumerate([(1, 16000), (2, 22050), (1, 44100)]):
        y = rng.uniform(-0.8, 0.8, (4000, ch)).astype(np.float32)
        p = tmp_path / f"{i}.wav"
        audio_io.write_wav(p, y if ch > 1 else y[:, 0], sr)
        paths.append(p)
    for p in paths:
        native = native_wavio.decode(p, 5000)
        assert native is not None
        mono_native, rate = native
        ref, ref_rate = audio_io.read_wav(p)
        ref_mono = ref.mean(axis=1)
        assert rate == ref_rate
        np.testing.assert_allclose(mono_native, ref_mono, atol=1e-6)
    waves, lengths, rates = native_wavio.decode_batch(paths, 5000)
    assert waves.shape == (3, 5000)
    assert (lengths == 4000).all()
    assert list(rates) == [16000, 22050, 44100]
    # error paths: missing file and malformed RIFF
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a riff file at all")
    _, lengths, _ = native_wavio.decode_batch([paths[0], tmp_path / "missing.wav", bad], 5000)
    assert lengths[0] == 4000 and lengths[1] < 0 and lengths[2] < 0


def test_load_audio_native_vs_numpy_identical(tmp_path, monkeypatch):
    """load_audio must return the same samples whether the native decoder
    serves the request or the numpy codec does (hot-path wiring of the C++
    reader; VERDICT r1 weak #6)."""
    from audio_edge_ml_pipeline_tpu.data import audio_io, native_wavio

    if not native_wavio.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    y = rng.uniform(-0.7, 0.7, (9000, 2)).astype(np.float32)
    p = tmp_path / "c.wav"
    audio_io.write_wav(p, y, 22050)
    got_native, sr1 = audio_io.load_audio(p, sr=16000, offset=0.05, duration=0.3)
    monkeypatch.setattr(native_wavio, "decode", lambda *a, **k: None)
    got_numpy, sr2 = audio_io.load_audio(p, sr=16000, offset=0.05, duration=0.3)
    assert sr1 == sr2 == 16000
    np.testing.assert_allclose(got_native, got_numpy, atol=2e-6)


def test_stage_timers():
    from audio_edge_ml_pipeline_tpu.utils import profiling

    profiling.reset()
    with profiling.stage_timer("unit"):
        pass
    with profiling.stage_timer("unit"):
        pass
    rep = profiling.timing_report()
    assert rep["unit"]["calls"] == 2
    assert rep["unit"]["total_s"] >= 0


def test_graft_entry_single_chip():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 27)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally on the sharded step


def test_graft_dryrun_self_provisions_from_one_device():
    """The driver calls dryrun_multichip in an environment whose backend has
    ONE device (tunneled axon chip). The hook must respawn itself with an
    8-device virtual CPU backend instead of crashing (VERDICT r1 item 1)."""
    import os
    import sys

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    # single-device parent: strip any forced host device count
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split() if "host_platform_device_count" not in f
    )
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "dryrun_multichip OK" in r.stdout


def test_get_mesh_rejects_too_few_devices():
    from audio_edge_ml_pipeline_tpu.parallel import mesh as pm

    with pytest.raises(ValueError, match="xla_force_host_platform_device_count"):
        pm.get_mesh(16)


def test_mesh_shardings():
    import jax

    from audio_edge_ml_pipeline_tpu.parallel import mesh as pm

    mesh = pm.get_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    x = np.zeros((8, 16), np.float32)
    xs = pm.shard_batch(x, mesh)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data")
    params = {"kernel": np.zeros((16, 64), np.float32), "bias": np.zeros((7,), np.float32)}
    sh = pm.param_shardings(params, mesh)
    assert sh["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["bias"].spec == jax.sharding.PartitionSpec()


def test_data_parallel_training_parity(tmp_path):
    """FlaxTrainer with data_parallel=8 shards the batch over the virtual
    mesh and must match the single-device fit (same seed) up to float
    reassociation (VERDICT r1 item 4: sharded training in the product path)."""
    from audio_edge_ml_pipeline_tpu.models import get_model

    X, y = _blobs(7, n=48)
    Xtr, ytr, Xva, yva = X[:120], y[:120], X[120:], y[120:]
    kw = dict(epochs=8, hidden_units=[16], batch_size=16, seed=5, learning_rate=3e-3)

    single = get_model("mlp")(**kw)
    r1 = single.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "dp1", tmp_path / "dp1", None)
    sharded = get_model("mlp")(data_parallel=8, **kw)
    r8 = sharded.fit(Xtr, ytr, Xva, yva, ["a", "b", "c"], "dp8", tmp_path / "dp8", None)

    assert abs(r8.metrics["val_accuracy"] - r1.metrics["val_accuracy"]) <= 0.1
    p1 = single.predict_proba(Xva)
    p8 = sharded.predict_proba(Xva)
    np.testing.assert_allclose(p8, p1, atol=5e-3)

    # a conv model exercises sharded conv compute + BN-free path
    import jax

    assert jax.device_count() == 8
    r = np.random.default_rng(9)
    Xs = r.uniform(0, 1, (48, 12, 16)).astype(np.float32)
    ys = (np.arange(48) % 2).astype(np.int32)
    Xs[ys == 1, 2:6, :] += 0.7
    cnn = get_model("cnn")(data_parallel=8, epochs=4, batch_size=16, filters=[4], seed=1)
    res = cnn.fit(Xs[:40], ys[:40], Xs[40:], ys[40:], ["a", "b"], "dpc", tmp_path / "dpc", None)
    assert np.isfinite(res.metrics["val_accuracy"])


def test_sharded_extraction_parity(tmp_path):
    """Batched extraction over the 8-device virtual mesh matches single-clip
    golden output (data-parallel extraction path)."""
    import jax

    from audio_edge_ml_pipeline_tpu.data.audio_io import load_audio, write_wav
    from audio_edge_ml_pipeline_tpu.data.loaders import AudioFolderLoader
    from audio_edge_ml_pipeline_tpu.features import get
    from audio_edge_ml_pipeline_tpu.ops import golden as g

    assert jax.device_count() == 8  # conftest virtual mesh
    root = tmp_path / "audio"
    rng = np.random.default_rng(2)
    for c in range(2):
        d = root / f"c{c}"
        d.mkdir(parents=True)
        for i in range(5):  # 10 clips -> padded to 16 rows over 8 devices
            t = np.arange(16000) / 16000
            y = (0.4 * np.sin(2 * np.pi * (300 + 200 * c + 10 * i) * t)
                 + 0.03 * rng.standard_normal(16000)).astype(np.float32)
            write_wav(d / f"{i}.wav", y, 16000)
    ex = get("audio_mel_spec")(duration=1.0)
    fs = ex.extract_dataset(AudioFolderLoader(root))
    assert fs.features.shape == (10, 40, 101)
    y0, _ = load_audio(sorted((root / "c0").glob("*.wav"))[0], sr=16000)
    ref = g.mel_spec_feature(y0[:16000], sr=16000)
    assert np.max(np.abs(fs.features[0] - ref)) <= 1e-5


def test_tracking_nested_runs_finalize_correctly(tmp_path):
    """Each ActiveRun context finalizes ITSELF and restores the previous
    active run (regression: __exit__ ended whatever run was globally
    active, leaving an outer run stuck status=RUNNING forever)."""
    from audio_edge_ml_pipeline_tpu.utils import tracking

    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    tracking.set_experiment("nested")
    with tracking.start_run(run_name="outer") as outer:
        with tracking.start_run(run_name="inner") as inner:
            assert tracking.active_run() is inner
        assert tracking.active_run() is outer
        assert inner.info.status == "FINISHED"
        outer.log_metric("m", 1.0)  # outer still usable after inner closed
    assert outer.info.status == "FINISHED"
    assert tracking.active_run() is None
    finished = {r.run_name for r in tracking.search_runs("nested", status="FINISHED")}
    assert finished == {"outer", "inner"}


def _load_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_backend_gate_healthy_and_exhausted():
    """Pre-flight gate: a healthy backend passes on the first killable
    subprocess probe; an unreachable one exhausts the budget and returns
    False instead of wedging in-process (CLAUDE.md tunnel pathologies)."""
    bench = _load_bench()
    assert bench._await_backend(budget_s=300) is True
    # force every probe to time out: even a healthy CPU probe cannot
    # finish inside 0.2 s, so the budget is exhausted deterministically
    assert bench._await_backend(budget_s=4, probe_timeout=0.2, interval=1) is False


def test_bench_gate_failure_emits_honest_zero(tmp_path):
    """`python bench.py` with an unreachable backend prints the one-line
    zero-score JSON contract and exits 3 — the driver records WHY there is
    no number instead of a hang (simulated by shadowing jax with a module
    that raises at import, which kills every probe subprocess)."""
    import json
    import os
    import subprocess
    import sys

    (tmp_path / "jax.py").write_text("raise RuntimeError('simulated dead backend')\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{tmp_path}{os.pathsep}" + env.get("PYTHONPATH", "")
    env["BENCH_HEALTH_BUDGET_S"] = "3"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert proc.returncode == 3
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["value"] == 0.0 and result["vs_baseline"] == 0.0
    assert "unreachable" in result["error"]
    assert result["metric"] == "fsc22 mel+CNN clips/sec/chip"


def test_bench_midrun_crash_emits_honest_zero(tmp_path):
    """A backend crash inside main() (measured 2026-08-20: JaxRuntimeError
    FAILED_PRECONDITION when the tunneled TPU server restarts under a live
    program) must still end in the one-line zero-score JSON contract after
    the single health-gated retry — not a bare traceback with no JSON line.
    Simulated by shadowing flax (imported by main(), not by the probe
    subprocesses, which only import jax) so the health gate passes while
    both bench attempts crash."""
    import json
    import os
    import subprocess
    import sys

    (tmp_path / "flax.py").write_text("raise RuntimeError('simulated mid-run crash')\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{tmp_path}{os.pathsep}{REPO}"  # drops .axon_site too
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=500, cwd=REPO,
    )
    assert proc.returncode == 3
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["value"] == 0.0 and result["vs_baseline"] == 0.0
    assert "crashed twice" in result["error"]
    assert result["metric"] == "fsc22 mel+CNN clips/sec/chip"
    assert "retrying after health gate" in proc.stderr


def test_hybrid_dcn_replica_mesh_training_step():
    """get_mesh(dcn_replicas=2) adds the cross-slice DCN axis (SURVEY §5:
    "optional DCN axis for multi-slice"): the mesh becomes
    ("replica", "data", "model"), the batch shards over replica x data, and
    the full sharded train step must reproduce the single-device step."""
    import jax
    import jax.numpy as jnp
    import optax

    from audio_edge_ml_pipeline_tpu.parallel import mesh as pm

    mesh = pm.get_mesh(8, model_parallel=2, dcn_replicas=2)
    assert mesh.axis_names == ("replica", "data", "model")
    assert dict(mesh.shape) == {"replica": 2, "data": 2, "model": 2}
    assert pm.data_axis_size(mesh) == 4
    assert pm.batch_sharding(mesh).spec == jax.sharding.PartitionSpec(("replica", "data"))
    with pytest.raises(ValueError, match="not divisible"):
        pm.get_mesh(8, model_parallel=2, dcn_replicas=3)

    rng = np.random.default_rng(0)
    params0 = {"w1": (0.1 * rng.standard_normal((12, 16))).astype(np.float32),
               "w2": (0.1 * rng.standard_normal((16, 4))).astype(np.float32)}
    X = rng.standard_normal((16, 12)).astype(np.float32)
    y = (np.arange(16) % 4).astype(np.int32)
    opt = optax.sgd(0.1)

    def apply_fn(p, x, _rng):
        return jnp.maximum(x @ p["w1"], 0.0) @ p["w2"]

    # single-device reference step (same math, no mesh)
    def ref_step(p, s, x, yy):
        def loss_fn(pp):
            logits = apply_fn(pp, x, None)
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, yy))
            return loss
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), loss

    p_ref, loss_ref = jax.jit(ref_step)(params0, opt.init(params0), X, y)

    p, s = pm.place_train_state(params0, opt.init(params0), mesh)
    step = pm.make_sharded_train_step(apply_fn, opt, mesh)
    with mesh:
        p, s, loss, _acc = step(p, s, pm.shard_batch(X, mesh),
                                pm.shard_batch(y, mesh), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(loss), np.asarray(loss_ref), atol=1e-5)
    for k in params0:
        np.testing.assert_allclose(np.asarray(p[k]), np.asarray(p_ref[k]), atol=1e-5)


def test_docker_mlflow_service_is_startable_as_composed():
    """Compose lint: the mlflow service must not pair a postgresql://
    backend store (or s3:// artifact destination) with an image that lacks
    the drivers. The stock ghcr.io/mlflow/mlflow image ships neither
    psycopg2 nor boto3 — the reference builds its own server image for
    exactly this reason (reference docker/Dockerfile.mlflow:1-4). Docker
    can't run in this environment, so assert the compose file is
    self-consistent: a postgresql/s3 store requires a `build:` whose
    Dockerfile installs the drivers."""
    import yaml

    compose_path = REPO / "docker" / "docker-compose.yaml"
    compose = yaml.safe_load(compose_path.read_text())
    svc = compose["services"]["mlflow"]
    command = " ".join(svc.get("command", "").split())
    needs_pg = "postgresql://" in command
    needs_s3 = "s3://" in command
    if not (needs_pg or needs_s3):
        return  # file-backed server: any mlflow image works

    assert "build" in svc, (
        "mlflow service uses a postgresql:// or s3:// store but no build: — "
        "the stock image cannot import psycopg2/boto3 and crashes on startup"
    )
    build = svc["build"]
    context = build.get("context", ".") if isinstance(build, dict) else build
    dockerfile = build.get("dockerfile", "Dockerfile") if isinstance(build, dict) else "Dockerfile"
    df_path = (compose_path.parent / context / dockerfile).resolve()
    assert df_path.is_file(), f"compose references missing {df_path}"
    df = df_path.read_text()
    assert "mlflow" in df
    if needs_pg:
        assert "psycopg2" in df, "postgresql:// store needs the psycopg2 driver baked in"
    if needs_s3:
        assert "boto3" in df, "s3:// artifact destination needs boto3 baked in"


def test_tunnel_probe_two_trip_semantics():
    """The congestion probe (scripts/e2e_timing.py) measures TWO consecutive
    round trips in one subprocess so the documented per-process first-fetch
    stall (CLAUDE.md tunnel pathologies; measured 546 s first / 0.31 s
    steady in one healthy window) cannot masquerade as congestion: the
    label comes from the steady-state trip. Runs the real probe on the CPU
    backend (conftest env) and checks the label algebra on synthetic
    results."""
    import sys

    sys.path.insert(0, str(REPO / "scripts"))
    from e2e_timing import probe_steady, tunnel_health_label, tunnel_probe

    p = tunnel_probe(timeout_s=120)
    assert isinstance(p, dict)
    assert isinstance(p["first_s"], float) and isinstance(p["steady_s"], float)
    assert tunnel_health_label(p) == "healthy"  # CPU round trip is ~ms
    assert probe_steady(p) == p["steady_s"]

    # warmup stall + healthy steady trip = healthy window, NOT congestion
    assert tunnel_health_label({"first_s": 546.0, "steady_s": 0.31}) == "healthy"
    # genuine congestion shows in the steady trip
    assert tunnel_health_label({"first_s": 300.0, "steady_s": 25.0}) == "congested"
    # first trip completed but the kill hit the second: judge from trip one
    assert tunnel_health_label({"first_s": 410.0, "steady_s": "timeout"}) == "congested"
    # nothing completed inside the budget: dead
    assert tunnel_health_label({"first_s": "timeout", "steady_s": "timeout"}) == "dead"
    assert probe_steady({"first_s": 1.0, "steady_s": "timeout"}) is None
    # legacy scalar results from committed round-4 artifacts still label
    assert tunnel_health_label(1.4) == "healthy"
    assert tunnel_health_label("timeout") == "dead"
