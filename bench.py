"""Benchmark: fsc22 mel-spectrogram + CNN pipeline throughput (clips/s/chip).

The driver-set target (BASELINE.json north_star) is >= 10,000 fsc22
clips/sec/chip for mel extraction on TPU v5e with <= 1e-5 parity vs the
librosa contract. This bench measures the full waveform -> mel (40 mel,
n_fft 512, hop 160, 16 kHz, 5 s clips) -> device-CNN forward pipeline on
device-resident batches, and verifies parity against the float64 oracle as
a gate (a fast wrong kernel scores 0).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_CLIPS_PER_SEC = 10_000.0  # driver target


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audio_edge_ml_pipeline_tpu.models.deep import CNNModule
    from audio_edge_ml_pipeline_tpu.ops import dsp, golden

    sr, seconds = 16000, 5.0
    n = int(sr * seconds)
    n_mels, n_fft, hop = 40, 512, 160

    # fsc22-shaped synthetic batch (harmonics + noise + transients)
    rng = np.random.default_rng(42)
    t = np.arange(n) / sr
    base = []
    for i in range(8):
        y = (
            0.5 * np.sin(2 * np.pi * (150 + 130 * i) * t)
            + 0.2 * np.sin(2 * np.pi * (430 + 310 * i) * t)
            + 0.06 * rng.standard_normal(n)
        )
        y[i * 7000 : i * 7000 + 3000] += 0.5 * rng.standard_normal(3000)
        base.append((0.8 * y / np.abs(y).max()).astype(np.float32))
    base = np.stack(base)

    # parity gate vs the float64 oracle
    small = jax.jit(lambda x: dsp.mel_spec_feature(x, sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop))
    got = np.asarray(small(jnp.asarray(base)))
    ref = np.stack([golden.mel_spec_feature(base[i], sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop) for i in range(len(base))])
    parity = float(np.max(np.abs(got - ref)))
    if parity > 1e-5:
        print(json.dumps({"metric": "fsc22 mel+CNN clips/sec/chip", "value": 0.0, "unit": "clips/s",
                          "vs_baseline": 0.0, "error": f"parity {parity:.2e} > 1e-5"}))
        return

    # flagship pipeline: mel -> CNN(16,64,64 fs=4 ss=2) forward
    module = CNNModule((16, 64, 64), dropout=0.3, n_classes=27, first_stride=4, second_stride=2)
    T = 1 + n // hop
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, T, n_mels, 1), jnp.float32), train=False)["params"]

    @jax.jit
    def pipeline(p, waves):
        mel = dsp.mel_spec_feature(waves, sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop)
        x = jnp.transpose(mel, (0, 2, 1))[..., None]
        return module.apply({"params": p}, x, train=False)

    # batch sweep on v5e (conv-era: 512 -> 35k ... 4096 -> 41.6k clips/s);
    # folded-GEMM STFT lifted 4096 to 54.4k; gathering the folded halves
    # directly (no frames-tensor HBM round trip) to 78.5k, and the freed
    # HBM allows B=8192 (~80k). Falls back to 4096 if the chip OOMs.
    # upload only the 8 base clips (~2.5 MB) and tile ON DEVICE — shipping
    # the tiled (B, 80000) batch through the tunnel is 2.6 GB and can stall
    # for many minutes under congestion (CLAUDE.md tunnel pathologies)
    base_dev = jax.device_put(jnp.asarray(base))
    tile_dev = jax.jit(lambda b, reps: jnp.tile(b, (reps, 1)), static_argnames="reps")
    B = 8192
    try:
        waves = tile_dev(base_dev, reps=B // len(base))
        pipeline(params, waves).block_until_ready()
    except Exception as exc:
        # only an OOM justifies the smaller-batch fallback; anything else
        # (compile error, bad params) must not hide behind a 4096 score
        msg = str(exc)
        if not ("RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg or "out of memory" in msg.lower()):
            raise
        import sys
        print(f"B=8192 OOM, falling back to 4096: {msg.splitlines()[0][:160]}", file=sys.stderr)
        B = 4096
        waves = tile_dev(base_dev, reps=B // len(base))

    def _barrier(out):
        # block_until_ready has been observed returning before the device
        # actually finishes on the tunneled backend (async bookkeeping);
        # fetching one scalar forces real completion (in-order stream, so
        # the last dispatch completing implies all prior ones did).
        out.block_until_ready()
        np.asarray(jax.device_get(out.ravel()[0]))

    def timed(fn, *args, iters=10, rounds=5):
        _barrier(fn(*args))  # compile + absorb first-fetch warmup

        def loop(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*args)
            _barrier(out)
            return time.perf_counter() - t0

        # the barrier itself costs a tunnel round trip; difference the best
        # k-iter and 2k-iter loops so that fixed cost cancels exactly.
        # Under tunnel noise the difference can degenerate (best2 <= best1);
        # fall back to the plain best1/iters bound rather than reporting a
        # nonsense near-zero per-iter time.
        best1 = min(loop(iters) for _ in range(rounds))
        best2 = min(loop(2 * iters) for _ in range(rounds))
        diff = (best2 - best1) / iters
        if diff <= 0.1 * best1 / iters:
            return best1 / iters  # conservative: includes the barrier cost
        return diff

    clips_per_sec = B / timed(pipeline, params, waves)

    # extraction-only (the literal BASELINE.json north-star metric), plus the
    # Pallas-vs-XLA A/B on the mel core (VERDICT r1 item 6)
    extract_xla = jax.jit(lambda w: dsp.mel_spec_feature(w, sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop))
    extraction_xla = B / timed(extract_xla, waves)
    extraction_pallas = None
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        try:
            from audio_edge_ml_pipeline_tpu.ops.pallas_mel import mel_spec_feature_pallas

            # apples-to-apples A/B at 4096: the Pallas kernel's XLA-side
            # p/m prep needs more live HBM than the fused XLA path and
            # OOMs at 8192
            B_ab = min(B, 4096)
            w_ab = waves[:B_ab]
            extract_pl = jax.jit(
                lambda w: mel_spec_feature_pallas(w, sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop)
            )
            pl = B_ab / timed(extract_pl, w_ab)
            xla_ab = B_ab / timed(extract_xla, w_ab)
            extraction_pallas = pl
            result_ab = {"pallas": round(pl, 1), "xla_same_batch": round(xla_ab, 1)}
        except Exception as exc:  # record the failure, don't sink the bench
            extraction_pallas = f"failed: {str(exc).splitlines()[0][:160]}"
            result_ab = None

    # -- training throughput: flagship CNN, one scan'd epoch ---------------
    # (VERDICT r2 item 4: clips/s, step time, estimated MFU on this chip)
    train_metrics = {}
    try:
        import optax

        Bt, steps = 512, 8
        mel_shape = (T, n_mels, 1)
        tparams = module.init(
            jax.random.PRNGKey(1), jnp.zeros((1,) + mel_shape, jnp.float32), train=True
        )["params"]
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(tparams)
        # synthesize the training batch ON DEVICE (~330 MB — no tunnel upload)
        kx, ky = jax.random.split(jax.random.PRNGKey(3))
        Xtr = jax.jit(lambda k: jax.random.normal(k, (Bt * steps, *mel_shape), jnp.float32))(kx)
        ytr = jax.jit(lambda k: jax.random.randint(k, (Bt * steps,), 0, 27, jnp.int32))(ky)
        idx_mat = jnp.arange(Bt * steps, dtype=jnp.int32).reshape(steps, Bt)

        def loss_fn(p, x, y, rng_key):
            logits = module.apply({"params": p}, x, train=True, rngs={"dropout": rng_key})
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, y))

        @jax.jit
        def run_epoch(p, opt_state, X, y, idx_mat, rng_key):
            def body(carry, idx):
                p, opt_state, rng_key = carry
                rng_key, sub = jax.random.split(rng_key)
                loss, grads = jax.value_and_grad(loss_fn)(p, X[idx], y[idx], sub)
                updates, opt_state = optimizer.update(grads, opt_state, p)
                p = optax.apply_updates(p, updates)
                return (p, opt_state, rng_key), loss
            (p, opt_state, _), losses = jax.lax.scan(body, (p, opt_state, rng_key), idx_mat)
            return p, opt_state, jnp.mean(losses)

        key = jax.random.PRNGKey(2)
        epoch_s = timed(lambda: run_epoch(tparams, opt_state, Xtr, ytr, idx_mat, key)[2],
                        iters=3, rounds=3)
        step_ms = epoch_s / steps * 1e3
        train_metrics["train_clips_per_sec"] = round(Bt * steps / epoch_s, 1)
        train_metrics["train_step_ms_b512"] = round(step_ms, 2)
        try:
            flops = run_epoch.lower(tparams, opt_state, Xtr, ytr, idx_mat, key) \
                .compile().cost_analysis()["flops"]
            # MFU vs the v5e bf16 MXU peak (197 TFLOP/s); DEFAULT-precision
            # training convs execute as single-pass bf16 on the MXU
            train_metrics["train_mfu_vs_bf16_peak"] = round(
                float(flops) / epoch_s / 197e12, 4
            )
            train_metrics["train_tflops_per_sec"] = round(float(flops) / epoch_s / 1e12, 2)
        except Exception:
            pass  # cost_analysis unavailable on some backends
    except Exception as exc:
        train_metrics["train_bench_error"] = str(exc).splitlines()[0][:160]

    # -- secondary extractor/augment throughputs (VERDICT r3 item 3) -------
    # classical 302-d vector, CQT, imgdsp images/s, device-vocoder copies/s:
    # these previously lived only in docs/EXTRACTION_PERF.md prose, where a
    # regression would ship invisibly. Each is parity-gated (same oracles
    # and tolerances as the test suite) and reported in the bench line.
    # Free the flagship HBM residents first — CQT's blocked frames tensor
    # budget (~512 MB/step) plus the 2.6 GB B=8192 wave batch don't coexist.
    waves = None
    try:
        del Xtr, ytr
    except NameError:
        pass
    try:
        del w_ab  # the 4096-clip Pallas A/B batch (~1.3 GB) is also live
    except NameError:
        pass
    secondary = {}
    # CPU smoke runs measure nothing meaningful at chip batch sizes (the
    # imgdsp GEMM formulation alone is ~15 img/s on XLA:CPU) — shrink them
    # so the code path still executes end-to-end everywhere.
    Bc, Bq, Bi, Bv = (2048, 512, 512, 64) if on_tpu else (64, 16, 8, 8)

    def _sec_gate(tag: str, got, ref, tol: float) -> bool:
        d = float(np.max(np.abs(np.asarray(got) - np.asarray(ref))))
        if d > tol:
            secondary[f"{tag}_error"] = f"parity {d:.2e} > {tol:g}"
            return False
        return True

    def _clips(n_clips: int, sr_x: int, seconds_x: float) -> np.ndarray:
        rng_x = np.random.default_rng(7)
        nx = int(sr_x * seconds_x)
        tx = np.arange(nx) / sr_x
        out = []
        for i in range(n_clips):
            y = (
                0.5 * np.sin(2 * np.pi * (160 + 140 * i) * tx)
                + 0.2 * np.sin(2 * np.pi * (450 + 290 * i) * tx)
                + 0.06 * rng_x.standard_normal(nx)
            )
            out.append((0.8 * y / np.abs(y).max()).astype(np.float32))
        return np.stack(out)

    # classical 302-d vector: 22.05 kHz 5 s clips, B=2048 (EXTRACTION_PERF).
    # The vector mixes physical scales (centroid/rolloff in Hz ~kHz, zcr in
    # [0,1]) so the gate is per-dimension RELATIVE at 1e-4, exactly the
    # suite's test_classical_vector_parity contract — an abs 1e-5 gate here
    # measured 5.7e-4 on chip purely from the Hz-scale dimensions.
    try:
        base_c = _clips(8, 22050, 5.0)
        classical = jax.jit(lambda w: dsp.classical_feature_vector(w, sr=22050))
        got_c = np.asarray(classical(jnp.asarray(base_c[:4])))
        ref_c = np.stack(
            [golden.classical_feature_vector(base_c[i], sr=22050) for i in range(4)]
        )
        rel_c = float(
            np.max(np.abs(got_c - ref_c) / np.maximum(np.abs(ref_c), 1.0))
        )
        if rel_c > 1e-4:
            secondary["classical_vector_error"] = f"rel parity {rel_c:.2e} > 1e-4"
        else:
            w_c = tile_dev(jax.device_put(jnp.asarray(base_c)), reps=Bc // len(base_c))
            secondary["classical_vector_clips_per_sec"] = round(
                Bc / timed(classical, w_c, iters=3, rounds=3), 1
            )
            w_c = None
    except Exception as exc:
        secondary["classical_vector_error"] = str(exc).splitlines()[0][:160]

    # CQT: 22.05 kHz 5 s clips, B=512, blocked frames schedule (EXTRACTION_PERF).
    # Parity is gated on the suite's pinned fixture family (batch22k in
    # tests/test_dsp_parity.py — the contract the 1e-5 feature gate is
    # defined on): measured 7.1e-6 on chip. The bench's own normalized
    # dual-tone clips measured 2.2e-5 on chip (9.4e-6 on CPU) — their
    # near-floor bins amplify f32 kernel noise through the dB step, a
    # workload property, not a kernel regression (CLAUDE.md: the direct CQT
    # path is precision-bound; ~185 dB worst-bin fidelity is beyond f32).
    try:
        rng_q = np.random.default_rng(22)
        tq = np.arange(66150) / 22050.0
        fix_q = np.stack(
            [
                (
                    0.5 * np.sin(2 * np.pi * (220 + 97 * i) * tq)
                    + 0.1 * rng_q.standard_normal(66150)
                ).astype(np.float32)
                for i in range(2)
            ]
        )
        cqt = jax.jit(lambda w: dsp.cqt_feature(w, sr=22050, hop_length=512))
        got_q = np.asarray(cqt(jnp.asarray(fix_q)))
        ref_q = np.stack([golden.cqt_feature(fix_q[i], sr=22050, hop_length=512) for i in range(2)])
        if _sec_gate("cqt", got_q, ref_q, 1e-5):
            base_q = _clips(8, 22050, 5.0)
            w_q = tile_dev(jax.device_put(jnp.asarray(base_q)), reps=Bq // len(base_q))
            secondary["cqt_clips_per_sec"] = round(Bq / timed(cqt, w_q, iters=2, rounds=3), 1)
            w_q = None
    except Exception as exc:
        secondary["cqt_error"] = str(exc).splitlines()[0][:160]

    # image classical descriptors: 128x128 grays, B=512 (EXTRACTION_PERF)
    try:
        from audio_edge_ml_pipeline_tpu.features import image as fi
        from audio_edge_ml_pipeline_tpu.ops import imgdsp

        rng_i = np.random.default_rng(11)
        yy, xx = np.mgrid[0:128, 0:128]
        imgs = np.stack(
            [
                rng_i.random((128, 128), dtype=np.float32),
                ((yy * yy / 127.0 + xx) / 256.0).astype(np.float32),
                (np.kron(rng_i.random((16, 16)) > 0.5, np.ones((8, 8))) * 0.8 + 0.1).astype(np.float32),
                np.clip(rng_i.normal(0.5, 0.2, (128, 128)), 0, 1).astype(np.float32),
            ]
        )
        img_fn = jax.jit(imgdsp.classical_image_vector_batch)
        got_i = np.asarray(img_fn(jnp.asarray(imgs)))
        ref_i = np.stack([fi.classical_image_vector(g) for g in imgs])
        if _sec_gate("imgdsp", got_i, ref_i, 2e-4):
            # NB: tile_dev's (reps, 1) spec would tile the MIDDLE axis of a
            # 3-D (B, H, W) stack (numpy prepends the missing 1) — tile the
            # batch axis explicitly
            tile_img = jax.jit(
                lambda b, reps: jnp.tile(b, (reps, 1, 1)), static_argnames="reps"
            )
            w_i = tile_img(jax.device_put(jnp.asarray(imgs)), reps=Bi // len(imgs))
            secondary["imgdsp_images_per_sec"] = round(Bi / timed(img_fn, w_i, iters=3, rounds=3), 1)
            w_i = None
    except Exception as exc:
        secondary["imgdsp_error"] = str(exc).splitlines()[0][:160]

    # device vocoder kernel: per-clip-rate time_stretch, B=64 2 s clips.
    # Host-level wall clock (the API packs grids on host and fetches lists) —
    # the honest unit is copies/s through the whole kernel path. The 47.6
    # copies/s in docs is the FULL augment-stage run (decode+write included);
    # this kernel-level number is the regression guard for ops/effects_jax.
    try:
        from audio_edge_ml_pipeline_tpu.ops import effects_jax
        from audio_edge_ml_pipeline_tpu.ops.golden import effects as gold_fx

        base_v = _clips(Bv, 22050, 2.0)
        rates = np.linspace(0.8, 1.25, Bv)
        outs = effects_jax.time_stretch_batch(base_v[:2], rates[:2])  # compile + gate
        ok = True
        for b in range(2):
            ref_v = gold_fx.time_stretch(base_v[b].astype(np.float64), float(rates[b]))
            if not _sec_gate("vocoder", outs[b], ref_v.astype(np.float32), 2e-3):
                ok = False
                break
        if ok:
            effects_jax.time_stretch_batch(base_v, rates)  # warm the full-batch program
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                effects_jax.time_stretch_batch(base_v, rates)
                best = min(best, time.perf_counter() - t0)
            secondary["vocoder_stretch_copies_per_sec"] = round(len(base_v) / best, 1)
            # scope marker so this kernel-level number can't be conflated
            # with the FULL augment-stage run (decode+param-draw+write;
            # scripts/augment_backend_bench.py, 47.6 copies/s = 3.2x host
            # in docs/EXTRACTION_PERF.md)
            secondary["vocoder_metric_scope"] = "kernel B=64 2s clips; full-stage A/B = scripts/augment_backend_bench.py"
    except Exception as exc:
        secondary["vocoder_error"] = str(exc).splitlines()[0][:160]

    result = {
        "metric": "fsc22 mel+CNN clips/sec/chip",
        "value": round(clips_per_sec, 1),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
        "extraction_only_xla_clips_per_sec": round(extraction_xla, 1),
        **train_metrics,
        **secondary,
    }
    if extraction_pallas is not None:
        result["extraction_only_pallas_clips_per_sec"] = (
            round(extraction_pallas, 1) if isinstance(extraction_pallas, float) else extraction_pallas
        )
        if isinstance(extraction_pallas, float) and result_ab:
            result["mel_backend_winner"] = (
                "pallas" if result_ab["pallas"] > result_ab["xla_same_batch"] else "xla"
            )
            result["mel_ab_batch4096"] = result_ab
    print(json.dumps(result))


def _await_backend(budget_s: float | None = None, probe_timeout: float = 150.0,
                   interval: float = 120.0) -> bool:
    """Wait (bounded) for the backend to answer before dispatching the bench.

    The tunneled TPU has measured multi-hour dead windows (CLAUDE.md tunnel
    pathologies) that can end mid-window; probing in KILLABLE subprocesses —
    an in-process wedged jax call cannot be interrupted — converts a
    "tunnel dead at bench start but back 10 minutes later" run into a real
    score instead of a watchdog zero. Healthy backends (CPU smoke runs, a
    live chip) pass the first probe in seconds-to-a-minute. Returns False
    if the budget is exhausted without one healthy probe."""
    import os
    import subprocess
    import sys

    if budget_s is None:
        budget_s = float(os.environ.get("BENCH_HEALTH_BUDGET_S", 1800))
    code = (
        "import jax, jax.numpy as jnp;"
        "(jnp.ones((256,256)) @ jnp.ones((256,256))).block_until_ready()"
    )
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=probe_timeout,
                               capture_output=True, text=True)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            if attempt > 1:
                print(f"backend healthy after {attempt} probes", file=sys.stderr)
            return True
        if time.monotonic() + interval >= deadline:
            return False
        print(f"backend probe {attempt} failed; retrying in {interval:.0f}s",
              file=sys.stderr)
        time.sleep(interval)


def _watchdog(seconds: float | None = None):
    """Emit an honest zero-score JSON line and hard-exit if the run wedges.

    The tunneled backend has measured multi-hour unreachable windows where
    even `import jax; jax.devices()` never returns (CLAUDE.md tunnel
    pathologies) — without a watchdog the bench would hang silently past
    any driver timeout instead of recording WHY there is no number. The
    default 55 min is ~5x a healthy cold-cache TPU run (compiles included)
    and above a congested-but-alive one; override with BENCH_WATCHDOG_S
    (a 1-core CPU smoke run needs more)."""
    import os
    import threading

    if seconds is None:
        seconds = float(os.environ.get("BENCH_WATCHDOG_S", 3300))

    def fire():
        print(json.dumps({
            "metric": "fsc22 mel+CNN clips/sec/chip", "value": 0.0,
            "unit": "clips/s", "vs_baseline": 0.0,
            "error": f"watchdog: no result within {seconds:.0f}s — backend "
                     "unreachable or pathologically congested",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


if __name__ == "__main__":
    # the pre-flight gate is self-bounded (killable subprocess probes, hard
    # budget), so the watchdog starts AFTER it passes — gate time must not
    # eat the run budget of a just-recovered, still-congested backend
    if not _await_backend():
        print(json.dumps({
            "metric": "fsc22 mel+CNN clips/sec/chip", "value": 0.0,
            "unit": "clips/s", "vs_baseline": 0.0,
            "error": "backend unreachable for the entire pre-flight health "
                     "budget (BENCH_HEALTH_BUDGET_S) — bench not dispatched",
        }), flush=True)
        raise SystemExit(3)
    _wd = _watchdog()
    try:
        main()
    except Exception as exc:  # noqa: BLE001
        # A backend crash mid-run (measured 2026-08-20: JaxRuntimeError
        # FAILED_PRECONDITION when the tunneled TPU server restarts under a
        # live program) would otherwise exit with a traceback and NO JSON
        # line for the driver. One retry behind a fresh health gate covers
        # the transient process-level crash; a second failure (or an
        # unreachable backend) records WHY there is no number.
        import sys
        import traceback

        traceback.print_exc()
        print(f"bench attempt 1 crashed ({exc!r}); retrying after health gate",
              file=sys.stderr, flush=True)
        _wd.cancel()
        err = None
        if _await_backend():
            _wd = _watchdog()
            try:
                main()
            except Exception as exc2:  # noqa: BLE001
                traceback.print_exc()
                err = f"crashed twice: {exc!r}; retry: {exc2!r}"
        else:
            err = (f"crashed ({exc!r}) and backend unreachable for the "
                   "retry health budget")
        if err is not None:
            print(json.dumps({
                "metric": "fsc22 mel+CNN clips/sec/chip", "value": 0.0,
                "unit": "clips/s", "vs_baseline": 0.0, "error": err[:500],
            }), flush=True)
            raise SystemExit(3)
    _wd.cancel()
