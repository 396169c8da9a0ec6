"""Teacher-scale training MFU on the real chip.

bench.py's training metric measures the flagship *edge* CNN, whose 1-16-64
channel convs cannot fill 128-wide MXU tiles — its ~1.2% MFU is a property
of the workload (docs/TRAINING_PERF.md). This script measures the training
step of the stack's LARGEST model, the EfficientNet-B0 spectrogram teacher
(reference deep.py:592-905 role), where the arithmetic intensity is real:
mel (501, 40, 1) -> RGB square -> 224x224 backbone -> head, full backward
pass, Adam.

Usage:
    python scripts/teacher_mfu_bench.py [--batch 64] [--steps 4]
        [--image-size 224] [--bf16]

Prints one JSON line with step time, clips/s, TFLOP/s, and MFU vs the v5e
bf16 MXU peak (197 TFLOP/s). Run in a healthy tunnel window; the first
compile is 30-90 s.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4, help="scan'd steps per dispatch")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 activations (params/grads/opt stay f32)")
    args = ap.parse_args()

    import optax

    from audio_edge_ml_pipeline_tpu.models.deep import EfficientNetTeacherModule

    B, steps = args.batch, args.steps
    n_classes = 27
    mel_shape = (501, 40, 1)
    module = EfficientNetTeacherModule(n_classes, 0.2, args.image_size)

    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1,) + mel_shape, jnp.float32), train=False,
    )
    params = variables["params"]
    collections = {k: v for k, v in variables.items() if k != "params"}
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    # synthesize the epoch ON DEVICE — a (B*steps, 501, 40, 1) upload through
    # the tunnel can stall minutes under congestion (CLAUDE.md)
    kx, ky = jax.random.split(jax.random.PRNGKey(3))
    X = jax.jit(lambda k: jax.random.normal(k, (B * steps, *mel_shape), jnp.float32))(kx)
    y = jax.jit(lambda k: jax.random.randint(k, (B * steps,), 0, n_classes, jnp.int32))(ky)
    idx_mat = jnp.arange(B * steps, dtype=jnp.int32).reshape(steps, B)
    act_dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    def loss_fn(p, x, yb, rng_key):
        logits = module.apply(
            {"params": p, **collections}, x.astype(act_dtype), train=True,
            rngs={"dropout": rng_key},
        )
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits.astype(jnp.float32), yb)
        )

    @jax.jit
    def run_epoch(p, s, Xd, yd, idx, rng_key):
        def body(carry, ix):
            p, s, rng_key = carry
            rng_key, sub = jax.random.split(rng_key)
            loss, grads = jax.value_and_grad(loss_fn)(p, Xd[ix], yd[ix], sub)
            updates, s = optimizer.update(grads, s, p)
            return (optax.apply_updates(p, updates), s, rng_key), loss

        (p, s, _), losses = jax.lax.scan(body, (p, s, rng_key), idx)
        return p, s, jnp.mean(losses)

    key = jax.random.PRNGKey(2)
    # warmup (compile + first-fetch pathologies), then min-of-rounds
    run_epoch(params, opt_state, X, y, idx_mat, key)[2].block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            run_epoch(params, opt_state, X, y, idx_mat, key)[2].block_until_ready()
        times.append((time.perf_counter() - t0) / 2)
    epoch_s = min(times)
    step_ms = epoch_s / steps * 1e3

    out = {
        "model": "efficientnet_teacher",
        "batch": B,
        "image_size": args.image_size,
        "activations": "bf16" if args.bf16 else "f32",
        "step_ms": round(step_ms, 2),
        "clips_per_sec": round(B * steps / epoch_s, 1),
    }
    try:
        flops = run_epoch.lower(params, opt_state, X, y, idx_mat, key) \
            .compile().cost_analysis()["flops"]
        out["gflop_per_step"] = round(float(flops) / steps / 1e9, 1)
        out["tflops_per_sec"] = round(float(flops) / epoch_s / 1e12, 2)
        out["mfu_vs_bf16_peak"] = round(float(flops) / epoch_s / 197e12, 4)
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
