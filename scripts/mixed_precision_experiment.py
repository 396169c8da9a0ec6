"""A/B the flagship-CNN train step in f32 vs bf16 compute on the real chip.

Question (round 3): DEFAULT-precision f32 convs already run single-pass
bf16 on the MXU, so the only thing bf16 *activations* can buy is HBM
traffic (the B=512 mel input batch alone is 41 MB f32). Variants:

  f32        — current trainer path (params f32, activations f32)
  bf16_act   — params f32, input + activations bf16 (flax dtype=bf16),
               logits upcast to f32 for the loss; grads/optimizer f32
  bf16_data  — bf16_act + the device-resident dataset stored bf16
               (halves the per-step gather traffic and dataset HBM)

Run: python scripts/mixed_precision_experiment.py [--steps 8] [--iters 3]
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class CNN(nn.Module):
    """Flagship CNN ([16,64,64], strides 4/2) with a compute dtype knob."""

    filters: tuple = (16, 64, 64)
    n_classes: int = 27
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for i, f in enumerate(self.filters):
            stride = 4 if i == 0 else (2 if i == 1 else 1)
            x = nn.relu(nn.Conv(f, (3, 3), strides=(stride, stride),
                                padding="SAME", dtype=self.dtype)(x))
            if stride == 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.n_classes, dtype=self.dtype)(x).astype(jnp.float32)


def build_epoch(module, optimizer):
    def loss_fn(p, x, y, key):
        logits = module.apply({"params": p}, x, train=True, rngs={"dropout": key})
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, y))

    @jax.jit
    def run_epoch(p, opt_state, X, y, idx_mat, key):
        def body(carry, idx):
            p, opt_state, key = carry
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(p, X[idx], y[idx], sub)
            updates, opt_state = optimizer.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return (p, opt_state, key), loss

        (p, opt_state, _), losses = jax.lax.scan(body, (p, opt_state, key), idx_mat)
        return p, opt_state, jnp.mean(losses)

    return run_epoch


def timed(fn, iters, rounds):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        out.block_until_ready()
        float(out.ravel()[0])  # force real completion through the tunnel
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args(argv)

    Bt, steps = args.batch, args.steps
    T, n_mels = 501, 40
    mel_shape = (T, n_mels, 1)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    kx, ky = jax.random.split(jax.random.PRNGKey(3))
    X32 = jax.jit(lambda k: jax.random.normal(k, (Bt * steps, *mel_shape), jnp.float32))(kx)
    y = jax.jit(lambda k: jax.random.randint(k, (Bt * steps,), 0, 27, jnp.int32))(ky)
    Xbf = jax.jit(lambda a: a.astype(jnp.bfloat16))(X32)
    idx_mat = jnp.arange(Bt * steps, dtype=jnp.int32).reshape(steps, Bt)
    optimizer = optax.adam(1e-3)

    results = {}
    for name, dtype, X in (
        ("f32", jnp.float32, X32),
        ("bf16_act", jnp.bfloat16, X32),
        ("bf16_data", jnp.bfloat16, Xbf),
    ):
        module = CNN(dtype=dtype)
        params = module.init(jax.random.PRNGKey(1), jnp.zeros((1, *mel_shape), X.dtype), train=True)["params"]
        opt_state = optimizer.init(params)
        run_epoch = build_epoch(module, optimizer)
        key = jax.random.PRNGKey(2)
        fn = lambda: run_epoch(params, opt_state, X, y, idx_mat, key)[2]
        fn().block_until_ready()  # compile
        epoch_s = timed(fn, args.iters, args.rounds)
        step_ms = epoch_s / steps * 1e3
        clips = Bt * steps / epoch_s
        results[name] = (step_ms, clips)
        print(f"{name:10s} step={step_ms:7.2f} ms  {clips:10.0f} clips/s")

    base = results["f32"][1]
    for name, (_, clips) in results.items():
        print(f"{name:10s} speedup vs f32: {clips / base:5.2f}x")


if __name__ == "__main__":
    main()
