"""Batched deep-trial tuning: TPE trials trained CONCURRENTLY on device.

The reference parallelizes classical tuning with a process pool but runs
deep (Keras) trials strictly sequentially (training/tune.py:269-276,
439-620). SURVEY §2c names device-parallel trials as the TPU-native
equivalent; this module implements it:

- the Study runs ask-tell in rounds of ``tune_parallel`` trials: k
  parameter sets are drawn from the current TPE posterior (running trials
  are invisible to the sampler — standard batch TPE);
- drawn trials are grouped by SHAPE SIGNATURE (filters / strides /
  batch_size / every knob that changes the traced program). Within a
  group, learning_rate and dropout are RUNTIME VECTORS: one jitted
  program trains the whole group via ``jax.vmap`` over stacked parameter
  pytrees — dropout enters as a traced rate (models/deep.py ``_dropout``)
  and Adam's step size is applied as ``-lr * scale_by_adam(update)``;
- with ``devices > 1`` the trial axis is sharded over a 1-D mesh so
  trials genuinely occupy different chips;
- per-epoch validation accuracy is reported to the pruner per trial
  (pruned trials stop counting — the batch keeps its wall-clock);
- the best trial is REFIT through the normal FlaxTrainer.fit path so its
  artifacts (model bundle, reports, tracking run) are identical to the
  sequential path's.

Divergence from the sequential path (documented): trial VALUES come from
the final sweep epoch without early stopping — ranking-equivalent for
short sweeps; the winner's metrics come from the full refit.
"""

from __future__ import annotations

import json
import logging
from typing import Callable, Optional

import numpy as np

logger = logging.getLogger(__name__)

# knobs trainable as runtime vectors inside one compiled program
VMAPPED = ("learning_rate", "dropout")
# model families whose modules accept a traced dropout_rate
BATCHABLE_MODELS = {"cnn", "mlp", "ds_cnn", "rnn", "transformer"}


def shape_key(params: dict) -> tuple:
    """Hashable signature of every shape/trace-affecting knob. `epochs` is
    excluded like the vmapped knobs: every sweep trial trains sweep_epochs
    regardless (a sampled epochs applies only after the study), so it must
    not split otherwise-identical trials into separate compiled groups."""
    return tuple(sorted((k, json.dumps(v, sort_keys=True))
                        for k, v in params.items() if k not in VMAPPED and k != "epochs"))


def _group_norm_stats(X: np.ndarray):
    axes = tuple(range(X.ndim - 1))
    mean = X.mean(axis=axes).astype(np.float32)
    std = np.sqrt(X.var(axis=axes) + 1e-6).astype(np.float32)
    return mean, std


# jitted group runners cached by architecture: a shape group seen in a later
# ask-tell round (or a second study) reuses its compiled program instead of
# retracing (CLAUDE.md jit-cache invariant)
_RUNNER_CACHE: dict = {}


def _get_runner(arch_json: str):
    if arch_json in _RUNNER_CACHE:
        return _RUNNER_CACHE[arch_json]

    import jax
    import jax.numpy as jnp
    import optax

    from ..models.deep import _MODULE_FACTORY

    arch = json.loads(arch_json)
    module = _MODULE_FACTORY[arch["type"]](arch)
    # collections (BatchNorm batch_stats) present iff the module mutates them
    probe = module.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
                        jnp.zeros((1,) + tuple(arch["input_shape"]), jnp.float32), train=False)
    mutable = tuple(sorted(c for c in probe if c != "params"))
    tx = optax.scale_by_adam()

    def one_epoch(params, cols, opt, lr, rate, rng, Xd, yd, idx_mat):
        def step(carry, idx):
            params, cols, opt, rng = carry
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                xb = jnp.take(Xd, idx, axis=0)
                yb = jnp.take(yd, idx, axis=0)
                v = {"params": p, **cols}
                if mutable:
                    logits, new_cols = module.apply(
                        v, xb, train=True, dropout_rate=rate,
                        rngs={"dropout": sub}, mutable=list(mutable),
                    )
                else:
                    logits = module.apply(v, xb, train=True, dropout_rate=rate,
                                          rngs={"dropout": sub})
                    new_cols = cols
                loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, yb))
                return loss, new_cols

            (loss, new_cols), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt = tx.update(grads, opt)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            return (params, dict(new_cols), opt, rng), loss

        (params, cols, opt, rng), losses = jax.lax.scan(step, (params, cols, opt, rng), idx_mat)
        return params, cols, opt, rng, jnp.mean(losses)

    vm_epoch = jax.jit(jax.vmap(one_epoch, in_axes=(0, 0, 0, 0, 0, 0, None, None, None)))

    def fwd(params, cols, xb):
        return module.apply({"params": params, **cols}, xb, train=False)

    vm_fwd = jax.jit(jax.vmap(fwd, in_axes=(0, 0, None)))

    _RUNNER_CACHE[arch_json] = (module, vm_epoch, vm_fwd, tx)
    return _RUNNER_CACHE[arch_json]


def train_trial_group(
    model_name: str,
    draws: list[dict],
    X_train: np.ndarray,
    y_train: np.ndarray,
    X_val: np.ndarray,
    y_val: np.ndarray,
    n_classes: int,
    sweep_epochs: int,
    seed: int = 42,
    devices: int = 1,
    epoch_cb: Optional[Callable[[int, int, float], bool]] = None,
) -> list[dict]:
    """Train all ``draws`` (same shape signature) as one vmapped program.

    epoch_cb(trial_index, epoch, val_accuracy) is a pure observation hook
    (its return value is ignored): the batch always trains to sweep_epochs,
    so callers track pruning decisions themselves — run_study_batched
    records should_prune() verdicts in a set and tells the study afterwards.

    Returns one dict per trial: {val_accuracy, val_f1_macro, history}.
    """
    import jax
    import jax.numpy as jnp
    from sklearn.metrics import f1_score

    from ..models import get_model

    k_real = len(draws)
    n_dev = 1
    if devices > 1:
        n_dev = min(devices, len(jax.devices()), max(k_real, 1))
        pad = (-k_real) % n_dev
        if pad:
            # pad the trial axis with copies of the last draw so the batch
            # shards evenly; padded results are sliced off below
            draws = list(draws) + [draws[-1]] * pad
    k = len(draws)
    proto = get_model(model_name)(
        epochs=sweep_epochs, **{kk: v for kk, v in draws[0].items() if kk != "epochs"}
    )
    X = proto._prepare_input(np.asarray(X_train)).astype(np.float32)
    Xv = proto._prepare_input(np.asarray(X_val)).astype(np.float32)
    y = np.asarray(y_train).astype(np.int32)
    yv = np.asarray(y_val).astype(np.int32)
    mean, std = _group_norm_stats(X)
    X = (X - mean) / std
    Xv = (Xv - mean) / std

    # the module's static dropout attr is irrelevant (every apply passes a
    # runtime dropout_rate) — pin it so the cache key / compiled program is
    # shared across draws that differ only in sampled dropout
    arch = {**proto._arch(X.shape[1:], n_classes), "dropout": 0.0}
    module, vm_epoch, vm_fwd, tx = _get_runner(json.dumps(arch, sort_keys=True))
    lrs = jnp.asarray([float(d.get("learning_rate", proto.learning_rate)) for d in draws],
                      jnp.float32)
    rates = jnp.asarray([float(d.get("dropout", proto.dropout)) for d in draws], jnp.float32)

    def init_one(key):
        return module.init({"params": key, "dropout": key},
                           jnp.zeros((1,) + X.shape[1:], jnp.float32), train=False)

    keys = jax.random.split(jax.random.PRNGKey(seed), k)
    variables = jax.vmap(init_one)(keys)
    params = variables["params"]
    cols = {c: v for c, v in variables.items() if c != "params"}

    opt_state = jax.vmap(tx.init)(params)

    n = len(X)
    bs = min(proto.batch_size, n)
    steps = max(1, n // bs)

    # optional trial-axis sharding over a 1-D device mesh (k is always a
    # multiple of n_dev — the trial axis was padded above)
    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("trials",))
        spec = NamedSharding(mesh, P("trials"))
        params = jax.tree.map(lambda a: jax.device_put(a, spec), params)
        cols = jax.tree.map(lambda a: jax.device_put(a, spec), cols)
        opt_state = jax.tree.map(lambda a: jax.device_put(a, spec), opt_state)
        lrs = jax.device_put(lrs, spec)
        rates = jax.device_put(rates, spec)
        logger.info("trial batch of %d (%d real) sharded over %d devices", k, k_real, n_dev)

    Xd, yd, Xvd = jnp.asarray(X), jnp.asarray(y), jnp.asarray(Xv)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(seed + 1, seed + 1 + k))
    np_rng = np.random.default_rng(seed)
    history: list[np.ndarray] = []
    preds = None
    for epoch in range(sweep_epochs):
        perm = np_rng.permutation(n)
        take = steps * bs
        idx_mat = perm[:take].reshape(steps, bs).astype(np.int32)
        params, cols, opt_state, rngs, _ = vm_epoch(
            params, cols, opt_state, lrs, rates, rngs, Xd, yd, jnp.asarray(idx_mat)
        )
        logits = np.asarray(vm_fwd(params, cols, Xvd))  # (k, Nv, C)
        preds = logits.argmax(-1)
        accs = (preds == yv[None, :]).mean(axis=1)
        history.append(accs)
        if epoch_cb is not None:
            for i in range(k_real):  # padded duplicates are not trials
                epoch_cb(i, epoch, float(accs[i]))

    if preds is None:  # sweep_epochs == 0: score the untrained init
        preds = np.asarray(vm_fwd(params, cols, Xvd)).argmax(-1)
    out = []
    hist = np.stack(history) if history else np.zeros((0, k))  # (epochs, k)
    for i in range(k_real):
        out.append({
            "val_accuracy": float((preds[i] == yv).mean()),
            "val_f1_macro": float(f1_score(yv, preds[i], average="macro", zero_division=0)),
            "history": hist[:, i].tolist(),
        })
    return out


def run_study_batched(
    study,
    search_space: dict,
    fixed: dict,
    sample_fn: Callable,
    model_name: str,
    X_train, y_train, X_val, y_val,
    n_classes: int,
    n_trials: int,
    sweep_epochs: int,
    batch_k: int,
    seed: int = 42,
    devices: int = 1,
) -> dict[int, dict]:
    """Drive the Study with ask-tell rounds of ``batch_k`` trials. Returns
    {trial_number: {params, val_accuracy, val_f1_macro}} for completed
    trials; study state (COMPLETE/PRUNED values) is updated in place."""
    from . import search

    results: dict[int, dict] = {}
    done = 0
    while done < n_trials:
        k = min(batch_k, n_trials - done)
        trials = [study.ask() for _ in range(k)]
        draws = [{**fixed, **(sample_fn(t, search_space) if search_space else {})}
                 for t in trials]
        groups: dict[tuple, list[int]] = {}
        for i, d in enumerate(draws):
            groups.setdefault(shape_key(d), []).append(i)
        logger.info("batch of %d trial(s) in %d shape group(s)", k, len(groups))
        for members in groups.values():
            pruned = set()

            def epoch_cb(local_i, epoch, acc, members=members, trials=trials, pruned=pruned):
                t = trials[members[local_i]]
                t.report(acc, step=epoch)
                if t.should_prune():
                    pruned.add(members[local_i])
                return False

            group_draws = [draws[i] for i in members]
            try:
                metrics = train_trial_group(
                    model_name, group_draws, X_train, y_train, X_val, y_val,
                    n_classes, sweep_epochs, seed=seed, devices=devices,
                    epoch_cb=epoch_cb,
                )
            except Exception as exc:
                logger.warning("trial group failed: %s", exc)
                for i in members:
                    study.tell(trials[i], state=search.TrialState.FAIL)
                continue
            for local_i, i in enumerate(members):
                if i in pruned:
                    study.tell(trials[i], state=search.TrialState.PRUNED)
                else:
                    value = metrics[local_i]["val_f1_macro"]
                    study.tell(trials[i], value=value)
                    results[trials[i].number] = {"params": draws[i], **metrics[local_i]}
        done += k
    return results
