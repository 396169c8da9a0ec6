"""Mesh + sharding utilities (the framework's collective-communication layer).

Design (SURVEY.md §2c / §5): a 2-D ("data", "model") mesh over ICI. The
batch axis of every array program (feature extraction, training, eval) is
sharded over "data"; large dense/conv kernels are sharded over "model"
(tensor parallelism). XLA inserts psum/all-gather/reduce-scatter as needed —
no hand-written NCCL-style calls. Metric reductions ride the same jit.

Scale notes: all pipeline models fit on one chip, so "model" is a
demonstration/robustness axis (the reference's largest model is
EfficientNet-B0); the throughput win is batch sharding of extraction and
tuning sweeps.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, model_parallel: int = 1, devices=None,
             dcn_replicas: int = 1) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    ``dcn_replicas > 1`` adds a leading "replica" axis for multi-slice
    pods (SURVEY.md §5: "1-D data mesh over ICI with optional DCN axis"):
    the mesh becomes ("replica", "data", "model") with "replica" laid out
    across slice boundaries (DCN) and "data"/"model" within a slice (ICI),
    so the per-step gradient psum reduces hierarchically — reduce-scatter
    over ICI first, one small cross-slice all-reduce over DCN. On real
    multi-slice hardware the layout comes from
    ``mesh_utils.create_hybrid_device_mesh`` (slice-granule placement);
    single-slice or virtual-CPU backends fall back to a plain reshape,
    which keeps the axis semantics compilable anywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but the active "
                f"'{devices[0].platform if devices else '?'}' backend exposes only "
                f"{len(devices)} device(s). For a virtual multi-device run, start the "
                "process with JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
                "set BEFORE jax is imported (see tests/conftest.py)."
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % (model_parallel * dcn_replicas) != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel} "
            f"x dcn_replicas={dcn_replicas}"
        )
    data = n // (model_parallel * dcn_replicas)
    if dcn_replicas == 1:
        arr = np.array(devices).reshape(data, model_parallel)
        return Mesh(arr, axis_names=("data", "model"))
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, data, model_parallel), (dcn_replicas, 1, 1), devices=devices
        )
    except Exception:
        # virtual CPU devices / single-slice backends carry no slice
        # topology — axis placement is simulated but the program is
        # identical, so tests and dryruns exercise the real sharding
        arr = np.array(devices).reshape(dcn_replicas, data, model_parallel)
    return Mesh(arr, axis_names=("replica", "data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis — and over the
    cross-slice replica axis too when the mesh has one (each slice handles
    a contiguous shard of the global batch)."""
    if "replica" in mesh.axis_names:
        return NamedSharding(mesh, P(("replica", "data")))
    return NamedSharding(mesh, P("data"))


def data_axis_size(mesh: Mesh) -> int:
    """How many ways batch_sharding splits the batch (replica x data on a
    multi-slice mesh) — the divisor a global batch size must respect."""
    n = mesh.shape["data"]
    if "replica" in mesh.axis_names:
        n *= mesh.shape["replica"]
    return n


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a host array with its batch axis split over the data axis."""
    return jax.device_put(jnp.asarray(x), batch_sharding(mesh))


def param_shardings(params, mesh: Mesh):
    """Per-leaf NamedShardings: 2D+ kernels whose last dim divides evenly
    over the model axis are tensor-sharded on that dim; everything else is
    replicated."""
    m = mesh.shape["model"]

    def rule(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.shape[-1] % m == 0 and leaf.shape[-1] >= m:
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def make_sharded_train_step(apply_fn, optimizer, mesh: Mesh):
    """jit a (params, opt_state, batch_x, batch_y, rng) -> (params,
    opt_state, loss, acc) step with batch data-sharded and parameters
    tensor-sharded per param_shardings. ``apply_fn(params, x, rng)`` must
    return logits for the full local batch.

    Collectives are inserted by XLA from the sharding annotations: gradient
    reduction over "data" (psum / reduce-scatter) and activation collectives
    over "model"."""

    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            logits = apply_fn(p, x, rng)
            losses = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return jnp.mean(losses), acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    data_shard = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(None, None, data_shard, data_shard, None),
        donate_argnums=(0, 1),
    )


def place_train_state(params, opt_state, mesh: Mesh):
    """Shard parameters (and matching optimizer state) onto the mesh."""
    shardings = param_shardings(params, mesh)
    params = jax.tree_util.tree_map(jax.device_put, params, shardings)

    def place_opt(leaf):
        # optimizer moments mirror parameter shapes; shard the ones that do
        if hasattr(leaf, "ndim"):
            return jax.device_put(leaf, _matching_sharding(leaf, mesh))
        return leaf

    opt_state = jax.tree_util.tree_map(place_opt, opt_state)
    return params, opt_state


def _matching_sharding(leaf, mesh: Mesh):
    m = mesh.shape["model"]
    if leaf.ndim >= 2 and leaf.shape[-1] % m == 0 and leaf.shape[-1] >= m:
        return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ["model"])))
    return NamedSharding(mesh, P())
