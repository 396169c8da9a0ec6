"""Deep trainers: flax/optax train loops under jit (TPU-native replacement
for the reference's Keras trainers, models/deep.py:58-1217).

Registered names and architecture contracts match the reference:

``mlp``                  Dense stack [256, 128] + dropout, softmax head
``cnn``                  Conv2D 3x3-same blocks (+MaxPool unless that block
                         strides via first_stride/second_stride), GAP2D,
                         Dense(128), softmax  (stride logic: deep.py:407-420)
``rnn``                  stacked Bi-LSTM(128) -> Dense(64) -> softmax
``transformer``          n_blocks x (MHA + residual LN + FFN + residual LN)
                         -> GAP1D -> Dense(64) -> softmax
``efficientnet_teacher`` EfficientNet-B0 on spectrograms, 2-phase fine-tune
``distillation_cnn``     tiny CNN student with KD loss (T=4.0, alpha=0.7)

Training semantics carried over: input Normalization adapted on the train
set (here: explicit mean/var stats over all-but-last axes, applied before
the module); EarlyStopping(val_loss, patience=10, restore_best);
ReduceLROnPlateau(0.5, patience=5, min_lr=1e-6) as host-side loop logic
driving an injected optax hyperparameter; per-epoch metric streaming to the
tracking store; pretrained warm-start that skips normalization stats.

Persistence: a single ``.npz`` bundle (__meta__ JSON + norm stats + flat
params) readable by numpy alone — the deployment codegen consumes it
directly.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..train.evaluate import (
    compute_metrics,
    log_run_to_mlflow,
    save_classification_report,
    save_confusion_matrix_png,
    save_model_info,
)
from .base import BaseTrainer, TrainResult
from .registry import register_model

logger = logging.getLogger(__name__)

_KD_TEMPERATURE = 4.0
_KD_ALPHA = 0.7


# ---------------------------------------------------------------------------
# Flax modules
# ---------------------------------------------------------------------------


def _dropout(mod: nn.Module, x, rate, train: bool):
    """Inverted dropout accepting a (possibly traced) rate. nn.Dropout's
    rate is static module config, which would force one compiled program
    per sampled dropout value; taking the rate as a runtime scalar lets
    the batched trial trainer (train/tune_batched.py) vmap over it."""
    if not train:
        return x
    rng = mod.make_rng("dropout")
    keep = 1.0 - jnp.asarray(rate, jnp.float32)
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / jnp.maximum(keep, 1e-6), jnp.zeros_like(x))


class MLPModule(nn.Module):
    hidden_units: tuple[int, ...]
    dropout: float
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rate=None):
        rate = self.dropout if dropout_rate is None else dropout_rate
        for units in self.hidden_units:
            x = nn.relu(nn.Dense(units)(x))
            x = _dropout(self, x, rate, train)
        return nn.Dense(self.n_classes)(x)  # logits


class CNNModule(nn.Module):
    filters: tuple[int, ...]
    dropout: float
    n_classes: int
    first_stride: int = 1
    second_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rate=None):
        rate = self.dropout if dropout_rate is None else dropout_rate
        for i, f in enumerate(self.filters):
            if i == 0:
                stride = self.first_stride
            elif i == 1:
                stride = self.second_stride
            else:
                stride = 1
            x = nn.relu(nn.Conv(f, (3, 3), strides=(stride, stride), padding="SAME")(x))
            use_stride = (i == 0 and self.first_stride > 1) or (i == 1 and self.second_stride > 1)
            if not use_stride:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = _dropout(self, x, rate, train)
        x = jnp.mean(x, axis=(1, 2))  # GAP2D
        x = nn.relu(nn.Dense(128)(x))
        x = _dropout(self, x, rate, train)
        return nn.Dense(self.n_classes)(x)


class DSCNNModule(nn.Module):
    """Depthwise-separable CNN (Hello-Edge DS-CNN shape): stem conv ->
    optional 2x2 pool -> N x (depthwise 3x3 + pointwise 1x1) blocks ->
    GAP -> head. BatchNorm after every conv, pooling selectable — the
    architecture that exercises the full C kernel surface of reference
    model_to_c.py:98-323 (dwconv / avgpool / batchnorm)."""

    filters: tuple[int, ...]  # (stem_channels, block1_channels, ...)
    dropout: float
    n_classes: int
    first_stride: int = 2
    pool: str = "avg"  # "avg" | "max" | "none" after the stem
    batch_norm: bool = True

    def _maybe_bn(self, x, train: bool):
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rate=None):
        rate = self.dropout if dropout_rate is None else dropout_rate
        s = self.first_stride
        x = nn.Conv(self.filters[0], (3, 3), strides=(s, s), padding="SAME", use_bias=not self.batch_norm)(x)
        x = nn.relu(self._maybe_bn(x, train))
        if self.pool == "avg":
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        elif self.pool == "max":
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for f in self.filters[1:]:
            c = x.shape[-1]
            x = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c, use_bias=not self.batch_norm)(x)
            x = nn.relu(self._maybe_bn(x, train))
            x = nn.Conv(f, (1, 1), padding="VALID", use_bias=not self.batch_norm)(x)
            x = nn.relu(self._maybe_bn(x, train))
            x = _dropout(self, x, rate, train)
        x = jnp.mean(x, axis=(1, 2))  # GAP2D
        x = _dropout(self, x, rate, train)
        return nn.Dense(self.n_classes)(x)


class BiLSTMModule(nn.Module):
    units: int
    n_layers: int
    dropout: float
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rate=None):
        rate = self.dropout if dropout_rate is None else dropout_rate
        for i in range(self.n_layers):
            x = _dropout(self, x, rate, train)
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.units))(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.units), reverse=True, keep_order=True)(x)
            if i < self.n_layers - 1:
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = jnp.concatenate([fwd[:, -1, :], bwd[:, 0, :]], axis=-1)
        x = nn.relu(nn.Dense(64)(x))
        x = _dropout(self, x, rate, train)
        return nn.Dense(self.n_classes)(x)


class TransformerModule(nn.Module):
    num_heads: int
    ff_dim: int
    n_blocks: int
    dropout: float
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rate=None):
        rate = self.dropout if dropout_rate is None else dropout_rate
        d = x.shape[-1]
        key_dim = max(1, d // self.num_heads)
        for _ in range(self.n_blocks):
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=key_dim * self.num_heads, out_features=d
            )(x, x)
            attn = _dropout(self, attn, rate, train)
            x = nn.LayerNorm(epsilon=1e-6)(x + attn)
            ff = nn.relu(nn.Dense(self.ff_dim)(x))
            ff = nn.Dense(d)(ff)
            ff = _dropout(self, ff, rate, train)
            x = nn.LayerNorm(epsilon=1e-6)(x + ff)
        x = jnp.mean(x, axis=1)  # GAP1D
        x = nn.relu(nn.Dense(64)(x))
        x = _dropout(self, x, rate, train)
        return nn.Dense(self.n_classes)(x)


class EfficientNetTeacherModule(nn.Module):
    """PrepRGBResize (mono->RGB, pad-square, resize) + EfficientNet-B0 +
    dense head (reference deep.py:592-905)."""

    n_classes: int
    dropout: float
    image_size: int = 224

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .backbones import EfficientNetB0

        # x: (B, H, W, 1) spectrogram -> RGB square image
        x = jnp.repeat(x, 3, axis=-1)
        B, H, W, C = x.shape
        side = max(H, W)
        x = jnp.pad(x, ((0, 0), (0, side - H), (0, side - W), (0, 0)))
        x = jax.image.resize(x, (B, self.image_size, self.image_size, 3), method="bilinear")
        emb = EfficientNetB0(name="backbone")(x, train=False)
        emb = nn.Dropout(self.dropout, deterministic=not train)(emb)
        return nn.Dense(self.n_classes, name="head")(emb)


def _check_teacher_revision(a: dict) -> None:
    # Arch revision gate: bundles saved before the Keras-faithful rework
    # (silu activations + squeeze-excite) load cleanly by name+shape into
    # the new module but compute through the wrong activation — reject them
    # instead of silently producing garbage soft targets for distillation.
    rev = a.get("act", "relu6-legacy")
    if rev != "silu":
        raise ValueError(
            f"efficientnet_teacher bundle has arch revision {rev!r}, but this "
            "build expects 'silu' (Keras-faithful EfficientNetB0). Re-train the "
            "teacher or re-convert the checkpoint with "
            "tools/convert_backbone_weights.py."
        )


def _build_efficientnet_teacher(a: dict):
    _check_teacher_revision(a)
    return EfficientNetTeacherModule(a["n_classes"], a["dropout"], a.get("image_size", 224))


_MODULE_FACTORY = {
    "mlp": lambda a: MLPModule(tuple(a["hidden_units"]), a["dropout"], a["n_classes"]),
    "cnn": lambda a: CNNModule(
        tuple(a["filters"]), a["dropout"], a["n_classes"], a.get("first_stride", 1), a.get("second_stride", 1)
    ),
    "rnn": lambda a: BiLSTMModule(a["units"], a["n_layers"], a["dropout"], a["n_classes"]),
    "transformer": lambda a: TransformerModule(
        a["num_heads"], a["ff_dim"], a["n_blocks"], a["dropout"], a["n_classes"]
    ),
    "efficientnet_teacher": lambda a: _build_efficientnet_teacher(a),
    "distillation_cnn": lambda a: CNNModule(
        tuple(a["filters"]), a["dropout"], a["n_classes"], a.get("first_stride", 1), a.get("second_stride", 1)
    ),
    "ds_cnn": lambda a: DSCNNModule(
        tuple(a["filters"]), a["dropout"], a["n_classes"], a.get("first_stride", 2),
        a.get("pool", "avg"), a.get("batch_norm", True)
    ),
}


# ---------------------------------------------------------------------------
# Persistence helpers (.npz bundle)
# ---------------------------------------------------------------------------


def _flatten_params(params) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[f"p/{key}"] = np.asarray(leaf)
    return flat


def _unflatten_params(template, flat: dict[str, np.ndarray]):
    leaves_with_path = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = flat.get(f"p/{key}")
        if arr is None or arr.shape != leaf.shape:
            raise ValueError(f"missing/mismatched param {key} in bundle")
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _flatten_collections(collections: dict) -> dict[str, np.ndarray]:
    """Non-param variable collections (e.g. BatchNorm batch_stats) flattened
    with c/<collection>/<path> keys."""
    flat = {}
    for col, tree in (collections or {}).items():
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            flat[f"c/{col}/{key}"] = np.asarray(leaf)
    return flat


def _unflatten_collections(template_cols: dict, flat: dict[str, np.ndarray]) -> dict:
    out = {}
    for col, tree in (template_cols or {}).items():
        leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
        treedef = jax.tree_util.tree_structure(tree)
        new_leaves = []
        for path, leaf in leaves_with_path:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            arr = flat.get(f"c/{col}/{key}")
            new_leaves.append(jnp.asarray(arr) if arr is not None else leaf)
        out[col] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return out


def save_model_bundle_flat(path: Path, arch: dict, flat: dict, norm_mean, norm_var) -> None:
    """Single source of truth for the .npz bundle layout (meta JSON + norm
    stats + flattened p/ params and c/ collections) — the format codegen and
    checkpoints depend on (CLAUDE.md invariant)."""
    np.savez(
        path,
        __meta__=np.frombuffer(json.dumps(arch).encode(), dtype=np.uint8),
        norm_mean=np.asarray(norm_mean),
        norm_var=np.asarray(norm_var),
        **flat,
    )


def save_model_bundle(path: Path, arch: dict, params, norm_mean, norm_var, collections: dict | None = None) -> None:
    flat = _flatten_params(params)
    flat.update(_flatten_collections(collections))
    save_model_bundle_flat(path, arch, flat, norm_mean, norm_var)


def load_model_bundle(path: Path):
    """Returns (arch, flat, norm_mean, norm_var); flat carries both p/ param
    keys and c/ collection keys."""
    data = np.load(path, allow_pickle=False)
    arch = json.loads(bytes(data["__meta__"].tobytes()).decode())
    flat = {k: data[k] for k in data.files if k.startswith(("p/", "c/"))}
    return arch, flat, data["norm_mean"], data["norm_var"]


def transfer_pretrained(params, collections: dict, path: Path):
    """By-name+shape warm start (reference deep.py:136-154 semantics: matching
    layers transfer, everything else — head, Normalization — keeps its init).
    Accepts any bundle written by save_model_bundle_flat, including converted
    backbone checkpoints (tools/convert_backbone_weights.py --bundle).
    Returns (params, collections, n_params_transferred)."""
    donor_arch, flat, _, _ = load_model_bundle(Path(path))
    if donor_arch.get("type") == "efficientnet_teacher":
        # same revision gate as load_model: a relu6-era teacher bundle has
        # byte-identical module names + shapes, so every tensor would
        # transfer silently and then compute through silu
        _check_teacher_revision(donor_arch)
    template_flat = _flatten_params(params)
    transferred = 0
    for k in template_flat:
        if k in flat and flat[k].shape == template_flat[k].shape:
            template_flat[k] = flat[k]
            transferred += 1
    params = _unflatten_params(params, template_flat)
    # same name+shape rule for collection (batch_stats) leaves: a mismatched
    # stats tensor must keep its init, not corrupt the variables tree
    col_template = _flatten_collections(collections)
    col_flat = {k: v for k, v in flat.items()
                if k in col_template and v.shape == col_template[k].shape}
    collections = _unflatten_collections(collections, col_flat)
    return params, collections, transferred


# ---------------------------------------------------------------------------
# FlaxTrainer base
# ---------------------------------------------------------------------------

MODEL_FILENAME = "model.flax.npz"


class FlaxTrainer(BaseTrainer):
    """Shared flax/optax training loop under jit.

    Subclasses set ``name``, implement ``_arch(input_shape, n_classes)``
    returning the architecture dict consumed by _MODULE_FACTORY, and may
    override ``_prepare_input``.
    """

    model_type = "deep"

    def __init__(self, epochs: int = 50, batch_size: int = 32, dropout: float = 0.3,
                 learning_rate: float = 1e-3, seed: int = 0,
                 data_parallel: Optional[int] = None, **kwargs):
        self.epochs = epochs
        self.batch_size = batch_size
        self.dropout = dropout
        self.learning_rate = learning_rate
        self.seed = seed
        # data_parallel=N shards the batch axis over an N-device ("data",)
        # mesh (SURVEY.md §2c: data parallelism as the first-class axis);
        # exposed through the CLI as --param data_parallel=N
        self.data_parallel = int(data_parallel) if data_parallel else 0
        self._mesh = None
        self._extra = dict(kwargs)
        self._arch_dict: Optional[dict] = None
        self._params = None
        self._collections: dict = {}
        self._norm_mean = None
        self._norm_var = None

    # -- subclass hooks ---------------------------------------------------
    def _arch(self, input_shape: tuple, n_classes: int) -> dict:
        raise NotImplementedError

    def _architecture_params(self) -> dict:
        return {}

    def _prepare_input(self, X: np.ndarray) -> np.ndarray:
        return X

    # -- internals ----------------------------------------------------------
    def _module(self) -> nn.Module:
        return _MODULE_FACTORY[self._arch_dict["type"]](self._arch_dict)

    def _variables(self, params) -> dict:
        """Full variable dict for apply(): trained params + frozen non-param
        collections (BatchNorm batch_stats etc.)."""
        return {"params": params, **self._collections}

    def _transform_grads(self, grads):
        """Hook for subclasses (e.g. head-only fine-tuning masks)."""
        return grads

    def _normalize(self, x):
        return (x - self._norm_mean) / jnp.sqrt(self._norm_var + 1e-6)

    # -- data-parallel sharding helpers -------------------------------------

    def _batch_sharding(self, ndim: int):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self._mesh, P(*(("data",) + (None,) * (ndim - 1))))

    def _put_batch(self, arr):
        """Device placement for batch-major arrays: sharded over the data
        mesh when data_parallel is active (rows padded to a multiple of the
        axis size — pad rows are never indexed / weighted 0), else a plain
        transfer."""
        arr = np.asarray(arr)
        if self._mesh is None:
            return jnp.asarray(arr)
        dp = self._mesh.shape["data"]
        pad = (-len(arr)) % dp
        if pad:
            arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
        return jax.device_put(arr, self._batch_sharding(arr.ndim))

    def _constrain_batch(self, x):
        """Inside jit: keep the gathered minibatch sharded over 'data' so
        conv/matmul compute runs batch-parallel and XLA psums the loss/grads
        (the collective layer of SURVEY.md §2c)."""
        if self._mesh is None:
            return x
        return jax.lax.with_sharding_constraint(x, self._batch_sharding(x.ndim))

    def _adapt_normalization(self, X: np.ndarray) -> None:
        """Keras Normalization(axis=-1) semantics: per-last-axis-position
        mean/variance over every other axis (reference deep.py:131-134).
        Computed in numpy — on a remote backend every eager jnp op is its
        own compiled-and-shipped XLA program."""
        axes = tuple(range(X.ndim - 1))
        self._norm_mean = jnp.asarray(np.asarray(X).mean(axis=axes).astype(np.float32))
        self._norm_var = jnp.asarray(np.asarray(X).var(axis=axes).astype(np.float32))

    def _make_train_step(self, module, optimizer, mutable_cols: tuple[str, ...]):
        """Training data stays device-resident; each step ships only a
        (batch,) index vector and gathers the mini-batch on device. (Per-step
        host->device batch uploads dominated wall clock on tunneled/remote
        accelerators.) Non-param collections (BatchNorm batch_stats) are
        threaded through the step and updated when the module mutates them."""

        def loss_fn(params, cols, X_full, y_full, idx, w, rng):
            x = self._constrain_batch(jnp.take(X_full, idx, axis=0))
            y = self._constrain_batch(jnp.take(y_full, idx, axis=0))
            variables = {"params": params, **cols}
            if mutable_cols:
                logits, new_cols = module.apply(
                    variables, self._normalize(x), train=True, rngs={"dropout": rng},
                    mutable=list(mutable_cols),
                )
            else:
                logits = module.apply(variables, self._normalize(x), train=True, rngs={"dropout": rng})
                new_cols = cols
            losses = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            loss = jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
            acc = jnp.sum((jnp.argmax(logits, -1) == y) * w) / jnp.maximum(jnp.sum(w), 1.0)
            return loss, (acc, new_cols)

        @jax.jit
        def train_step(params, cols, opt_state, X_full, y_full, idx, w, rng):
            (loss, (acc, new_cols)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, cols, X_full, y_full, idx, w, rng
            )
            grads = self._transform_grads(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, dict(new_cols), opt_state, loss, acc

        return train_step

    def _make_epoch_runner(self, train_step):
        """One jitted dispatch per EPOCH: lax.scan over the per-step updates
        (train_step's traced computation inlines into the scan body). On a
        tunneled/remote accelerator each dispatch is a ~25 ms round trip, so
        steps-per-epoch dispatches per epoch dominate small-dataset training;
        the scan collapses them to one."""

        @jax.jit
        def run_epoch(params, cols, opt_state, X_full, y_full, idx_mat, w_mat, rng):
            def body(carry, xs):
                params, cols, opt_state, rng = carry
                idx, w = xs
                rng, sub = jax.random.split(rng)
                params, cols, opt_state, loss, acc = train_step(
                    params, cols, opt_state, X_full, y_full, idx, w, sub
                )
                return (params, cols, opt_state, rng), jnp.stack([loss, acc])

            (params, cols, opt_state, _), stats = jax.lax.scan(
                body, (params, cols, opt_state, rng), (idx_mat, w_mat)
            )
            return params, cols, opt_state, jnp.mean(stats[:, 0]), jnp.mean(stats[:, 1])

        return run_epoch

    def _make_eval_step(self, module):
        from functools import partial

        @partial(jax.jit, static_argnames=("bs",))
        def eval_step(params, cols, X_dev, start, bs):
            # dynamic_slice keeps the window offset a traced scalar: ONE
            # compiled program for every batch position (a static slice per
            # offset is a separate remote compile each)
            x = jax.lax.dynamic_slice_in_dim(X_dev, start, bs, axis=0)
            return module.apply({"params": params, **cols}, self._normalize(x), train=False)

        return eval_step

    def _batched_logits_device(self, X_dev, n: int) -> np.ndarray:
        """Eval over an already-device-resident, bs-padded array."""
        eval_step = getattr(self, "_cached_eval_step", None)
        if eval_step is None:
            eval_step = self._make_eval_step(self._module())
            self._cached_eval_step = eval_step
        bs = min(self.batch_size, X_dev.shape[0])
        outs = []
        for s in range(0, X_dev.shape[0], bs):
            start = min(s, X_dev.shape[0] - bs)  # clamp: full window at the tail
            o = eval_step(self._params, self._collections, X_dev, start, bs)
            outs.append(np.asarray(o)[s - start :])
        return np.concatenate(outs)[:n]

    def _batched_logits(self, X: np.ndarray) -> np.ndarray:
        # jax.jit caches by function identity: build the jitted eval step
        # once per trainer, not once per call (a fresh closure per epoch
        # means a full recompile per epoch).
        eval_step = getattr(self, "_cached_eval_step", None)
        if eval_step is None:
            eval_step = self._make_eval_step(self._module())
            self._cached_eval_step = eval_step
        outs = []
        bs = self.batch_size
        n = len(X)
        for s in range(0, n, bs):
            xb = X[s : s + bs]
            pad = bs - len(xb)
            if pad:
                xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
            o = eval_step(self._params, self._collections, jnp.asarray(xb), 0, bs)
            outs.append(np.asarray(o)[: len(X[s : s + bs])])
        return np.concatenate(outs)

    # -- BaseTrainer ---------------------------------------------------------
    def fit(
        self,
        X_train: np.ndarray,
        y_train: np.ndarray,
        X_val: np.ndarray,
        y_val: np.ndarray,
        label_names: list[str],
        run_name: str,
        output_dir: Path,
        mlflow_run,
        epoch_callback=None,
    ) -> TrainResult:
        X_train = self._prepare_input(np.asarray(X_train)).astype(np.float32)
        X_val = self._prepare_input(np.asarray(X_val)).astype(np.float32)
        y_train = np.asarray(y_train).astype(np.int32)
        y_val = np.asarray(y_val).astype(np.int32)
        n_classes = len(label_names)
        self._arch_dict = self._arch(X_train.shape[1:], n_classes)
        self._adapt_normalization(X_train)
        self._cached_eval_step = None  # arch/norm changed; retrace eval

        module = self._module()
        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        variables = module.init(
            {"params": init_rng, "dropout": init_rng}, jnp.zeros((1,) + X_train.shape[1:], jnp.float32), train=False
        )
        params = variables["params"]
        # non-param collections (BatchNorm batch_stats, ...): updated by the
        # train step when the module mutates them, frozen at inference
        self._collections = {k: v for k, v in variables.items() if k != "params"}

        # pretrained warm-start: copy matching path+shape leaves, skip norm
        # stats. Consumed once (pop): a refit of the same instance trains
        # from its own state, mirroring the reference's one-shot transfer.
        pretrained_path = self._extra.pop("pretrained_model", None)
        if pretrained_path:
            try:
                params, self._collections, transferred = transfer_pretrained(
                    params, self._collections, Path(pretrained_path)
                )
                logger.info("Pretrained weights: %d tensors transferred from %s", transferred, pretrained_path)
            except Exception as exc:
                logger.warning("Pretrained weight transfer failed (%s); training from scratch", exc)

        self._mesh = None
        if self.data_parallel and self.data_parallel > 1:
            from ..parallel.mesh import get_mesh

            self._mesh = get_mesh(self.data_parallel, model_parallel=1)
            logger.info("[%s] data-parallel training over %d devices", self.name, self.data_parallel)

        optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=self.learning_rate)
        opt_state = optimizer.init(params)
        cols = {k: dict(v) if hasattr(v, "items") else v for k, v in self._collections.items()}
        train_step = self._make_train_step(module, optimizer, tuple(sorted(cols)))

        n = len(X_train)
        bs = min(self.batch_size, max(n, 1))
        if self._mesh is not None:
            # minibatches must split evenly over the data axis
            bs = -(-bs // self.data_parallel) * self.data_parallel
        steps = max(1, -(-n // bs))
        best_val_loss = float("inf")
        best_params = params
        best_cols = cols
        patience_es, patience_lr = 10, 5
        es_wait = lr_wait = 0
        current_lr = self.learning_rate
        prev_lr = current_lr
        np_rng = np.random.default_rng(self.seed)
        stopped_epoch = self.epochs
        start_epoch = 0

        # mid-training checkpoint/resume (utils/checkpoint.py): opt-in via
        # checkpoint_dir=...; resume=True restores params/opt state/loop
        # counters from the latest epoch checkpoint.
        checkpoint_dir = self._extra.get("checkpoint_dir")
        checkpoint_every = int(self._extra.get("checkpoint_every", 1))
        resume = bool(self._extra.get("resume", True))
        ckpt_path = Path(checkpoint_dir) / "train_state.npz" if checkpoint_dir else None
        if ckpt_path is not None and resume:
            from ..utils.checkpoint import load_train_state

            restored = load_train_state(
                ckpt_path, {"params": params, "best": best_params, "cols": cols, "best_cols": best_cols}, opt_state
            )
            if restored is not None:
                bundles, opt_state, meta = restored
                params, best_params = bundles["params"], bundles["best"]
                cols, best_cols = bundles["cols"], bundles["best_cols"]
                start_epoch = int(meta["epoch"]) + 1
                current_lr = float(meta["lr"])
                best_val_loss = float(meta["best_val_loss"])
                es_wait, lr_wait = int(meta["es_wait"]), int(meta["lr_wait"])
                np_rng = np.random.default_rng(self.seed + start_epoch)
                logger.info("[%s] resumed from %s at epoch %d", self.name, ckpt_path, start_epoch)

        # datasets move to device once (batch-sharded over the data mesh when
        # data_parallel is on); steps ship only index vectors
        X_train_d = self._put_batch(X_train)
        y_train_d = self._put_batch(y_train)
        n_val = len(X_val)
        val_pad = (-n_val) % self.batch_size
        X_val_d = self._put_batch(
            np.concatenate([X_val, np.zeros((val_pad,) + X_val.shape[1:], X_val.dtype)]) if val_pad else X_val
        )

        run_epoch = self._make_epoch_runner(train_step)
        for epoch in range(start_epoch, self.epochs):
            perm = np_rng.permutation(n)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(current_lr, jnp.float32)
            # (steps, bs) index/weight matrices; short last batch zero-
            # weighted for loss/grads, padded with WRAP-AROUND samples from
            # this epoch's permutation (not repeats of index 0): BatchNorm
            # batch_stats see every row regardless of weight, and a batch
            # dominated by one duplicated sample would skew the running
            # stats (bites ds_cnn, whose collections are mutated each step)
            idx_mat = np.resize(perm, (steps, bs)).astype(np.int32)  # cycles perm
            w_mat = np.zeros((steps, bs), np.float32)
            for s in range(steps):
                sl = perm[s * bs : (s + 1) * bs]
                idx_mat[s, : len(sl)] = sl
                w_mat[s, : len(sl)] = 1.0
            rng, epoch_rng = jax.random.split(rng)
            params, cols, opt_state, ep_loss, ep_acc = run_epoch(
                params, cols, opt_state, X_train_d, y_train_d,
                jnp.asarray(idx_mat), jnp.asarray(w_mat), epoch_rng,
            )
            ep_loss, ep_acc = float(ep_loss), float(ep_acc)

            # validation on device-resident batches (current epoch's stats)
            self._params = params
            self._collections = cols
            val_logits = self._batched_logits_device(X_val_d, n_val)
            # numpy log-softmax: no per-epoch eager device op on the logits
            shifted = val_logits - val_logits.max(axis=-1, keepdims=True)
            log_probs = shifted - np.log(np.exp(shifted).sum(axis=-1, keepdims=True))
            val_loss = float(np.mean(-np.take_along_axis(log_probs, y_val[:, None], axis=1)))
            val_acc = float((val_logits.argmax(-1) == y_val).mean())

            log_epoch = epoch + getattr(self, "_log_epoch_offset", 0)
            logs = {"loss": ep_loss, "accuracy": ep_acc, "val_loss": val_loss, "val_accuracy": val_acc}
            if mlflow_run is not None:
                for k, v in logs.items():
                    mlflow_run.log_metric(k, v, step=log_epoch)
            lr_tag = ""
            if current_lr < prev_lr - 1e-12:
                lr_tag = f"  lr={current_lr:.2e}v"
            prev_lr = current_lr
            logger.info(
                "[%s] Epoch %3d/%d  loss=%.4f  acc=%.4f  val_loss=%.4f  val_acc=%.4f%s",
                self.name, epoch + 1, self.epochs, ep_loss, ep_acc, val_loss, val_acc, lr_tag,
            )

            # EarlyStopping(restore_best) + ReduceLROnPlateau, host-side
            if val_loss < best_val_loss - 1e-12:
                best_val_loss = val_loss
                best_params = params
                best_cols = cols
                es_wait = lr_wait = 0
            else:
                es_wait += 1
                lr_wait += 1
                if lr_wait >= patience_lr and current_lr > 1e-6:
                    current_lr = max(current_lr * 0.5, 1e-6)
                    lr_wait = 0
                if es_wait >= patience_es:
                    stopped_epoch = epoch + 1
                    logger.info("[%s] Early stopped at epoch %d/%d", self.name, epoch + 1, self.epochs)
                    break
            if ckpt_path is not None and (epoch + 1) % checkpoint_every == 0:
                from ..utils.checkpoint import save_train_state

                save_train_state(
                    ckpt_path,
                    {"params": params, "best": best_params, "cols": cols, "best_cols": best_cols},
                    opt_state,
                    {"epoch": epoch, "lr": current_lr, "best_val_loss": best_val_loss,
                     "es_wait": es_wait, "lr_wait": lr_wait},
                )
            if epoch_callback is not None and epoch_callback(log_epoch, logs):
                stopped_epoch = epoch + 1
                logger.info("[%s] Pruned at epoch %d/%d", self.name, epoch + 1, self.epochs)
                break

        self._params = best_params
        self._collections = best_cols

        y_pred_val = self._batched_logits(X_val).argmax(-1)
        val_metrics = compute_metrics(y_val, y_pred_val, label_names=label_names)

        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        model_path = output_dir / MODEL_FILENAME
        self.save(model_path)
        model_size_kb = model_path.stat().st_size / 1024

        params_d = {
            "model": self.name,
            "stopped_epoch": stopped_epoch,
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "dropout": self.dropout,
            "learning_rate": self.learning_rate,
        }
        params_d.update({k: str(v) for k, v in self._architecture_params().items()})
        params_d.update({k: str(v) for k, v in self._extra.items()})

        save_classification_report(y_val, y_pred_val, label_names, output_dir / "classification_report.txt")
        save_confusion_matrix_png(val_metrics.get("confusion_matrix", []), label_names, output_dir / "confusion_matrix.png")
        save_model_info(output_dir, self.name, run_name, val_metrics, params_d, model_size_kb)
        val_metrics["model_size_kb"] = model_size_kb
        log_run_to_mlflow(mlflow_run, params_d, val_metrics, output_dir)
        if mlflow_run is not None:
            mlflow_run.log_artifact(model_path)

        return TrainResult(
            model_name=self.name,
            run_id=mlflow_run.info.run_id if mlflow_run else "",
            output_dir=output_dir,
            metrics=val_metrics,
            model_size_kb=model_size_kb,
            params=params_d,
        )

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = self._prepare_input(np.asarray(X)).astype(np.float32)
        return self._batched_logits(X).argmax(-1)

    def predict_proba(self, X: np.ndarray) -> Optional[np.ndarray]:
        X = self._prepare_input(np.asarray(X)).astype(np.float32)
        logits = self._batched_logits(X)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)

    def save(self, path: Path) -> None:
        save_model_bundle(
            Path(path), self._arch_dict, self._params, self._norm_mean, self._norm_var,
            collections=self._collections,
        )

    @classmethod
    def load(cls, path: Path) -> "FlaxTrainer":
        arch, flat, norm_mean, norm_var = load_model_bundle(Path(path))
        inst = cls.__new__(cls)
        FlaxTrainer.__init__(inst)
        inst._arch_dict = arch
        inst._norm_mean = jnp.asarray(norm_mean)
        inst._norm_var = jnp.asarray(norm_var)
        module = _MODULE_FACTORY[arch["type"]](arch)
        variables = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + tuple(arch["input_shape"]), jnp.float32), train=False
        )
        inst._params = _unflatten_params(variables["params"], flat)
        inst._collections = _unflatten_collections(
            {k: v for k, v in variables.items() if k != "params"}, flat
        )
        return inst


def load_any_model(path: Path) -> BaseTrainer:
    """Load a saved deep model bundle and return the right trainer class."""
    from .registry import get_model

    arch, _, _, _ = load_model_bundle(Path(path))
    cls = get_model(arch["type"])
    return cls.load(path)


# ---------------------------------------------------------------------------
# Registered trainers
# ---------------------------------------------------------------------------


@register_model
class MLPTrainer(FlaxTrainer):
    name = "mlp"

    def __init__(self, hidden_units: Optional[list[int]] = None, **kwargs):
        super().__init__(**kwargs)
        self.hidden_units = hidden_units or [256, 128]

    def _architecture_params(self) -> dict:
        return {"hidden_units": self.hidden_units}

    def _prepare_input(self, X: np.ndarray) -> np.ndarray:
        # Dense stacks need flat vectors; flatten ND features (improvement
        # over the reference, which errors on (H, W) inputs fed to mlp)
        return self.flatten(X)

    def _arch(self, input_shape, n_classes):
        return {
            "type": "mlp", "hidden_units": list(self.hidden_units), "dropout": self.dropout,
            "n_classes": n_classes, "input_shape": list(input_shape),
        }


@register_model
class CNNTrainer(FlaxTrainer):
    name = "cnn"

    def __init__(self, filters=None, n_blocks: Optional[int] = None,
                 first_stride: int = 1, second_stride: int = 1, **kwargs):
        super().__init__(**kwargs)
        if filters is None:
            filters = [32, 64]
        if isinstance(filters, int):
            filters = [filters] * (n_blocks or 2)
        self.filters = list(filters)
        self.first_stride = first_stride
        self.second_stride = second_stride

    def _architecture_params(self) -> dict:
        return {"filters": self.filters, "first_stride": self.first_stride, "second_stride": self.second_stride}

    def _prepare_input(self, X: np.ndarray) -> np.ndarray:
        if X.ndim == 2:
            return X[:, :, np.newaxis]
        if X.ndim == 3:
            return X[:, :, :, np.newaxis]
        return X

    def _arch(self, input_shape, n_classes):
        return {
            "type": "cnn", "filters": list(self.filters), "dropout": self.dropout,
            "n_classes": n_classes, "first_stride": self.first_stride,
            "second_stride": self.second_stride, "input_shape": list(input_shape),
        }


@register_model
class DSCNNTrainer(FlaxTrainer):
    """Depthwise-separable CNN with BatchNorm — the standard keyword-spotting
    edge architecture. Exercises every generated C kernel (dwconv2d,
    avgpool2d, batchnorm, 1x1 valid conv; reference model_to_c.py:98-323)."""

    name = "ds_cnn"

    def __init__(self, filters=None, first_stride: int = 2, pool: str = "avg",
                 batch_norm: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.filters = list(filters) if filters else [32, 32, 64]
        self.first_stride = first_stride
        self.pool = pool
        self.batch_norm = batch_norm

    def _architecture_params(self) -> dict:
        return {"filters": self.filters, "first_stride": self.first_stride,
                "pool": self.pool, "batch_norm": self.batch_norm}

    def _prepare_input(self, X: np.ndarray) -> np.ndarray:
        if X.ndim == 2:
            return X[:, :, np.newaxis]
        if X.ndim == 3:
            return X[:, :, :, np.newaxis]
        return X

    def _arch(self, input_shape, n_classes):
        return {
            "type": "ds_cnn", "filters": list(self.filters), "dropout": self.dropout,
            "n_classes": n_classes, "first_stride": self.first_stride,
            "pool": self.pool, "batch_norm": self.batch_norm,
            "input_shape": list(input_shape),
        }


@register_model
class RNNTrainer(FlaxTrainer):
    name = "rnn"

    def __init__(self, units: int = 128, n_layers: int = 1, **kwargs):
        super().__init__(**kwargs)
        self.units = units
        self.n_layers = n_layers

    def _architecture_params(self) -> dict:
        return {"units": self.units, "n_layers": self.n_layers}

    def _prepare_input(self, X: np.ndarray) -> np.ndarray:
        if X.ndim == 2:
            return X[:, :, np.newaxis]
        return X

    def _arch(self, input_shape, n_classes):
        return {
            "type": "rnn", "units": self.units, "n_layers": self.n_layers,
            "dropout": self.dropout, "n_classes": n_classes, "input_shape": list(input_shape),
        }


@register_model
class TransformerTrainer(FlaxTrainer):
    name = "transformer"

    def __init__(self, num_heads: int = 4, ff_dim: int = 128, n_blocks: int = 2, **kwargs):
        super().__init__(**kwargs)
        self.num_heads = num_heads
        self.ff_dim = ff_dim
        self.n_blocks = n_blocks

    def _architecture_params(self) -> dict:
        return {"num_heads": self.num_heads, "ff_dim": self.ff_dim, "n_blocks": self.n_blocks}

    def _prepare_input(self, X: np.ndarray) -> np.ndarray:
        if X.ndim == 2:
            return X[:, :, np.newaxis]
        return X

    def _arch(self, input_shape, n_classes):
        return {
            "type": "transformer", "num_heads": self.num_heads, "ff_dim": self.ff_dim,
            "n_blocks": self.n_blocks, "dropout": self.dropout,
            "n_classes": n_classes, "input_shape": list(input_shape),
        }


@register_model
class EfficientNetTeacherTrainer(FlaxTrainer):
    """EfficientNet-B0 teacher on spectrograms. Two-phase schedule
    (reference deep.py:801-856): phase 1 trains the head with the backbone
    frozen (zero-masked gradients); phase 2 unfreezes everything at lr*0.1.
    ImageNet weights are unavailable offline (see models/backbones.py)."""

    name = "efficientnet_teacher"

    def __init__(self, warmup_epochs: int = 5, image_size: Optional[int] = None,
                 unfreeze_layers: Optional[int] = None, fine_tune_lr_factor: float = 0.1,
                 target_h: Optional[int] = None, target_w: Optional[int] = None, **kwargs):
        # unfreeze_layers / fine_tune_lr_factor / target_h / target_w mirror
        # reference deep.py:677-690; this trainer resizes to a square, so
        # target_h is the operative side (target_w accepted for configs).
        # unfreeze_layers is advisory: phase 2 unfreezes the whole backbone
        # (flax modules have no Keras-style layer index to slice by).
        super().__init__(**kwargs)
        self.warmup_epochs = warmup_epochs
        self.image_size = int(image_size if image_size is not None else (target_h or 224))
        self.unfreeze_layers = unfreeze_layers
        self.fine_tune_lr_factor = float(fine_tune_lr_factor)

    def _architecture_params(self) -> dict:
        return {"warmup_epochs": self.warmup_epochs, "image_size": self.image_size,
                "fine_tune_lr_factor": self.fine_tune_lr_factor}

    def _prepare_input(self, X: np.ndarray) -> np.ndarray:
        if X.ndim == 3:
            return X[:, :, :, np.newaxis]
        return X

    def _arch(self, input_shape, n_classes):
        return {
            "type": "efficientnet_teacher", "dropout": self.dropout, "n_classes": n_classes,
            "image_size": self.image_size, "input_shape": list(input_shape),
            "act": "silu",  # arch revision marker — see _build_efficientnet_teacher
        }

    def fit(self, X_train, y_train, X_val, y_val, label_names, run_name, output_dir, mlflow_run, epoch_callback=None):
        # Phase 1: head-only at full lr for warmup_epochs; Phase 2: all at
        # lr*0.1. Phases checkpoint into separate subdirs and phase-2 metric
        # steps continue after phase 1 (no step collisions in tracking or
        # pruning callbacks).
        total = self.epochs
        base_lr = self.learning_rate
        base_ckpt = self._extra.get("checkpoint_dir")
        if not self._extra.get("pretrained_model"):
            logger.warning(
                "efficientnet_teacher: backbone starts RANDOM-INIT — ImageNet "
                "weights are unavailable offline, while the reference warm-starts "
                "from ImageNet (models/backbones.py). Convert a real checkpoint "
                "(tools/convert_backbone_weights.py --arch efficientnet_b0 "
                "--prefix backbone --bundle) and pass --param "
                "pretrained_model=<bundle.npz> to warm-start."
            )
        self.epochs = min(self.warmup_epochs, total)
        self._head_only = True
        self._log_epoch_offset = 0
        if base_ckpt:
            self._extra["checkpoint_dir"] = str(Path(base_ckpt) / "phase1")
        result = super().fit(X_train, y_train, X_val, y_val, label_names, run_name, output_dir, mlflow_run, epoch_callback)
        if total > self.warmup_epochs:
            self._head_only = False
            self.epochs = total - self.warmup_epochs
            self.learning_rate = base_lr * self.fine_tune_lr_factor
            self._log_epoch_offset = self.warmup_epochs
            if base_ckpt:
                self._extra["checkpoint_dir"] = str(Path(base_ckpt) / "phase2")
            self._extra["pretrained_model"] = str(Path(output_dir) / MODEL_FILENAME)
            result = super().fit(X_train, y_train, X_val, y_val, label_names, run_name, output_dir, mlflow_run, epoch_callback)
        self.epochs = total
        self.learning_rate = base_lr
        self._log_epoch_offset = 0
        if base_ckpt:
            self._extra["checkpoint_dir"] = base_ckpt
        return result

    def _transform_grads(self, grads):
        if not getattr(self, "_head_only", False):
            return grads
        return jax.tree_util.tree_map_with_path(
            lambda path, g: g if any("head" in str(getattr(p, "key", "")) for p in path) else jnp.zeros_like(g),
            grads,
        )


@register_model
class DistillationCNNTrainer(FlaxTrainer):
    """Tiny CNN student distilled from a teacher's precomputed soft targets
    (reference deep.py:912-1217): loss = alpha*T^2*KL(teacher_T || student_T)
    + (1-alpha)*CE, T=4.0, alpha=0.7. Teacher probabilities are converted to
    pseudo-logits log(p + eps) (deep.py:1196-1209)."""

    name = "distillation_cnn"

    def __init__(self, filters=None, teacher_model: Optional[str] = None,
                 temperature: float = _KD_TEMPERATURE, alpha: float = _KD_ALPHA,
                 teacher_model_path: Optional[str] = None, **kwargs):
        # teacher_model_path is the reference's knob name (deep.py:950-954)
        super().__init__(**kwargs)
        self.filters = list(filters) if filters else [16, 16, 16]
        self.teacher_model = teacher_model or teacher_model_path
        self.temperature = temperature
        self.alpha = alpha
        self._teacher_logits: Optional[np.ndarray] = None

    def _architecture_params(self) -> dict:
        return {"filters": self.filters, "temperature": self.temperature, "alpha": self.alpha,
                "teacher_model": self.teacher_model}

    def _prepare_input(self, X: np.ndarray) -> np.ndarray:
        if X.ndim == 3:
            return X[:, :, :, np.newaxis]
        return X

    def _arch(self, input_shape, n_classes):
        return {
            "type": "distillation_cnn", "filters": list(self.filters), "dropout": self.dropout,
            "n_classes": n_classes, "input_shape": list(input_shape),
        }

    def fit(self, X_train, y_train, X_val, y_val, label_names, run_name, output_dir, mlflow_run, epoch_callback=None):
        if self.teacher_model:
            teacher = load_any_model(Path(self.teacher_model))
            probs = teacher.predict_proba(X_train)
            self._teacher_logits = np.log(probs + 1e-8).astype(np.float32)
        else:
            logger.warning("distillation_cnn without teacher_model: training with plain CE")
            self._teacher_logits = None
        return super().fit(X_train, y_train, X_val, y_val, label_names, run_name, output_dir, mlflow_run, epoch_callback)

    def _make_train_step(self, module, optimizer, mutable_cols: tuple[str, ...] = ()):
        if self._teacher_logits is None:
            return super()._make_train_step(module, optimizer, mutable_cols)
        T, alpha = self.temperature, self.alpha
        # device-resident teacher logits, gathered per batch by the same idx
        # the student batch uses (closure constant; (N, C) is small)
        tlogits_full = jnp.asarray(self._teacher_logits)

        def loss_fn(params, X_full, y_full, idx, w, rng):
            x = jnp.take(X_full, idx, axis=0)
            y = jnp.take(y_full, idx, axis=0)
            tlogits = jnp.take(tlogits_full, idx, axis=0)
            logits = module.apply({"params": params}, self._normalize(x), train=True, rngs={"dropout": rng})
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            t_soft = jax.nn.softmax(tlogits / T, axis=-1)
            s_logsoft = jax.nn.log_softmax(logits / T, axis=-1)
            kl = jnp.sum(t_soft * (jnp.log(t_soft + 1e-12) - s_logsoft), axis=-1)
            losses = alpha * (T**2) * kl + (1 - alpha) * ce
            loss = jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
            acc = jnp.sum((jnp.argmax(logits, -1) == y) * w) / jnp.maximum(jnp.sum(w), 1.0)
            return loss, acc

        @jax.jit
        def train_step(params, cols, opt_state, X_full, y_full, idx, w, rng):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, X_full, y_full, idx, w, rng
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, cols, opt_state, loss, acc

        return train_step
