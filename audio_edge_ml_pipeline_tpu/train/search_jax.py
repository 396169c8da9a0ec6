"""Device-batched grid search for the JAX-native classical models.

TPU-native replacement for the reference's `GridSearchCV(n_jobs=-1)`
process pool (reference training/tune.py:269-276; SURVEY.md §2c/§7.5):
instead of fitting cv folds in worker processes, ALL folds of a grid cell
run as ONE compiled device program —

- the fold split is encoded as weight vectors ``w (F, N)`` over a single
  resident ``X``: no per-fold data copies, no host loop;
- for `svm`, the fold axis vmaps over the already-pair-batched dual
  solver, so one dispatch solves ``F x K(K-1)/2`` QPs simultaneously;
- for `pca_*`, the per-fold scaler+PCA bases come from one batched
  sqrt(w)-weighted Gram eigendecomposition;
- C / gamma are ARRAY arguments, so every cell of a C x gamma grid reuses
  the same compiled program (only shape-affecting knobs like
  ``n_components`` trigger a new compile).

With ``devices > 1`` the fold axis is sharded over a 1-D ``jax.sharding``
mesh (folds padded to a device multiple with zero-weight dummies), so CV
folds genuinely run on different chips — the `--param tune_parallel=N`
path.
"""

from __future__ import annotations

import itertools
import logging
from typing import Optional

import numpy as np

from ..models.classical_jax import kernels, ovo_vote, softmax_np
from ..models.registry import get_model

logger = logging.getLogger(__name__)

# models this engine can tune on-device; trees fall back to sklearn
JAX_TUNABLE = {"svm", "lda", "knn", "pca_svm", "pca_lda", "pca_knn"}

_DEFAULT_ITERS = 400  # dual-solver steps per CV fit (refit uses the trainer default)

# grid keys each family's CV core actually consumes (+ no-op keys the
# trainers accept for sklearn-grid compatibility). Anything else is a typo
# or an unsupported knob and must fail loudly — the sklearn GridSearchCV
# path raises "Invalid parameter", and a silently-ignored key here would
# score every cell identically and pick an arbitrary winner.
_SVM_KEYS = {"C", "kernel", "gamma", "iters"}
_GRID_KEYS = {
    "svm": _SVM_KEYS,
    # NB: sklearn's `shrinkage` changes LDA's covariance estimate (and so
    # its predictions); the closed-form core doesn't implement it, so it is
    # rejected rather than silently ignored. n_components/solver are
    # allowed: they never affect sklearn LDA classification.
    "lda": {"n_components", "solver"},
    "knn": {"n_neighbors", "metric"},
    # grids use `n_components` for every pca_* pipeline (the reference's
    # friendly->Pipeline remap, tune.py:155-166); `n_components_pca` is
    # additionally accepted where the trainer ctor names it that way
    "pca_svm": _SVM_KEYS | {"n_components"},
    "pca_lda": {"n_components", "n_components_pca", "n_components_lda", "solver"},
    "pca_knn": {"n_components", "n_neighbors", "metric"},
}
_SVM_KERNELS = ("rbf", "linear")
_KNN_METRICS = ("minkowski", "euclidean", "cosine")


def validate_grid(model_name: str, param_grid: dict) -> None:
    """Reject unknown grid keys and unsupported kernel/metric values BEFORE
    any device work (the batched cores would otherwise fall through to
    their default formulation and mis-score the cell)."""
    allowed = _GRID_KEYS[model_name]
    unknown = set(param_grid) - allowed
    if unknown:
        raise ValueError(
            f"unknown grid key(s) {sorted(unknown)} for {model_name!r}; "
            f"supported: {sorted(allowed)}"
        )
    for kern in param_grid.get("kernel", ()):
        if kern not in _SVM_KERNELS:
            raise ValueError(f"svm kernel must be one of {_SVM_KERNELS}, got {kern!r}")
    for metric in param_grid.get("metric", ()):
        if metric not in _KNN_METRICS:
            raise ValueError(f"knn metric must be one of {_KNN_METRICS}, got {metric!r}")
    for gamma in param_grid.get("gamma", ()):
        if gamma in ("scale", "auto"):
            continue
        try:
            float(gamma)
        except (TypeError, ValueError):
            raise ValueError(
                f"svm gamma must be 'scale', 'auto', or numeric, got {gamma!r}"
            ) from None


def stratified_fold_ids(y: np.ndarray, cv: int, seed: int = 42) -> np.ndarray:
    """Per-sample fold assignment: shuffle within each class, deal
    round-robin — stratified like sklearn's StratifiedKFold(shuffle=True)."""
    rng = np.random.default_rng(seed)
    fold_of = np.empty(len(y), np.int32)
    for c in np.unique(y):
        idx = np.flatnonzero(y == c)
        rng.shuffle(idx)
        fold_of[idx] = np.arange(len(idx)) % cv
    return fold_of


def _expand_grid(param_grid: dict) -> list[dict]:
    if not param_grid:
        return [{}]
    keys = sorted(param_grid)
    return [dict(zip(keys, combo)) for combo in itertools.product(*(param_grid[k] for k in keys))]


def _score(y_true: np.ndarray, y_pred: np.ndarray, scoring: str) -> float:
    from sklearn.metrics import accuracy_score, f1_score

    if scoring in ("f1_macro", "f1"):
        return float(f1_score(y_true, y_pred, average="macro", zero_division=0))
    if scoring == "accuracy":
        return float(accuracy_score(y_true, y_pred))
    raise ValueError(f"unsupported scoring {scoring!r} (f1_macro | accuracy)")


def _fold_ovo_arrays(y: np.ndarray, fold_of: np.ndarray, n_classes: int):
    """Per-fold padded OvO layouts over the SAME sample space. Returns
    (pairs, idx[F,P,M], ypm[F,P,M], cw[F,P,M]) where cw holds the UNIT-C box
    bounds — balanced class weights computed per fold (sklearn fits
    class_weight on each fold's data); a cell's bounds are ``C * cw``. The
    layout depends only on (y, folds), so the engine caches one per search."""
    from ..models.classical_jax import _ovo_layout

    cv = int(fold_of.max()) + 1
    per_fold = []
    M = 0
    for f in range(cv):
        tr = np.flatnonzero(fold_of != f)
        pairs, idx_l, ypm_l = _ovo_layout(y[tr], n_classes)
        per_fold.append((tr, pairs, idx_l, ypm_l))
        M = max(M, idx_l.shape[1])
    P = per_fold[0][1].shape[0]
    idx = np.zeros((cv, P, M), np.int32)
    ypm = np.zeros((cv, P, M), np.float32)
    cw = np.zeros((cv, P, M), np.float32)
    pairs = per_fold[0][1]
    for f, (tr, _, idx_l, ypm_l) in enumerate(per_fold):
        m = idx_l.shape[1]
        idx[f, :, :m] = tr[idx_l]  # local -> global sample indices
        ypm[f, :, :m] = ypm_l
        counts = np.bincount(y[tr], minlength=n_classes).astype(np.float64)
        w = len(tr) / (n_classes * np.maximum(counts, 1))
        cw[f, :, :m] = np.where(ypm_l > 0, w[pairs[:, 0]][:, None],
                                np.where(ypm_l < 0, w[pairs[:, 1]][:, None], 0.0))
    return pairs, idx, ypm, cw


def _shard_folds(mesh, *arrays):
    """Place fold-axis arrays sharded over the mesh's fold axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(mesh, P("folds"))
    return tuple(jax.device_put(a, spec) for a in arrays)


def _pad_folds(n_dev: int, W: np.ndarray, *arrays):
    """Pad the fold axis to a multiple of n_dev with zero-weight dummy
    folds (their QPs collapse to alpha=0 and are never scored)."""
    F = W.shape[0]
    pad = (-F) % n_dev
    if pad == 0:
        return (W,) + arrays
    out = [np.concatenate([W, np.zeros((pad,) + W.shape[1:], W.dtype)])]
    for a in arrays:
        out.append(np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)]))
    return tuple(out)


class _CVEngine:
    """Evaluates one grid cell for one model family, fold-batched."""

    def __init__(self, X: np.ndarray, y: np.ndarray, fold_of: np.ndarray,
                 n_classes: int, devices: int = 1):
        self.k = kernels()
        self.X = np.asarray(X, np.float32)
        self.y = np.asarray(y, np.int32)
        self.fold_of = fold_of
        self.cv = int(fold_of.max()) + 1
        self.n_classes = n_classes
        self.W = np.stack([(fold_of != f) for f in range(self.cv)]).astype(np.float32)
        self.onehot = np.eye(n_classes, dtype=np.float32)[self.y]
        self._pca_cache: dict[int, np.ndarray] = {}  # ncomp -> per-fold Z
        self._ovo = None  # cached (pairs, idx_dev, ypm_dev, cw): C-independent
        self._W_dev = None
        self.mesh = None
        if devices > 1:
            import jax
            from jax.sharding import Mesh

            devs = jax.devices()
            n = min(devices, len(devs))
            if n > 1:
                self.mesh = Mesh(np.array(devs[:n]), ("folds",))

    # -- per-family cell evaluation (returns per-fold val scores) ---------

    def _per_fold_scores(self, class_scores: np.ndarray, scoring: str) -> list[float]:
        """class_scores (F, N, K): argmax prediction scored on each fold's
        own validation rows."""
        out = []
        for f in range(self.cv):
            val = self.fold_of == f
            pred = class_scores[f, val].argmax(-1)
            out.append(_score(self.y[val], pred, scoring))
        return out

    def _maybe_shard(self, W, *arrays):
        if self.mesh is None:
            return (W,) + arrays
        n_dev = self.mesh.devices.size
        padded = _pad_folds(n_dev, W, *arrays)
        with self.mesh:
            return _shard_folds(self.mesh, *padded)

    def _w_dev(self):
        """Fold-weight matrix, padded/sharded once and reused by every cell."""
        if self._W_dev is None:
            (self._W_dev,) = self._maybe_shard(self.W)
        return self._W_dev

    def _ovo_cached(self):
        """(pairs, idx_dev, ypm_dev, cw): the OvO fold layout depends only on
        (y, folds) — built and device-placed ONCE per search, not per cell
        (a C x gamma grid otherwise rebuilds and re-uploads identical
        index/target arrays for every cell)."""
        if self._ovo is None:
            pairs, idx, ypm, cw = _fold_ovo_arrays(self.y, self.fold_of, self.n_classes)
            idx_d, ypm_d = self._maybe_shard(idx, ypm)
            self._ovo = (pairs, idx_d, ypm_d, cw)
        return self._ovo

    def eval_svm(self, cell: dict, scoring: str, Z: Optional[np.ndarray] = None) -> list[float]:
        C = float(cell.get("C", 1.0))
        kernel = str(cell.get("kernel", "rbf"))
        if kernel not in _SVM_KERNELS:
            raise ValueError(f"svm kernel must be one of {_SVM_KERNELS}, got {kernel!r}")
        gamma = cell.get("gamma", "scale")
        if gamma in ("scale", "auto"):
            gamma_mode, gval = str(gamma), np.float32(0.0)
        else:
            gamma_mode, gval = "value", np.float32(gamma)
        pairs, idx, ypm, cw = self._ovo_cached()
        (u,) = self._maybe_shard((C * cw).astype(np.float32))
        W = self._w_dev()
        shared = Z is None
        Xin = self.X if shared else Z
        # honor a gridded solver budget: iters is a static kernel arg, so a
        # grid over iters compiles one program per distinct value (same as
        # kernel/gamma_mode) — silently pinning _DEFAULT_ITERS would score
        # every iters cell identically and pick an arbitrary winner
        iters = int(cell.get("iters", _DEFAULT_ITERS))
        fn = self.k.svm_cv(shared, kernel, gamma_mode, iters)
        if self.mesh is not None and not shared and isinstance(Xin, np.ndarray):
            # host-provided Z only; eval_cell's cached Z is already sharded
            (Xin,) = self._maybe_shard(Xin)
        dec = np.asarray(fn(Xin, W, idx, ypm, u, gval))  # (F', N, P)
        scores = []
        for f in range(self.cv):
            val = self.fold_of == f
            votes = ovo_vote(dec[f, val], pairs, self.n_classes)
            scores.append(_score(self.y[val], votes.argmax(1), scoring))
        return scores

    def eval_lda(self, cell: dict, scoring: str, Z: Optional[np.ndarray] = None) -> list[float]:
        shared = Z is None
        Xin = self.X if shared else Z
        fn = self.k.lda_cv(shared)
        W = self._w_dev()
        if self.mesh is not None and not shared and isinstance(Xin, np.ndarray):
            # host-provided Z only; eval_cell's cached Z is already sharded
            (Xin,) = self._maybe_shard(Xin)
        dec = np.asarray(fn(Xin, self.onehot, W))
        return self._per_fold_scores(dec, scoring)

    def eval_knn(self, cell: dict, scoring: str, Z: Optional[np.ndarray] = None) -> list[float]:
        n_neighbors = int(cell.get("n_neighbors", 5))
        metric = str(cell.get("metric", "minkowski"))
        if metric not in _KNN_METRICS:
            raise ValueError(f"knn metric must be one of {_KNN_METRICS}, got {metric!r}")
        shared = Z is None
        Xin = self.X if shared else Z
        min_fold = int(self.W.sum(1).min()) or 1
        fn = self.k.knn_cv(shared, min(n_neighbors, min_fold), metric)
        W = self._w_dev()
        if self.mesh is not None and not shared and isinstance(Xin, np.ndarray):
            # host-provided Z only; eval_cell's cached Z is already sharded
            (Xin,) = self._maybe_shard(Xin)
        counts = np.asarray(fn(Xin, W, self.onehot))
        return self._per_fold_scores(counts, scoring)

    def eval_cell(self, model_name: str, cell: dict, scoring: str) -> list[float]:
        Z = None
        if model_name.startswith("pca_"):
            # n_components_pca is the reference's knob name on the pca_*
            # pipelines (PCALDATrainer accepts both); honor it here too
            ncomp = int(cell.get("n_components_pca", cell.get("n_components", 50)))
            ncomp = min(ncomp, self.X.shape[1], int(self.W.sum(1).min()))
            Z = self._pca_cache.get(ncomp)
            if Z is None:
                # cells sharing n_components reuse one fold-PCA dispatch, and
                # the result stays ON DEVICE (fold-sharded when meshed, since
                # _w_dev() is): fetching to host and re-sharding per grid cell
                # re-uploaded the same (F, N, k) tensor once per cell
                Z = self.k.pca_cv(ncomp)(self.X, self._w_dev())  # (F', N, k)
                self._pca_cache[ncomp] = Z
        tail = model_name.split("_")[-1]
        if tail == "svm" or model_name == "svm":
            return self.eval_svm(cell, scoring, Z)
        if tail == "lda" or model_name == "lda":
            return self.eval_lda(cell, scoring, Z)
        if tail == "knn" or model_name == "knn":
            return self.eval_knn(cell, scoring, Z)
        raise ValueError(f"unsupported model {model_name!r}")


def grid_search_cv_jax(model_name: str, param_grid: dict, X, y, cv: int = 5,
                       scoring: str = "f1_macro", seed: int = 42, devices: int = 1):
    """Fold-batched grid search over the JAX classical models. Returns
    (best_trainer, best_params, best_score) — the same contract as
    search.grid_search_cv, with the best cell refit on ALL of (X, y)."""
    if model_name not in JAX_TUNABLE:
        raise ValueError(f"{model_name!r} is not JAX-tunable; use search.grid_search_cv")
    validate_grid(model_name, param_grid or {})
    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.int64)
    n_classes = int(y.max()) + 1
    fold_of = stratified_fold_ids(y, cv, seed)
    engine = _CVEngine(X, y, fold_of, n_classes, devices=devices)

    cells = _expand_grid(param_grid)
    best_cell, best_score = None, -np.inf
    for cell in cells:
        fold_scores = engine.eval_cell(model_name, cell, scoring)
        mean = float(np.mean(fold_scores))
        logger.info("[grid-jax %s] %s -> %s=%.4f", model_name, cell or "(defaults)", scoring, mean)
        if mean > best_score:
            best_cell, best_score = cell, mean

    trainer = get_model(model_name)(**best_cell)
    trainer._fit_body(X, np.asarray(y, np.int32), n_classes)
    return trainer, dict(best_cell), best_score
