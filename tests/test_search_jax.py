"""Fold-batched grid search (train/search_jax.py).

The tuning stage's TPU-native replacement for GridSearchCV(n_jobs=-1)
(reference training/tune.py:269-276): all CV folds of a grid cell run as
one batched device program, optionally sharded fold-wise over a mesh.
"""

from __future__ import annotations

import time
import warnings

import numpy as np
import pytest

from audio_edge_ml_pipeline_tpu.models import classical_jax as cj
from audio_edge_ml_pipeline_tpu.train import search_jax as sj

warnings.filterwarnings("ignore", category=FutureWarning)


@pytest.fixture(scope="module")
def data():
    K, per, D = 6, 40, 32
    rng = np.random.default_rng(5)
    means = rng.standard_normal((K, D)) * 0.8
    X = np.concatenate([means[k] + rng.standard_normal((per, D)) for k in range(K)]).astype(np.float32)
    y = np.repeat(np.arange(K), per).astype(np.int64)
    perm = rng.permutation(len(X))
    return X[perm], y[perm]


def _sequential_cv_svm(X, y, fold_of, n_classes, C, scoring="f1_macro"):
    """The naive path: one solver dispatch per fold (what the batched
    engine replaces). Same fold split, same solver, same iteration count."""
    scores = []
    for f in range(int(fold_of.max()) + 1):
        tr = fold_of != f
        va = ~tr
        state = cj.fit_svm_np(X[tr], y[tr], n_classes, C=C, kernel="rbf",
                              gamma="scale", iters=sj._DEFAULT_ITERS)
        pred = cj.predict_svm_np(X[va], state)
        scores.append(sj._score(y[va], pred, scoring))
    return scores


def test_batched_cv_matches_sequential(data):
    """The fold-batched program must reproduce the per-fold sequential
    fits' scores (same split, same QP solver)."""
    X, y = data
    n_classes = int(y.max()) + 1
    fold_of = sj.stratified_fold_ids(y, 4, seed=0)
    engine = sj._CVEngine(X, y.astype(np.int32), fold_of, n_classes)
    batched = engine.eval_svm({"C": 1.0, "kernel": "rbf", "gamma": "scale"}, "f1_macro")
    sequential = _sequential_cv_svm(X, y, fold_of, n_classes, C=1.0)
    np.testing.assert_allclose(batched, sequential, atol=0.02)


def test_grid_search_cv_jax_end_to_end(data):
    X, y = data
    trainer, best, score = sj.grid_search_cv_jax(
        "pca_svm", {"n_components": [8, 16], "C": [1.0]}, X, y, cv=4
    )
    assert set(best) == {"n_components", "C"}
    assert score > 0.9
    assert trainer.predict(X[:8]).shape == (8,)
    proba = trainer.predict_proba(X[:8])
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)


def test_cells_reuse_compiled_program(data):
    """C/gamma grid cells must share one compiled CV program."""
    X, y = data
    fold_of = sj.stratified_fold_ids(y, 4, seed=0)
    engine = sj._CVEngine(X, y.astype(np.int32), fold_of, int(y.max()) + 1)
    fn = engine.k.svm_cv(True, "rbf", "scale", sj._DEFAULT_ITERS)
    engine.eval_svm({"C": 0.5}, "f1_macro")
    n0 = fn._cache_size()
    engine.eval_svm({"C": 2.0}, "f1_macro")
    engine.eval_svm({"C": 8.0}, "f1_macro")
    assert fn._cache_size() == n0


def test_mesh_sharded_folds_match_single_device(data):
    """devices=8 (virtual CPU mesh): fold-sharded evaluation returns the
    same scores as the unsharded program (folds padded with zero-weight
    dummies)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-virtual-device CPU test config")
    X, y = data
    n_classes = int(y.max()) + 1
    fold_of = sj.stratified_fold_ids(y, 5, seed=1)
    plain = sj._CVEngine(X, y.astype(np.int32), fold_of, n_classes, devices=1)
    sharded = sj._CVEngine(X, y.astype(np.int32), fold_of, n_classes, devices=8)
    assert sharded.mesh is not None
    for model, cell in [("svm", {"C": 1.0}), ("lda", {}),
                        ("pca_knn", {"n_components": 8, "n_neighbors": 5})]:
        s0 = plain.eval_cell(model, cell, "f1_macro")
        s1 = sharded.eval_cell(model, cell, "f1_macro")
        np.testing.assert_allclose(s0, s1, atol=5e-3, err_msg=model)


def test_batched_beats_sequential_wall_clock(data):
    """The point of the redesign: one batched dispatch across folds is
    materially faster than the sequential per-fold loop (>= 2x here on
    CPU; the gap widens on TPU where per-dispatch overhead is ~25 ms)."""
    X, y = data
    n_classes = int(y.max()) + 1
    fold_of = sj.stratified_fold_ids(y, 4, seed=0)
    engine = sj._CVEngine(X, y.astype(np.int32), fold_of, n_classes)
    # warm both paths (compile excluded from timing)
    engine.eval_svm({"C": 1.0}, "f1_macro")
    _sequential_cv_svm(X, y, fold_of, n_classes, C=1.0)

    t0 = time.perf_counter()
    engine.eval_svm({"C": 2.0}, "f1_macro")
    t_batched = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sequential_cv_svm(X, y, fold_of, n_classes, C=2.0)
    t_seq = time.perf_counter() - t0
    ratio = t_seq / max(t_batched, 1e-9)
    print(f"batched={t_batched:.3f}s sequential={t_seq:.3f}s ratio={ratio:.1f}x")
    assert ratio >= 2.0, f"batched CV only {ratio:.2f}x faster than sequential"


def test_grid_validation_rejects_unknown_keys_and_values(data):
    """Silently-ignored grid keys would score every cell identically and
    pick an arbitrary winner; unsupported kernels/metrics would silently
    fall through to the linear/euclidean formulation. All must raise."""
    X, y = data
    with pytest.raises(ValueError, match="unknown grid key"):
        sj.grid_search_cv_jax("pca_lda", {"n_components_lda_typo": [5]}, X, y, cv=3)
    with pytest.raises(ValueError, match="kernel"):
        sj.grid_search_cv_jax("svm", {"kernel": ["poly"]}, X, y, cv=3)
    with pytest.raises(ValueError, match="metric"):
        sj.grid_search_cv_jax("knn", {"metric": ["chebyshev"]}, X, y, cv=3)
    with pytest.raises(ValueError, match="shrinkage"):
        # sklearn shrinkage changes LDA predictions; the closed-form core
        # doesn't implement it, so it must be rejected, not ignored
        sj.grid_search_cv_jax("lda", {"shrinkage": [0.1]}, X, y, cv=3)


def test_n_components_pca_alias_matches_n_components(data):
    """pca_lda's ctor knob name (reference classical.py:450) must select
    the same PCA dimensionality as the friendly grid name."""
    X, y = data
    fold_of = sj.stratified_fold_ids(y, 3, seed=0)
    engine = sj._CVEngine(X, y.astype(np.int32), fold_of, int(y.max()) + 1)
    s_alias = engine.eval_cell("pca_lda", {"n_components_pca": 8}, "f1_macro")
    s_plain = engine.eval_cell("pca_lda", {"n_components": 8}, "f1_macro")
    np.testing.assert_allclose(s_alias, s_plain)


def test_gridded_iters_reaches_the_solver(data):
    """'iters' is an accepted grid key, so it must actually reach the
    compiled solver — a pinned default would score every iters cell
    identically and pick an arbitrary winner (the silent-no-op failure mode
    validate_grid exists to prevent). OvO votes on the easy synthetic can
    coincide even for a starved solve, so assert on the forwarded budget and
    on the raw decision values instead of fold scores."""
    X, y = data
    fold_of = sj.stratified_fold_ids(y, 4, seed=0)
    engine = sj._CVEngine(X, y.astype(np.int32), fold_of, int(y.max()) + 1)
    seen = []
    orig = engine.k.svm_cv
    engine.k.svm_cv = lambda shared, kern, gm, iters: (seen.append(iters), orig(shared, kern, gm, iters))[1]
    try:
        engine.eval_svm({"C": 1.0, "iters": 7}, "f1_macro")
        engine.eval_svm({"C": 1.0}, "f1_macro")
    finally:
        engine.k.svm_cv = orig
    assert seen == [7, sj._DEFAULT_ITERS]
    # and the budget genuinely changes the compiled program's output
    pairs, idx, ypm, cw = engine._ovo_cached()
    u = cw.astype(np.float32)
    dec1 = np.asarray(orig(True, "rbf", "scale", 1)(X, engine._w_dev(), idx, ypm, u, np.float32(0)))
    dec400 = np.asarray(orig(True, "rbf", "scale", sj._DEFAULT_ITERS)(X, engine._w_dev(), idx, ypm, u, np.float32(0)))
    assert np.max(np.abs(dec1 - dec400)) > 1e-3
