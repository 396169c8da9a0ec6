"""JAX-native classical core (models/classical_jax.py) vs sklearn.

Selection-decision parity: the JAX PCA/LDA/OvO-SVM stack must make the
same predictions (and hence the same model-selection decisions) as the
sklearn estimators it replaces (reference models/classical.py:60-513),
on synthetic data at fsc22 scale.
"""

from __future__ import annotations

import warnings

import numpy as np
import pytest

from audio_edge_ml_pipeline_tpu.models import classical_jax as cj
from audio_edge_ml_pipeline_tpu.models.registry import get_model

warnings.filterwarnings("ignore", category=FutureWarning)


def make_blobs(n_classes, per_class, dim, spread=1.2, seed=0, val_per_class=12):
    rng = np.random.default_rng(seed)
    means = rng.standard_normal((n_classes, dim)) * spread
    Xtr = np.concatenate(
        [means[k] + rng.standard_normal((per_class, dim)) for k in range(n_classes)]
    ).astype(np.float32)
    ytr = np.repeat(np.arange(n_classes), per_class).astype(np.int32)
    Xv = np.concatenate(
        [means[k] + rng.standard_normal((val_per_class, dim)) for k in range(n_classes)]
    ).astype(np.float32)
    yv = np.repeat(np.arange(n_classes), val_per_class).astype(np.int32)
    perm = rng.permutation(len(Xtr))
    return Xtr[perm], ytr[perm], Xv, yv


@pytest.fixture(scope="module")
def blobs6():
    return make_blobs(6, 40, 32, seed=3)


# ---------------------------------------------------------------------------
# SVM
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kernel,C", [("rbf", 1.0), ("linear", 1.0), ("rbf", 10.0)])
def test_svm_prediction_parity(blobs6, kernel, C):
    from sklearn.svm import SVC

    Xtr, ytr, Xv, yv = blobs6
    state = cj.fit_svm_np(Xtr, ytr, 6, C=C, kernel=kernel, gamma="scale", iters=600)
    pred = cj.predict_svm_np(Xv, state)
    sk = SVC(C=C, kernel=kernel, gamma="scale", probability=True,
             class_weight="balanced").fit(Xtr, ytr)
    match = (pred == sk.predict(Xv)).mean()
    assert match >= 0.97, f"{kernel} C={C}: only {match:.3f} prediction agreement"

    proba = cj.predict_proba_svm_np(Xv, state)
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-6)
    # Platt-on-train vs libsvm's CV-Platt differ slightly; distributions
    # must still be close enough that proba-based metrics (ROC-AUC) agree
    assert np.abs(proba - sk.predict_proba(Xv)).mean() < 0.05


def test_svm_linear_coef_matches_sklearn(blobs6):
    from sklearn.svm import SVC

    Xtr, ytr, Xv, _ = blobs6
    state = cj.fit_svm_np(Xtr, ytr, 6, C=1.0, kernel="linear", iters=600)
    coef, b = cj.linear_ovo_coef(state)
    sk = SVC(C=1.0, kernel="linear", class_weight="balanced").fit(Xtr, ytr)
    assert coef.shape == sk.coef_.shape
    corr = np.corrcoef(coef.ravel(), sk.coef_.ravel())[0, 1]
    assert corr > 0.999, f"OvO coefficient correlation only {corr:.4f}"


def test_svm_grid_reuses_compiled_program(blobs6):
    """C and gamma are ARRAY args: a whole tuning grid must reuse one
    compiled solver (CLAUDE.md jit-cache invariant)."""
    Xtr, ytr, _, _ = blobs6
    k = cj.kernels()
    cj.fit_svm_np(Xtr, ytr, 6, C=1.0, kernel="rbf", gamma="scale", iters=50)
    n0 = k.svm_fit._cache_size()
    for C, gamma in [(0.3, "scale"), (3.0, 0.01), (10.0, "auto")]:
        cj.fit_svm_np(Xtr, ytr, 6, C=C, kernel="rbf", gamma=gamma, iters=50)
    assert k.svm_fit._cache_size() == n0, "C/gamma changes must not retrace svm_fit"


# ---------------------------------------------------------------------------
# LDA / PCA
# ---------------------------------------------------------------------------


def test_lda_parity_and_tall_matrix(blobs6):
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis

    Xtr, ytr, Xv, _ = blobs6
    state = cj.fit_lda_np(Xtr, ytr, 6)
    pred = cj.lda_decision_np(Xv, state).argmax(1)
    sk = LinearDiscriminantAnalysis().fit(Xtr, ytr)
    assert (pred == sk.predict(Xv)).mean() >= 0.97

    # D > N: fit must run in the data span and still agree
    Xw, yw, Xwv, _ = make_blobs(4, 15, 256, seed=9, val_per_class=8)
    st = cj.fit_lda_np(Xw, yw, 4)
    p = cj.lda_decision_np(Xwv, st).argmax(1)
    skw = LinearDiscriminantAnalysis().fit(Xw, yw)
    assert (p == skw.predict(Xwv)).mean() >= 0.95


def test_lda_coefficients_survive_reduced_precision():
    """Rank-deficient fits (D >> N: within-scatter has exact-null
    directions) must yield BOUNDED coefficients. The ridge-floor solve kept
    near-null eigendirections with 1/ev weights up to ~4e8: decisions were
    exact in f32, but the fp16 optimize artifact overflowed to chance
    accuracy and the int8 scale (max|w|/127) flattened every informative
    weight. The rank-cutoff solve (pinv rcond = dim * eps * ev_max) drops
    them; deliberate divergence from sklearn's svd solver, which keeps
    tiny-singular-value directions with |coef| ~ 4e4 on this data."""
    rng = np.random.default_rng(11)
    K, per, D = 6, 8, 302  # N=48 << D, like a tiny classical FeatureSet
    means = rng.standard_normal((K, D)) * 1.5
    X = np.concatenate(
        [means[k] + rng.standard_normal((per, D)) for k in range(K)]
    ).astype(np.float32)
    y = np.repeat(np.arange(K), per).astype(np.int32)
    st = cj.fit_lda_np(X, y, K)
    # bounded enough that fp16 round-trips without overflow (max f16 65504)
    assert np.abs(st["lda_coef"]).max() < 1e4
    c16 = st["lda_coef"].astype(np.float16).astype(np.float32)
    assert np.isfinite(c16).all()
    # fp16 weights must preserve the training-set decisions
    dec32 = cj.lda_decision_np(X, st).argmax(1)
    dec16 = (X @ c16 + st["lda_intercept"]).argmax(1)
    assert (dec16 == dec32).mean() >= 0.95
    assert (dec32 == y).mean() >= 0.95  # and the fit itself still separates


def test_pca_subspace_matches_sklearn(blobs6):
    from sklearn.decomposition import PCA
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    Xtr, _, Xv, _ = blobs6
    state = cj.fit_scaler_pca_np(Xtr, 8)
    Z = cj.transform_scaler_pca_np(Xv, state)
    pipe = Pipeline([("s", StandardScaler()), ("p", PCA(n_components=8))]).fit(Xtr)
    Zs = pipe.transform(Xv)
    # components are defined up to sign; compare |coords|
    np.testing.assert_allclose(np.abs(Z), np.abs(Zs), atol=5e-3)


# ---------------------------------------------------------------------------
# fsc22-scale selection parity
# ---------------------------------------------------------------------------


def test_selection_ranking_parity_27_classes(tmp_path):
    """27-class fsc22-shaped data: the f1-ranking across (svm, lda, pca_svm)
    must agree between the JAX stack and sklearn, so Stage-5 selection
    decisions are backend-independent."""
    from sklearn.decomposition import PCA
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis
    from sklearn.metrics import f1_score
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    Xtr, ytr, Xv, yv = make_blobs(27, 30, 64, spread=0.55, seed=11, val_per_class=10)

    def f1(pred):
        return f1_score(yv, pred, average="macro")

    jax_scores = {}
    sk_scores = {}

    st = cj.fit_svm_np(Xtr, ytr, 27, C=1.0, kernel="rbf", gamma="scale", iters=400)
    jax_scores["svm"] = f1(cj.predict_svm_np(Xv, st))
    sk_scores["svm"] = f1(
        SVC(C=1.0, kernel="rbf", gamma="scale", class_weight="balanced").fit(Xtr, ytr).predict(Xv)
    )

    st = cj.fit_lda_np(Xtr, ytr, 27)
    jax_scores["lda"] = f1(cj.lda_decision_np(Xv, st).argmax(1))
    sk_scores["lda"] = f1(LinearDiscriminantAnalysis().fit(Xtr, ytr).predict(Xv))

    pca_state = cj.fit_scaler_pca_np(Xtr, 24)
    Ztr = cj.transform_scaler_pca_np(Xtr, pca_state)
    st = cj.fit_svm_np(Ztr, ytr, 27, C=1.0, kernel="rbf", gamma="scale", iters=400)
    jax_scores["pca_svm"] = f1(cj.predict_svm_np(cj.transform_scaler_pca_np(Xv, pca_state), st))
    sk_pipe = Pipeline([
        ("s", StandardScaler()), ("p", PCA(n_components=24)),
        ("svm", SVC(C=1.0, kernel="rbf", gamma="scale", class_weight="balanced")),
    ]).fit(Xtr, ytr)
    sk_scores["pca_svm"] = f1(sk_pipe.predict(Xv))

    for name in jax_scores:
        assert abs(jax_scores[name] - sk_scores[name]) < 0.03, (
            f"{name}: jax f1={jax_scores[name]:.4f} vs sklearn {sk_scores[name]:.4f}"
        )
    assert (sorted(jax_scores, key=jax_scores.get) == sorted(sk_scores, key=sk_scores.get)), (
        f"selection ranking diverged: {jax_scores} vs {sk_scores}"
    )


# ---------------------------------------------------------------------------
# trainer classes + bundles
# ---------------------------------------------------------------------------


def test_trainer_save_load_roundtrip(blobs6, tmp_path):
    Xtr, ytr, Xv, _ = blobs6
    names = ["a", "b", "c", "d", "e", "f"]
    for name, kwargs in [("svm", {"iters": 200}), ("lda", {}),
                         ("pca_svm", {"n_components": 8, "iters": 200}),
                         ("pca_lda", {"n_components": 8}),
                         ("pca_knn", {"n_components": 8, "n_neighbors": 3})]:
        trainer = get_model(name)(**kwargs)
        res = trainer.fit(Xtr, ytr, Xv, np.zeros(len(Xv), np.int32), names,
                          name, tmp_path / name, None)
        assert res.model_size_kb > 0
        loaded = get_model(name).load(tmp_path / name / f"{name}.npz")
        np.testing.assert_array_equal(loaded.predict(Xv), trainer.predict(Xv))
        proba = loaded.predict_proba(Xv)
        assert proba is not None and proba.shape == (len(Xv), 6)
        np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)


def test_export_svm_consumes_jax_bundle(blobs6, tmp_path):
    """The deploy path: JAX pca_svm (linear) -> export_svm bundle -> the
    MicroPython runtime's scaler->pca->OvO-vote math reproduces the
    trainer's predictions exactly."""
    import json

    from audio_edge_ml_pipeline_tpu.deploy.export_svm import export_bundle

    Xtr, ytr, Xv, _ = blobs6
    names = list("abcdef")
    trainer = get_model("pca_svm")(n_components=8, kernel="linear", iters=400)
    trainer.fit(Xtr, ytr, Xv, np.zeros(len(Xv), np.int32), names, "ps",
                tmp_path / "ps", None)
    model_path = tmp_path / "ps" / "pca_svm.npz"
    out = export_bundle(model_path, tmp_path / "bundle", names, sample_rate=16000)

    comp = np.load(out / "pca_components.npy")   # (k, D) sklearn layout
    coef = np.load(out / "svm_coef.npy")
    b = np.load(out / "svm_intercept.npy")
    smean = np.load(out / "scaler_mean.npy")
    sscale = np.load(out / "scaler_scale.npy")
    pmean = np.load(out / "pca_mean.npy")
    assert comp.shape[0] == 8 and coef.shape == (15, 8)
    assert json.loads((out / "label_names.json").read_text()) == names

    # replicate the on-device predict() (deploy/micropython_runtime.py)
    preds = []
    for x in Xv:
        z = comp @ ((x - smean) / sscale - pmean)
        dec = coef @ z + b
        votes = np.zeros(6)
        k = 0
        for i in range(6):
            for j in range(i + 1, 6):
                votes[i if dec[k] > 0 else j] += 1
                k += 1
        preds.append(int(votes.argmax()))
    agree = (np.asarray(preds) == trainer.predict(Xv)).mean()
    assert agree >= 0.98, f"on-device vote only agrees {agree:.3f} with trainer"


def test_rbf_kernel_rejected_by_export(blobs6, tmp_path):
    Xtr, ytr, Xv, _ = blobs6
    from audio_edge_ml_pipeline_tpu.deploy.export_svm import export_bundle

    trainer = get_model("pca_svm")(n_components=8, kernel="rbf", iters=100)
    trainer.fit(Xtr, ytr, Xv, np.zeros(len(Xv), np.int32), list("abcdef"), "ps",
                tmp_path / "ps", None)
    with pytest.raises(ValueError, match="linear"):
        export_bundle(tmp_path / "ps" / "pca_svm.npz", tmp_path / "b", list("abcdef"))


def test_lda_survives_absent_class():
    """A class present in label_names but absent from y_train (non-stratified
    split fallback, max_samples subsampling) must not NaN-poison the fit:
    the absent class gets a large-negative FINITE log-prior (a -inf one
    would make int8 fake-quant's scale = max|a|/127 = inf and NaN the whole
    intercept vector) and is simply never predicted."""
    rng = np.random.default_rng(7)
    K, per, D = 5, 30, 12
    means = rng.standard_normal((K, D)) * 2.0
    X = np.concatenate([means[k] + rng.standard_normal((per, D)) for k in range(K)]).astype(np.float32)
    y = np.repeat(np.arange(K), per).astype(np.int32)
    keep = y != 3  # class 3 exists in the label space but has no samples
    state = cj.fit_lda_np(X[keep], y[keep], n_classes=K)
    assert np.isfinite(state["lda_coef"]).all()
    dec = cj.lda_decision_np(X, state)
    pred = dec.argmax(1)
    assert not np.any(pred == 3), "absent class must never be predicted"
    # the present classes still classify essentially perfectly
    acc = (pred[keep] == y[keep]).mean()
    assert acc > 0.95
    proba = cj.softmax_np(dec)
    assert np.isfinite(proba).all()
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)
    # the floored prior log(1e-12) ≈ -27.6 leaves the absent class ~e^-27
    # softmax mass (not exactly 0 like the old -inf prior) — negligible
    np.testing.assert_allclose(proba[:, 3], 0.0, atol=1e-5)
    # the intercept must be finite so the optimize stage's int8 fake-quant
    # keeps a finite scale (a -inf entry made every class's entry NaN)
    assert np.isfinite(state["lda_intercept"]).all()
    from audio_edge_ml_pipeline_tpu.optimize.quantize import fake_quant_int8
    deq = fake_quant_int8(state["lda_intercept"])[0]
    assert np.isfinite(deq).all()
    # OOD safety: far from every class mean, all present-class affine scores
    # drop below the floored -27.6 intercept — without the lda_present mask
    # the zero-coef absent class would win the argmax
    X_ood = np.full((4, D), 1e4, np.float32) * np.array([[1], [-1], [2], [-3]], np.float32)
    pred_ood = cj.lda_decision_np(X_ood, state).argmax(1)
    assert not np.any(pred_ood == 3), "absent class must not win on outliers"
    # and the mask survives the .npz save/load round trip trainers use
    import io
    buf = io.BytesIO()
    np.savez(buf, **state)
    buf.seek(0)
    loaded = dict(np.load(buf))
    assert loaded["lda_present"].dtype == np.bool_
    pred_loaded = cj.lda_decision_np(X_ood, loaded).argmax(1)
    assert not np.any(pred_loaded == 3)
