"""JAX-native classical model core: PCA, LDA, and OvO kernel SVM.

TPU-first redesign of the reference's sklearn classical stack
(reference models/classical.py:60-513). Instead of per-estimator host
solvers, every fit is expressed as dense batched linear algebra so XLA
tiles it onto the MXU:

- **PCA** — Gram-matrix eigendecomposition (`G = Xc Xc^T`, N x N) instead
  of an SVD over (N, D): flattened audio features have D >> N, so the
  N x N path is both exact (same spectrum) and orders of magnitude
  cheaper. Deterministic component signs (largest-|coef| positive).
- **LDA** — closed-form Gaussian discriminant: class means via one-hot
  matmuls, pooled within-class covariance, eigendecomposition solve
  with a relative rank cutoff (sklearn svd-solver convention, and the
  reason quantized LDA artifacts keep bounded weights). For D > N-1
  the problem is first projected (losslessly) onto the span of the
  centered data via the PCA above. predict_proba is the softmax over
  the decision function (sklearn semantics).
- **SVM** — all K(K-1)/2 one-vs-one dual QPs solved SIMULTANEOUSLY as one
  batched accelerated-projected-gradient program: pairs are padded to a
  common size M, the full N x N kernel matrix is computed once, per-pair
  Gram blocks are gathered from it, and a `lax.scan` of APG steps with a
  bisection projection onto {0 <= a <= u, y.a = 0} runs for every pair at
  once. Balanced class weights, libsvm-style intercept (free-SV mean with
  KKT-interval fallback), Platt sigmoids per pair, and pairwise coupling
  (Wu-Lin-Weng / libsvm multiclass_probability) for predict_proba.
  Voting matches sklearn's `_ovr_decision_function` (votes + bounded
  confidence-sum tie-break).

All jitted callables are module-level and cached by JAX's trace cache —
never rebuilt per call (CLAUDE.md invariant). Hyperparameters (C, gamma,
box bounds) are ARRAY arguments, so a whole C x gamma tuning grid reuses
one compiled program.
"""

from __future__ import annotations

import logging
from functools import partial
from types import SimpleNamespace

import numpy as np

logger = logging.getLogger(__name__)

_K = None  # lazily-built namespace of jitted kernels


def kernels() -> SimpleNamespace:
    """Build (once) and return the jitted kernel namespace."""
    global _K
    if _K is not None:
        return _K

    import jax
    import jax.numpy as jnp
    from jax import lax

    HI = jax.lax.Precision.HIGHEST

    # -- scaler + PCA ------------------------------------------------------

    @partial(jax.jit, static_argnames=("n_components",))
    def fit_scaler_pca(X, n_components):
        """StandardScaler + PCA via the N x N Gram eigendecomposition.
        Returns (mean, scale, pca_mean, components[D,k])."""
        mean = X.mean(0)
        scale = X.std(0)
        scale = jnp.where(scale == 0.0, 1.0, scale)
        Xs = (X - mean) / scale
        pmean = Xs.mean(0)
        Xc = Xs - pmean
        G = jnp.matmul(Xc, Xc.T, precision=HI)
        w, U = jnp.linalg.eigh(G)  # ascending
        w = jnp.clip(w[::-1][:n_components], 0.0)
        U = U[:, ::-1][:, :n_components]
        S = jnp.sqrt(w)
        comp = jnp.matmul(Xc.T, U, precision=HI) / jnp.maximum(S, 1e-12)[None, :]
        # deterministic sign: the largest-|.| loading of each component > 0
        j = jnp.argmax(jnp.abs(comp), axis=0)
        sgn = jnp.sign(comp[j, jnp.arange(comp.shape[1])])
        comp = comp * jnp.where(sgn == 0, 1.0, sgn)[None, :]
        return mean, scale, pmean, comp

    @jax.jit
    def transform_scaler_pca(X, mean, scale, pmean, comp):
        return jnp.matmul((X - mean) / scale - pmean, comp, precision=HI)

    # -- LDA ---------------------------------------------------------------

    @partial(jax.jit, static_argnames=("n_classes",))
    def fit_lda(Z, y, n_classes):
        """Closed-form LDA: pooled within-class covariance, rank-cutoff
        eigendecomposition solve. Returns (coef[r,K], intercept[K])."""
        N, r = Z.shape
        onehot = jax.nn.one_hot(y, n_classes, dtype=Z.dtype)
        counts = onehot.sum(0)
        # a class can be absent from y (non-stratified split fallback,
        # max_samples subsampling): clamp the mean divisor so its row stays
        # finite (zero) — a raw 0/0 here would NaN the whole coefficient
        # matrix. The prior is floored below instead of left at 0: a -inf
        # intercept would NaN-poison int8 quantization (scale = max|a|/127
        # = inf), while log(1e-12) ≈ -27.6 still never wins the argmax
        # because the absent class's coef column is exactly 0.
        means = jnp.matmul(onehot.T, Z, precision=HI) / jnp.maximum(counts, 1.0)[:, None]
        Zc = Z - means[y]
        Sw = jnp.matmul(Zc.T, Zc, precision=HI) / jnp.maximum(N - n_classes, 1)
        coef = _sw_pinv_solve(Sw, means.T)  # (r, K)
        priors = counts / N
        intercept = -0.5 * jnp.sum(means.T * coef, axis=0) + jnp.log(jnp.maximum(priors, 1e-12))
        return coef, intercept

    def _sw_pinv_solve(Sw, B):
        """Solve Sw @ coef = B by eigendecomposition with a RELATIVE rank
        cutoff (sklearn svd-solver convention: within-class directions below
        tolerance are DISCARDED, not ridge-inflated). The previous ridge
        floor (1e-6 * trace) let near-null within-variance directions blow
        coefficients up to ~1e8 — decisions stayed exact in f32, but fp16
        artifacts overflowed to chance accuracy and int8 scales flattened
        every informative weight. The cutoff is the standard pinv rcond,
        dim * eps(dtype) * ev_max: JAX f32 eigh noise on rank-deficient
        dims measured up to ~5*eps*ev_max, and a noise dim kept just above
        a tighter cutoff re-enters with weight 1/ev ~ 1e6 (measured) —
        exactly the blow-up this solve exists to prevent."""
        ev, V = jnp.linalg.eigh(Sw)  # ascending
        rcond = Sw.shape[0] * jnp.finfo(Sw.dtype).eps
        keep = ev > rcond * jnp.maximum(ev[-1], 1e-30)
        inv = jnp.where(keep, 1.0 / jnp.maximum(ev, 1e-30), 0.0)
        return jnp.matmul(V, inv[:, None] * jnp.matmul(V.T, B, precision=HI), precision=HI)

    @jax.jit
    def linear_decision(X, coef, intercept):
        return jnp.matmul(X, coef, precision=HI) + intercept

    # -- SVM ---------------------------------------------------------------

    def _pair_dist_sq(A, B):
        sq = (
            jnp.sum(A * A, axis=1)[:, None]
            - 2.0 * jnp.matmul(A, B.T, precision=HI)
            + jnp.sum(B * B, axis=1)[None, :]
        )
        return jnp.clip(sq, 0.0)

    def _kernel_matrix(A, B, gamma, kind):
        if kind == "rbf":
            return jnp.exp(-gamma * _pair_dist_sq(A, B))
        return jnp.matmul(A, B.T, precision=HI)

    def _project(z, ypm, u):
        """Exact projection of each pair's z onto {0<=a<=u, ypm.a=0} by
        bisection over the hyperplane multiplier (g is monotone in lam)."""
        span = jnp.max(jnp.abs(z), -1) + jnp.max(u, -1) + 1.0  # (P,)
        lo, hi = -span, span

        def body(_, lh):
            lo, hi = lh
            mid = 0.5 * (lo + hi)
            a = jnp.clip(z - mid[:, None] * ypm, 0.0, u)
            g = jnp.sum(a * ypm, -1)
            return jnp.where(g > 0, mid, lo), jnp.where(g > 0, hi, mid)

        lo, hi = lax.fori_loop(0, 64, body, (lo, hi))
        lam = 0.5 * (lo + hi)
        return jnp.clip(z - lam[:, None] * ypm, 0.0, u)

    def _solve_qps(Kp, ypm, u, iters):
        """Accelerated projected gradient (+ gradient restart) over a batch
        of OvO dual QPs. Kp (P,M,M); returns (alpha[P,M], b[P], f[P,M])
        where f holds the training decision values without b."""
        Q = ypm[:, :, None] * ypm[:, None, :] * Kp
        # Lipschitz bound per pair: max row sum of |Q| >= lambda_max
        L = jnp.max(jnp.sum(jnp.abs(Q), -1), -1)
        eta = (1.0 / jnp.maximum(L, 1e-12))[:, None]

        def grad(a):
            # HIGHEST: DEFAULT bf16 products perturb the gradient ~1e-2
            # relative on TPU — enough to move alpha off the sklearn optimum
            return jnp.einsum("pmn,pn->pm", Q, a, precision=HI) - jnp.where(u > 0, 1.0, 0.0)

        def step(carry, _):
            a, z, th = carry
            g = grad(z)
            a_new = _project(z - eta * g, ypm, u)
            # gradient restart: momentum fighting the descent direction
            restart = jnp.sum(g * (a_new - a), -1) > 0.0
            th = jnp.where(restart, 1.0, th)
            th_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * th * th))
            mom = ((th - 1.0) / th_new)[:, None]
            z_new = a_new + jnp.where(restart[:, None], 0.0, mom * (a_new - a))
            return (a_new, z_new, th_new), None

        a0 = jnp.zeros_like(u)
        (alpha, _, _), _ = lax.scan(step, (a0, a0, jnp.ones(u.shape[0])), None, length=iters)

        # intercept: mean over free SVs, else midpoint of the KKT interval
        f = jnp.einsum("pmn,pn->pm", Kp, alpha * ypm, precision=HI)  # decision w/o b
        tol = 1e-6 * jnp.maximum(jnp.max(u, -1, keepdims=True), 1e-12)
        valid = u > 0
        free = valid & (alpha > tol) & (alpha < u - tol)
        nfree = jnp.sum(free, -1)
        b_free = jnp.sum(jnp.where(free, ypm - f, 0.0), -1) / jnp.maximum(nfree, 1)
        lo_set = valid & (((ypm > 0) & (alpha <= tol)) | ((ypm < 0) & (alpha >= u - tol)))
        hi_set = valid & (((ypm > 0) & (alpha >= u - tol)) | ((ypm < 0) & (alpha <= tol)))
        b_lo = jnp.max(jnp.where(lo_set, ypm - f, -jnp.inf), -1)
        b_hi = jnp.min(jnp.where(hi_set, ypm - f, jnp.inf), -1)
        b_lo = jnp.where(jnp.isfinite(b_lo), b_lo, 0.0)
        b_hi = jnp.where(jnp.isfinite(b_hi), b_hi, 0.0)
        b = jnp.where(nfree > 0, b_free, 0.5 * (b_lo + b_hi))
        return alpha, b, f

    @partial(jax.jit, static_argnames=("kernel", "iters"))
    def svm_fit(X, idx, ypm, u, gamma, kernel, iters=500):
        """Solve every OvO dual QP at once. Returns (alpha[P,M], b[P],
        f[P,M]) — f + b are the per-pair training decision values (Platt
        fitting consumes them directly; recomputing them would cost another
        N x N kernel matrix dispatch).

        X (N,D) f32; idx (P,M) int32 sample indices (0-padded); ypm (P,M)
        in {+1,-1,0}; u (P,M) box upper bounds (0 on padding); gamma scalar.
        """
        Kfull = _kernel_matrix(X, X, gamma, kernel)
        Kp = Kfull[idx[:, :, None], idx[:, None, :]]  # (P, M, M)
        return _solve_qps(Kp, ypm, u, iters)

    # -- batched cross-validation programs (tuning stage) ------------------

    def _weighted_gamma_scale(X, w):
        """sklearn gamma='scale' on the weighted (train-fold) rows:
        1 / (D * var(X_fold)) with the variance over all matrix entries."""
        D = X.shape[1]
        tot = jnp.maximum(jnp.sum(w) * D, 1.0)
        mean = jnp.sum(X * w[:, None]) / tot
        var = jnp.sum(((X - mean) ** 2) * w[:, None]) / tot
        return 1.0 / jnp.maximum(D * var, 1e-12)

    def _svm_cv_core(X, w, idx, ypm, u, gamma, kernel, gamma_mode, iters):
        """One fold: solve all pair QPs on the train rows (encoded by
        idx/ypm/u) and return decision values for ALL N rows (N, P) — the
        host selects the fold's validation rows."""
        if gamma_mode == "scale":
            g = _weighted_gamma_scale(X, w)
        elif gamma_mode == "auto":
            g = 1.0 / X.shape[1]
        else:
            g = gamma
        Kfull = _kernel_matrix(X, X, g, kernel)
        Kp = Kfull[idx[:, :, None], idx[:, None, :]]
        alpha, b, _ = _solve_qps(Kp, ypm, u, iters)
        P, N = idx.shape[0], X.shape[0]
        A = jnp.zeros((P, N), X.dtype).at[jnp.arange(P)[:, None], idx].add(alpha * ypm)
        return jnp.matmul(Kfull, A.T, precision=HI) + b[None, :]  # (N, P)

    from functools import lru_cache

    @lru_cache(maxsize=None)
    def svm_cv(shared_x: bool, kernel: str, gamma_mode: str, iters: int):
        """Jitted fold-batched SVM CV program, cached per static config.
        Signature: (X, w[F,N], idx[F,P,M], ypm, u, gamma) -> dec (F, N, P).
        shared_x=True broadcasts one X to every fold (plain svm); False
        expects a per-fold X (F, N, k) — the pca_svm feature spaces."""
        core = partial(_svm_cv_core, kernel=kernel, gamma_mode=gamma_mode, iters=iters)
        axes = (None if shared_x else 0, 0, 0, 0, 0, None)
        return jax.jit(jax.vmap(core, in_axes=axes))

    def _pca_w_core(X, w, n_components):
        """Weighted scaler+PCA (rows with w=0 ignored in the fit), then
        transform of ALL rows: sqrt(w)-scaled Gram eigendecomposition."""
        tot = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(X * w[:, None], 0) / tot
        var = jnp.sum(((X - mean) ** 2) * w[:, None], 0) / tot
        scale = jnp.sqrt(var)
        scale = jnp.where(scale == 0.0, 1.0, scale)
        Xs = (X - mean) / scale
        pmean = jnp.sum(Xs * w[:, None], 0) / tot
        Xc = Xs - pmean
        Xw = Xc * jnp.sqrt(w)[:, None]
        G = jnp.matmul(Xw, Xw.T, precision=HI)
        ev, U = jnp.linalg.eigh(G)
        ev = jnp.clip(ev[::-1][:n_components], 0.0)
        U = U[:, ::-1][:, :n_components]
        S = jnp.maximum(jnp.sqrt(ev), 1e-12)
        comp = jnp.matmul(Xw.T, U, precision=HI) / S[None, :]
        return jnp.matmul(Xc, comp, precision=HI)  # (N, k) all rows

    @lru_cache(maxsize=None)
    def pca_cv(n_components: int):
        """(X, w[F,N]) -> per-fold transformed Z (F, N, k)."""
        core = partial(_pca_w_core, n_components=n_components)
        return jax.jit(jax.vmap(core, in_axes=(None, 0)))

    def _lda_w_core(X, y_onehot, w):
        """Weighted closed-form LDA; returns decision values for ALL rows
        (N, K). Same rank-cutoff solve as fit_lda — CV fold scores must see
        the identical covariance treatment the refit model gets."""
        N, r = X.shape
        wcounts = jnp.matmul(w, y_onehot)  # (K,)
        means = jnp.matmul((y_onehot * w[:, None]).T, X, precision=HI) / jnp.maximum(
            wcounts, 1.0
        )[:, None]
        mu_per_row = jnp.matmul(y_onehot, means, precision=HI)
        Xc = (X - mu_per_row) * jnp.sqrt(w)[:, None]
        K = y_onehot.shape[1]
        denom = jnp.maximum(jnp.sum(w) - K, 1.0)
        Sw = jnp.matmul(Xc.T, Xc, precision=HI) / denom
        coef = _sw_pinv_solve(Sw, means.T)  # (r, K)
        # same 1e-12 prior floor as fit_lda: a class absent from this fold's
        # train rows must score the identical -27.6 constant the refit model
        # would give it — the old max(wcounts,1)/sum(w) floor made it
        # log(1/N) ≈ -5, high enough to attract validation predictions and
        # skew grid selection relative to the refit behavior
        priors = wcounts / jnp.maximum(jnp.sum(w), 1.0)
        intercept = -0.5 * jnp.sum(means.T * coef, axis=0) + jnp.log(jnp.maximum(priors, 1e-12))
        return jnp.matmul(X, coef, precision=HI) + intercept  # (N, K)

    @lru_cache(maxsize=None)
    def lda_cv(shared_x: bool):
        """(X, y_onehot, w[F,N]) -> decision values (F, N, K)."""
        axes = (None if shared_x else 0, None, 0)
        return jax.jit(jax.vmap(_lda_w_core, in_axes=axes))

    def _knn_cv_core(X, w, yr_onehot, k, metric):
        """Masked kNN: class counts for ALL rows against the fold's train
        rows (w=0 rows excluded via +inf distance)."""
        if metric == "cosine":
            Xn = X / jnp.maximum(jnp.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            d = 1.0 - jnp.matmul(Xn, Xn.T, precision=HI)
        else:
            d = (
                jnp.sum(X * X, 1)[:, None]
                - 2.0 * jnp.matmul(X, X.T, precision=HI)
                + jnp.sum(X * X, 1)[None, :]
            )
        d = jnp.where(w[None, :] > 0, d, jnp.inf)
        _, nidx = jax.lax.top_k(-d, k)  # (N, k)
        return jnp.sum(yr_onehot[nidx], axis=1)  # (N, K)

    @lru_cache(maxsize=None)
    def knn_cv(shared_x: bool, k: int, metric: str):
        """(X, w[F,N], yr_onehot) -> neighbor class counts (F, N, K)."""
        core = partial(_knn_cv_core, k=k, metric=metric)
        axes = (None if shared_x else 0, 0, None)
        return jax.jit(jax.vmap(core, in_axes=axes))

    @partial(jax.jit, static_argnames=("kernel",))
    def svm_decision(Xq, Xsv, Asv, b, gamma, kernel):
        """OvO decision values (B, P): one kernel matmul against the union
        of support vectors, then a dense (Nsv, P) contraction."""
        Kq = _kernel_matrix(Xq, Xsv, gamma, kernel)
        return jnp.matmul(Kq, Asv.T, precision=HI) + b[None, :]

    _K_ns = SimpleNamespace(
        jnp=jnp,
        fit_scaler_pca=fit_scaler_pca,
        transform_scaler_pca=transform_scaler_pca,
        fit_lda=fit_lda,
        linear_decision=linear_decision,
        svm_fit=svm_fit,
        svm_decision=svm_decision,
        svm_cv=svm_cv,
        pca_cv=pca_cv,
        lda_cv=lda_cv,
        knn_cv=knn_cv,
    )
    _K = _K_ns
    return _K


# ===========================================================================
# host-side orchestration (numpy in/out; device math through kernels())
# ===========================================================================


def fit_scaler_pca_np(X: np.ndarray, n_components: int) -> dict:
    k = kernels()
    n_components = int(min(n_components, X.shape[0], X.shape[1]))
    mean, scale, pmean, comp = k.fit_scaler_pca(
        np.asarray(X, np.float32), n_components=n_components
    )
    return {
        "scaler_mean": np.asarray(mean),
        "scaler_scale": np.asarray(scale),
        "pca_mean": np.asarray(pmean),
        "pca_components": np.asarray(comp),  # (D, k) columns
    }


def transform_scaler_pca_np(X: np.ndarray, state: dict) -> np.ndarray:
    k = kernels()
    return np.asarray(
        k.transform_scaler_pca(
            np.asarray(X, np.float32), state["scaler_mean"], state["scaler_scale"],
            state["pca_mean"], state["pca_components"],
        )
    )


def fit_lda_np(X: np.ndarray, y: np.ndarray, n_classes: int) -> dict:
    """Closed-form LDA; for D > N-1 the fit runs in the (lossless) span of
    the centered data and the coefficients are composed back to D-space,
    so the stored model is always plain (coef, intercept)."""
    k = kernels()
    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.int32)
    N, D = X.shape
    r = min(D, N - 1)
    if D > r:
        # project onto the data span: plain PCA with unit scale
        mean, scale, pmean, comp = k.fit_scaler_pca(X, n_components=r)
        scale_np = np.asarray(scale)
        comp_np = np.asarray(comp) / scale_np[:, None]  # undo the std scaling
        offset = np.asarray(mean) + np.asarray(pmean) * scale_np
        Z = (X - offset) @ comp_np
        coef_r, intercept = k.fit_lda(np.asarray(Z, np.float32), y, n_classes=n_classes)
        coef_r = np.asarray(coef_r)
        coef = comp_np @ coef_r  # (D, K)
        intercept = np.asarray(intercept) - offset @ coef
    else:
        coef_j, intercept_j = k.fit_lda(X, y, n_classes=n_classes)
        coef, intercept = np.asarray(coef_j), np.asarray(intercept_j)
    # presence mask: the floored prior (log 1e-12 ≈ -27.6, kept finite so
    # int8 fake-quant scales stay finite) makes an absent class effectively
    # unpredictable near the training distribution, but an out-of-distribution
    # input can push every present class's affine score below -27.6 — the
    # mask makes "never predicted" unconditional at decision time
    present = (np.bincount(y, minlength=n_classes) > 0)
    return {
        "lda_coef": coef.astype(np.float32),
        "lda_intercept": np.asarray(intercept, np.float32),
        "lda_present": present,
    }


def lda_decision_np(X: np.ndarray, state: dict) -> np.ndarray:
    k = kernels()
    dec = np.asarray(
        k.linear_decision(np.asarray(X, np.float32), state["lda_coef"], state["lda_intercept"])
    )
    present = state.get("lda_present")  # absent in pre-mask saved bundles
    if present is not None and not np.asarray(present).all():
        absent = ~np.asarray(present, bool)
        dec = np.array(dec)  # np.asarray of a CPU jax array can be read-only
        # row-relative floor far below every present-class score: argmax can
        # never pick an absent class, and its softmax mass is ~e^-100 ≈ 0
        # (finite, so downstream quantization/metrics never see inf)
        dec[:, absent] = dec[:, ~absent].min(axis=1, keepdims=True) - 100.0
    return dec


def softmax_np(d: np.ndarray) -> np.ndarray:
    e = np.exp(d - d.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


# -- SVM host orchestration --------------------------------------------------


def _resolve_gamma(gamma, X: np.ndarray) -> float:
    if gamma == "scale":
        v = float(X.var())
        return 1.0 / (X.shape[1] * v) if v > 0 else 1.0
    if gamma == "auto":
        return 1.0 / X.shape[1]
    return float(gamma)


def _ovo_layout(y: np.ndarray, n_classes: int, pad_to: int = 8):
    """Build padded per-pair index/target arrays for the batched solver.
    Returns (pairs[P,2], idx[P,M], ypm[P,M]) with M rounded up to a
    multiple of ``pad_to``."""
    by_class = [np.flatnonzero(y == c) for c in range(n_classes)]
    pairs = [(i, j) for i in range(n_classes) for j in range(i + 1, n_classes)]
    M = max(len(by_class[i]) + len(by_class[j]) for i, j in pairs)
    M = int(-(-M // pad_to) * pad_to)
    P = len(pairs)
    idx = np.zeros((P, M), np.int32)
    ypm = np.zeros((P, M), np.float32)
    for p, (i, j) in enumerate(pairs):
        ni, nj = len(by_class[i]), len(by_class[j])
        idx[p, :ni] = by_class[i]
        idx[p, ni:ni + nj] = by_class[j]
        ypm[p, :ni] = 1.0
        ypm[p, ni:ni + nj] = -1.0
    return np.asarray(pairs, np.int32), idx, ypm


def _platt_fit(f: np.ndarray, ypm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Platt sigmoid per pair (vectorized over pairs): minimize the NLL of
    t against 1/(1+exp(A f + B)) with Platt's regularized targets, damped
    Newton (Lin-Weng-style). f, ypm: (P, M); returns (A[P], B[P])."""
    valid = ypm != 0
    npos = (ypm > 0).sum(1).astype(np.float64)
    nneg = (ypm < 0).sum(1).astype(np.float64)
    hi_t = (npos + 1.0) / (npos + 2.0)
    lo_t = 1.0 / (nneg + 2.0)
    t = np.where(ypm > 0, hi_t[:, None], lo_t[:, None]) * valid
    A = np.zeros(len(f))
    B = np.log((nneg + 1.0) / (npos + 1.0))
    f = np.asarray(f, np.float64)

    def nll(A, B):
        # NLL of t vs p=1/(1+e^z): log(1+e^z) - (1-t) z, branch-stabilized
        z = A[:, None] * f + B[:, None]
        val = np.where(z >= 0, t * z + np.log1p(np.exp(-np.abs(z))),
                       (t - 1.0) * z + np.log1p(np.exp(-np.abs(z))))
        return np.sum(val * valid, axis=1)

    obj = nll(A, B)
    for _ in range(64):
        z = A[:, None] * f + B[:, None]
        p = 1.0 / (1.0 + np.exp(np.clip(z, -500, 500)))  # P(y=+1)
        g = (t - p) * valid  # dNLL/dz
        w = (p * (1.0 - p)) * valid + 1e-12
        gA = np.sum(g * f, 1)
        gB = np.sum(g, 1)
        hAA = np.sum(w * f * f, 1) + 1e-8
        hAB = np.sum(w * f, 1)
        hBB = np.sum(w, 1) + 1e-8
        det = hAA * hBB - hAB * hAB
        dA = -(hBB * gA - hAB * gB) / det
        dB = -(hAA * gB - hAB * gA) / det
        step = np.ones(len(f))
        for _bt in range(16):  # backtracking line search, vectorized
            newA, newB = A + step * dA, B + step * dB
            new_obj = nll(newA, newB)
            better = new_obj < obj + 1e-12
            if better.all():
                break
            step = np.where(better, step, step * 0.5)
        A, B = A + step * dA, B + step * dB
        new_obj = nll(A, B)
        if np.max(np.abs(new_obj - obj)) < 1e-10:
            obj = new_obj
            break
        obj = new_obj
    return A, B


def fit_svm_np(
    X: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    C: float = 1.0,
    kernel: str = "rbf",
    gamma="scale",
    class_weight: str | None = "balanced",
    iters: int = 500,
) -> dict:
    """Fit the batched OvO kernel SVM. Returns a flat state dict of numpy
    arrays (support vectors, dual coefficient matrix, intercepts, Platt
    sigmoids) consumed by predict_svm_np / the .npz bundle writer."""
    if kernel not in ("rbf", "linear"):
        raise ValueError(f"svm kernel must be rbf or linear, got {kernel!r}")
    k = kernels()
    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.int32)
    N = len(X)
    gamma_v = _resolve_gamma(gamma, X)
    pairs, idx, ypm = _ovo_layout(y, n_classes)
    if class_weight == "balanced":
        counts = np.bincount(y, minlength=n_classes).astype(np.float64)
        w = N / (n_classes * np.maximum(counts, 1))
    else:
        w = np.ones(n_classes)
    u = np.where(
        ypm > 0, C * w[pairs[:, 0]][:, None], np.where(ypm < 0, C * w[pairs[:, 1]][:, None], 0.0)
    ).astype(np.float32)

    alpha, b, f = k.svm_fit(X, idx, ypm, u, np.float32(gamma_v), kernel=kernel, iters=iters)
    alpha, b = np.asarray(alpha), np.asarray(b)

    # Platt sigmoids on the training decision values (divergence from
    # libsvm's internal 5-fold CV, mitigated by Platt's regularized targets)
    pA, pB = _platt_fit(np.asarray(f) + b[:, None], ypm)

    # dense dual-coefficient matrix over the union of support vectors
    A_full = np.zeros((len(pairs), N), np.float32)
    np.add.at(A_full, (np.arange(len(pairs))[:, None], idx), alpha * ypm)
    sv_mask = np.abs(A_full).max(0) > 1e-10
    if not sv_mask.any():
        sv_mask[:1] = True
    return {
        "svm_sv": X[sv_mask],
        "svm_dual": A_full[:, sv_mask],
        "svm_b": b.astype(np.float32),
        "svm_platt_a": pA.astype(np.float32),
        "svm_platt_b": pB.astype(np.float32),
        "svm_pairs": pairs,
        "svm_gamma": np.float32(gamma_v),
        "svm_kernel": np.array(kernel),
        "svm_n_classes": np.int32(n_classes),
    }


def svm_decision_np(X: np.ndarray, state: dict) -> np.ndarray:
    k = kernels()
    return np.asarray(
        k.svm_decision(
            np.asarray(X, np.float32), state["svm_sv"], state["svm_dual"],
            state["svm_b"], np.float32(state["svm_gamma"]), kernel=str(state["svm_kernel"]),
        )
    )


def ovo_vote(dec: np.ndarray, pairs: np.ndarray, n_classes: int) -> np.ndarray:
    """sklearn `_ovr_decision_function`: votes + bounded confidence sums."""
    B = len(dec)
    votes = np.zeros((B, n_classes))
    conf = np.zeros((B, n_classes))
    for p, (i, j) in enumerate(pairs):
        d = dec[:, p]
        votes[:, i] += d > 0
        votes[:, j] += d <= 0
        conf[:, i] += d
        conf[:, j] -= d
    return votes + conf / (3.0 * (np.abs(conf) + 1.0))


def pairwise_coupling(r_pos: np.ndarray, pairs: np.ndarray, n_classes: int,
                      iters: int = 100) -> np.ndarray:
    """libsvm multiclass_probability (Wu, Lin & Weng 2004, method 2),
    vectorized over the batch. r_pos (B, P) = P(class i | i or j)."""
    Kc = n_classes
    B, P = r_pos.shape
    if Kc == 2:
        return np.stack([r_pos[:, 0], 1.0 - r_pos[:, 0]], axis=1)
    r = np.full((B, Kc, Kc), 0.0)
    eps = 1e-7
    rp = np.clip(r_pos, eps, 1.0 - eps)
    for p, (i, j) in enumerate(pairs):
        r[:, i, j] = rp[:, p]
        r[:, j, i] = 1.0 - rp[:, p]
    Q = np.zeros((B, Kc, Kc))
    for t in range(Kc):
        Q[:, t, t] = np.sum(np.delete(r[:, :, t], t, axis=1) ** 2, axis=1)
        for j in range(Kc):
            if j != t:
                Q[:, t, j] = -r[:, j, t] * r[:, t, j]
    p = np.full((B, Kc), 1.0 / Kc)
    for _ in range(iters):
        Qp = np.einsum("btj,bj->bt", Q, p)
        pQp = np.einsum("bt,bt->b", p, Qp)
        max_err = 0.0
        for t in range(Kc):
            diff = (-Qp[:, t] + pQp) / Q[:, t, t]
            p[:, t] += diff
            pQp = (pQp + diff * (diff * Q[:, t, t] + 2.0 * Qp[:, t])) / (1.0 + diff) ** 2
            Qp = (Qp + diff[:, None] * Q[:, t, :]) / (1.0 + diff)[:, None]
            p /= (1.0 + diff)[:, None]
            max_err = max(max_err, float(np.max(np.abs(diff))))
        if max_err < 1e-7:
            break
    return p / p.sum(axis=1, keepdims=True)


def predict_svm_np(X: np.ndarray, state: dict) -> np.ndarray:
    dec = svm_decision_np(X, state)
    scores = ovo_vote(dec, state["svm_pairs"], int(state["svm_n_classes"]))
    return scores.argmax(1).astype(np.int32)


def predict_proba_svm_np(X: np.ndarray, state: dict) -> np.ndarray:
    dec = svm_decision_np(X, state)
    z = state["svm_platt_a"][None, :] * dec + state["svm_platt_b"][None, :]
    r_pos = 1.0 / (1.0 + np.exp(np.clip(z, -500, 500)))
    return pairwise_coupling(r_pos, state["svm_pairs"], int(state["svm_n_classes"]))


def linear_ovo_coef(state: dict) -> tuple[np.ndarray, np.ndarray]:
    """Collapse a linear-kernel OvO model to explicit (coef[P,D], b[P]) —
    the layout export_svm / the MicroPython runtime consume."""
    if str(state["svm_kernel"]) != "linear":
        raise ValueError("linear_ovo_coef needs kernel='linear'")
    return state["svm_dual"] @ state["svm_sv"], state["svm_b"]
