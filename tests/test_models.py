"""LDA fit/predict vs sklearn; Spearman selection vs scipy."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import spearmanr
from sklearn.discriminant_analysis import LinearDiscriminantAnalysis

from closed_loop_seeg_speech_synthesis_tpu.models import lda, selection


def _make_dataset(rng, n=600, d=20, n_bins=5, k=9, missing_bin=2):
    X = rng.randn(n, d)
    # labels correlated with features so LDA is non-degenerate
    proj = rng.randn(d, n_bins)
    z = X @ proj + 0.5 * rng.randn(n, n_bins)
    Y = np.zeros((n, n_bins), int)
    for b in range(n_bins):
        qs = np.quantile(z[:, b], np.linspace(0, 1, k + 1)[1:-1])
        Y[:, b] = np.searchsorted(qs, z[:, b])
    # force a missing class in one bin (reference exp4.py:75-83 observes this)
    Y[Y[:, missing_bin] == 1, missing_bin] = 2
    return X, Y


def test_lda_matches_sklearn(rng):
    X, Y = _make_dataset(rng)
    params = lda.fit(jnp.asarray(X), Y)
    pred = np.asarray(lda.predict(params, jnp.asarray(X)))
    for b in range(Y.shape[1]):
        est = LinearDiscriminantAnalysis().fit(X, Y[:, b])
        ref_pred = est.predict(X)
        agree = (pred[:, b] == ref_pred).mean()
        assert agree == 1.0, f"bin {b}: prediction agreement {agree}"
        # weight-level reproduction (multi-class bins store per-class rows)
        cls = est.classes_.astype(int)
        m = np.asarray(params.valid[b])
        np.testing.assert_array_equal(np.asarray(params.classes[b])[m], cls)
        if len(cls) > 2:
            np.testing.assert_allclose(
                np.asarray(params.coef[b])[m], est.coef_, rtol=1e-5, atol=1e-7
            )
            np.testing.assert_allclose(
                np.asarray(params.intercept[b])[m], est.intercept_, rtol=1e-5, atol=1e-7
            )


def test_lda_missing_class_bin(rng):
    X, Y = _make_dataset(rng)
    b = 2
    assert 1 not in np.unique(Y[:, b])
    params = lda.fit(jnp.asarray(X), Y)
    pred = np.asarray(lda.predict(params, jnp.asarray(X)))
    assert 1 not in np.unique(pred[:, b])


def test_sklearn_roundtrip(rng):
    X, Y = _make_dataset(rng)
    params = lda.fit(jnp.asarray(X), Y)
    ests = lda.to_sklearn_estimators(params)
    back = lda.from_sklearn_estimators(ests, dtype=jnp.float64)
    p1 = np.asarray(lda.predict(params, jnp.asarray(X)))
    p2 = np.asarray(lda.predict(back, jnp.asarray(X)))
    np.testing.assert_array_equal(p1, p2)
    # sklearn objects predict identically too
    for b, est in enumerate(ests):
        np.testing.assert_array_equal(est.predict(X).astype(int), p1[:, b])


def test_spearman_selection_matches_scipy(rng):
    n, F = 400, 30
    X = rng.randn(n, F)
    X[:, 7] = 0.0  # zero column -> rho forced to 0
    X[:, 11] = np.round(X[:, 11] * 2) / 2  # ties
    Y = rng.randn(n, 4)
    target = Y.mean(axis=1)
    cs_ref = np.zeros(F)
    for f in range(F):
        if np.isclose(X[:, f].sum(), 0):
            continue
        cs_ref[f], _ = spearmanr(X[:, f], target)
    cs = np.asarray(selection.spearman_vs_target(jnp.asarray(X), jnp.asarray(target)))
    np.testing.assert_allclose(cs, cs_ref, rtol=1e-10, atol=1e-12)
    sel = selection.select_features(jnp.asarray(X), jnp.asarray(Y), nb_feats=10)
    ref_sel = np.argsort(np.abs(cs_ref))[-10:]
    np.testing.assert_array_equal(sel, ref_sel)
