"""Spearman-correlation feature selection (reference ``train.py:96-109``).

Per feature: Spearman rho against the frame-mean of the target logMels;
features whose column sum is ~0 are forced to rho=0; the 150 largest |rho|
are kept in ``np.argsort`` order (ascending |rho|), which fixes the feature
ordering the LDA models are trained in — we reproduce that ordering exactly.

Ranking (average ties, scipy.stats.rankdata semantics) and the correlation
pass run on device; the final argsort runs host-side with numpy to match the
reference's ordering, including NaN-last placement for zero-variance
(railed) channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rank_average(v: jnp.ndarray) -> jnp.ndarray:
    """scipy.stats.rankdata(v, method='average') for a 1-D array."""
    order = jnp.argsort(v)
    sv = v[order]
    n = v.shape[0]
    first = jnp.searchsorted(sv, sv, side="left")
    last = jnp.searchsorted(sv, sv, side="right") - 1
    avg_sorted = (first + last).astype(v.dtype) / 2.0 + 1.0
    ranks = jnp.zeros(n, v.dtype).at[order].set(avg_sorted)
    return ranks


def _pearson(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ac = a - jnp.mean(a)
    bc = b - jnp.mean(b)
    denom = jnp.sqrt(jnp.sum(ac * ac) * jnp.sum(bc * bc))
    # zero variance -> NaN, matching scipy.stats.spearmanr: the reference's
    # np.argsort(|cs|) then sorts NaNs LAST, i.e. a constant-but-nonzero
    # (railed) channel lands INSIDE the selected features (train.py:96-109).
    return jnp.where(denom > 0, jnp.sum(ac * bc) / jnp.where(denom > 0, denom, 1.0), jnp.nan)


@jax.jit
def spearman_vs_target(X: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Spearman rho of every feature column of X (n, F) against y (n,)."""
    ry = _rank_average(y)
    zero_col = jnp.isclose(jnp.sum(X, axis=0), 0.0)

    def per_feature(col):
        return _pearson(_rank_average(col), ry)

    rhos = jax.vmap(per_feature, in_axes=1)(X)
    return jnp.where(zero_col, 0.0, rhos)  # exact-zero columns forced to 0 (train.py:103-105)


def select_features(X: jnp.ndarray, Y: jnp.ndarray, nb_feats: int = 150) -> np.ndarray:
    """Indices of the nb_feats best features, in the reference's order
    (ascending |rho|, numpy argsort tie order).  Y: (n, n_bins) logMels."""
    target = jnp.mean(Y, axis=1)
    cs = np.asarray(spearman_vs_target(X, target))
    return np.argsort(np.abs(cs))[max(-nb_feats, -len(cs)):]
