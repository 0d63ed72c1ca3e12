"""Gaussian smoothing across mel bins (reference ``livenodes/Dequantization.py:17``).

The reference runs ``scipy.ndimage.gaussian_filter(vec, sigma=0.5)`` on each
dequantized 40-dim logMel vector: a 1-D correlation with a truncated
(radius = int(4.0*sigma + 0.5) = 2) normalized Gaussian kernel and 'reflect'
boundary handling.  We reproduce the exact kernel weights and boundary mode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float = 0.5, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage._gaussian_kernel1d weights, float64, length 2r+1."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return phi / phi.sum()


def gaussian_smooth(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Correlate along the last axis with 'reflect' padding.

    x: (..., N); kernel: (2r+1,).  Matches scipy.ndimage.gaussian_filter
    (mode='reflect': pad [c b a | a b c ... ]).
    """
    r = kernel.shape[0] // 2
    left = x[..., :r][..., ::-1]
    right = x[..., -r:][..., ::-1]
    xp = jnp.concatenate([left, x, right], axis=-1)
    n = x.shape[-1]
    out = jnp.zeros_like(x)
    for i in range(kernel.shape[0]):
        out = out + kernel[i] * xp[..., i : i + n]
    return out
