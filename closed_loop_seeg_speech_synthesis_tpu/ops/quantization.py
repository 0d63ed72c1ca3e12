"""Logistic spectrogram quantization (reference ``local/quantization.py``).

Per mel bin: interval borders/representatives sigmoid-spaced over the bin's
[min, max] (``quantization.py:83-109``); quantization assigns the smallest
interval index whose border is >= the value, leaving values above the last
border at 0 — a reference quirk we keep (``quantization.py:112-122``);
dequantization is a representative lookup (``quantization.py:125-135``).

All ops are vectorized across bins and frames (no per-bin Python loops) and
jit-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_borders_logistic(spectrogram: jnp.ndarray, nb_intervals: int):
    """spectrogram: (T, n_bins) -> (medians (n_bins, nb), borders (n_bins, nb)).

    sigmoid(t) = L / (1 + exp(-0.5 t)) - |vmin| with L = |vmin| + vmax,
    borders at t = linspace(-10, 10, nb+1)[1:-1] plus vmax as the last
    border; representatives at t = linspace(-9.5, 9.5, nb).
    """
    vmin = jnp.min(spectrogram, axis=0)  # (n_bins,)
    vmax = jnp.max(spectrogram, axis=0)
    L = jnp.abs(vmin) + vmax

    def sigmoid(t):  # t: (n_points,) -> (n_bins, n_points)
        return L[:, None] / (1.0 + jnp.exp(-0.5 * t)[None, :]) - jnp.abs(vmin)[:, None]

    t_b = jnp.linspace(-10.0, 10.0, nb_intervals + 1)[1:-1]
    borders = jnp.concatenate([sigmoid(t_b), vmax[:, None]], axis=1)
    t_m = jnp.linspace(-9.5, 9.5, nb_intervals)
    medians = sigmoid(t_m)
    return medians, borders


def quantize(spectrogram: jnp.ndarray, borders: jnp.ndarray) -> jnp.ndarray:
    """(T, n_bins) values -> (T, n_bins) interval indices (float, like ref).

    Reference semantics: reversed-loop assignment == index of first border
    >= value; values above all borders keep the init value 0
    (quantization.py:114-119).
    """
    above_all = spectrogram > borders[None, :, -1]
    idx = jnp.sum(spectrogram[:, :, None] > borders[None, :, :], axis=-1)
    return jnp.where(above_all, 0, idx).astype(spectrogram.dtype)


def dequantize(q_spectrogram: jnp.ndarray, medians: jnp.ndarray) -> jnp.ndarray:
    """(T, n_bins) indices + medians (n_bins, nb) -> (T, n_bins) values."""
    idx = q_spectrogram.astype(jnp.int32)  # (T, n_bins)
    # medians[bin, idx[t, bin]] for every (t, bin)
    return jnp.take_along_axis(medians[None, :, :], idx[:, :, None], axis=2)[:, :, 0]


# ---------------------------------------------------------------------------
# Legacy API parity (present in the reference but unused by its trainer)
# ---------------------------------------------------------------------------


def to_categorical(y, num_classes=None):
    """One-hot encode integer labels (quantization.py:4-17, unused there)."""
    import numpy as np

    y = np.asarray(y, int)
    shape = y.shape
    flat = y.reshape(-1)
    if not num_classes:
        num_classes = int(flat.max()) + 1
    out = np.zeros((flat.size, num_classes))
    out[np.arange(flat.size), flat] = 1
    return out.reshape(shape + (num_classes,))


def compute_borders_median_cut(spectrogram, nb_intervals):
    """Median-cut interval borders (quantization.py:20-80, the legacy
    quantizer superseded by the logistic one).  Host NumPy.

    Per bin: repeatedly split the largest interval at its median element
    until nb_intervals exist; borders are interval maxima, representatives
    interval medians.
    """
    import numpy as np

    spectrogram = np.asarray(spectrogram)
    n_bins = spectrogram.shape[1]
    borders = np.zeros((n_bins, nb_intervals))
    medians = np.zeros((n_bins, nb_intervals))
    for b in range(n_bins):
        intervals = [(spectrogram.shape[0], spectrogram[:, b])]
        while len(intervals) < nb_intervals:
            intervals.sort(key=lambda x: x[0])
            data = np.sort(intervals.pop()[1])
            med = data[len(data) // 2]
            left, right = data[data <= med], data[data > med]
            if len(left) > 0 and len(right) > 0:
                intervals += [(len(left), left), (len(right), right)]
            else:
                intervals.append((0, data))
        intervals.sort(key=lambda x: np.median(x[1]))
        borders[b] = [iv[1].max() for iv in intervals]
        medians[b] = [np.median(iv[1]) for iv in intervals]
    return medians, borders
