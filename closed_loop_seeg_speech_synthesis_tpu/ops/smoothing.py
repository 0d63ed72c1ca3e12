"""Gaussian smoothing across mel bins (reference ``livenodes/Dequantization.py:17``).

The reference runs ``scipy.ndimage.gaussian_filter(vec, sigma=0.5)`` on each
dequantized 40-dim logMel vector: a 1-D correlation with a truncated
(radius = int(4.0*sigma + 0.5) = 2) normalized Gaussian kernel and 'reflect'
boundary handling.  We reproduce the exact kernel weights and boundary mode.

Two implementations:

* ``gaussian_smooth`` — the arithmetic twin (used on the f32 accelerator
  paths).  It reproduces scipy's NI_Correlate1D summation order, but XLA's
  CPU backend contracts mul+add chains into FMAs at LLVM codegen (verified:
  the HLO keeps the op tree yet jitted results differ from the identical
  eager computation by 1-2 ulp; ``lax.optimization_barrier`` does not stop
  it), so under jit it can differ from scipy by a couple of ulp.

* ``exact_smooth_table``/``smooth_by_table`` — the bit-exact float64 path.
  The smoothing input is *quantized*: every dequantized value is one of the
  K (=9) per-bin medians, so each smoothed output is a function of the 5
  integer labels in its (reflect-padded) window — a finite lattice of
  ``n_mel * K**5`` values.  We precompute that table on the host with plain
  NumPy in scipy's exact summation order (bit-equal to
  ``scipy.ndimage.gaussian_filter`` — property-tested in tests/test_ops.py)
  and the jitted pipeline performs a pure integer-index gather: no float
  arithmetic happens under XLA at all, so the decoded spectrogram matches
  the reference system bit-for-bit (direct bit-equality property test:
  tests/test_ops.py::test_smooth_by_table_bit_equal_to_scipy; end-to-end:
  tests/test_reference_system_oracle.py).
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
    (mode='reflect': pad [c b a | a b c ... ]) BIT-EXACTLY in float64: scipy's
    NI_Correlate1D symmetric-kernel path accumulates ``center*w0`` first, then
    ``(left_j + right_j) * w_j`` for pairs from the OUTERMOST inward
    (``for jj = -size1; jj < 0``), so we reproduce that summation order — the
    naive per-tap loop differs by ~1 ulp, which the chaotic Griffin-Lim
    iteration amplifies into >1-LSB audio diffs vs the reference system.
    """
    r = kernel.shape[0] // 2
    left = x[..., :r][..., ::-1]
    right = x[..., -r:][..., ::-1]
    xp = jnp.concatenate([left, x, right], axis=-1)
    n = x.shape[-1]
    out = xp[..., r : r + n] * kernel[r]
    for j in range(r, 0, -1):
        out = out + (xp[..., r - j : r - j + n] + xp[..., r + j : r + j + n]) * kernel[r - j]
    return out


def reflect_positions(n: int, radius: int) -> np.ndarray:
    """Source bin for each (output bin, window offset) under scipy's
    'reflect' boundary mode (pad pattern ``c b a | a b c``): (n, 2r+1) int."""
    idx = np.arange(n)[:, None] + np.arange(-radius, radius + 1)[None, :]
    idx = np.where(idx < 0, -idx - 1, idx)
    idx = np.where(idx >= n, 2 * n - idx - 1, idx)
    return idx


def exact_smooth_table(medians: np.ndarray, sigma: float = 0.5,
                       truncate: float = 4.0):
    """Precompute the exactly-rounded smoothed-value lattice.

    medians: (n_mel, K) float64 dequantization medians.  Returns
    ``(pos (n_mel, 2r+1) int32, table (n_mel, K**(2r+1)) float64)`` where
    ``table[b, mixed-radix(labels at pos[b])]`` is bit-equal to
    ``scipy.ndimage.gaussian_filter(deq_row, sigma)[b]`` for any label row.
    Window combinations where duplicated edge positions would disagree are
    unreachable at runtime (the index is built from actual labels).
    """
    k = gaussian_kernel1d(sigma, truncate)
    r = len(k) // 2
    med = np.asarray(medians, np.float64)
    n, K = med.shape
    w = 2 * r + 1
    pos = reflect_positions(n, r)
    combos = np.stack(np.unravel_index(np.arange(K**w), (K,) * w), axis=1)
    table = np.empty((n, K**w), np.float64)
    for b in range(n):
        vals = med[pos[b][None, :], combos]                 # (K^w, w)
        out = vals[:, r] * k[r]
        for j in range(r, 0, -1):                           # scipy's pair order
            out = out + (vals[:, r - j] + vals[:, r + j]) * k[r - j]
        table[b] = out
    return pos.astype(np.int32), table


def smooth_by_table(labels: jnp.ndarray, pos: jnp.ndarray,
                    table: jnp.ndarray, n_intervals: int) -> jnp.ndarray:
    """Bit-exact smoothing as a pure gather: labels (..., n_mel) int32 ->
    smoothed (..., n_mel) float64.  No float arithmetic under jit."""
    w = pos.shape[1]
    lab = labels[..., pos]                                  # (..., n_mel, w)
    weights = jnp.asarray(n_intervals ** np.arange(w - 1, -1, -1), labels.dtype)
    idx = (lab * weights).sum(-1)                           # mixed-radix index
    bins = jnp.broadcast_to(jnp.arange(table.shape[0]), idx.shape)
    return table[bins, idx]
