"""Training-target logMel spectrogram (twin of ``local/offline.py:219-241``).

16 ms symmetric-Hann windows every 10 ms over audio prepended with
``overlap = win - shift`` warm-start zeros; |rfft| -> logMels.  Window count
is ``floor((len(padded) - overlap) / shift)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import mel as mel_ops
from .stft import make_rdft, hann_sym, frame_signal


def compute_spectrogram(
    audio: jnp.ndarray,
    sr: int = 16000,
    window_length: float = 0.05,
    window_shift: float = 0.01,
    mel_bins: int = 40,
    dtype=None,
) -> jnp.ndarray:
    """audio: (T,) -> logMel spectrogram (num_windows, mel_bins).

    NB: the trainer calls this with window_length=0.016 (train.py:128).
    """
    dtype = dtype or audio.dtype
    win = int(sr * window_length)
    shift = int(sr * window_shift)
    overlap = win - shift
    padded = jnp.concatenate([jnp.zeros(overlap, dtype), audio.astype(dtype)])
    num_windows = int(np.floor((padded.shape[0] - overlap) / shift))
    frames = frame_signal(padded, win, shift, num_windows)  # (N, win)
    w = jnp.asarray(hann_sym(win), dtype)
    rdft = make_rdft(win, dtype)
    xr, xi = rdft.rfft(frames * w)
    mag = jnp.sqrt(xr * xr + xi * xi)
    M, _ = mel_ops.mel_matrices(win // 2 + 1, mel_bins, sr)
    return mel_ops.to_log_mels(mag, jnp.asarray(M, dtype))
