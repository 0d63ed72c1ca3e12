"""Offline training pipeline (twin of reference ``train.py`` + ``local/offline.py``).

The offline feature path intentionally differs from the streaming one at the
boundary (reference design): filters warm-start the same way, but the
framing grid starts at sample 0 of the *filtered data* (no zero-fill prefix
kept, ``offline.py:99-109``) and context stacking drops the first
``model_order*step_size`` rows instead of zero-padding
(``offline.py:111-116``).  The ``y_train[20:-4]`` alignment crop
(train.py:144-147) then lines the audio spectrogram up with the stacked
features.  Models trained here drop into the streaming decoder unchanged —
the reference's core online/offline contract.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.signal as _sig

from ..models import lda as lda_mod
from ..models import selection
from ..ops import filter_design as fd
from ..ops import framing, iir, quantization
from ..ops.spectrogram import compute_spectrogram


def offline_high_gamma(eeg: jnp.ndarray, sr: float, line_noise: int = 50,
                       window_length: float = 0.05, window_shift: float = 0.01,
                       iir_block: int = 256, dtype=jnp.float64) -> jnp.ndarray:
    """Filtered broadband signal matching ``offline.py:31-97``.

    hg/fh(first harmonic for EU) cold-start with zi scaled by their first
    input sample; the last filter's state is advanced over
    ``win - shift`` zeros first (warm start), outputs discarded.
    """
    chain = fd.high_gamma_bank(sr, line_noise)
    prefill = int(window_length * sr) - int(window_shift * sr)
    combined, warm = iir.make_warmstart_chain(chain, prefill)
    op = iir.make_blocked_iir(combined, iir_block, dtype)
    x = eeg.astype(dtype)
    s0 = (jnp.asarray(warm.zi_scale, dtype)[:, None] * x[0][None, :]
          + jnp.asarray(warm.s_const, dtype)[:, None])
    y, _ = iir.iir_blocked(op, x, s0)
    return y


def offline_features(eeg: np.ndarray, sr: float, window_length: float = 0.05,
                     window_shift: float = 0.01, line_noise: int = 50,
                     model_order: int = 4, step_size: int = 5,
                     skip_stacking: bool = False, dtype=jnp.float64) -> jnp.ndarray:
    """Twin of ``offline.py:12-128`` (herff2016_b): (T, C) -> (N, (mo+1)*C)."""
    y = offline_high_gamma(jnp.asarray(eeg), sr, line_noise, window_length, window_shift, dtype=dtype)
    starts = framing.offline_window_starts(window_length, window_shift, sr, eeg.shape[0])
    wlen = framing.offline_window_len(window_length, sr, starts)
    ends = jnp.asarray(starts + wlen, jnp.int32)
    F = framing.windowed_logpower(y, ends, wlen)
    if skip_stacking:
        return F
    return framing.stack_context(F, model_order, step_size, zero_pad=False)


@dataclasses.dataclass
class TrainResult:
    x_train: np.ndarray          # (n, 150) selected features actually fitted
    y_train: np.ndarray          # (n, n_mel) quantized labels
    medians: np.ndarray          # (n_mel, n_intervals)
    borders: np.ndarray
    lda: lda_mod.LDAParams
    select: np.ndarray           # (150,) feature indices
    missing: dict                # bin -> missing interval indices (train.py:86-91)


def train(eeg: np.ndarray, audio: np.ndarray, eeg_sr: float, audio_sr: float,
          bad_channels, nb_mel_bins: int = 40, nb_intervals: int = 9,
          nb_feats: int = 150, line_noise: int = 50, dtype=None) -> TrainResult:
    """Full training (reference train.py:132-168).

    eeg: (T, C_all) raw; audio: (T_a,) in [-1, 1] float; bad_channels:
    indices to exclude.  Audio is decimated by 3 to 16 kHz exactly as the
    reference does (train.py:125, scipy.signal.decimate defaults).
    """
    from .pipeline import default_compute_dtype

    dtype = dtype or default_compute_dtype()
    bad_channels = np.asarray(bad_channels, int)
    if len(bad_channels) > 0:
        mask = np.ones(eeg.shape[1], bool)
        mask[bad_channels] = False
        eeg = eeg[:, mask]

    x_train = np.asarray(offline_features(eeg, eeg_sr, 0.05, 0.01, line_noise, dtype=dtype))

    audio16 = _sig.decimate(np.asarray(audio, np.float64), 3)
    y_spec = np.asarray(compute_spectrogram(jnp.asarray(audio16), 16000, 0.016, 0.01, nb_mel_bins))
    y_spec = y_spec[20:-4]  # context + window-length alignment crop (train.py:144-147)

    medians, borders = quantization.compute_borders_logistic(jnp.asarray(y_spec), nb_intervals)
    q_spec = np.asarray(quantization.quantize(jnp.asarray(y_spec), borders)).astype(int)

    missing = {}
    for b in range(nb_mel_bins):
        diff = np.setdiff1d(np.arange(nb_intervals), q_spec[:, b])
        if diff.size:
            missing[b] = diff.tolist()

    # features and audio spectrogram can differ by a frame at the recording
    # tail; clamp BEFORE the Spearman selection (train.py clamps at 144-147)
    n = min(len(x_train), len(y_spec))
    x_train, y_spec, q_spec = x_train[:n], y_spec[:n], q_spec[:n]

    select = selection.select_features(jnp.asarray(x_train), jnp.asarray(y_spec), nb_feats)
    x_sel = x_train[:, select]
    lda_params = lda_mod.fit(jnp.asarray(x_sel), q_spec, nb_intervals)
    return TrainResult(
        x_train=x_sel, y_train=q_spec,
        medians=np.asarray(medians), borders=np.asarray(borders),
        lda=lda_params, select=np.asarray(select), missing=missing,
    )
