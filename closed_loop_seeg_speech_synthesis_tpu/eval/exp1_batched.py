"""Jitted, vmapped retrain+decode for exp1 chance-level estimation.

One compiled program per CV fold runs a whole batch of randomization runs at
once: circular-shift the training sEEG, re-extract features, re-select,
re-fit all 40 LDAs, decode the held-out sEEG — everything on device.  The
reference executes each of the 10 folds x 100 runs serially through its node
graph (exp1.py:133-160).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as _sig

from ..models import lda as lda_mod
from ..models.selection import spearman_vs_target
from ..ops import framing, quantization
from ..ops import griffinlim as gl
from ..ops.spectrogram import compute_spectrogram
from ..runtime import pipeline


def make_fold_chance_runner(x_train, y_train_audio, x_test, eeg_sr, audio_sr,
                            bad_channels, norm_factor, nb_feats=150, nb_intervals=9,
                            n_mel=40, line_noise=50, dtype=jnp.float32):
    """Returns (runner(shift_idx (R,), key) -> reco (R, n_frames, n_mel), n_frames)."""
    mask = np.ones(x_train.shape[1], bool)
    if len(bad_channels):
        mask[np.asarray(bad_channels, int)] = False
    xt = np.asarray(x_train, np.float64)[:, mask]
    xe = np.asarray(x_test, np.float64)[:, mask]
    C = xt.shape[1]

    # fold-constant training targets (audio never shifts, exp1.py:94-99)
    audio16 = _sig.decimate(np.asarray(y_train_audio, np.float64), 3)
    y_spec = np.asarray(compute_spectrogram(jnp.asarray(audio16), 16000, 0.016, 0.01, n_mel))[20:-4]
    medians, borders = quantization.compute_borders_logistic(jnp.asarray(y_spec), nb_intervals)
    q = np.asarray(quantization.quantize(jnp.asarray(y_spec), borders)).astype(np.int32)

    cfg = pipeline.DecoderConfig(sr=eeg_sr, n_channels=C, gl_norm=float(norm_factor), dtype=dtype)
    template = pipeline.build_decoder_params(
        cfg,
        lda_mod.LDAParams(
            coef=jnp.zeros((n_mel, nb_intervals, nb_feats), dtype),
            intercept=jnp.zeros((n_mel, nb_intervals), dtype),
            classes=jnp.broadcast_to(jnp.arange(nb_intervals, dtype=jnp.int32), (n_mel, nb_intervals)),
            valid=jnp.ones((n_mel, nb_intervals), bool),
        ),
        np.asarray(medians), np.arange(nb_feats),
    )

    # training-grid framing (offline.py:99-116)
    starts = framing.offline_window_starts(0.05, 0.01, eeg_sr, len(xt))
    wlen = framing.offline_window_len(0.05, eeg_sr, starts)
    tr_ends = jnp.asarray(starts + wlen, jnp.int32)

    # decode-grid framing for the held-out sEEG
    te_ends = framing.streaming_frame_ends(cfg.frame_len_ms, cfg.frame_shift_ms, eeg_sr,
                                           len(xe) + cfg.prefill)
    n_frames = len(te_ends)
    pw = framing.periodic_window_matrix(te_ends, cfg.win)
    if pw is not None:
        S, Ls, P, origin = pw
        plan = (Ls, P, origin, n_frames)
        window_S = jnp.asarray(S, dtype)
    else:
        plan, window_S = None, None
    te_ends_d = jnp.asarray(te_ends, jnp.int32)

    xt_d = jnp.asarray(xt, dtype)
    xe_d = jnp.asarray(xe, dtype)
    q_d = jnp.asarray(q)
    y_mean = jnp.asarray(y_spec.mean(axis=1), dtype)
    n_stacked = (cfg.model_order + 1) * C

    def one_run(shift, key):
        eeg = jnp.roll(xt_d, -shift, axis=0)
        feats = train_features_offline(eeg)
        n = min(feats.shape[0], q_d.shape[0])
        X = feats[:n]
        rhos = spearman_vs_target(X, y_mean[:n])
        _, select = jax.lax.top_k(jnp.abs(rhos), nb_feats)
        select = select[::-1]
        Xs = jnp.take(X, select, axis=1)
        coef, intercept, present = lda_mod._fit_batched(Xs, q_d[:n].T, nb_intervals)
        scatter = jax.nn.one_hot(select, n_stacked, dtype=dtype)      # (150, 5C)
        coef_full = jnp.einsum("bkf,fd->bkd", coef, scatter)
        params = dataclasses.replace(
            template,
            lda_coef_full=coef_full,
            lda=dataclasses.replace(template.lda, intercept=intercept, valid=present),
        )
        rand = gl.default_rand_init(key, n_frames - 1, 0, dtype)
        spec, _ = pipeline._offline_decode_jit(params, cfg, xe_d, te_ends_d, rand, window_S, plan)
        return spec

    def train_features_offline(eeg):
        """Offline herff2016_b features of one (shifted) training signal.

        The offline trainer's warm-start rules equal the streaming ones
        (offline.py:31-97), so the combined-chain closed-form init applies;
        the offline grid just skips the zero-fill prefix.
        """
        from ..ops import iir as iir_mod

        s0 = template.filt_zi_scale[:, None] * eeg[0][None, :] + template.filt_s_const[:, None]
        y, _ = iir_mod.iir_blocked(template.filt_op, eeg, s0)
        F = framing.windowed_logpower(y, tr_ends, wlen)
        return framing.stack_context(F, cfg.model_order, cfg.step_size, zero_pad=False)

    @jax.jit
    def runner(shifts, key):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(shifts.shape[0]))
        return jax.vmap(one_run)(shifts, keys)

    return runner, n_frames
