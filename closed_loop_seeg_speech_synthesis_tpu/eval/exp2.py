"""Experiment 2: DTW correlations of whisper/imagine decodes vs chance
(twin of reference ``eval_steps/exp2.py``).

Matched pairs: for every word present in both the training session and a
decoding run, DTW-warp the training trial's logMels onto the decoded trial's
logMels and take the mean per-bin Pearson r.  Chance: decode random 2 s
segments of *other-task* sEEG through the trained model and DTW-score them
against training words.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..io.loaders import load_only_eeg
from ..io.session import DecodingRun, Session
from ..ops.spectrogram import compute_spectrogram
from ..runtime import params as params_io
from ..runtime import pipeline
from .dtw import dtw_warping
from .metrics import pearson_correlation

logger = logging.getLogger("eval.exp2")


def _decoder_from_params(session_dir, sr, n_channels_used, norm_factor, dtype=None):
    dtype = dtype or pipeline.default_compute_dtype()
    loaded = params_io.load_params(os.path.join(session_dir, "params.h5"), dtype=dtype)
    cfg = pipeline.DecoderConfig(sr=float(sr), n_channels=n_channels_used,
                                 gl_norm=float(norm_factor), dtype=dtype)
    dec = pipeline.build_decoder_params(cfg, loaded["lda"], loaded["medians"], loaded["select"])
    return cfg, dec, loaded["bad_channels"]


class Experiment2:
    def __init__(self, config, session_dir, run_dir, other_tasks, dest_dir, rng=None):
        self.config = config
        self.session_dir = session_dir
        self.run_dir = run_dir
        self.dest_dir = dest_dir
        self.rng = rng or np.random.RandomState()
        self.audio_sr = 16000
        self.dec_run = DecodingRun(run_dir)
        self.sess = Session(session_dir, rng=self.rng)
        if other_tasks:
            self.other_tasks_eeg = np.vstack([
                load_only_eeg(os.path.join(session_dir, ot))[0] for ot in other_tasks
            ])
        else:
            self.other_tasks_eeg = None

    def chance_level(self, runs=100):
        norm = self.config.getint("Experiment2", "griffin_lim_norm")
        bad = params_io.load_params(os.path.join(self.session_dir, "params.h5"))["bad_channels"]
        mask = np.ones(self.other_tasks_eeg.shape[1], bool)
        mask[bad] = False
        cfg, dec, _ = _decoder_from_params(self.session_dir, self.dec_run.eeg_sr, int(mask.sum()), norm)

        training_words = list(zip(self.sess.word_starts_indices_audio, self.sess.words))
        corrs = []
        for i in range(runs):
            cutoff = self.rng.randint(0, len(self.other_tasks_eeg) - 2 * self.dec_run.eeg_sr)
            seeg = self.other_tasks_eeg[cutoff : cutoff + 2 * self.dec_run.eeg_sr][:, mask]
            wa, _ = training_words[i % len(training_words)]
            orig = self.sess.audio[wa : wa + 2 * self.sess.audio_sr]
            orig_spec = np.asarray(compute_spectrogram(jnp.asarray(orig), self.sess.audio_sr, 0.016, 0.01))

            reco_spec, _ = pipeline.offline_decode(dec, cfg, seeg, key=jax.random.PRNGKey(i))
            warped = dtw_warping(np.asarray(reco_spec), orig_spec)
            corrs.append(pearson_correlation(warped, np.asarray(reco_spec))[0])
        return np.asarray(corrs)

    def chance_level_batched(self, runs=100, batch_size=25, dtype=None):
        """All random other-task segments decoded as one vmapped batch per
        chunk (the model is fixed; only the 2 s sEEG cuts differ), DTW scored
        on host.  Functionally identical sampling to chance_level."""
        from ..ops import framing
        from ..ops import griffinlim as gl

        dtype = dtype or pipeline.default_compute_dtype()
        norm = self.config.getint("Experiment2", "griffin_lim_norm")
        bad = params_io.load_params(os.path.join(self.session_dir, "params.h5"))["bad_channels"]
        mask = np.ones(self.other_tasks_eeg.shape[1], bool)
        mask[bad] = False
        cfg, dec, _ = _decoder_from_params(self.session_dir, self.dec_run.eeg_sr, int(mask.sum()), norm, dtype)

        T = 2 * self.dec_run.eeg_sr
        training_words = list(zip(self.sess.word_starts_indices_audio, self.sess.words))
        cuts = [self.rng.randint(0, len(self.other_tasks_eeg) - T) for _ in range(runs)]
        segs = np.stack([self.other_tasks_eeg[c : c + T][:, mask] for c in cuts])

        ends = framing.streaming_frame_ends(cfg.frame_len_ms, cfg.frame_shift_ms, cfg.sr, T + cfg.prefill)
        nf = len(ends)
        pw = framing.periodic_window_matrix(ends, cfg.win)
        if pw is not None:
            S, Ls, P, origin = pw
            plan = (Ls, P, origin, nf)
            window_S = jnp.asarray(S, dtype)
        else:
            plan, window_S = None, None
        ends_d = jnp.asarray(ends, jnp.int32)

        @jax.jit
        def decode_batch(eeg_b, rand_b):
            return jax.vmap(lambda e, r: pipeline._offline_decode_jit(
                dec, cfg, e, ends_d, r, window_S, plan)[0])(eeg_b, rand_b)

        corrs = []
        for start in range(0, runs, batch_size):
            sub = segs[start : start + batch_size]
            rand = jnp.stack([gl.default_rand_init(jax.random.PRNGKey(start + j), nf - 1, 0, dtype)
                              for j in range(len(sub))])
            specs = np.asarray(decode_batch(jnp.asarray(sub, dtype), rand))
            for j, reco in enumerate(specs):
                i = start + j
                wa, _ = training_words[i % len(training_words)]
                orig = self.sess.audio[wa : wa + 2 * self.sess.audio_sr]
                orig_spec = np.asarray(compute_spectrogram(jnp.asarray(orig), self.sess.audio_sr, 0.016, 0.01))
                warped = dtw_warping(reco, orig_spec)
                corrs.append(pearson_correlation(warped, reco)[0])
        return np.asarray(corrs)

    def matching_trials(self):
        inter = set(self.sess.words) & set(self.dec_run.words)
        corrs = []
        for word in sorted(inter):
            train_audio = self.sess.get_trial_by_word(word)[2]
            dec_audio = self.dec_run.get_trial_by_word(word)[2]
            train_lm = np.asarray(compute_spectrogram(jnp.asarray(train_audio), self.sess.audio_sr, 0.016, 0.01))
            dec_lm = np.asarray(compute_spectrogram(
                jnp.asarray((dec_audio / (2**15)).astype(float)), self.dec_run.audio_sr, 0.016, 0.01))
            warped = dtw_warping(dec_lm, train_lm)
            corrs.append(pearson_correlation(warped, dec_lm)[0])
        return corrs

    def run(self, runs=100, which="both"):
        run = os.path.basename(self.run_dir)
        os.makedirs(self.dest_dir, exist_ok=True)
        if which in ("both", "chance_only"):
            # batched device decode (identical sampling/keys to the
            # sequential path — parity-tested; handles periodic and
            # aperiodic schedules).  chance_level() remains as the
            # sequential parity twin.
            chance = self.chance_level_batched(runs=runs)
            chance = chance[~np.isnan(chance)]
            np.save(os.path.join(self.dest_dir, "exp2_{}_chance.npy".format(run)), chance)
        if which in ("both", "pm_only"):
            pm = self.matching_trials()
            np.save(os.path.join(self.dest_dir, "exp2_{}_pm.npy".format(run)), pm)
