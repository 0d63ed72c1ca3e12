"""Experiment 1: 10-fold cross-validated spectrogram reconstruction vs a
randomized chance level (twin of reference ``eval_steps/exp1.py``).

Per fold: cut the test words' contiguous 3 s spans out of the raw recording,
retrain on the rest, decode the held-out sEEG, compare the reconstructed
logMels with the audio spectrogram of the held-out audio.  Chance level
repeats this with the training sEEG circularly split at a random index to
break neural/audio alignment (exp1.py:94-99).

The reference serializes everything through ThreadPool(processes=1)
(exp1.py:111,142); here each fold's train+decode runs as compiled TPU
programs, and folds simply loop on the host.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io.wavfile import write as wavwrite
from scipy.signal import decimate

from ..io.session import Session
from ..ops.spectrogram import compute_spectrogram
from ..runtime import pipeline, trainer
from .metrics import extract_corrs_for_distribution, kfold_indices, pearson_correlation

logger = logging.getLogger("eval.exp1")

# Stacked-feature multiplier of the runners' decoder config: the batched
# runners build DecoderConfig with its default model_order, so the nb_feats
# clamp below must track that same default (not a hardcoded 5).
_N_TAPS = pipeline.DecoderConfig.__dataclass_fields__["model_order"].default + 1


def train_decode_fold(k, eeg_train, audio_train, eeg_test, spec_test, eeg_sr, audio_sr,
                      bad_channels, norm_factor, dtype=None, key=None, nb_feats=150):
    """One fold: full retrain + offline decode of the held-out sEEG."""
    dtype = dtype or pipeline.default_compute_dtype()
    logger.info("Processing Fold k=%d", k)
    res = trainer.train(eeg_train, audio_train, eeg_sr, audio_sr, bad_channels,
                        nb_feats=nb_feats, dtype=dtype)

    mask = np.ones(eeg_test.shape[1], bool)
    mask[np.asarray(bad_channels, int)] = False
    eeg_test_sel = eeg_test[:, mask]

    cfg = pipeline.DecoderConfig(sr=float(eeg_sr), n_channels=eeg_test_sel.shape[1],
                                 gl_norm=float(norm_factor), dtype=dtype)
    dec = pipeline.build_decoder_params(cfg, res.lda, res.medians, res.select)
    spec, audio = pipeline.offline_decode(
        dec, cfg, eeg_test_sel, key=key if key is not None else jax.random.PRNGKey(k))
    return k, np.asarray(spec), spec_test, np.asarray(audio)


class Experiment1:
    def __init__(self, config, session_dir, dest_dir, rng=None):
        self.session_dir = session_dir
        self.dest_dir = dest_dir
        self.config = config
        self.rng = rng or np.random.RandomState()
        self.sess = Session(session_dir, downsample_audio=False, rng=self.rng)

    def _construct_datasets_for_run(self, nb_folds=10, randomize=False):
        import h5py

        with h5py.File(os.path.join(self.session_dir, "params.h5"), "r") as hf:
            bad_channels = hf["bad_channels"][:]
        norm_factor = self.config.getint("Experiment1", "griffin_lim_norm")

        n_words = len(self.sess.words)
        folds = list(enumerate(kfold_indices(n_words, nb_folds), start=1))

        def stage(fold):
            k, (train_idx, test_idx) = fold
            eeg_mask = np.ones(len(self.sess.eeg), bool)
            audio_mask = np.ones(len(self.sess.audio), bool)
            es = self.sess.word_starts_indices_eeg[test_idx[0]]
            ee = self.sess.word_starts_indices_eeg[test_idx[-1]] + 3 * self.sess.eeg_sr
            eeg_mask[es:ee] = False
            as_ = self.sess.word_starts_indices_audio[test_idx[0]]
            ae = self.sess.word_starts_indices_audio[test_idx[-1]] + 3 * self.sess.audio_sr
            audio_mask[as_:ae] = False

            # asarray, not astype: the boolean index already copied, so skip
            # the second full-session copy when the stored dtype is f64
            x_train = np.asarray(self.sess.eeg[eeg_mask], dtype=np.float64)
            y_train = self.sess.audio[audio_mask]
            x_test = self.sess.eeg[~eeg_mask]
            y_test = np.asarray(compute_spectrogram(
                jnp.asarray(decimate(self.sess.audio[~audio_mask], 3)), 16000, 0.016, 0.01))

            minimum = min(len(x_train) / self.sess.eeg_sr, len(y_train) / self.sess.audio_sr)
            x_train = x_train[: int(minimum * self.sess.eeg_sr)]
            y_train = y_train[: int(minimum * self.sess.audio_sr)]

            return [k, x_train, y_train, x_test, y_test, self.sess.eeg_sr,
                    self.sess.audio_sr, bad_channels, norm_factor]

        # fold staging is embarrassingly parallel and GIL-light (numpy bool
        # masking, scipy decimate, XLA spectrogram all release the GIL) —
        # threads cut the cold-start staging wall ~Nx (VERDICT r3 #6)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(len(folds), os.cpu_count() or 4)) as ex:
            args = list(ex.map(stage, folds))

        if randomize:
            # circular shifts applied AFTER staging, sequentially in fold
            # order, preserving the exact serial-loop RNG stream
            for a in args:
                r = self.rng.randint(0, len(a[1]))
                a[1] = np.vstack([a[1][r:], a[1][:r]])
        return [tuple(a) for a in args]

    def _run_folds(self, args):
        results = sorted([train_decode_fold(*a) for a in args], key=lambda r: r[0])
        _, reco, orig, wavs = zip(*results)
        return np.vstack(reco), np.vstack(orig), np.hstack(wavs)

    def _run_folds_batched(self, args, dtype=None, key=None, nb_feats=150,
                           fold_batch=10):
        """All retrain+decode folds as one compiled device program, grouped
        by fold shape (uniform KFold => one group, one compilation).

        The fold axis runs through ``lax.map`` — sequential lanes of the
        proven-correct unbatched program (see make_proposed_runner for the
        TPU vmap miscompile this avoids) — so peak HBM is one fold's working
        set and all 10 folds fit in one call.  ``fold_batch`` still bounds
        host-side stacking per call."""
        from .exp1_batched import fold_targets, make_proposed_runner

        dtype = dtype or pipeline.default_compute_dtype()
        key = key if key is not None else jax.random.PRNGKey(0)

        groups = {}  # shape_key -> list of (order_index, fold arg tuple)
        for i, a in enumerate(args):
            (k, x_train, y_train, x_test, y_test, eeg_sr, audio_sr, bad, norm) = a
            shape_key = (x_train.shape, x_test.shape, float(norm))
            groups.setdefault(shape_key, []).append((i, a))

        recos = [None] * len(args)
        origs = [None] * len(args)
        wavs = [None] * len(args)
        runners = {}
        for shape_key, members in groups.items():
            (k0, xt0, yt0, xe0, _, eeg_sr, audio_sr, bad, norm) = members[0][1]
            mask = np.ones(xt0.shape[1], bool)
            if len(bad):
                mask[np.asarray(bad, int)] = False
            # clamp to the stacked-feature count like select_features does
            # (small sessions can have fewer than nb_feats features)
            nf = min(nb_feats, _N_TAPS * int(mask.sum()))
            if shape_key not in runners:
                runners[shape_key] = make_proposed_runner(
                    xt0.shape[0], xe0.shape[0], int(mask.sum()), float(eeg_sr),
                    float(norm), nb_feats=nf, dtype=dtype)
            runner, _ = runners[shape_key]

            for c0 in range(0, len(members), fold_batch):
                chunk = members[c0 : c0 + fold_batch]

                def stage_member(member):
                    _, (k, x_train, y_train, x_test, y_test, *_rest) = member
                    q, medians, y_mean = fold_targets(y_train)
                    return (np.asarray(x_train, np.float64)[:, mask],
                            np.asarray(x_test, np.float64)[:, mask],
                            q, y_mean, medians,
                            # fold id as key stream (train_decode_fold uses PRNGKey(k))
                            jax.random.fold_in(key, k))

                # per-fold target staging in threads (quantization + masked
                # f64 copies release the GIL) — VERDICT r3 #6
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=min(len(chunk), os.cpu_count() or 4)) as ex:
                    staged = list(ex.map(stage_member, chunk))
                xts, xes, qs, yms, meds, keys = map(list, zip(*staged))
                reco_b, audio_b = runner(
                    jnp.asarray(np.stack(xts), dtype), jnp.asarray(np.stack(xes), dtype),
                    jnp.asarray(np.stack(qs), jnp.int32), jnp.asarray(np.stack(yms), dtype),
                    jnp.asarray(np.stack(meds), dtype), jnp.stack(keys))
                reco_b, audio_b = np.asarray(reco_b), np.asarray(audio_b)
                for j, (i, a) in enumerate(chunk):
                    recos[i] = reco_b[j]
                    origs[i] = a[4]
                    wavs[i] = audio_b[j]
        return np.vstack(recos), np.vstack(origs), np.hstack(wavs)

    def proposed_method(self, nb_folds=10, batched=True, args=None,
                        fold_batch=10):
        # No silent sequential fallback: a swallowed device-path failure
        # masks regressions (and wouldn't catch silent corruption anyway —
        # a TPU vmap miscompile zeroed 4 of 10 folds without raising; the
        # lax.map runners fixed it).  _run_folds stays as the parity twin.
        # ``args`` lets callers reuse pre-staged fold datasets (the host
        # staging dominates the wall; see benchmarks/eval_full.py).
        if args is None:
            args = self._construct_datasets_for_run(nb_folds)
        elif len(args) != nb_folds:
            raise ValueError(
                f"pre-staged args carry {len(args)} folds but nb_folds={nb_folds}")
        if batched:
            reco, orig, decoded_audio = self._run_folds_batched(args, fold_batch=fold_batch)
        else:
            reco, orig, decoded_audio = self._run_folds(args)
        sr = 16000
        wav_dir = os.path.join(self.dest_dir, "reco_wavs")
        os.makedirs(wav_dir, exist_ok=True)
        for i, w in enumerate(self.sess.words):
            word_wav = decoded_audio[i * 3 * sr : (i * 3 + 2) * sr]
            wavwrite(os.path.join(wav_dir, "{:03}-{}.wav".format(i + 1, w)), sr, word_wav)
        np.save(os.path.join(self.dest_dir, "pm_reco.npy"), reco)
        np.save(os.path.join(self.dest_dir, "orig.npy"), orig)
        return extract_corrs_for_distribution(orig, reco, n_folds=5)

    def chance_level(self, nb_runs=100, nb_folds=10):
        corrs = []
        for i in range(nb_runs):
            reco, orig, _ = self._run_folds(self._construct_datasets_for_run(nb_folds, randomize=True))
            np.save(os.path.join(self.dest_dir, "rc_reco_i={:03}.npy".format(i + 1)), reco)
            _, _, rs = pearson_correlation(orig, reco, return_means=True)
            corrs.append(rs)
        corrs = np.vstack(corrs)
        return np.mean(corrs, axis=0), np.std(corrs, axis=0)

    def chance_level_batched(self, nb_runs=100, nb_folds=10, batch_size=10,
                             dtype=jnp.float32, key=None, save=True, nb_feats=150,
                             base_args=None, checkpoint_dir=None):
        """TPU fan-out of the chance estimation (SURVEY §7: the reference's
        most expensive loop, run serially there).

        The randomization only circularly shifts the training sEEG
        (exp1.py:94-99) — audio, quantization and medians are identical
        across runs of a fold — so the whole retrain+decode per shift is one
        jitted function vmapped over a batch of shift indices.  Feature
        selection uses top-|rho| (same feature set as the reference's
        argsort; LDA predictions are invariant to feature order).
        """
        from .exp1_batched import fold_targets, make_chance_runner

        if base_args is None:
            base_args = self._construct_datasets_for_run(nb_folds, randomize=False)
        elif len(base_args) != nb_folds:
            raise ValueError(
                f"pre-staged base_args carry {len(base_args)} folds but nb_folds={nb_folds}")
        key = key if key is not None else jax.random.PRNGKey(0)

        # per (run, fold) shift indices, host RNG like the reference
        # (drawn upfront for ALL runs, so a checkpointed resume with the same
        # seeded rng reproduces the identical shift stream)
        shifts = np.zeros((nb_runs, len(base_args)), np.int64)
        for i in range(nb_runs):
            for f, a in enumerate(base_args):
                shifts[i, f] = self.rng.randint(0, len(a[1]))
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)

        # one compiled runner per distinct fold shape (uniform KFold => one)
        runners = {}
        fold_recos = []  # per fold: (nb_runs, n_frames_fold, n_mel)
        origs = []
        for f, (k, x_train, y_train, x_test, y_test, eeg_sr, audio_sr, bad, norm) in enumerate(base_args):
            ck = (os.path.join(checkpoint_dir, f"chance_fold_{f:02}_r{nb_runs}.npy")
                  if checkpoint_dir else None)
            if ck and os.path.exists(ck):
                done = np.load(ck)
                if done.shape[0] == nb_runs:  # a complete fold from a prior attempt
                    logger.info("chance fold %d restored from checkpoint", f)
                    fold_recos.append(done)
                    origs.append(y_test)
                    continue
            # per-chunk checkpoints within the fold: a relay-worker crash
            # mid-fold resumes at chunk granularity (batch_size runs), not
            # by redoing the whole 100-run fold
            chunk_cks = {}
            if checkpoint_dir:
                for start in range(0, nb_runs, batch_size):
                    chunk_cks[start] = os.path.join(
                        checkpoint_dir,
                        f"chance_fold_{f:02}_c{start:03}_b{batch_size}_r{nb_runs}.npy")
            mask = np.ones(x_train.shape[1], bool)
            if len(bad):
                mask[np.asarray(bad, int)] = False
            xt = jnp.asarray(x_train[:, mask], dtype)
            xe = jnp.asarray(x_test[:, mask], dtype)
            shape_key = (xt.shape, xe.shape, float(norm))
            if shape_key not in runners:
                # clamp like select_features (small sessions < nb_feats)
                nf = min(nb_feats, _N_TAPS * int(mask.sum()))
                runners[shape_key] = make_chance_runner(
                    xt.shape[0], xe.shape[0], xt.shape[1], float(eeg_sr), float(norm),
                    nb_feats=nf, dtype=dtype)
            runner, n_out = runners[shape_key]
            q, medians, y_mean = fold_targets(y_train)
            q_d, med_d, ym_d = jnp.asarray(q), jnp.asarray(medians, dtype), jnp.asarray(y_mean, dtype)
            outs = []
            for start in range(0, nb_runs, batch_size):
                cck = chunk_cks.get(start)
                if cck and os.path.exists(cck):
                    outs.append(np.load(cck))
                    continue
                idx = shifts[start : start + batch_size, f]
                sub = jax.random.fold_in(key, f * 100003 + start)
                out = np.asarray(runner(xt, xe, q_d, ym_d, med_d, jnp.asarray(idx, jnp.int32), sub))
                if cck:
                    np.save(cck, out)
                outs.append(out)
            fold_recos.append(np.concatenate(outs, axis=0))
            origs.append(y_test)
            if ck:
                np.save(ck, fold_recos[-1])
                for cck in chunk_cks.values():
                    if os.path.exists(cck):
                        os.remove(cck)
        orig = np.vstack(origs)

        corrs = []
        for i in range(nb_runs):
            reco = np.vstack([fr[i] for fr in fold_recos])
            n = min(len(reco), len(orig))
            if save:
                np.save(os.path.join(self.dest_dir, "rc_reco_i={:03}.npy".format(i + 1)), reco[:n])
            _, _, rs = pearson_correlation(orig[:n], reco[:n], return_means=True)
            corrs.append(rs)
        corrs = np.vstack(corrs)
        return np.mean(corrs, axis=0), np.std(corrs, axis=0)

    def synthesize_specs(self, reco, norm_factor=10.0, key=None):
        """Re-vocode a saved spectrogram (exp1.py:162-180) as a batch."""
        from ..ops import filter_design as fd
        from ..ops import griffinlim as gl
        from ..ops import iir

        reco = jnp.asarray(reco, jnp.float64)
        ops = gl.make_streaming_gl_ops(reco.shape[1], 16000.0, jnp.float64)
        rand = gl.default_rand_init(key or jax.random.PRNGKey(0), reco.shape[0] - 1, 0, jnp.float64)
        re = gl.streaming_gl_blocks(reco, rand, ops, 8, True)
        raw = gl.overlap_add_stream(re, ops)
        ss = iir.sos_to_statespace(fd.gl_output_lowpass_sos())
        lp, _ = iir.iir_blocked(iir.make_blocked_iir(ss, 160, jnp.float64), raw[:, None],
                                jnp.zeros((ss.dim, 1)))
        wav = np.asarray(gl.to_int16(lp[:, 0], norm_factor))
        out_dir = os.path.join(self.dest_dir, "resynth")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(len(self.sess.words)):
            trial = wav[i * 3 * 16000 : (i * 3 + 2) * 16000]
            wavwrite(os.path.join(out_dir, "{:03}-{}.wav".format(i + 1, self.sess.words[i])), 16000, trial)
        return wav

    def run(self, randomization_runs=100, batched=True):
        pm = self.proposed_method(batched=batched)
        if batched:
            rc = self.chance_level_batched(nb_runs=randomization_runs)
        else:
            rc = self.chance_level(nb_runs=randomization_runs)
        return pm, rc
