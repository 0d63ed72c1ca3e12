"""Eval suite: VAD golden, DTW properties, metrics vs scipy, mini exp1/3/4."""

import configparser
import os

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import pearsonr

from closed_loop_seeg_speech_synthesis_tpu.eval import dtw, exp1 as exp1_mod, exp3 as exp3_mod, exp4 as exp4_mod, metrics
from closed_loop_seeg_speech_synthesis_tpu.eval.vad import EnergyBasedVad
from closed_loop_seeg_speech_synthesis_tpu.io import loaders
from closed_loop_seeg_speech_synthesis_tpu.runtime import params as params_io, trainer


def test_pearson_matches_scipy(rng):
    a, b = rng.randn(200, 6), rng.randn(200, 6)
    mine = metrics.pearson_per_bin(a, b)
    for i in range(6):
        np.testing.assert_allclose(mine[i], pearsonr(a[:, i], b[:, i])[0], rtol=1e-12)
    m, s, rs = metrics.pearson_correlation(a, b, return_means=True)
    np.testing.assert_allclose(m, np.mean(mine))


def test_kfold_matches_sklearn():
    from sklearn.model_selection import KFold

    for n, k in [(100, 10), (17, 5)]:
        ref = list(KFold(n_splits=k).split(np.arange(n)))
        mine = list(metrics.kfold_indices(n, k))
        for (rt, rv), (mt, mv) in zip(ref, mine):
            np.testing.assert_array_equal(rt, mt)
            np.testing.assert_array_equal(rv, mv)


def test_vad_matches_reference_loop(rng):
    """Vectorized VAD == the reference's per-frame loop semantics."""
    mfccs = rng.randn(120, 15) * 2
    vad = EnergyBasedVad(vad_energy_threshold=0.5, vad_energy_mean_scale=1,
                         vad_frames_context=5, vad_proportion_threshold=0.6)
    out = vad.from_mfccs(mfccs)

    log_energy = mfccs[:, 0]
    thr = 0.5 + 1 * log_energy.sum() / len(log_energy)
    ref = np.empty(len(mfccs), bool)
    for i in range(len(mfccs)):
        num = den = 0.0
        for t2 in range(i - 5, i + 5):
            if 0 <= t2 < len(mfccs):
                den += 1
                if log_energy[t2] > thr:
                    num += 1
        ref[i] = num >= den * 0.6
    np.testing.assert_array_equal(out, ref)


def test_vad_from_wav_and_lab(tmp_path, rng):
    wav = np.zeros(16000 * 2)
    wav[16000:24000] = rng.randn(8000) * 8000  # loud middle segment
    vad = EnergyBasedVad(vad_energy_threshold=0.5, vad_energy_mean_scale=1)
    mask = vad.from_wav(wav + rng.randn(len(wav)) * 10)
    # voiced frames should concentrate in the loud segment
    assert mask[105:145].mean() > 0.8
    assert mask[:80].mean() < 0.2
    lab = tmp_path / "x.lab"
    vad.convert_vad_to_lab(str(lab), mask)
    assert lab.exists() and len(lab.read_text().splitlines()) >= 1


def test_dtw_identity_and_shift(rng):
    x = rng.randn(30, 4)
    d, path = dtw.dtw_path(x, x)
    assert d < 1e-6  # sqrt of clipped float rounding per step
    assert path[0] == (0, 0) and path[-1] == (29, 29)
    # warping a time-shifted copy recovers high correlation; output length is
    # len(reference) (utils.py:124-131 grid semantics)
    ref = np.concatenate([x[5:], x[:5]], axis=0)
    warped = dtw.dtw_warping(x, ref)
    assert warped.shape[0] == ref.shape[0]
    r = metrics.pearson_per_bin(warped[: len(x)], x)
    assert np.nanmean(r) > 0.6


@pytest.fixture(scope="module")
def mini_session(tmp_path_factory):
    """Tiny 4-word synthetic session with trained params on disk."""
    rng = np.random.RandomState(3)
    tmp = tmp_path_factory.mktemp("sess")
    eeg_sr, audio_sr, n_words = 1024, 48000, 4
    T = 3 * n_words * eeg_sr
    eeg = rng.randn(T, 5)
    t = np.arange(3 * n_words * audio_sr) / audio_sr
    audio = 0.3 * np.sin(2 * np.pi * 200 * t) * (np.sin(2 * np.pi * 0.2 * t) > 0)
    markers = [["experimentStarted"]]
    for w in ["aa", "bb", "cc", "dd"]:
        markers += [[f"start;{w}"], [f"end;{w}"]]
    markers += [["experimentEnded"]]
    loaders.save_hdf5(str(tmp / "speech1.hdf"), eeg, eeg_sr, audio, audio_sr,
                      ch_names=[f"c{i}" for i in range(5)], markers=markers)
    res = trainer.train(eeg, audio, eeg_sr, audio_sr, bad_channels=[], nb_feats=15)
    params_io.store_training(str(tmp), res, bad_channels=[])
    return str(tmp), rng


def test_exp1_mini(mini_session, tmp_path):
    session_dir, rng = mini_session
    cfg = configparser.ConfigParser()
    cfg["Experiment1"] = {"griffin_lim_norm": "10"}
    e = exp1_mod.Experiment1(cfg, session_dir, str(tmp_path), rng=np.random.RandomState(0))
    means, stds = e.proposed_method(nb_folds=2)
    assert means.shape == (40,) and np.isfinite(means[np.argmax(np.abs(means))])
    assert os.path.exists(os.path.join(str(tmp_path), "pm_reco.npy"))
    rc_means, rc_stds = e.chance_level(nb_runs=1, nb_folds=2)
    assert rc_means.shape == (40,)
    # resynthesize from the saved reconstruction
    reco = np.load(os.path.join(str(tmp_path), "pm_reco.npy"))
    wav = e.synthesize_specs(reco[:400])
    assert wav.dtype == np.int16 and len(wav) == (400 - 1) * 160


def test_exp4_mini(mini_session, tmp_path):
    session_dir, rng = mini_session
    e = exp4_mod.Experiment4(session_dir, channel_names=[f"c{i}" for i in range(5)])
    matrix = e.compute_activations()
    assert matrix.shape == (5, 5)
    assert np.isfinite(matrix).all() and (matrix != 0).any()
    # selection mask marks exactly the selected features on the grid
    mask = e.selection_mask()
    assert mask.sum() == len(e.sel_features)
    assert ((matrix != 0) <= mask).all()
    # shafts from name prefixes: 'c0'..'c4' is one 5-wide shaft
    assert e.shaft_spans() == [("c", 0, 5)]
    # paper figure renders with the computed boundary + shaft patches
    out = str(tmp_path / "activation_map.png")
    e.plot_activation_map(matrix, out)
    assert os.path.getsize(out) > 0
    # excluded shaft -> empty grid must still not crash the renderer
    e2 = exp4_mod.Experiment4(session_dir, channel_names=[f"c{i}" for i in range(5)])
    e2.plot_activation_map(matrix, str(tmp_path / "am2.png"), exclude_shafts=())


def test_exp3_mini(mini_session, tmp_path):
    session_dir, _ = mini_session
    # fabricate a decoding-run directory
    run_dir = tmp_path / "whisper"
    run_dir.mkdir()
    rng = np.random.RandomState(1)
    audio = (rng.randn(16000 * 12) * 500).astype(np.int16)
    from scipy.io.wavfile import write as wavwrite
    wavwrite(str(run_dir / "audio.wav"), 16000, audio)
    np.save(str(run_dir / "first_timestamp.npy"), np.array(100.0))
    with open(run_dir / "markers.csv", "w") as f:
        for i, w in enumerate(["aa", "bb", "cc"]):
            f.write(f"2021-01-01 00:00:0{i},{100.0 + 3*i + 0.5},start;{w}\n")
            f.write(f"2021-01-01 00:00:0{i},{100.0 + 3*i + 2.5},end;{w}\n")
    import h5py
    with h5py.File(run_dir / "sEEG.hdf", "w") as hf:
        hf.create_dataset("sEEG", data=rng.randn(1024 * 12, 5))
        hf.create_dataset("sEEG_sr", data=1024, dtype=np.int32)

    cfg = configparser.ConfigParser()
    cfg["Experiment3"] = {"decoding_runs": "whisper", "vad_energy_threshold": "0.5",
                          "vad_energy_mean_scale": "1", "vad_frames_context": "5",
                          "vad_proportion_threshold": "0.6"}
    results = exp3_mod.run_experiment3(cfg, str(tmp_path), str(tmp_path / "exp3"))
    in_trials, in_rest = results["whisper"]
    assert in_trials >= 0 and in_rest >= 0
    assert (tmp_path / "exp3" / "whisper_run.lab").exists()


def test_pearson_constant_input_matches_scipy():
    """pearson_per_bin replicates scipy.stats.pearsonr's constant-input
    semantics (NaN, offline.py:207 behavior): an exactly-constant column
    must not leak a finite ~1e-15 ratio from a denominator that rounds to
    nonzero.  Load-bearing for exp2 chance runs (reference drops them)."""
    import warnings

    from scipy.stats import pearsonr

    from closed_loop_seeg_speech_synthesis_tpu.eval.metrics import pearson_per_bin

    rng = np.random.RandomState(0)
    a = rng.randn(50, 4)
    b = rng.randn(50, 4)
    a[:, 1] = 2.3371  # constant column whose centered sum-of-squares
    b[:, 2] = -0.875  # rounds to a tiny nonzero value
    got = pearson_per_bin(a, b)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = np.array([pearsonr(a[:, i], b[:, i])[0] for i in range(4)])
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12, equal_nan=True)
    assert np.isnan(got[1]) and np.isnan(got[2])
