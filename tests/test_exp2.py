"""Experiment 2: matched-trial DTW scoring + batched chance level."""

import configparser
import os

import numpy as np
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.eval import exp2 as exp2_mod
from closed_loop_seeg_speech_synthesis_tpu.io import loaders
from closed_loop_seeg_speech_synthesis_tpu.runtime import params as params_io, trainer


@pytest.fixture(scope="module")
def exp2_env(tmp_path_factory):
    rng = np.random.RandomState(13)
    root = tmp_path_factory.mktemp("exp2")
    eeg_sr, audio_sr, n_words = 1024, 48000, 4
    eeg = rng.randn(3 * n_words * eeg_sr, 4)
    t = np.arange(3 * n_words * audio_sr) / audio_sr
    audio = 0.3 * np.sin(2 * np.pi * 230 * t)
    markers = [["experimentStarted"]]
    for w in ["aa", "bb", "cc", "dd"]:
        markers += [[f"start;{w}"], [f"end;{w}"]]
    markers += [["experimentEnded"]]
    loaders.save_hdf5(str(root / "speech1.hdf"), eeg, eeg_sr, audio, audio_sr, markers=markers)
    res = trainer.train(eeg, audio, eeg_sr, audio_sr, [], nb_feats=12)
    params_io.store_training(str(root), res, bad_channels=[])

    # fabricate a decoding run with two words overlapping the session
    run_dir = root / "whisper"
    run_dir.mkdir()
    from scipy.io.wavfile import write as wavwrite
    dec_audio = (rng.randn(16000 * 12) * 2000).astype(np.int16)
    wavwrite(str(run_dir / "audio.wav"), 16000, dec_audio)
    np.save(str(run_dir / "first_timestamp.npy"), np.array(50.0))
    with open(run_dir / "markers.csv", "w") as f:
        for i, w in enumerate(["aa", "bb", "zz"]):
            f.write(f"w,{50.0 + 3*i + 0.2},start;{w}\n")
            f.write(f"w,{50.0 + 3*i + 2.2},end;{w}\n")
    import h5py
    with h5py.File(run_dir / "sEEG.hdf", "w") as hf:
        hf.create_dataset("sEEG", data=rng.randn(1024 * 12, 4))
        hf.create_dataset("sEEG_sr", data=1024, dtype=np.int32)

    cfg = configparser.ConfigParser()
    cfg["Experiment2"] = {"griffin_lim_norm": "10", "which": "both",
                          "nb_randomization_runs": "4", "decoding_runs": "whisper",
                          "other_xdf": ""}
    e = exp2_mod.Experiment2(cfg, str(root), str(run_dir), other_tasks=[],
                             dest_dir=str(root / "out"), rng=np.random.RandomState(1))
    # inject other-task sEEG directly (normally loaded from XDFs)
    e.other_tasks_eeg = rng.randn(1024 * 30, 4)
    return e


def test_matching_trials(exp2_env):
    corrs = exp2_env.matching_trials()
    assert len(corrs) == 2  # 'aa' and 'bb' overlap
    assert all(np.isfinite(c) for c in corrs)


def test_chance_level_batched_matches_sequential(exp2_env):
    e = exp2_env
    e.rng = np.random.RandomState(7)
    seq = e.chance_level(runs=3)
    e.rng = np.random.RandomState(7)
    bat = e.chance_level_batched(runs=3, batch_size=2, dtype=jnp.float64)
    assert seq.shape == bat.shape == (3,)
    # same segments + same model; GL keys differ between the two paths, but
    # DTW correlations of dequantized spectrograms are key-independent
    np.testing.assert_allclose(bat, seq, rtol=1e-6, atol=1e-9)
