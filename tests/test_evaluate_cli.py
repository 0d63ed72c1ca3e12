"""cli.evaluate dispatch: exp1/exp3/exp4/figures/extract_trials on a tiny session."""

import configparser
import os

import numpy as np
import pytest

from closed_loop_seeg_speech_synthesis_tpu.cli import evaluate as eval_cli
from closed_loop_seeg_speech_synthesis_tpu.io import loaders
from closed_loop_seeg_speech_synthesis_tpu.runtime import params as params_io, trainer


@pytest.fixture(scope="module")
def eval_ws(tmp_path_factory):
    rng = np.random.RandomState(9)
    root = tmp_path_factory.mktemp("eval_ws")
    storage = root / "storage"
    sess_dir = storage / "tiny"
    sess_dir.mkdir(parents=True)
    eeg_sr, audio_sr, n_words = 1024, 48000, 4
    eeg = rng.randn(3 * n_words * eeg_sr, 4)
    t = np.arange(3 * n_words * audio_sr) / audio_sr
    audio = 0.3 * np.sin(2 * np.pi * 240 * t)
    markers = [["experimentStarted"]]
    for w in ["aa", "bb", "cc", "dd"]:
        markers += [[f"start;{w}"], [f"end;{w}"]]
    markers += [["experimentEnded"]]
    loaders.save_hdf5(str(sess_dir / "speech1.hdf"), eeg, eeg_sr, audio, audio_sr,
                      ch_names=[f"c{i}" for i in range(4)], markers=markers)
    res = trainer.train(eeg, audio, eeg_sr, audio_sr, [], nb_feats=10)
    params_io.store_training(str(sess_dir), res, bad_channels=[])

    cfg = configparser.ConfigParser()
    cfg["General"] = {"storage_dir": str(storage), "session": "tiny",
                      "temp_dir": str(root / "eval_out")}
    cfg["Experiment1"] = {"nb_randomization_runs": "1", "griffin_lim_norm": "10"}
    cfg["Experiment3"] = {"decoding_runs": "run1", "vad_energy_threshold": "0.5",
                          "vad_energy_mean_scale": "1", "vad_frames_context": "5",
                          "vad_proportion_threshold": "0.6"}
    cfg_path = root / "evaluation.ini"
    with open(cfg_path, "w") as f:
        cfg.write(f)

    # fabricate one decoding run for exp3/extract_trials
    run_dir = sess_dir / "run1"
    run_dir.mkdir()
    from scipy.io.wavfile import write as wavwrite
    wavwrite(str(run_dir / "audio.wav"), 16000, (rng.randn(16000 * 12) * 2000).astype(np.int16))
    np.save(str(run_dir / "first_timestamp.npy"), np.array(10.0))
    with open(run_dir / "markers.csv", "w") as f:
        for i, w in enumerate(["aa", "bb"]):
            f.write(f"w,{10.0 + 3*i + 0.1},start;{w}\n")
            f.write(f"w,{10.0 + 3*i + 2.1},end;{w}\n")
    import h5py
    with h5py.File(run_dir / "sEEG.hdf", "w") as hf:
        hf.create_dataset("sEEG", data=rng.randn(1024 * 12, 4))
        hf.create_dataset("sEEG_sr", data=1024, dtype=np.int32)
    return root, str(cfg_path)


def test_evaluate_exp4(eval_ws):
    root, cfg_path = eval_ws
    eval_cli.main([cfg_path, "exp4"])
    out = root / "eval_out" / "tiny" / "exp4"
    assert (out / "activations.npy").exists() and (out / "activations.png").exists()
    assert (out / "activation_map.png").exists()


def test_evaluate_exp3_and_extract(eval_ws):
    root, cfg_path = eval_ws
    eval_cli.main([cfg_path, "exp3"])
    out = root / "eval_out" / "tiny" / "exp3"
    assert (out / "run1_speech_amount.npy").exists()
    eval_cli.main([cfg_path, "extract_trials"])
    temp = root / "eval_out" / "tiny"
    assert (temp / "train_wavs").is_dir()
    assert (temp / "run1_trials.lab").exists()
