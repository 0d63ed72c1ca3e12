"""CLI entry points end-to-end: train -> offline decode via config files."""

import configparser
import os

import numpy as np
import pytest

from closed_loop_seeg_speech_synthesis_tpu.cli import decode as decode_cli
from closed_loop_seeg_speech_synthesis_tpu.cli import train as train_cli
from closed_loop_seeg_speech_synthesis_tpu.io import loaders


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    rng = np.random.RandomState(42)
    root = tmp_path_factory.mktemp("cli_ws")
    eeg_sr, audio_sr = 1024, 48000
    T = 6 * eeg_sr
    eeg = rng.randn(T, 4).astype(np.float32)
    t = np.arange(6 * audio_sr) / audio_sr
    audio = (0.2 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    rec = root / "speech1.hdf"
    loaders.save_hdf5(str(rec), eeg, eeg_sr, audio, audio_sr,
                      ch_names=["LA1", "LA2", "LB1", "EKG"])

    cfg_path = root / "experiment.ini"
    cfg = configparser.ConfigParser()
    cfg["General"] = {"storage_dir": str(root / "storage"), "session": "demo"}
    cfg["Training"] = {"file": str(rec), "power_line": "50",
                       "channels": "L[AB][0-9]*",  # excludes EKG
                       "show_interactive_channel_view": "False",
                       "overwrite_on_rerun": "True", "draw_plots": "True"}
    cfg["Decoding"] = {"stream_name": "dev_sEEG", "marker_stream_name": "Mk",
                       "griffin_lim_norm": "10", "run": "replay",
                       "overwrite_on_rerun": "True"}
    cfg["Development"] = {"file": str(rec)}
    with open(cfg_path, "w") as f:
        cfg.write(f)
    return root, str(cfg_path), eeg, eeg_sr


def test_train_cli(workspace):
    root, cfg_path, eeg, eeg_sr = workspace
    params_path = train_cli.main([cfg_path])
    session_dir = root / "storage" / "demo"
    for f in ["params.h5", "LDAs.pkl", "training_features.npy", "train.ini",
              "train.log", "trainset.png", "coeffs.png"]:
        assert (session_dir / f).exists(), f
    import h5py
    with h5py.File(params_path, "r") as hf:
        assert list(hf["bad_channels"]) == [3]  # EKG excluded by regex
        assert hf["medians_array"].shape == (40, 9)


def test_decode_cli_offline(workspace):
    root, cfg_path, eeg, eeg_sr = workspace
    # reuse the recording as the seeg_file (sEEG/sEEG_sr datasets exist)
    import h5py
    seeg_file = root / "replay_input.hdf"
    with h5py.File(seeg_file, "w") as hf:
        hf.create_dataset("sEEG", data=eeg)
        hf.create_dataset("sEEG_sr", data=eeg_sr, dtype=np.int32)
    run_dir = decode_cli.main([cfg_path, "--seeg_file", str(seeg_file), "--run", "replay"])
    for f in ["audio.wav", "sEEG.hdf", "spectrogram.npy", "decode.ini", "decoding.png", "decode.log"]:
        assert os.path.exists(os.path.join(run_dir, f)), f
    spec = np.load(os.path.join(run_dir, "spectrogram.npy"))
    assert spec.shape[1] == 40 and len(spec) > 500


def test_decode_cli_exact_host_vocoder(workspace):
    """--vocoder exact-host re-synthesizes through the reference-exact NumPy
    vocoder: identical spectrogram, byte-stable audio on the reference's
    FP-jittered emission grid (length differs from the constant-160 device
    grid by the jitter's net rounding, at most a few samples)."""
    root, cfg_path, eeg, eeg_sr = workspace
    import h5py
    if not (root / "storage" / "demo" / "params.h5").exists():
        train_cli.main([cfg_path])
    seeg_file = root / "replay_input.hdf"
    if not seeg_file.exists():
        with h5py.File(seeg_file, "w") as hf:
            hf.create_dataset("sEEG", data=eeg)
            hf.create_dataset("sEEG_sr", data=eeg_sr, dtype=np.int32)
    run_dir = decode_cli.main([cfg_path, "--seeg_file", str(seeg_file),
                               "--run", "replay_exact", "--vocoder", "exact-host"])
    base_dir = decode_cli.main([cfg_path, "--seeg_file", str(seeg_file),
                                "--run", "replay_base"])
    spec_e = np.load(os.path.join(run_dir, "spectrogram.npy"))
    spec_b = np.load(os.path.join(base_dir, "spectrogram.npy"))
    np.testing.assert_array_equal(spec_e, spec_b)
    from scipy.io import wavfile
    sr_a, a = wavfile.read(os.path.join(run_dir, "audio.wav"))
    sr_b, b = wavfile.read(os.path.join(base_dir, "audio.wav"))
    assert sr_a == sr_b == 16000 and a.dtype == np.int16
    assert abs(len(a) - len(b)) <= 4 and len(a) > 5 * 16000  # 6 s session
    n = min(len(a), len(b))
    # same GL inits + same spec -> waveforms correlate strongly despite the
    # two vocoders' different FFT/rounding paths (chaotic phase iteration)
    r = np.corrcoef(a[:n].astype(np.float64), b[:n].astype(np.float64))[0, 1]
    assert r > 0.98


def test_decode_cli_profile(workspace):
    """--profile wraps the decode in a jax.profiler trace capture."""
    root, cfg_path, eeg, eeg_sr = workspace
    import glob

    import h5py
    if not (root / "storage" / "demo" / "params.h5").exists():
        train_cli.main([cfg_path])
    seeg_file = root / "replay_input.hdf"
    if not seeg_file.exists():
        with h5py.File(seeg_file, "w") as hf:
            hf.create_dataset("sEEG", data=eeg)
            hf.create_dataset("sEEG_sr", data=eeg_sr, dtype=np.int32)
    prof_dir = str(root / "prof")
    decode_cli.main([cfg_path, "--seeg_file", str(seeg_file), "--run", "prof_replay",
                     "--profile", prof_dir])
    traces = glob.glob(os.path.join(prof_dir, "**", "*.trace.json.gz"), recursive=True) + \
        glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no profiler artifacts under {prof_dir}"
