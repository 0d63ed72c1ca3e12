"""End-to-end demo on synthetic data: record -> train -> closed loop -> eval.

Creates a synthetic 100-word session (sEEG with word-locked high-gamma bursts
+ matching audio), trains the full model through the CLI, runs the closed
loop over the native loopback transport with a fake amplifier, and evaluates
reconstruction quality — the whole reference workflow (README.md:69-134)
without any lab hardware.

Run:  python examples/demo.py [workdir]
"""

import configparser
import os
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_session(path, n_words=20, eeg_sr=1024, audio_sr=48000, n_channels=16, seed=0):
    """Word-locked data: each 3 s trial has 2 s of correlated high-gamma
    activity + voiced audio, then 1 s of rest."""
    from closed_loop_seeg_speech_synthesis_tpu.io import loaders

    rng = np.random.RandomState(seed)
    words = ["w{:02d}".format(i % 10) for i in range(n_words)]
    T = 3 * n_words * eeg_sr
    Ta = 3 * n_words * audio_sr
    eeg = rng.randn(T, n_channels)
    audio = np.zeros(Ta)
    t_a = np.arange(2 * audio_sr) / audio_sr
    for i, w in enumerate(words):
        # deterministic per-word voice (NOT hash(): PYTHONHASHSEED randomizes
        # str hashes per process, which made runs non-reproducible) and a
        # broadband harmonic stack + breath noise so every mel bin carries
        # voiced/unvoiced structure — a pure tone only excites two bins once
        # spectral targets are computed exactly (docs/NUMERICS.md precision)
        wid = int(w[1:]) % 5
        f0 = 150 + 30 * wid
        burst = np.sin(2 * np.pi * 120 * np.arange(2 * eeg_sr) / eeg_sr)
        gain = 1.0 + wid * 0.4
        eeg[i * 3 * eeg_sr : i * 3 * eeg_sr + 2 * eeg_sr, : n_channels // 2] += gain * burst[:, None]
        voiced = sum((0.4 / h) * np.sin(2 * np.pi * h * f0 * t_a)
                     for h in range(1, 26))
        voiced += 0.02 * rng.randn(len(t_a))
        audio[i * 3 * audio_sr : i * 3 * audio_sr + 2 * audio_sr] = 0.3 * voiced / np.abs(voiced).max()
    markers = [["experimentStarted"]]
    for w in words:
        markers += [[f"start;{w}"], [f"end;{w}"]]
    markers += [["experimentEnded"]]
    loaders.save_hdf5(path, eeg, eeg_sr, audio, audio_sr,
                      ch_names=[f"LA{i+1}" for i in range(n_channels)], markers=markers)
    return eeg, words


def main(workdir="/tmp/seeg_demo"):
    os.environ.setdefault("NSX_REGISTRY_DIR", os.path.join(workdir, "nsx"))
    os.makedirs(workdir, exist_ok=True)

    from closed_loop_seeg_speech_synthesis_tpu.cli import decode as decode_cli
    from closed_loop_seeg_speech_synthesis_tpu.cli import dev_streamer
    from closed_loop_seeg_speech_synthesis_tpu.cli import train as train_cli
    from closed_loop_seeg_speech_synthesis_tpu.eval.metrics import pearson_correlation
    from closed_loop_seeg_speech_synthesis_tpu.ops.spectrogram import compute_spectrogram
    from closed_loop_seeg_speech_synthesis_tpu.runtime import params as params_io
    import jax.numpy as jnp
    import scipy.signal as sig

    rec = os.path.join(workdir, "speech1.hdf")
    print("== creating synthetic session ==")
    eeg, words = make_synthetic_session(rec)

    cfg = configparser.ConfigParser()
    cfg["General"] = {"storage_dir": workdir, "session": "demo"}
    cfg["Training"] = {"file": rec, "power_line": "50", "channels": "LA[0-9]*",
                       "show_interactive_channel_view": "False",
                       "overwrite_on_rerun": "True", "draw_plots": "True"}
    cfg["Decoding"] = {"stream_name": "demo_sEEG", "marker_stream_name": "DemoMk",
                       "griffin_lim_norm": "10", "run": "loopback", "overwrite_on_rerun": "True"}
    cfg["Development"] = {"file": rec}
    cfg_path = os.path.join(workdir, "experiment.ini")
    with open(cfg_path, "w") as f:
        cfg.write(f)

    print("== training (cli.train) ==")
    train_cli.main([cfg_path])

    print("== closed loop over the native loopback transport ==")
    config = configparser.ConfigParser()
    config.read(cfg_path)
    loaded = params_io.load_params(os.path.join(workdir, "demo", "params.h5"))
    run_dir = os.path.join(workdir, "demo", "loopback")
    os.makedirs(run_dir, exist_ok=True)

    n_packets = min(len(eeg) // 32, 2000)
    streamed = eeg[: n_packets * 32].astype(np.float32)
    results = {}

    def run_decoder():
        results["out"] = decode_cli.perform_online_decoding(
            config, loaded, 10, run_dir, max_packets=n_packets, backend="nsx")

    dec = threading.Thread(target=run_decoder)
    dec.start()
    dev_streamer.stream_eeg(streamed, 1024, "demo_sEEG", asap=True,
                            backend="nsx", wait_for_consumers=120.0)
    dec.join()
    spectrogram, audio_out, received, sfreq = results["out"]
    decode_cli.store_decoding_to_file(run_dir, config, spectrogram, audio_out, received, sfreq)
    print(f"decoded {len(spectrogram)} frames, {len(audio_out)/16000:.1f}s of audio -> {run_dir}")

    print("== quality: decoded logMels vs original audio spectrogram ==")
    import h5py
    with h5py.File(rec) as hf:
        orig_audio = hf["Audio"][:]
    audio16 = sig.decimate(orig_audio.astype(np.float64), 3)
    orig_spec = np.asarray(compute_spectrogram(jnp.asarray(audio16), 16000, 0.016, 0.01))
    n = min(len(orig_spec), len(spectrogram))
    mean_r, std_r = pearson_correlation(orig_spec[:n], np.asarray(spectrogram)[:n])
    print(f"mean per-bin Pearson r = {mean_r:.3f} (+- {std_r:.3f}) over {n} frames")
    assert mean_r > 0.15, "synthetic decode should beat chance comfortably"
    print("demo OK")


if __name__ == "__main__":
    main(*sys.argv[1:2])
