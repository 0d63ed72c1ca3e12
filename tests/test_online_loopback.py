"""Full closed-loop integration over the native NSX transport.

Equivalent of the reference's sanctioned debug harness (README: dev streamer
+ decode on one machine over loopback LSL): a fake-amplifier thread replays a
recording; the decode CLI's online path pulls it packet by packet through the
jitted step; output must equal the batch offline decode of the same samples.
"""

import os
import threading
import time

import numpy as np
import pytest

os.environ.setdefault("NSX_REGISTRY_DIR", "/tmp/nsx_pytest")

import jax
import jax.numpy as jnp

from closed_loop_seeg_speech_synthesis_tpu.cli import decode as decode_cli
from closed_loop_seeg_speech_synthesis_tpu.cli import dev_streamer
from closed_loop_seeg_speech_synthesis_tpu.io import loaders
from closed_loop_seeg_speech_synthesis_tpu.runtime import params as params_io, trainer


@pytest.fixture(scope="module")
def trained_session(tmp_path_factory):
    rng = np.random.RandomState(11)
    tmp = tmp_path_factory.mktemp("loopsess")
    eeg_sr, audio_sr = 1024, 48000
    T = 8 * eeg_sr
    eeg = rng.randn(T, 4)
    t = np.arange(8 * audio_sr) / audio_sr
    audio = 0.3 * np.sin(2 * np.pi * 180 * t)
    loaders.save_hdf5(str(tmp / "speech1.hdf"), eeg, eeg_sr, audio, audio_sr)
    res = trainer.train(eeg, audio, eeg_sr, audio_sr, bad_channels=[1], nb_feats=12)
    params_io.store_training(str(tmp), res, bad_channels=[1])
    return str(tmp), eeg, eeg_sr


def test_offline_cli_decode(trained_session, tmp_path):
    session_dir, eeg, eeg_sr = trained_session
    loaded = params_io.load_params(os.path.join(session_dir, "params.h5"), dtype=jnp.float64)
    spec, audio, received, sr = decode_cli.perform_offline_decoding(loaded, eeg, eeg_sr, 10)
    assert spec.shape[1] == 40 and audio.dtype == np.int16
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    import configparser
    cfg = configparser.ConfigParser()
    cfg["General"] = {"storage_dir": str(tmp_path), "session": "run"}
    decode_cli.store_decoding_to_file(str(run_dir), cfg, spec, audio, received, sr)
    for f in ["decoding.png", "audio.wav", "sEEG.hdf", "spectrogram.npy", "decode.ini"]:
        assert (run_dir / f).exists()


def test_online_loopback_matches_offline(trained_session, tmp_path):
    session_dir, eeg, eeg_sr = trained_session
    loaded = params_io.load_params(os.path.join(session_dir, "params.h5"), dtype=jnp.float64)

    n_packets = len(eeg) // 32
    streamed = eeg[: n_packets * 32]

    # reference result: batch offline decode of exactly the streamed samples
    spec_ref, audio_ref, _, _ = decode_cli.perform_offline_decoding(loaded, streamed, eeg_sr, 10)

    import configparser
    cfg = configparser.ConfigParser()
    cfg["Decoding"] = {"stream_name": "dev_sEEG_t", "marker_stream_name": "Mk_t",
                       "griffin_lim_norm": "10"}
    run_dir = tmp_path / "online_run"
    run_dir.mkdir()

    stop = threading.Event()
    results = {}

    def run_decoder():
        results["out"] = decode_cli.perform_online_decoding(
            cfg, loaded, 10, str(run_dir), max_packets=n_packets, backend="nsx",
            dtype=jnp.float64)

    marker_stop = threading.Event()
    marker_thread = threading.Thread(
        target=dev_streamer.stream_fake_markers,
        kwargs={"interval": 0.6, "stream_name": "Mk_t", "stop_event": marker_stop,
                "backend": "nsx"})  # emit continuously until the decode ends
    dec_thread = threading.Thread(target=run_decoder)
    dec_thread.start()
    marker_thread.start()
    # streamer waits for the decoder's subscription, then pushes flat out
    dev_streamer.stream_eeg(streamed.astype(np.float32), eeg_sr, "dev_sEEG_t",
                            stop_event=stop, asap=True, backend="nsx",
                            wait_for_consumers=60.0)
    dec_thread.join(timeout=300)
    marker_stop.set()
    marker_thread.join(timeout=10)
    assert not dec_thread.is_alive(), "online decoder did not finish"

    spec_on, audio_on, received, sfreq = results["out"]
    assert sfreq == eeg_sr
    # received sEEG passthrough: exactly what was streamed (float32 cast)
    np.testing.assert_allclose(received, streamed.astype(np.float32), rtol=1e-6)
    assert spec_on.shape == spec_ref.shape
    np.testing.assert_allclose(spec_on, np.asarray(spec_ref), rtol=1e-9, atol=1e-10)
    assert np.abs(audio_on.astype(int) - np.asarray(audio_ref).astype(int)).max() <= 1

    # artifacts from the online path
    assert (run_dir / "first_timestamp.npy").exists()
    markers_path = run_dir / "markers.csv"
    assert markers_path.exists()
    lines = markers_path.read_text().strip().splitlines()
    assert any("start;" in line for line in lines)

    # the stored run is loadable as a DecodingRun once artifacts are complete
    from scipy.io.wavfile import write as wavwrite
    import h5py
    wavwrite(str(run_dir / "audio.wav"), 16000, audio_on)
    with h5py.File(run_dir / "sEEG.hdf", "w") as hf:
        hf.create_dataset("sEEG", data=received)
        hf.create_dataset("sEEG_sr", data=eeg_sr, dtype=np.int32)
    from closed_loop_seeg_speech_synthesis_tpu.io.session import DecodingRun
    dr = DecodingRun(str(run_dir))
    assert len(dr.words) >= 1


def test_pipelined_decoder_matches_blocking(trained_session):
    """Double-buffered host pipelining (dispatch packet k, materialize k-1)
    produces byte-identical results to the blocking path."""
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline
    from closed_loop_seeg_speech_synthesis_tpu.runtime.online import OnlineDecoder

    session_dir, eeg, eeg_sr = trained_session
    loaded = params_io.load_params(os.path.join(session_dir, "params.h5"), dtype=jnp.float64)
    cfg = pipeline.DecoderConfig(sr=float(eeg_sr), n_channels=3, gl_norm=10.0,
                                 dtype=jnp.float64)
    dec_params = pipeline.build_decoder_params(cfg, loaded["lda"], loaded["medians"],
                                               loaded["select"])
    packets = [eeg[i * 32 : (i + 1) * 32] for i in range(64)]

    outs = {}
    for pipelined in (False, True):
        d = OnlineDecoder(cfg, dec_params, bad_channels=loaded["bad_channels"],
                          key=jax.random.PRNGKey(0), pipelined=pipelined)
        for p in packets:
            d.process_packet(p)
        outs[pipelined] = d.results()

    spec_a, audio_a, recv_a = outs[False]
    spec_b, audio_b, recv_b = outs[True]
    np.testing.assert_array_equal(spec_a, spec_b)
    np.testing.assert_array_equal(audio_a, audio_b)
    np.testing.assert_array_equal(recv_a, recv_b)


def test_persistent_loop_matches_per_packet(trained_session):
    """The persistent device loop (one dispatch, io_callback I/O edges)
    produces bit-identical outputs to the per-packet OnlineDecoder."""
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline
    from closed_loop_seeg_speech_synthesis_tpu.runtime.online import (
        OnlineDecoder, PersistentOnlineDecoder)

    session_dir, eeg, eeg_sr = trained_session
    loaded = params_io.load_params(os.path.join(session_dir, "params.h5"), dtype=jnp.float64)
    cfg = pipeline.DecoderConfig(sr=float(eeg_sr), n_channels=3, gl_norm=10.0,
                                 dtype=jnp.float64)
    dec_params = pipeline.build_decoder_params(cfg, loaded["lda"], loaded["medians"],
                                               loaded["select"])
    packets = [eeg[i * 32 : (i + 1) * 32] for i in range(48)]

    ref = OnlineDecoder(cfg, dec_params, bad_channels=loaded["bad_channels"],
                        key=jax.random.PRNGKey(0))
    for p in packets:
        ref.process_packet(p)
    spec_a, audio_a, recv_a = ref.results()

    per = PersistentOnlineDecoder(cfg, dec_params, bad_channels=loaded["bad_channels"],
                                  key=jax.random.PRNGKey(0))
    for p in packets[:8]:
        per.feed_packet(p)
    # warmup after packets are queued: must neither consume them, emit
    # anything, nor advance streaming state (it compiles against a private
    # stop-sentinel queue)
    per.warmup()
    assert per.spec_frames == [] and per.audio_chunks == []
    for p in packets[8:]:
        per.feed_packet(p)
    per.feed_stop()
    spec_b, audio_b, recv_b = per.run_until_stopped()

    np.testing.assert_array_equal(spec_a, spec_b)
    np.testing.assert_array_equal(audio_a, audio_b)
    np.testing.assert_array_equal(recv_a, recv_b)

    # resumable: feeding more packets continues from the carried state
    more = [eeg[(48 + i) * 32 : (48 + i + 1) * 32] for i in range(8)]
    for p in more:
        per.feed_packet(p)
    per.feed_stop()
    spec_c, audio_c, _ = per.run_until_stopped()
    for p in more:
        ref.process_packet(p)
    spec_r, audio_r, _ = ref.results()
    np.testing.assert_array_equal(spec_c, spec_r)
    np.testing.assert_array_equal(audio_c, audio_r)


def test_persistent_loop_feeder_error_propagates(trained_session):
    """A feeder crash (e.g. malformed chunk) must release the device loop via
    the finally-feed_stop and re-raise in the caller, never hang."""
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline
    from closed_loop_seeg_speech_synthesis_tpu.runtime.online import PersistentOnlineDecoder

    session_dir, eeg, eeg_sr = trained_session
    loaded = params_io.load_params(os.path.join(session_dir, "params.h5"), dtype=jnp.float64)
    cfg = pipeline.DecoderConfig(sr=float(eeg_sr), n_channels=3, gl_norm=10.0,
                                 dtype=jnp.float64)
    dec_params = pipeline.build_decoder_params(cfg, loaded["lda"], loaded["medians"],
                                               loaded["select"])
    dec = PersistentOnlineDecoder(cfg, dec_params, bad_channels=loaded["bad_channels"],
                                  key=jax.random.PRNGKey(0))

    class BrokenInlet:
        channels = 4
        nominal_srate = eeg_sr

        def __init__(self):
            self.calls = 0

        def pull_chunk(self, max_samples=64, timeout=0.25):
            self.calls += 1
            if self.calls > 2:
                raise OSError("amplifier link dropped mid-read")
            return eeg[(self.calls - 1) * 32 : self.calls * 32].astype(np.float32), 1.0

    t0 = time.time()
    with pytest.raises(OSError, match="amplifier link"):
        dec.run_stream(BrokenInlet(), max_packets=64)
    assert time.time() - t0 < 120, "feeder crash must not hang the device loop"
    # the two packets decoded before the crash were still processed
    assert len(dec.received) == 2


def test_persistent_loop_run_stream_nsx(trained_session, tmp_path):
    """PersistentOnlineDecoder.run_stream over the native NSX transport."""
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline
    from closed_loop_seeg_speech_synthesis_tpu.runtime.online import PersistentOnlineDecoder

    session_dir, eeg, eeg_sr = trained_session
    loaded = params_io.load_params(os.path.join(session_dir, "params.h5"), dtype=jnp.float64)
    cfg = pipeline.DecoderConfig(sr=float(eeg_sr), n_channels=3, gl_norm=10.0,
                                 dtype=jnp.float64)
    dec_params = pipeline.build_decoder_params(cfg, loaded["lda"], loaded["medians"],
                                               loaded["select"])
    n_packets = 32
    streamed = eeg[: n_packets * 32].astype(np.float32)

    dec = PersistentOnlineDecoder(cfg, dec_params, bad_channels=loaded["bad_channels"],
                                  key=jax.random.PRNGKey(0))
    results = {}

    def run():
        results["out"] = dec.run_stream("dev_sEEG_p", max_packets=n_packets,
                                        backend="nsx")

    t = threading.Thread(target=run)
    t.start()
    dev_streamer.stream_eeg(streamed, eeg_sr, "dev_sEEG_p", asap=True,
                            backend="nsx", wait_for_consumers=60.0)
    t.join(timeout=300)
    assert not t.is_alive(), "persistent decoder did not finish"
    spec, audio, received = results["out"]
    np.testing.assert_allclose(received, streamed, rtol=1e-6)
    assert spec.shape[1] == 40 and audio.dtype == np.int16 and len(audio) > 0
