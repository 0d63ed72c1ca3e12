"""Audio sink coverage: streaming resampler numerics and the patient-facing
JACK/PyAudio sink classes driven through injected fake backend modules
(JackAudioSink.py / PyAudioSink.py semantics — no real audio server here)."""

import sys
import types

import numpy as np
import pytest

from closed_loop_seeg_speech_synthesis_tpu.runtime.audio import (
    BoundedBlockQueue, JackSink, PyAudioSink, StreamingResampler, make_sink)


# ---------------------------------------------------------------- resampler

def _sine(sr, f, n):
    return np.sin(2 * np.pi * f * np.arange(n) / sr).astype(np.float32)


@pytest.mark.parametrize("out_sr", [48000, 44100, 32000])
def test_resampler_sine_fidelity(out_sr):
    """16 kHz sine resampled to the device rate matches the ideal sine."""
    in_sr, f = 16000, 440.0
    x = _sine(in_sr, f, 16000)
    r = StreamingResampler(out_sr / in_sr)
    y = r.process(x)
    # expected continuous-time sine sampled at out_sr
    t = np.arange(len(y)) / (out_sr / in_sr)  # in input-sample units
    ref = np.sin(2 * np.pi * f * t / in_sr)
    # skip the warm-up edge (zero prehistory) and the tail
    m = slice(200, len(y) - 200)
    err = np.max(np.abs(y[m] - ref[m]))
    assert err < 5e-3, err
    # output length tracks the ratio
    assert abs(len(y) - len(x) * out_sr / in_sr) < 64


def test_resampler_chunk_invariance(rng):
    """Feeding the stream in arbitrary chunk splits yields identical output."""
    x = rng.randn(8000).astype(np.float32)
    whole = StreamingResampler(44100 / 16000).process(x)
    r = StreamingResampler(44100 / 16000)
    parts, i = [], 0
    while i < len(x):
        n = int(rng.randint(1, 500))
        parts.append(r.process(x[i : i + n]))
        i += n
    split = np.concatenate(parts)
    n = min(len(whole), len(split))
    np.testing.assert_allclose(split[:n], whole[:n], atol=1e-6)


def test_resampler_downsample_antialias():
    """Downsampling low-passes at the output Nyquist: a 7 kHz tone must be
    strongly attenuated at 8 kHz output rate (Nyquist 4 kHz)."""
    x = _sine(16000, 7000.0, 16000)
    y = StreamingResampler(0.5, half=32).process(x)
    assert np.sqrt(np.mean(y[500:-500] ** 2)) < 0.05 * np.sqrt(np.mean(x**2))


# ------------------------------------------------------------- fake backends

class _FakePort:
    def __init__(self, blocksize):
        self._buf = np.zeros(blocksize, np.float32)
        self.connections = []

    def get_array(self):
        return self._buf

    def connect(self, target):
        self.connections.append(target)


class _FakeOutports:
    def __init__(self, client):
        self._client = client

    def register(self, name):
        port = _FakePort(self._client.blocksize)
        self._client.ports.append(port)
        return port


class _FakeJackClient:
    instances = []

    def __init__(self, name):
        self.name = name
        self.samplerate = _FakeJackClient.server_rate
        self.blocksize = _FakeJackClient.server_blocksize
        self.ports = []
        self.outports = _FakeOutports(self)
        self.process_cb = None
        self.active = False
        _FakeJackClient.instances.append(self)

    def set_process_callback(self, fn):
        self.process_cb = fn
        return fn

    def activate(self):
        self.active = True

    def deactivate(self):
        self.active = False

    def close(self):
        pass

    def get_ports(self, is_physical=False, is_input=False, is_audio=False):
        return ["system:playback_1", "system:playback_2", "system:playback_3"]


@pytest.fixture
def fake_jack(monkeypatch):
    mod = types.ModuleType("jack")
    mod.Client = _FakeJackClient
    _FakeJackClient.instances = []
    _FakeJackClient.server_rate = 48000
    _FakeJackClient.server_blocksize = 256
    monkeypatch.setitem(sys.modules, "jack", mod)
    return mod


def test_jack_sink_resamples_and_plays(fake_jack):
    sink = JackSink(orig_sample_rate=16000)
    client = _FakeJackClient.instances[-1]
    assert client.active
    # mono port connected to exactly the first two physical playback ports
    port = client.ports[0]
    assert port.connections == ["system:playback_1", "system:playback_2"]

    # a full second of a 440 Hz int16 tone -> 3x as many samples queued/played
    tone = (0.5 * 32767 * _sine(16000, 440.0, 16000)).astype(np.int16)
    for i in range(0, len(tone), 512):
        sink.write(tone[i : i + 512])
    # drain through the process callback and reconstruct the playout
    out = []
    while len(sink.queue):
        client.process_cb(256)
        out.append(port.get_array().copy())
    played = np.concatenate(out)
    # duration ~1 s at 48 kHz, modulo queue drops (bounded at 8 blocks)
    assert len(played) >= 8 * 256
    # content is the resampled tone at the new rate (compare a mid slice)
    t = np.arange(len(played)) / 3.0
    ref = 0.5 * 32767 / 32768.0 * np.sin(2 * np.pi * 440.0 * t / 16000)
    # the queue drops blocks beyond 8 in flight, so only the first blocks
    # are contiguous; compare the first 4 blocks past the filter warm-up
    m = slice(256, 4 * 256)
    assert np.max(np.abs(played[m] - ref[m])) < 2e-2

    # underrun: empty queue -> silence + counted xrun
    client.process_cb(256)
    assert np.all(port.get_array() == 0.0)
    assert sink.queue.xruns == 1
    sink.close()
    assert not client.active


def test_jack_sink_fractional_441(fake_jack):
    _FakeJackClient.server_rate = 44100
    sink = JackSink(orig_sample_rate=16000)
    assert abs(sink._ratio - 2.75625) < 1e-12
    tone = (0.5 * 32767 * _sine(16000, 300.0, 8000)).astype(np.int16)
    sink.write(tone)
    client = _FakeJackClient.instances[-1]
    n_blocks = len(sink.queue)
    assert n_blocks > 0
    client.process_cb(256)
    assert np.any(client.ports[0].get_array() != 0)
    with pytest.raises(ValueError):
        JackSink(orig_sample_rate=16000, allow_fractional_resample=False)
    sink.close()


def test_jack_sink_drop_policy(fake_jack):
    """Blocks beyond max_blocks in flight are dropped, not queued (latency
    over completeness, JackAudioSink.py:111-118)."""
    sink = JackSink(orig_sample_rate=16000, max_blocks=8)
    sink.write(np.ones(16000, np.int16))  # 3 s of device-rate audio at once
    assert len(sink.queue) == 8
    assert sink.queue.dropped_blocks > 0
    sink.close()


class _FakePaStream:
    def __init__(self, callback, frames):
        self.callback = callback
        self.frames = frames
        self.stopped = False

    def stop_stream(self):
        self.stopped = True

    def close(self):
        pass


class _FakePyAudio:
    paInt16 = 8
    paContinue = 0

    class PyAudio:
        def open(self, format=None, channels=None, rate=None, output=None,
                 frames_per_buffer=None, stream_callback=None):
            self.stream = _FakePaStream(stream_callback, frames_per_buffer)
            return self.stream

        def terminate(self):
            pass


@pytest.fixture
def fake_pyaudio(monkeypatch):
    mod = types.ModuleType("pyaudio")
    mod.paInt16 = _FakePyAudio.paInt16
    mod.paContinue = _FakePyAudio.paContinue
    mod.PyAudio = _FakePyAudio.PyAudio
    monkeypatch.setitem(sys.modules, "pyaudio", mod)
    return mod


def test_pyaudio_sink_callback(fake_pyaudio):
    sink = PyAudioSink(orig_sample_rate=16000, block_size=128)
    sink.write(np.arange(300, dtype=np.int16))
    cb = sink._stream.callback
    data, flag = cb(None, 128, None, None)
    np.testing.assert_array_equal(np.frombuffer(data, np.int16),
                                  np.arange(128, dtype=np.int16))
    data, flag = cb(None, 128, None, None)
    np.testing.assert_array_equal(np.frombuffer(data, np.int16),
                                  np.arange(128, 256, dtype=np.int16))
    # underrun -> silence
    data, flag = cb(None, 128, None, None)
    assert np.all(np.frombuffer(data, np.int16) == 0)
    sink.close()
    assert sink._stream.stopped


def test_make_sink_prefers_jack(fake_jack):
    sink = make_sink("auto")
    assert isinstance(sink, JackSink)
    sink.close()


def test_bounded_queue_float_dtype():
    q = BoundedBlockQueue(4, 2, dtype=np.float32)
    q.push(np.linspace(0, 1, 10, dtype=np.float32))
    b = q.pop()
    assert b.dtype == np.float32
    np.testing.assert_allclose(b, np.linspace(0, 1, 10)[:4], atol=1e-6)
