"""Audio output sinks with the reference's latency policy.

The reference plays decoded int16 audio through JACK on Linux or PortAudio
on Windows, handing blocks to the realtime callback through a bounded pipe
that DROPS blocks beyond 8 in flight (latency over completeness,
JackAudioSink.py:30-32,111-118) and counts xruns (JackAudioSink.py:72-78).

Here the queueing/drop/xrun policy lives in ``BoundedBlockQueue`` shared by
every backend; concrete sinks are selected by availability: ``jack`` /
``pyaudio`` when importable (they are not in this image), a ``WavFileSink``
for headless runs, or ``NullSink``.
"""

from __future__ import annotations

import collections
import logging
import threading

import numpy as np

logger = logging.getLogger("runtime.audio")


class BoundedBlockQueue:
    """Reblocks an int16 sample stream into fixed blocks; at most
    ``max_blocks`` queued, overflow dropped and counted."""

    def __init__(self, block_size: int = 256, max_blocks: int = 8):
        self.block_size = block_size
        self.max_blocks = max_blocks
        self._accum = np.zeros(0, np.int16)
        self._q = collections.deque()
        self._lock = threading.Lock()
        self.dropped_blocks = 0
        self.xruns = 0

    def push(self, samples: np.ndarray) -> None:
        self._accum = np.concatenate([self._accum, np.asarray(samples, np.int16)])
        while len(self._accum) >= self.block_size:
            block, self._accum = self._accum[: self.block_size], self._accum[self.block_size :]
            with self._lock:
                if len(self._q) >= self.max_blocks:
                    self.dropped_blocks += 1
                else:
                    self._q.append(block)

    def pop(self):
        """Called from the audio callback; None on underrun (counted)."""
        with self._lock:
            if not self._q:
                self.xruns += 1
                return None
            return self._q.popleft()

    def __len__(self):
        with self._lock:
            return len(self._q)


class NullSink:
    def __init__(self, *a, **k):
        self.queue = BoundedBlockQueue()

    def write(self, samples):
        pass

    def close(self):
        pass


class BufferSink:
    """Collects everything (tests / headless runs)."""

    def __init__(self, *a, **k):
        self.chunks = []

    def write(self, samples):
        self.chunks.append(np.asarray(samples, np.int16))

    def audio(self):
        return np.concatenate(self.chunks) if self.chunks else np.zeros(0, np.int16)

    def close(self):
        pass


class WavFileSink:
    """Streams to a wav file incrementally."""

    def __init__(self, path, sample_rate=16000):
        import wave

        self._w = wave.open(path, "wb")
        self._w.setnchannels(1)
        self._w.setsampwidth(2)
        self._w.setframerate(sample_rate)

    def write(self, samples):
        self._w.writeframes(np.asarray(samples, np.int16).tobytes())

    def close(self):
        self._w.close()


class JackSink:
    """JACK playout (Linux lab machines); requires the ``jack`` module +
    ``samplerate`` for device-rate resampling, mirroring JackAudioSink.py."""

    def __init__(self, orig_sample_rate=16000, block_size=256, max_blocks=8):
        import jack  # noqa: F401 — raises if unavailable, caller falls back

        self.queue = BoundedBlockQueue(block_size, max_blocks)
        self._client = __import__("jack").Client("seeg_synth")
        self._out = self._client.outports.register("out_0")
        self._ratio = self._client.samplerate / float(orig_sample_rate)

        @self._client.set_process_callback
        def process(frames):  # pragma: no cover — needs a JACK server
            block = self.queue.pop()
            buf = self._out.get_array()
            if block is None:
                buf[:] = 0.0
            else:
                n = min(len(buf), len(block))
                buf[:n] = block[:n].astype(np.float32) / 32768.0

        self._client.activate()

    def write(self, samples):
        self.queue.push(samples)

    def close(self):
        self._client.deactivate()
        self._client.close()


class PyAudioSink:
    """PortAudio playout (the reference's Windows path, PyAudioSink.py):
    same bounded-drop queue feeding the stream callback."""

    def __init__(self, orig_sample_rate=16000, block_size=256, max_blocks=8):
        import pyaudio  # raises if unavailable, caller falls back

        self.queue = BoundedBlockQueue(block_size, max_blocks)
        self._pa = pyaudio.PyAudio()

        def callback(in_data, frame_count, time_info, status):  # pragma: no cover
            block = self.queue.pop()
            if block is None:
                return (np.zeros(frame_count, np.int16).tobytes(), pyaudio.paContinue)
            return (block.tobytes(), pyaudio.paContinue)

        self._stream = self._pa.open(format=pyaudio.paInt16, channels=1,
                                     rate=orig_sample_rate, output=True,
                                     frames_per_buffer=block_size,
                                     stream_callback=callback)

    def write(self, samples):
        self.queue.push(samples)

    def close(self):
        self._stream.stop_stream()
        self._stream.close()
        self._pa.terminate()


def make_sink(kind: str = "auto", wav_path=None, sample_rate=16000):
    """Best available sink: jack -> pyaudio -> wav -> null
    (mirrors decode.py:170-181 platform dispatch, availability-gated)."""
    if kind in ("auto", "jack"):
        try:
            return JackSink(orig_sample_rate=sample_rate)
        except Exception as e:
            if kind == "jack":
                raise
            logger.info("JACK unavailable (%s)", e)
    if kind in ("auto", "pyaudio"):
        try:
            return PyAudioSink(orig_sample_rate=sample_rate)
        except Exception as e:
            if kind == "pyaudio":
                raise
            logger.info("PyAudio unavailable (%s)", e)
    if kind in ("auto", "wav") and wav_path:
        return WavFileSink(wav_path, sample_rate)
    if kind == "buffer":
        return BufferSink()
    return NullSink()
