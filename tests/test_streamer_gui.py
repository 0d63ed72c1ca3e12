"""Dev streamer pacing + experiment GUI marker protocol over NSX."""

import os
import threading
import time

import numpy as np

os.environ.setdefault("NSX_REGISTRY_DIR", "/tmp/nsx_pytest")

from closed_loop_seeg_speech_synthesis_tpu.cli import dev_streamer, experiment_gui
from closed_loop_seeg_speech_synthesis_tpu.runtime.streams import StreamInlet


def test_streamer_realtime_pacing(rng):
    """Wall-clock pacing: 1 s of data takes ~1 s to stream (drift-corrected,
    dev_lsl_streamer.py:79-89)."""
    sr = 1024
    eeg = rng.randn(sr, 3).astype(np.float32)  # 1 second
    stop = threading.Event()
    results = {}

    def consume():
        inlet = StreamInlet("pace_t", timeout=10.0, backend="nsx")
        n = 0
        while n < sr:
            chunk, _ = inlet.pull_chunk(256, timeout=2.0)
            if chunk.shape[0] == 0:
                break
            n += chunk.shape[0]
        results["n"] = n

    t = threading.Thread(target=consume)
    t.start()
    t0 = time.perf_counter()
    sent = dev_streamer.stream_eeg(eeg, sr, "pace_t", stop_event=stop,
                                   asap=False, backend="nsx", wait_for_consumers=10.0)
    elapsed = time.perf_counter() - t0
    t.join(timeout=10)
    assert sent == sr
    assert results.get("n") == sr
    assert 0.9 < elapsed < 2.0, f"pacing off: {elapsed:.2f}s for 1s of data"


def test_experiment_gui_marker_protocol():
    """Headless stimulus run emits the reference marker protocol
    (singleWords.py:34-62)."""
    seen = []
    done = threading.Event()

    def listen():
        inlet = StreamInlet("gui_mk_t", timeout=10.0, backend="nsx")
        while not done.is_set() or True:
            label, ts = inlet.pull_string(timeout=1.0)
            if label is None:
                if done.is_set():
                    return
                continue
            seen.append(label)
            if label == "experimentEnded":
                return

    t = threading.Thread(target=listen)
    t.start()
    words = experiment_gui.run_experiment(["boom", "vis"], n_trials=3,
                                          word_seconds=0.05, cross_seconds=0.02,
                                          stream_name="gui_mk_t", backend="nsx",
                                          gui=False, seed=1, wait_for_consumers=10.0)
    done.set()
    t.join(timeout=10)
    assert len(words) == 3
    assert seen[0] == "experimentStarted" and seen[-1] == "experimentEnded"
    starts = [s for s in seen if s.startswith("start;")]
    ends = [s for s in seen if s.startswith("end;")]
    assert len(starts) == 3 and len(ends) == 3
    assert all(s[6:] in ("boom", "vis") for s in starts)
