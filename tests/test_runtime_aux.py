"""Auxiliary runtime subsystems: audio queue policy, tracing, figures."""

import numpy as np

from closed_loop_seeg_speech_synthesis_tpu.runtime.audio import BoundedBlockQueue, BufferSink, WavFileSink
from closed_loop_seeg_speech_synthesis_tpu.runtime.tracing import StageTracer


def test_bounded_queue_drop_policy():
    """<= 8 blocks in flight, excess dropped (JackAudioSink.py:111-118)."""
    q = BoundedBlockQueue(block_size=256, max_blocks=8)
    q.push(np.ones(256 * 12, np.int16))
    assert len(q) == 8
    assert q.dropped_blocks == 4
    # drain; underruns counted as xruns (JackAudioSink.py:72-78)
    for _ in range(8):
        assert q.pop() is not None
    assert q.pop() is None
    assert q.xruns == 1


def test_queue_reblocking():
    q = BoundedBlockQueue(block_size=100, max_blocks=8)
    q.push(np.arange(50, dtype=np.int16))
    assert len(q) == 0  # partial block accumulates
    q.push(np.arange(50, 150, dtype=np.int16))
    assert len(q) == 1
    np.testing.assert_array_equal(q.pop(), np.arange(100, dtype=np.int16))


def test_wav_sink(tmp_path):
    path = str(tmp_path / "x.wav")
    s = WavFileSink(path, 16000)
    s.write(np.ones(1600, np.int16) * 1000)
    s.close()
    from scipy.io import wavfile
    sr, data = wavfile.read(path)
    assert sr == 16000 and len(data) == 1600 and data[0] == 1000


def test_stage_tracer():
    tr = StageTracer(enabled=True)
    import time
    for _ in range(5):
        tr.mark("in")
        time.sleep(0.002)
        tr.mark("out")
    info = tr.get_timing_info()
    assert set(info) == {"in", "out"} and len(info["in"]) == 5
    p = tr.percentiles("in", "out")
    assert 0.001 < p[50] < 0.1 and p[99] >= p[50]


def test_figures_smoke(tmp_path, rng):
    """figure_3 on synthetic exp1 artifacts."""
    import os
    from closed_loop_seeg_speech_synthesis_tpu.eval.figures import figure_3

    orig = rng.randn(1500, 40)
    reco = orig + rng.randn(1500, 40)
    np.save(tmp_path / "orig.npy", orig)
    np.save(tmp_path / "pm_reco.npy", reco)
    for i in (1, 2):
        np.save(tmp_path / f"rc_reco_i={i:03}.npy", rng.randn(1500, 40))
    out = tmp_path / "fig3.png"
    stats = figure_3(str(tmp_path), str(out), n_chance_runs=2)
    assert out.exists()
    assert len(stats) == 40 and all(np.isfinite(s[2]) for s in stats)
