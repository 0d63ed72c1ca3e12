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


def test_channel_inspection(tmp_path):
    """Headless channel QC: railed/dead/line-dominated channels are flagged,
    artifacts written (substitute for train.py:328-334's interactive view)."""
    import numpy as np
    from closed_loop_seeg_speech_synthesis_tpu.io.inspection import (
        channel_stats, flag_suspects, inspect_channels)

    rng = np.random.RandomState(0)
    sr = 1024
    t = np.arange(10 * sr) / sr
    good = rng.randn(len(t), 4)
    railed = np.clip(5 * np.sin(2 * np.pi * 0.5 * t), -0.8, 0.8)[:, None]
    railed[np.abs(railed) >= 0.8] = 0.8           # long flat runs
    dead = np.full((len(t), 1), 1e-12)
    mains = (5.0 * np.sin(2 * np.pi * 50 * t))[:, None] + 0.01 * rng.randn(len(t), 1)
    eeg = np.hstack([good, railed, dead, mains])

    stats = channel_stats(eeg, sr, seconds=10, line_noise=50)
    sus = flag_suspects(stats)
    assert "railed" in sus.get(4, [])
    assert "dead" in sus.get(5, [])
    assert "line-dominated" in sus.get(6, [])
    assert all(i not in sus for i in range(4))

    png = tmp_path / "insp.png"
    csv = tmp_path / "report.csv"
    out = inspect_channels(eeg, sr, [f"ch{i}" for i in range(7)], [5],
                           str(png), str(csv), seconds=10)
    assert png.exists() and csv.exists()
    rows = open(csv).read().splitlines()
    assert rows[0].startswith("index,name,std")
    assert len(rows) == 8
    assert set(out) == set(sus)


def test_train_cli_inspection_artifact(tmp_path):
    """inspect_channels=True config writes channel_inspection.png before
    training."""
    import numpy as np
    from closed_loop_seeg_speech_synthesis_tpu.cli import train as train_cli
    from closed_loop_seeg_speech_synthesis_tpu.io import loaders

    rng = np.random.RandomState(3)
    sr, audio_sr = 1024, 48000
    eeg = rng.randn(10 * sr, 4)
    audio = 0.1 * rng.randn(10 * audio_sr)
    rec = tmp_path / "speech1.hdf"
    loaders.save_hdf5(str(rec), eeg, sr, audio, audio_sr,
                      ch_names=[f"A{i}" for i in range(4)])
    cfg = tmp_path / "exp.ini"
    cfg.write_text(f"""[General]
storage_dir = {tmp_path}/storage
session = insp
[Training]
file = {rec}
overwrite_on_rerun = True
inspect_channels = True
""")
    train_cli.main([str(cfg)])
    sess = tmp_path / "storage" / "insp"
    assert (sess / "channel_inspection.png").exists()
    assert (sess / "channel_report.csv").exists()
    assert (sess / "params.h5").exists()
