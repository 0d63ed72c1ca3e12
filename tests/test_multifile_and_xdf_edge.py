"""Multi-recording training (train.py:284-311) and XDF edge cases."""

import configparser
import struct

import numpy as np
import pytest

from closed_loop_seeg_speech_synthesis_tpu.cli import train as train_cli
from closed_loop_seeg_speech_synthesis_tpu.io import loaders, xdf


def test_train_cli_multifile(tmp_path, rng):
    eeg_sr, audio_sr = 1024, 48000
    files = []
    for i in range(2):
        T = 3 * eeg_sr
        eeg = rng.randn(T, 4).astype(np.float32)
        audio = (0.1 * rng.randn(3 * audio_sr + i * 7)).astype(np.float32)  # length mismatch
        path = tmp_path / f"rec{i}.hdf"
        loaders.save_hdf5(str(path), eeg, eeg_sr, audio, audio_sr,
                          ch_names=["A1", "A2", "A3", "A4"])
        files.append(str(path))

    cfg_path = tmp_path / "exp.ini"
    cfg = configparser.ConfigParser()
    cfg["General"] = {"storage_dir": str(tmp_path / "st"), "session": "mf"}
    cfg["Training"] = {"file": ",".join(files), "power_line": "50",
                       "channels": "A[0-9]*", "show_interactive_channel_view": "False",
                       "overwrite_on_rerun": "True", "draw_plots": "False"}
    with open(cfg_path, "w") as f:
        cfg.write(f)
    path = train_cli.main([str(cfg_path)])
    import h5py
    with h5py.File(path, "r") as hf:
        assert hf["medians_array"].shape == (40, 9)
        assert len(hf["select"]) == 20  # 5 taps x 4 channels, capped by dim


def _varlen(n):
    return bytes([1, n]) if n < 256 else bytes([4]) + struct.pack("<I", n)


def _chunk(tag, content):
    body = struct.pack("<H", tag) + content
    return _varlen(len(body)) + body


def test_xdf_boundary_and_deduced_timestamps(tmp_path):
    """Boundary chunks skipped; omitted timestamps deduced at nominal rate."""
    xml = ("<info><name>S</name><type>EEG</type><channel_count>2</channel_count>"
           "<nominal_srate>100</nominal_srate><channel_format>float32</channel_format>"
           "<created_at>0</created_at></info>")
    blob = b"XDF:" + _chunk(1, b"<info/>") + _chunk(2, struct.pack("<I", 7) + xml.encode())
    blob += _chunk(5, b"\x00" * 16)  # boundary
    # 4 samples: explicit ts on the first only
    payload = struct.pack("<I", 7) + _varlen(4)
    data = np.arange(8, dtype="<f4").reshape(4, 2)
    payload += bytes([8]) + struct.pack("<d", 10.0) + data[0].tobytes()
    for row in data[1:]:
        payload += bytes([0]) + row.tobytes()
    blob += _chunk(3, payload)
    blob += _chunk(6, struct.pack("<I", 7) + b"<info><sample_count>4</sample_count></info>")
    p = tmp_path / "e.xdf"
    p.write_bytes(blob)

    streams, hdr = xdf.load_xdf(str(p), synchronize_clocks=False, dejitter_timestamps=False)
    s = streams[0]
    np.testing.assert_allclose(s["time_stamps"], [10.0, 10.01, 10.02, 10.03])
    np.testing.assert_allclose(np.asarray(s["time_series"]), data)
    assert "footer" in s["info"]
