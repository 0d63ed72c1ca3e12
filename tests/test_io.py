"""IO: XDF parser against a spec-conformant writer; HDF5 + session accessors."""

import struct

import numpy as np
import pytest

from closed_loop_seeg_speech_synthesis_tpu.io import loaders, session as session_mod, utils, xdf


# ------------------------------ XDF writer --------------------------------


def _varlen(n):
    if n < 256:
        return bytes([1, n])
    return bytes([4]) + struct.pack("<I", n)


def _chunk(tag, content):
    body = struct.pack("<H", tag) + content
    return _varlen(len(body)) + body


def _stream_header(sid, name, stype, channels, srate, fmt, ch_labels=None):
    ch_xml = ""
    if ch_labels:
        ch_xml = "<desc><channels>" + "".join(f"<channel><label>{c}</label></channel>" for c in ch_labels) + "</channels></desc>"
    xml = (f"<info><name>{name}</name><type>{stype}</type>"
           f"<channel_count>{channels}</channel_count>"
           f"<nominal_srate>{srate}</nominal_srate>"
           f"<channel_format>{fmt}</channel_format>"
           f"<created_at>0.0</created_at>{ch_xml}</info>")
    return _chunk(2, struct.pack("<I", sid) + xml.encode())


def _numeric_samples(sid, data, t0, srate, ts_every=64, jitter=None):
    """Sample chunk: explicit timestamp every ts_every samples, deduced rest.
    ``jitter``: optional per-explicit-stamp offsets (recording jitter)."""
    out = struct.pack("<I", sid) + _varlen(len(data))
    parts = [out]
    for i, row in enumerate(data):
        if i % ts_every == 0:
            t = t0 + i / srate
            if jitter is not None:
                t += float(jitter[(i // ts_every) % len(jitter)])
            parts.append(bytes([8]) + struct.pack("<d", t))
        else:
            parts.append(bytes([0]))
        parts.append(np.asarray(row, "<f4").tobytes())
    return _chunk(3, b"".join(parts))


def _string_samples(sid, items):
    parts = [struct.pack("<I", sid), _varlen(len(items))]
    for t, s in items:
        parts.append(bytes([8]) + struct.pack("<d", t))
        b = s.encode()
        parts.append(_varlen(len(b)) + b)
    return _chunk(3, b"".join(parts))


def write_test_xdf(path, eeg, eeg_sr, audio, audio_sr, markers, ch_labels):
    blob = b"XDF:"
    blob += _chunk(1, b"<info><version>1.0</version></info>")
    blob += _stream_header(1, "Micromed", "EEG", eeg.shape[1], eeg_sr, "float32", ch_labels)
    blob += _stream_header(2, "AudioCaptureWin", "Audio", 1, audio_sr, "float32")
    blob += _stream_header(3, "SingleWordsMarkerStream", "Markers", 1, 0, "string")
    # clock offsets for stream 1 (constant small offset)
    for t in (0.0, 5.0, 10.0):
        blob += _chunk(4, struct.pack("<I", 1) + struct.pack("<dd", t, 0.25))
    half = len(eeg) // 2
    blob += _numeric_samples(1, eeg[:half], 100.0, eeg_sr)
    blob += _numeric_samples(1, eeg[half:], 100.0 + half / eeg_sr, eeg_sr)
    blob += _numeric_samples(2, audio[:, None], 100.0, audio_sr, ts_every=256)
    blob += _string_samples(3, markers)
    with open(path, "wb") as f:
        f.write(blob)


@pytest.fixture
def xdf_file(tmp_path, rng):
    eeg_sr, audio_sr = 1024, 48000
    dur = 3.0
    eeg = rng.randn(int(eeg_sr * dur), 4).astype(np.float32)
    audio = (0.1 * rng.randn(int(audio_sr * dur))).astype(np.float32)
    markers = [(100.5, "experimentStarted"), (100.8, "start;hallo"),
               (102.0, "end;hallo"), (102.5, "experimentEnded")]
    labels = ["A1", "A2", "B1", "B2"]
    path = str(tmp_path / "rec.xdf")
    write_test_xdf(path, eeg, eeg_sr, audio, audio_sr, markers, labels)
    return path, eeg, audio, markers, labels


def test_xdf_parse_streams(xdf_file):
    path, eeg, audio, markers, labels = xdf_file
    streams, header = xdf.load_xdf(path, synchronize_clocks=False, dejitter_timestamps=False)
    by_name = {s["info"]["name"][0]: s for s in streams}
    assert set(by_name) == {"Micromed", "AudioCaptureWin", "SingleWordsMarkerStream"}
    mm = by_name["Micromed"]
    np.testing.assert_allclose(np.asarray(mm["time_series"]), eeg, rtol=1e-6)
    np.testing.assert_allclose(mm["time_stamps"][0], 100.0)
    np.testing.assert_allclose(np.diff(mm["time_stamps"]), 1.0 / 1024, atol=1e-9)
    got_labels = [c["label"][0] for c in mm["info"]["desc"][0]["channels"][0]["channel"]]
    assert got_labels == labels
    mk = by_name["SingleWordsMarkerStream"]
    assert [m[0] for m in mk["time_series"]] == [m[1] for m in markers]


def test_xdf_clock_sync(xdf_file):
    path, *_ = xdf_file
    streams, _ = xdf.load_xdf(path, synchronize_clocks=True, dejitter_timestamps=True)
    mm = [s for s in streams if s["info"]["name"][0] == "Micromed"][0]
    np.testing.assert_allclose(mm["time_stamps"][0], 100.25, atol=1e-6)  # +0.25 offset


def test_xdf_recording_loader(xdf_file):
    path, eeg, audio, markers, labels = xdf_file
    out = loaders.load_xdf_recording(path, return_markers=True)
    eeg_c, eeg_sr, audio_c, audio_sr, ch_names, mks = out
    assert ch_names == labels
    assert eeg_sr == 1024 and audio_sr == 48000
    # cut spans experimentStarted..experimentEnded (~2 s of 3 s)
    assert 1.8 * 1024 < len(eeg_c) < 2.2 * 1024
    assert 1.8 * 48000 < len(audio_c) < 2.2 * 48000
    assert [m[0] for m in mks][:2] == ["experimentStarted", "start;hallo"]


def test_hdf5_roundtrip_and_session(tmp_path, rng):
    eeg_sr, audio_sr = 1024, 48000
    n_words = 4
    eeg = rng.randn(3 * n_words * eeg_sr, 5)
    audio = 0.1 * rng.randn(3 * n_words * audio_sr)
    markers = [["experimentStarted"]]
    for w in ["aa", "bb", "cc", "dd"]:
        markers += [[f"start;{w}"], [f"end;{w}"]]
    markers += [["experimentEnded"]]
    sdir = tmp_path / "sess"
    sdir.mkdir()
    loaders.save_hdf5(str(sdir / "speech1.hdf"), eeg, eeg_sr, audio, audio_sr,
                      ch_names=[f"c{i}" for i in range(5)], markers=markers)

    out = loaders.load_hdf5(str(sdir / "speech1.hdf"), return_markers=True)
    assert out[1] == eeg_sr and out[3] == audio_sr
    np.testing.assert_allclose(out[0], eeg)

    sess = session_mod.Session(str(sdir), rng=np.random.RandomState(0))
    assert sess.words == ["aa", "bb", "cc", "dd"]
    w, e, a = sess.get_trial_by_index(1)
    assert w == "bb" and e.shape == (2 * eeg_sr, 5) and a.shape == (2 * 16000,)
    w2, e2, a2 = sess.get_trial_by_word("bb")
    np.testing.assert_allclose(e2, e)


def test_channel_selection_and_audio_squeeze(rng):
    names = ["LFP1", "LFP2", "EKG", "M1", "M2"]
    assert utils.select_channels(names, ["LFP[0-9]*", "M1"]) == ["LFP1", "LFP2", "M1"]
    ints = (rng.randn(100) * 1000).astype(np.int16)
    out = utils.squeeze_audio_to_float64(ints)
    assert out.dtype == np.float64 and np.abs(out).max() <= 1.0


def test_xdf_clock_reset_segments(tmp_path, rng):
    """A mid-recording computer restart (source clock resets to ~0, offset
    series glitches) gets per-segment offset fits: corrected timestamps are
    continuous in recorder time (local/xdf.py:439-526 semantics)."""
    sr = 256
    eeg1 = rng.randn(512, 2).astype(np.float32)   # 2 s before the reset
    eeg2 = rng.randn(512, 2).astype(np.float32)   # 2 s after the reset
    blob = b"XDF:" + _chunk(1, b"<info><version>1.0</version></info>")
    blob += _stream_header(1, "Micromed", "EEG", 2, sr, "float32")
    # segment 1: source clock at ~1000, offset +5 (recorder = source + 5)
    for t in (1000.0, 1001.0, 1002.0):
        blob += _chunk(4, struct.pack("<I", 1) + struct.pack("<dd", t, 5.0))
    blob += _numeric_samples(1, eeg1, 1000.0, sr)
    # reset: source clock restarts near 0; recorder kept running, so the
    # offset jumps to ~1007 (recorder = source + 1007).  Measurement times
    # jump backwards (time glitch) and the offset jumps by ~1002 s
    # (value glitch via the large-jump branch) -> reset detected.
    for t in (1.0, 2.0, 3.0):
        blob += _chunk(4, struct.pack("<I", 1) + struct.pack("<dd", t, 1007.0))
    blob += _numeric_samples(1, eeg2, 1.0, sr)
    path = str(tmp_path / "reset.xdf")
    with open(path, "wb") as f:
        f.write(blob)

    streams, _ = xdf.load_xdf(path)
    ts = streams[0]["time_stamps"]
    assert len(ts) == 1024
    # segment 1 maps 1000 -> 1005; segment 2 maps 1 -> 1008
    np.testing.assert_allclose(ts[0], 1005.0, atol=1e-6)
    np.testing.assert_allclose(ts[512], 1008.0, atol=1e-6)
    # recorder-time is monotone across the whole recording after correction
    assert np.all(np.diff(ts) > 0)

    # without reset handling the single global fit corrupts both halves
    streams_off, _ = xdf.load_xdf(path, handle_clock_resets=False)
    ts_off = streams_off[0]["time_stamps"]
    assert not np.all(np.diff(ts_off) > 0) or abs(ts_off[0] - 1005.0) > 0.5


def test_xdf_sync_order_golden(tmp_path, rng):
    """Drift + clock reset + timestamp jitter simultaneously: our
    dejitter-before-sync order equals the pyxdf order (sync first, then
    dejitter; reference local/xdf.py:439-571) and both recover the known
    ground-truth recorder timestamps.

    Why equality holds: per clock segment the sync is one affine map
    ts -> ts + a + b*(ts - t0), and the de-jitter is a least-squares
    projection whose design matrix includes an intercept — projections with
    intercept commute with affine maps of the data, so the two orders agree
    exactly as long as both split segments at the same reset boundaries
    (both split at backwards timestamp jumps).  This test pins that
    equivalence on the nastiest fixture instead of leaving it to argument.
    """
    sr = 256
    n1, n2 = 1024, 768
    eeg1 = rng.randn(n1, 2).astype(np.float32)
    eeg2 = rng.randn(n2, 2).astype(np.float32)
    jit1 = (rng.rand(n1 // 16 + 1) - 0.5) * 0.004   # +-2 ms recording jitter
    jit2 = (rng.rand(n2 // 16 + 1) - 0.5) * 0.004

    blob = b"XDF:" + _chunk(1, b"<info><version>1.0</version></info>")
    blob += _stream_header(1, "Micromed", "EEG", 2, sr, "float32")
    # clock segment A: offset 5.0 with 100 ppm drift (recorder runs fast)
    for t in (1000.0, 1001.0, 1002.0, 1003.0, 1004.0):
        blob += _chunk(4, struct.pack("<I", 1) + struct.pack("<dd", t, 5.0 + 1e-4 * (t - 1000.0)))
    blob += _numeric_samples(1, eeg1, 1000.0, sr, ts_every=16, jitter=jit1)
    # reset: source clock restarts near 1; offset jumps to ~1008 with its
    # own (different) drift
    for t in (1.0, 2.0, 3.0, 4.0):
        blob += _chunk(4, struct.pack("<I", 1) + struct.pack("<dd", t, 1008.0 + 5e-5 * (t - 1.0)))
    blob += _numeric_samples(1, eeg2, 1.0, sr, ts_every=16, jitter=jit2)
    path = str(tmp_path / "nasty.xdf")
    with open(path, "wb") as f:
        f.write(blob)

    # ground truth recorder-time stamps
    src1 = 1000.0 + np.arange(n1) / sr
    src2 = 1.0 + np.arange(n2) / sr
    truth = np.concatenate([src1 + 5.0 + 1e-4 * (src1 - 1000.0),
                            src2 + 1008.0 + 5e-5 * (src2 - 1.0)])

    streams, _ = xdf.load_xdf(path)          # dejitter -> sync (our order)
    ts_ours = streams[0]["time_stamps"]
    assert len(ts_ours) == n1 + n2

    # pyxdf order: sync first on RAW timestamps, then dejitter
    raw, _ = xdf.load_xdf(path, synchronize_clocks=False, dejitter_timestamps=False)
    ts_raw = raw[0]["time_stamps"]

    class _Shim:
        clock_times = [1000.0, 1001.0, 1002.0, 1003.0, 1004.0, 1.0, 2.0, 3.0, 4.0]
        clock_values = [5.0 + 1e-4 * (t - 1000.0) for t in (1000.0, 1001.0, 1002.0, 1003.0, 1004.0)] + \
                       [1008.0 + 5e-5 * (t - 1.0) for t in (1.0, 2.0, 3.0, 4.0)]

    ts_ref = xdf._dejitter(xdf._apply_clock_sync(_Shim(), ts_raw, True), sr)

    # Across a reset the orders are NOT bit-identical: sync-first erases the
    # backwards jump, so the subsequent de-jitter fits ONE line across the
    # reset's slope change (pyxdf behavior); dejitter-first keeps the
    # segments separate.  The divergence is bounded by the reset kink
    # (sub-ms here); both orders must recover ground truth below the
    # injected +-2 ms jitter.
    err_ours = np.max(np.abs(ts_ours - truth))
    err_ref = np.max(np.abs(ts_ref - truth))
    assert err_ours < 1e-3, err_ours
    assert err_ref < 1e-3, err_ref
    assert np.max(np.abs(ts_ours - ts_ref)) < 1e-3
    assert np.all(np.diff(ts_ours) > 0)


def test_xdf_sync_order_commutes_without_reset(tmp_path, rng):
    """Drift + jitter, NO reset: dejitter-before-sync == sync-before-dejitter
    exactly (the de-jitter projection has an intercept column, so it commutes
    with the affine clock map; see test_xdf_sync_order_golden for the reset
    case where the orders legitimately diverge)."""
    sr = 256
    n = 1024
    eeg = rng.randn(n, 2).astype(np.float32)
    jit = (rng.rand(n // 16 + 1) - 0.5) * 0.004

    blob = b"XDF:" + _chunk(1, b"<info><version>1.0</version></info>")
    blob += _stream_header(1, "Micromed", "EEG", 2, sr, "float32")
    cts = (1000.0, 1001.0, 1002.0, 1003.0, 1004.0)
    for t in cts:
        blob += _chunk(4, struct.pack("<I", 1) + struct.pack("<dd", t, 5.0 + 1e-4 * (t - 1000.0)))
    blob += _numeric_samples(1, eeg, 1000.0, sr, ts_every=16, jitter=jit)
    path = str(tmp_path / "drift.xdf")
    with open(path, "wb") as f:
        f.write(blob)

    streams, _ = xdf.load_xdf(path)
    ts_ours = streams[0]["time_stamps"]
    raw, _ = xdf.load_xdf(path, synchronize_clocks=False, dejitter_timestamps=False)

    class _Shim:
        clock_times = list(cts)
        clock_values = [5.0 + 1e-4 * (t - 1000.0) for t in cts]

    ts_ref = xdf._dejitter(xdf._apply_clock_sync(_Shim(), raw[0]["time_stamps"], True), sr)
    np.testing.assert_allclose(ts_ours, ts_ref, rtol=0, atol=1e-9)

    src = 1000.0 + np.arange(n) / sr
    truth = src + 5.0 + 1e-4 * (src - 1000.0)
    assert np.max(np.abs(ts_ours - truth)) < 5e-4


def test_xdfz_gzip_roundtrip(tmp_path, rng):
    """.xdfz (gzipped) containers open transparently."""
    import gzip

    eeg_sr, audio_sr = 1024, 48000
    eeg = rng.randn(1024, 4).astype(np.float32)
    audio = (0.1 * rng.randn(48000)).astype(np.float32)
    markers = [(100.5, "experimentStarted"), (102.0, "experimentEnded")]
    plain = str(tmp_path / "rec.xdf")
    write_test_xdf(plain, eeg, eeg_sr, audio, audio_sr, markers, ["A1", "A2", "B1", "B2"])
    zpath = str(tmp_path / "rec.xdfz")
    with open(plain, "rb") as f, gzip.open(zpath, "wb") as g:
        g.write(f.read())

    sp, _ = xdf.load_xdf(plain)
    sz, _ = xdf.load_xdf(zpath)
    for a, b in zip(sp, sz):
        np.testing.assert_array_equal(a["time_stamps"], b["time_stamps"])
        if isinstance(a["time_series"], np.ndarray):
            np.testing.assert_array_equal(a["time_series"], b["time_series"])


def test_native_scanner_parity(xdf_file):
    """libxdfscan.so sample walk == pure-Python parser, byte for byte
    (explicit + deduced timestamps, multi-chunk streams)."""
    from closed_loop_seeg_speech_synthesis_tpu.io.xdf import _native_scanner

    if _native_scanner() is None:
        pytest.skip("native scanner not built")
    path, *_ = xdf_file
    sn, _ = xdf.load_xdf(path, synchronize_clocks=False, dejitter_timestamps=False,
                         use_native=True)
    sp, _ = xdf.load_xdf(path, synchronize_clocks=False, dejitter_timestamps=False,
                         use_native=False)
    for a, b in zip(sn, sp):
        np.testing.assert_array_equal(a["time_stamps"], b["time_stamps"])
        if isinstance(b["time_series"], np.ndarray):
            np.testing.assert_array_equal(a["time_series"], b["time_series"])
        else:
            assert a["time_series"] == b["time_series"]


def test_native_scanner_large_throughput(tmp_path, rng):
    """Smoke the native path on a larger multi-chunk recording and confirm
    it is substantially faster than the Python walk."""
    import time

    from closed_loop_seeg_speech_synthesis_tpu.io.xdf import _native_scanner

    if _native_scanner() is None:
        pytest.skip("native scanner not built")
    eeg_sr, audio_sr = 1024, 48000
    eeg = rng.randn(60 * eeg_sr, 32).astype(np.float32)     # ~8 MB
    audio = (0.1 * rng.randn(60 * audio_sr)).astype(np.float32)
    markers = [(100.5, "experimentStarted"), (150.0, "experimentEnded")]
    path = str(tmp_path / "big.xdf")
    write_test_xdf(path, eeg, eeg_sr, audio, audio_sr, markers,
                   [f"c{i}" for i in range(32)])

    # Wall-clock on this (virtualized) CI box is extremely noisy — identical
    # loads have been observed anywhere from 0.3 s to 29 s under host-level
    # contention.  Take min-of-3 per implementation (interleaved so a noise
    # burst cannot land entirely on one side) and keep a generous margin.
    t_native, t_py = [], []
    sn = None
    for _ in range(3):
        t0 = time.perf_counter()
        sn, _ = xdf.load_xdf(path, use_native=True)
        t_native.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        xdf.load_xdf(path, use_native=False)
        t_py.append(time.perf_counter() - t0)
    mm = [s for s in sn if s["info"]["name"][0] == "Micromed"][0]
    np.testing.assert_allclose(np.asarray(mm["time_series"]), eeg, rtol=1e-6)
    assert min(t_native) < 1.5 * min(t_py), (t_native, t_py)
