"""Golden tests that execute the ACTUAL reference implementation as oracle.

Everything else in this suite checks the rebuild against freshly written
simulators (tests/golden.py) or against scipy/sklearn formulas.  These tests
close the remaining gap: when the reference repo is present (read-only, at
$CLSS_REFERENCE_DIR or /root/reference), its numpy-only modules are imported
and RUN IN PLACE, and the rebuild (plus the golden simulators the rest of
the suite leans on) must match their outputs.  No reference code is copied.

Reference modules exercised directly:
  local/MelFilterBank.py     toLogMels / fromLogMels
  local/quantization.py      compute_borders_logistic / quantize / dequantize
  local/xdf.py               vendored pyxdf importer (sync + dejitter)
  local/vad.py               EnergyBasedVad
  livenodes/FrameBuffer.py   streaming IIR + absolute-time framing
  livenodes/LambdaNode.py    the ECogFeatCalc sub-graph glue
  livenodes/GriffinLim.py    the streaming vocoder node
  livenodes/Dequantization.py

The modules that import mne (ECogFeatCalc, offline.py) cannot load in this
environment; their sub-graphs are re-wired here from reference FrameBuffer/
LambdaNode instances using this repo's mne-matched SOS designs
(ECogFeatCalc.py:40-104 wiring, parameters cited inline).

The reference targets 2018-era numpy/scipy; the fixture shims the since-
removed aliases it uses (np.float/np.object, scipy.blackman/hanning/zeros/
real — all of which were plain numpy re-exports) before import.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF_DIR = os.environ.get("CLSS_REFERENCE_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_DIR, "local")),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference's numpy-only modules from REF_DIR."""
    import scipy

    # Legacy alias shims (historically these WERE the numpy functions).
    added_np = {}
    for name, val in (("float", float), ("object", object)):
        if not hasattr(np, name):
            added_np[name] = val
            setattr(np, name, val)
    added_scipy = {}
    for name, val in (("blackman", np.blackman), ("hanning", np.hanning),
                      ("zeros", np.zeros), ("real", np.real)):
        if not hasattr(scipy, name):
            added_scipy[name] = val
            setattr(scipy, name, val)

    sys.path.insert(0, REF_DIR)
    try:
        import livenodes.Dequantization as ref_deq
        import livenodes.FrameBuffer as ref_fb
        import livenodes.GriffinLim as ref_gl
        import livenodes.LambdaNode as ref_ln
        import local.MelFilterBank as ref_mel
        import local.quantization as ref_quant
        import local.vad as ref_vad
        import local.xdf as ref_xdf
    except Exception as e:  # pragma: no cover - incompatible host env
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF_DIR)

    yield types.SimpleNamespace(
        mel=ref_mel, quant=ref_quant, xdf=ref_xdf, vad=ref_vad,
        FrameBuffer=ref_fb.FrameBuffer, LambdaNode=ref_ln.LambdaNode,
        GriffinLimSynthesis=ref_gl.GriffinLimSynthesis,
        Dequantization=ref_deq.Dequantization,
    )

    for name in added_np:
        delattr(np, name)
    for name in added_scipy:
        delattr(scipy, name)


def _collect(node):
    """Register a plain collector callback on a reference Node
    (Node.py:122-156 accepts arbitrary functions as outputs)."""
    out = []
    node.add_output(lambda frame: out.append(np.array(frame, copy=True)))
    return out


# ---------------------------------------------------------------------------
# local/MelFilterBank.py
# ---------------------------------------------------------------------------


def test_mel_filterbank_oracle(ref, rng):
    from closed_loop_seeg_speech_synthesis_tpu.ops import mel as mel_ops

    mfb = ref.mel.MelFilterBank(129, 40, 16000.0)
    M, Minv = mel_ops.mel_matrices(129, 40, 16000.0)
    np.testing.assert_allclose(np.asarray(M), mfb.melMatrix, rtol=0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(Minv), mfb.melInvMatrix, rtol=0, atol=1e-15)

    spec = np.abs(rng.randn(50, 129)) + 1e-3
    spec[7] = 0.0  # forces log(fuzz(0)) -> the NaN/Inf scrub path
    want = mfb.toLogMels(spec)
    got = np.asarray(mel_ops.to_log_mels(spec, M))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    logmels = rng.randn(50, 40)
    want_inv = mfb.fromLogMels(logmels)
    got_inv = np.asarray(mel_ops.from_log_mels(logmels, Minv))
    np.testing.assert_allclose(got_inv, want_inv, rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# local/quantization.py
# ---------------------------------------------------------------------------


def test_quantization_oracle(ref, rng):
    from closed_loop_seeg_speech_synthesis_tpu.ops import quantization

    y = rng.randn(300, 40) * 2.0 + rng.randn(40)[None, :]
    want_med, want_bord = ref.quant.compute_borders_logistic(y, 9)
    got_med, got_bord = quantization.compute_borders_logistic(y, 9)
    np.testing.assert_allclose(np.asarray(got_med), want_med, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got_bord), want_bord, rtol=1e-12)

    # include values above the last border (quantized to 0 in the reference
    # — the quirk docs/NUMERICS.md pins)
    y_eval = np.concatenate([y[:100], y[:5] + 50.0])
    want_q = ref.quant.quantize_spectrogram(y_eval, want_bord)
    got_q = np.asarray(quantization.quantize(y_eval, got_bord))
    np.testing.assert_array_equal(got_q, want_q)

    want_dq = ref.quant.dequantize_spectrogram(want_q, want_med)
    got_dq = np.asarray(quantization.dequantize(got_q.astype(int), got_med))
    np.testing.assert_allclose(got_dq, want_dq, rtol=1e-12)


# ---------------------------------------------------------------------------
# livenodes/Dequantization.py
# ---------------------------------------------------------------------------


def test_dequantization_node_oracle(ref, rng):
    from golden import golden_dequantize

    medians = np.sort(rng.randn(40, 9), axis=1)
    node = ref.Dequantization(medians)
    out = _collect(node)
    frames = rng.randint(0, 9, size=(20, 40))
    for f in frames:
        node.add_data(f.astype(float))
    assert len(out) == len(frames)
    for f, got_ref in zip(frames, out):
        np.testing.assert_allclose(golden_dequantize(f, medians), got_ref,
                                   rtol=1e-12, atol=1e-15)


# ---------------------------------------------------------------------------
# local/vad.py
# ---------------------------------------------------------------------------


def test_vad_oracle(ref, rng):
    from closed_loop_seeg_speech_synthesis_tpu.eval.vad import EnergyBasedVad

    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = (0.02 * rng.randn(len(t)) + 0.5 * np.sin(2 * np.pi * 220 * t)
           * (t % 1.0 < 0.4)) * 2**14  # bursty "speech"
    want = ref.vad.EnergyBasedVad().from_wav(wav, sampling_rate=sr)
    got = EnergyBasedVad().from_wav(wav, sampling_rate=sr)
    np.testing.assert_array_equal(np.asarray(got, float), np.asarray(want, float))


# ---------------------------------------------------------------------------
# local/xdf.py — the vendored pyxdf importer as parsing + sync oracle
# ---------------------------------------------------------------------------


def _compare_xdf(ref, path, **kw):
    from closed_loop_seeg_speech_synthesis_tpu.io import xdf as our_xdf

    ref_streams, _ = ref.xdf.load_xdf(path, **kw)
    got_streams, _ = our_xdf.load_xdf(path, **kw)
    ref_by = {s["info"]["name"][0]: s for s in ref_streams}
    got_by = {s["info"]["name"][0]: s for s in got_streams}
    assert set(ref_by) == set(got_by)
    for name in ref_by:
        r, g = ref_by[name], got_by[name]
        np.testing.assert_allclose(np.asarray(g["time_stamps"], float),
                                   np.asarray(r["time_stamps"], float),
                                   rtol=0, atol=1e-9, err_msg=name)
        if name == "SingleWordsMarkerStream":
            assert [m[0] for m in g["time_series"]] == [m[0] for m in r["time_series"]]
        else:
            np.testing.assert_array_equal(np.asarray(g["time_series"]),
                                          np.asarray(r["time_series"]), err_msg=name)


def test_xdf_oracle_plain(ref, tmp_path, rng):
    from test_io import write_test_xdf

    eeg = rng.randn(2048, 4).astype(np.float32)
    audio = (0.1 * rng.randn(4800)).astype(np.float32)
    markers = [(100.5, "experimentStarted"), (101.0, "start;w"), (101.5, "experimentEnded")]
    path = str(tmp_path / "plain.xdf")
    write_test_xdf(path, eeg, 1024, audio, 48000, markers, ["A1", "A2", "B1", "B2"])
    _compare_xdf(ref, path, synchronize_clocks=False, dejitter_timestamps=False)
    _compare_xdf(ref, path, synchronize_clocks=True, dejitter_timestamps=True)


def test_xdf_oracle_drift_and_jitter(ref, tmp_path, rng):
    """Clock drift + timestamp jitter simultaneously: the rebuild's
    dejitter-before-sync order must agree with the reference's
    sync-before-dejitter (local/xdf.py:439-571) on affine clock maps."""
    import struct

    from test_io import (_chunk, _numeric_samples, _stream_header,
                         _string_samples)

    eeg = rng.randn(4096, 2).astype(np.float32)
    jitter = rng.uniform(-2e-4, 2e-4, size=64)
    blob = b"XDF:" + _chunk(1, b"<info><version>1.0</version></info>")
    blob += _stream_header(1, "Micromed", "EEG", 2, 1024, "float32", ["A1", "A2"])
    blob += _stream_header(3, "SingleWordsMarkerStream", "Markers", 1, 0, "string")
    # linearly drifting clock offsets (affine map), stream 1
    for i in range(13):
        t = 2.0 * i
        blob += _chunk(4, struct.pack("<I", 1) + struct.pack("<dd", t, 0.25 + 1e-5 * t))
    blob += _numeric_samples(1, eeg, 100.0, 1024, ts_every=32, jitter=jitter)
    blob += _string_samples(3, [(100.5, "experimentStarted"), (103.0, "experimentEnded")])
    path = str(tmp_path / "drift.xdf")
    with open(path, "wb") as f:
        f.write(blob)
    _compare_xdf(ref, path, synchronize_clocks=False, dejitter_timestamps=False)
    _compare_xdf(ref, path, synchronize_clocks=True, dejitter_timestamps=False)
    _compare_xdf(ref, path, synchronize_clocks=True, dejitter_timestamps=True)


# ---------------------------------------------------------------------------
# livenodes/FrameBuffer.py (+ LambdaNode): the full ECogFeatCalc sub-graph
# ---------------------------------------------------------------------------


def _build_reference_feature_graph(ref, sr, chunk_size, line_noise=50):
    """Rewire ECogFeatCalc.py:67-104 from reference nodes, with this repo's
    mne-matched SOS designs standing in for the mne.filter call the broken
    import prevents (the SOS coefficients themselves are golden-tested in
    tests/test_ops.py)."""
    from closed_loop_seeg_speech_synthesis_tpu.ops import filter_design as fd

    chain = fd.high_gamma_bank(sr, line_noise)
    one_frame = (1.0 / sr) * 1000.0 * chunk_size
    fb_hg = ref.FrameBuffer(one_frame, one_frame, sr, filter_coefficients=chain[0])
    nodes = [fb_hg]
    if line_noise == 50:
        fb_h1 = ref.FrameBuffer(one_frame, one_frame, sr, filter_coefficients=chain[1])(fb_hg)
        fb_h2 = ref.FrameBuffer(50, 10, sr, filter_coefficients=chain[2], warm_start=True)(fb_h1)
        nodes += [fb_h1, fb_h2]
        last_fb = fb_h2
    else:
        fb_h1 = ref.FrameBuffer(50, 10, sr, filter_coefficients=chain[1], warm_start=True)(fb_hg)
        nodes.append(fb_h1)
        last_fb = fb_h1

    def frame_extract_hg(data):  # ECogFeatCalc.py:118-124
        return np.array([np.log(np.sum(data**2, axis=0) + 0.01).T])

    feat = ref.LambdaNode(frame_extract_hg)(last_fb)
    stack_buff = ref.FrameBuffer(4 * 5 + 1, 1, 1000, warm_start=True)(feat)
    stacker = ref.LambdaNode(lambda d: d[::5].T.flatten())(stack_buff)
    return fb_hg, stacker


@pytest.mark.parametrize("line_noise", [50, 60])
def test_feature_chain_oracle(ref, rng, line_noise):
    """The golden simulator every pipeline test leans on == the actual
    reference node graph, chunk by chunk."""
    from golden import GoldenFeatureChain

    sr, chunk, C = 1024.0, 32, 3
    head, tail = _build_reference_feature_graph(ref, sr, chunk, line_noise)
    out_ref = _collect(tail)

    golden = GoldenFeatureChain(sr, line_noise=line_noise)
    data = rng.randn(int(sr * 3), C)
    rows_golden = []
    for i in range(0, len(data) - chunk + 1, chunk):
        pkt = data[i : i + chunk]
        head.add_data(pkt)
        rows_golden.extend(golden.process(pkt))

    assert len(out_ref) == len(rows_golden) > 200
    np.testing.assert_allclose(np.asarray(rows_golden), np.asarray(out_ref),
                               rtol=0, atol=1e-12)


def test_framebuffer_fractional_shift_oracle(ref, rng):
    """Bare FrameBuffer at a fractional-shift rate (10 ms @ 1024 Hz =
    10.24 samples): the reference's rounded absolute-time schedule
    (FrameBuffer.py:147-177) vs the golden framer's integer grid."""
    from golden import GoldenFramer

    sr = 1024.0
    fb = ref.FrameBuffer(50, 10, sr)
    out_ref = _collect(fb)
    golden = GoldenFramer(50, 10, sr, None, warm_start=False)
    data = rng.randn(int(sr * 2), 2)
    frames_golden = []
    for i in range(0, len(data) - 32 + 1, 32):
        pkt = data[i : i + 32]
        fb.add_data(pkt)
        frames_golden.extend(golden.process(pkt))
    assert len(out_ref) == len(frames_golden) > 150
    np.testing.assert_array_equal(np.asarray(frames_golden), np.asarray(out_ref))


# ---------------------------------------------------------------------------
# livenodes/GriffinLim.py — the streaming vocoder node
# ---------------------------------------------------------------------------


def test_griffinlim_node_oracle(ref, rng, monkeypatch):
    """GoldenVocoder (the simulator the <=1-LSB pipeline audio tests anchor
    on) == the actual reference node, with the reference's np.random.rand
    phase inits injected deterministically."""
    from golden import GoldenVocoder

    n_frames, n_mel = 40, 40
    mels = rng.randn(n_frames, n_mel) * 1.5 - 2.0
    rand_rows = [rng.rand(480) for _ in range(n_frames)]  # one per emission
    rows = iter([r.copy() for r in rand_rows])
    monkeypatch.setattr(np.random, "rand", lambda n: next(rows).copy())

    node = ref.GriffinLimSynthesis(16, 10, 16000, n_mel,
                                   numReconstructionIterations=8,
                                   cutoff=7900, normFactor=10.0)
    out_ref = _collect(node)

    # The node's buffer-allocation gate is `self.inputBuffer == []`
    # (GriffinLim.py:104) — valid on 2018-era numpy, a broadcast ValueError
    # today.  An ndarray view whose == short-circuits the empty-list probe
    # restores the historical behavior without touching reference code.
    class _EqArr(np.ndarray):
        def __eq__(self, other):
            if isinstance(other, list) and not other:
                return False
            return np.ndarray.__eq__(self, other)

    for i, m in enumerate(mels):
        node.add_data(m.reshape(1, -1))
        if i == 0:
            node.inputBuffer = node.inputBuffer.view(_EqArr)

    golden = GoldenVocoder(n_mel=n_mel, num_iterations=8, norm_factor=10.0,
                           phase_bug=True, lowpass="ba")
    chunks = []
    k = 0
    for i, m in enumerate(mels):
        c = golden.process_frame(m, rand_rows[k])
        if c is not None:
            chunks.append(c)
            k += 1

    got = np.concatenate(chunks).astype(np.int32)
    want = np.concatenate(out_ref).astype(np.int32)
    assert got.shape == want.shape and len(got) == (n_frames - 1) * 160
    assert np.max(np.abs(got - want)) <= 1  # int16 LSB (fp summation order)
