"""Ops vs golden NumPy models / direct formula checks (float64)."""

import numpy as np
import scipy.signal as sig
import jax
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.ops import (
    filter_design as fd,
    framing,
    griffinlim as gl,
    mel as mel_ops,
    quantization as quant,
    smoothing,
    spectrogram as spec_ops,
    stft,
)
import golden


# -------------------------- framing / schedules ---------------------------


def test_streaming_frame_ends_1024():
    ends = framing.streaming_frame_ends(50, 10, 1024.0, 200)
    assert ends[0] == 51
    assert list(np.diff(ends))[:6] == [10, 10, 11, 10, 10, 10]


def test_shift_table_periodicity():
    d = framing.shift_table(50, 10, 1024.0)
    assert d.sum() == 256 and len(d) == 25  # 10 ms @ 1024 Hz = 256/25 samples
    ends = framing.streaming_frame_ends(50, 10, 1024.0, 6000)
    diffs = np.diff(ends)
    reps = np.tile(d, len(diffs) // len(d) + 1)[: len(diffs)]
    np.testing.assert_array_equal(diffs, reps)
    d2 = framing.shift_table(50, 10, 2048.0)
    assert d2.sum() == 512 and len(d2) == 25


def test_windowed_logpower_matches_loop(rng):
    x = rng.randn(500, 3)
    ends = framing.streaming_frame_ends(50, 10, 1024.0, 500)
    out = np.asarray(framing.windowed_logpower(jnp.asarray(x), jnp.asarray(ends), 51))
    for i, e in enumerate(ends):
        ref = np.log(np.sum(x[e - 51 : e] ** 2, axis=0) + 0.01)
        np.testing.assert_allclose(out[i], ref, rtol=1e-10)


def test_stack_context_matches_reference_orders(rng):
    F = rng.randn(30, 4)
    # offline variant (offline.py:111-116)
    out = np.asarray(framing.stack_context(jnp.asarray(F), zero_pad=False))
    assert out.shape == (10, 20)
    ef = F[0:21:5, :]
    np.testing.assert_allclose(out[0], ef.T.flatten())
    # streaming variant: first row sees only F[0] (zero history)
    out_s = np.asarray(framing.stack_context(jnp.asarray(F), zero_pad=True))
    assert out_s.shape == (30, 20)
    row0 = np.zeros((5, 4))
    row0[4] = F[0]
    np.testing.assert_allclose(out_s[0], row0.T.flatten())
    np.testing.assert_allclose(out_s[20], out[0])


def test_feature_chain_matches_golden_chunked(rng):
    """Batched filter+frame+stack == literal chunk-by-chunk golden simulator.

    Also proves chunk-size invariance (golden fed 32-sample packets)."""
    sr = 1024.0
    T, C = 1600, 3
    eeg = rng.randn(T, C)

    g = golden.GoldenFeatureChain(sr, line_noise=50)
    rows = []
    for i in range(0, T, 32):
        rows.extend(g.process(eeg[i : i + 32]))
    rows = np.asarray(rows)

    # framework batch path
    from closed_loop_seeg_speech_synthesis_tpu.ops import iir

    chain = fd.high_gamma_bank(sr, 50)
    x0 = eeg[0]
    ss1 = iir.sos_to_statespace(chain[0])
    op1 = iir.make_blocked_iir(ss1, 128, jnp.float64)
    s1 = jnp.asarray(fd.sosfilt_zi(chain[0]).reshape(-1)[:, None] * x0[None, :])
    y1, _ = iir.iir_blocked(op1, jnp.asarray(eeg), s1)

    ss2 = iir.sos_to_statespace(chain[1])
    op2 = iir.make_blocked_iir(ss2, 128, jnp.float64)
    s2 = jnp.asarray(fd.sosfilt_zi(chain[1]).reshape(-1))[:, None] * y1[0][None, :]
    y2, _ = iir.iir_blocked(op2, y1, s2)

    ss3 = iir.sos_to_statespace(chain[2])
    op3 = iir.make_blocked_iir(ss3, 128, jnp.float64)
    prefill = framing.warm_start_prefill(50, 10, sr)
    zi3 = jnp.asarray(fd.sosfilt_zi(chain[2]).reshape(-1))[:, None] * jnp.ones((1, C))
    zf, s3 = iir.zero_input_response(op3, zi3, prefill)
    y3, _ = iir.iir_blocked(op3, y2, s3)
    s_cat = jnp.concatenate([zf, y3], axis=0)

    ends = framing.streaming_frame_ends(50, 10, sr, T + prefill)
    F = framing.windowed_logpower(s_cat, jnp.asarray(ends), 51)
    stacked = np.asarray(framing.stack_context(F, zero_pad=True))

    assert stacked.shape == rows.shape
    np.testing.assert_allclose(stacked, rows, rtol=1e-6, atol=1e-9)


def test_high_gamma_bank_golden_constants():
    """Pin the exact SOS coefficients of every deployed filter design.

    Every number downstream (features, spectrograms, LDA weights, audio)
    rests on these designs matching what the reference obtains through mne
    (``ECogFeatCalc.py:42-59``).  mne's ``construct_iir_filter`` with an
    explicit ``iir_params={'order': 8, 'ftype': 'butter'}`` normalizes the
    band edges by Nyquist and delegates to ``scipy.signal.iirfilter(8, Wn,
    btype='bandpass'|'bandstop', ftype='butter', output='sos')`` — band-stop
    when l_freq > h_freq, over the swapped edges.  The float64 goldens in
    tests/golden_sos.npz were produced by that exact call chain; if a scipy
    upgrade changes ``iirfilter``/``butter`` internals (e.g. the bilinear
    transform or zpk->sos pairing), this trips instead of silently shifting
    every downstream number.  Bit-exact equality required (atol=0).
    """
    import os

    goldens = np.load(os.path.join(os.path.dirname(__file__), "golden_sos.npz"))
    n_checked = 0
    for sr in (1024.0, 2048.0):
        for ln, n_filt in ((50, 3), (60, 2)):
            chain = fd.high_gamma_bank(sr, ln)
            assert len(chain) == n_filt
            for i, sos in enumerate(chain):
                want = goldens[f"sr{int(sr)}_ln{ln}_f{i}"]
                assert sos.shape == (8, 6) and sos.dtype == np.float64
                np.testing.assert_array_equal(sos, want,
                                              err_msg=f"sr={sr} ln={ln} filter={i}")
                n_checked += 1
    assert n_checked == 10
    # spot literal (human-readable anchor): first biquad of the 1024 Hz
    # high-gamma band-pass, exact float64 values
    hg = fd.high_gamma_bank(1024.0, 50)[0]
    np.testing.assert_array_equal(
        hg[0], np.array([2.037059820702679e-05, 4.074119641405358e-05,
                         2.037059820702679e-05, 1.0,
                         -1.090755031819602, 0.4969231207342202]))


def test_mne_stub_matches_filter_design():
    """The test-fixture mne stub (tests/refsys.py) independently implements
    mne's documented design path; it must reproduce ``high_gamma_bank``
    exactly, tying the reference-system oracle to the golden constants."""
    from refsys import _make_mne_stub

    create = _make_mne_stub()["mne.filter"].create_filter
    for sr in (1024.0, 2048.0):
        bands = {50: [(70, 170), (102, 98), (152, 148)],
                 60: [(70, 170), (122, 118)]}
        for ln, edges in bands.items():
            chain = fd.high_gamma_bank(sr, ln)
            for sos, (l_freq, h_freq) in zip(chain, edges):
                got = create(None, sr, l_freq, h_freq, method="iir",
                             iir_params={"order": 8, "ftype": "butter"})["sos"]
                np.testing.assert_array_equal(got, sos)


# ------------------------------ mel / quant -------------------------------


def test_mel_matrices_reference_formulas():
    M, Minv = mel_ops.mel_matrices(129, 40, 16000.0)
    assert M.shape == (129, 40) and Minv.shape == (40, 129)
    # columns normalized (sum over spec bins is 1 where the filter is nonzero)
    colsums = M.sum(axis=0)
    nz = colsums > 0
    np.testing.assert_allclose(colsums[nz], 1.0)
    # inverse is the column-normalized transpose, not a pinv
    Mt = M.T.copy()
    s = Mt.sum(axis=0)
    s[s == 0] = 1.0
    np.testing.assert_allclose(Minv, Mt / s)
    # round-trip scrubs non-finite
    x = jnp.full((2, 129), 0.0)
    out = np.asarray(mel_ops.to_log_mels(x, jnp.asarray(M)))
    assert np.isfinite(out).all()


def test_quantization_roundtrip(rng):
    spec = rng.randn(300, 40) * 2.0
    medians, borders = quant.compute_borders_logistic(jnp.asarray(spec), 9)
    assert medians.shape == (40, 9) and borders.shape == (40, 9)
    # golden loop implementation of the quantizer semantics
    b = np.asarray(borders)
    q_ref = np.zeros(spec.shape)
    for mel_bin in range(40):
        for iv in reversed(range(9)):
            q_ref[spec[:, mel_bin] <= b[mel_bin, iv], mel_bin] = iv
    q = np.asarray(quant.quantize(jnp.asarray(spec), borders))
    np.testing.assert_array_equal(q, q_ref)
    # all values covered (max is a border)
    assert q.max() <= 8 and q.min() >= 0
    deq = np.asarray(quant.dequantize(jnp.asarray(q), medians))
    m = np.asarray(medians)
    for t in range(0, 300, 37):
        for bin_ in range(40):
            assert deq[t, bin_] == m[bin_, int(q[t, bin_])]


def test_gaussian_smooth_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter

    k = jnp.asarray(smoothing.gaussian_kernel1d(0.5))
    x = rng.randn(7, 40)
    out = np.asarray(smoothing.gaussian_smooth(jnp.asarray(x), k))
    for i in range(7):
        np.testing.assert_allclose(out[i], gaussian_filter(x[i], 0.5), rtol=1e-12, atol=1e-14)


def test_smooth_by_table_bit_equal_to_scipy(rng):
    """The exact-lattice path (exact_smooth_table + smooth_by_table) is
    BIT-equal to scipy.ndimage.gaussian_filter on quantized inputs — the
    property the docstring claims, including every edge bin, under jit."""
    import jax
    from scipy.ndimage import gaussian_filter

    n_mel, K = 12, 9  # smaller n_mel keeps the K^5 table cheap; edges included
    medians = np.sort(rng.randn(n_mel, K), axis=1)
    pos, table = smoothing.exact_smooth_table(medians)
    smooth = jax.jit(lambda lab: smoothing.smooth_by_table(
        lab, jnp.asarray(pos), jnp.asarray(table), K))
    labels = rng.randint(0, K, size=(64, n_mel))
    # plus adversarial rows: constant, edge-heavy, alternating extremes
    labels = np.vstack([labels, np.zeros((1, n_mel), int),
                        np.full((1, n_mel), K - 1),
                        np.tile([0, K - 1], n_mel)[:n_mel][None]])
    got = np.asarray(smooth(jnp.asarray(labels, jnp.int32)))
    for row, lab in zip(got, labels):
        want = gaussian_filter(medians[np.arange(n_mel), lab], 0.5)
        assert row.tobytes() == want.tobytes()


# ------------------------------- stft / gl --------------------------------


def test_rdft_matches_numpy(rng):
    r = stft.make_rdft(256, jnp.float64)
    x = rng.randn(5, 256)
    xr, xi = r.rfft(jnp.asarray(x))
    ref = np.fft.rfft(x, axis=1)
    np.testing.assert_allclose(np.asarray(xr), ref.real, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(xi), ref.imag, rtol=1e-9, atol=1e-9)
    z = rng.randn(5, 129) + 1j * rng.randn(5, 129)
    back = r.irfft(jnp.asarray(z.real), jnp.asarray(z.imag))
    np.testing.assert_allclose(np.asarray(back), np.fft.irfft(z, axis=1), rtol=1e-9, atol=1e-9)


def test_compute_spectrogram_matches_loop(rng):
    audio = rng.randn(16000)
    out = np.asarray(spec_ops.compute_spectrogram(jnp.asarray(audio), 16000, 0.016, 0.01))
    # direct loop model (offline.py:219-241)
    win, shift = 256, 160
    overlap = win - shift
    padded = np.concatenate([np.zeros(overlap), audio])
    num = int(np.floor((len(padded) - overlap) / shift))
    w = sig.windows.hann(win, sym=True)
    M, _ = mel_ops.mel_matrices(win // 2 + 1, 40, 16000.0)
    ref = np.zeros((num, 40))
    for i in range(num):
        seg = padded[i * shift : i * shift + win] * w
        mag = np.abs(np.fft.rfft(seg))
        ref[i] = np.log(mag @ M + 1e-7)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("phase_bug", [True, False])
def test_streaming_vocoder_matches_golden(rng, phase_bug):
    """Batched GL blocks + OLA + lowpass + int16 == per-frame golden vocoder."""
    from closed_loop_seeg_speech_synthesis_tpu.ops import iir

    n_frames = 12
    logmels = rng.randn(n_frames, 40) * 0.5 - 1.0
    rand = rng.rand(n_frames - 1, 480)

    g = golden.GoldenVocoder(num_iterations=8, norm_factor=10.0, phase_bug=phase_bug, lowpass="sos")
    chunks = []
    for i in range(n_frames):
        out = g.process_frame(logmels[i], rand[i - 1] if i >= 1 else None)
        if out is not None:
            chunks.append(out)
    ref_audio = np.concatenate(chunks)

    ops = gl.make_streaming_gl_ops(dtype=jnp.float64)
    re = gl.streaming_gl_blocks(jnp.asarray(logmels), jnp.asarray(rand), ops, 8, phase_bug)
    raw = gl.overlap_add_stream(re, ops)
    sos = fd.gl_output_lowpass_sos()
    ss = iir.sos_to_statespace(sos)
    op = iir.make_blocked_iir(ss, 160, jnp.float64)
    lp, _ = iir.iir_blocked(op, raw[:, None], jnp.zeros((ss.dim, 1)))
    audio = np.asarray(gl.to_int16(lp[:, 0], 10.0))

    assert audio.shape == ref_audio.shape
    np.testing.assert_array_equal(audio, ref_audio)


def test_lowpass_sos_vs_reference_ba_on_gl_audio(rng):
    """SOS-form lowpass matches the reference's DF2T lfilter within 1 int16 LSB."""
    n_frames = 10
    logmels = rng.randn(n_frames, 40) * 0.5 - 1.0
    rand = rng.rand(n_frames - 1, 480)
    a = golden.GoldenVocoder(phase_bug=True, lowpass="ba")
    b = golden.GoldenVocoder(phase_bug=True, lowpass="sos")
    for i in range(n_frames):
        ca = a.process_frame(logmels[i], rand[i - 1] if i >= 1 else None)
        cb = b.process_frame(logmels[i], rand[i - 1] if i >= 1 else None)
        if ca is not None:
            assert np.abs(ca.astype(int) - cb.astype(int)).max() <= 1
