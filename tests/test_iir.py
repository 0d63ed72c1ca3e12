"""IIR state-space operators vs scipy.signal golden (float64)."""

import numpy as np
import scipy.signal as sig
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.ops import filter_design as fd
from closed_loop_seeg_speech_synthesis_tpu.ops import iir


def _rand_signal(rng, T=1200, C=4):
    return rng.randn(T, C)


@pytest.mark.parametrize("sr,kind", [(1024.0, "bp"), (1024.0, "bs")])
def test_scan_matches_sosfilt(rng, sr, kind):
    sos = fd.butter_bandpass_sos(sr, 70, 170) if kind == "bp" else fd.butter_bandstop_sos(sr, 98, 102)
    x = _rand_signal(rng)
    zi = fd.sosfilt_zi(sos)
    zi_full = np.repeat(zi[:, :, None], x.shape[1], axis=2)
    y_ref, zf_ref = sig.sosfilt(sos, x, axis=0, zi=zi_full)

    ss = iir.sos_to_statespace(sos)
    s0 = jnp.asarray(zi.reshape(-1)[:, None] * np.ones((1, x.shape[1])))
    y, sT = iir.iir_scan(jnp.asarray(ss.A), jnp.asarray(ss.B), jnp.asarray(ss.C), ss.D, jnp.asarray(x), s0)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sT), zf_ref.reshape(-1, x.shape[1]), rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("block,T", [(64, 1200), (128, 1201), (256, 255)])
def test_blocked_matches_sosfilt(rng, block, T):
    sos = fd.butter_bandpass_sos(1024.0, 70, 170)
    x = rng.randn(T, 3)
    zi = fd.sosfilt_zi(sos)
    zi_full = np.repeat(zi[:, :, None], x.shape[1], axis=2)
    y_ref, zf_ref = sig.sosfilt(sos, x, axis=0, zi=zi_full)

    ss = iir.sos_to_statespace(sos)
    op = iir.make_blocked_iir(ss, block, dtype=jnp.float64)
    s0 = jnp.asarray(zi.reshape(-1)[:, None] * np.ones((1, x.shape[1])))
    y, sT = iir.iir_blocked(op, jnp.asarray(x), s0)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sT), zf_ref.reshape(-1, x.shape[1]), rtol=1e-6, atol=1e-9)


def test_blocked_high_q_bandstop(rng):
    """Narrow (4 Hz) band-stop is the numerically nastiest reference filter."""
    sos = fd.butter_bandstop_sos(1024.0, 148, 152)
    x = rng.randn(2048, 2)
    zi0 = np.zeros((sos.shape[0], 2, x.shape[1]))
    y_ref, _ = sig.sosfilt(sos, x, axis=0, zi=zi0)
    ss = iir.sos_to_statespace(sos)
    op = iir.make_blocked_iir(ss, 128, dtype=jnp.float64)
    y, _ = iir.iir_blocked(op, jnp.asarray(x), jnp.zeros((ss.dim, x.shape[1])))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-6, atol=1e-9)


def test_cascade_three_filters(rng):
    """The full EU high-gamma chain as ONE 48-dim system == sequential scipy."""
    sr = 1024.0
    chain = fd.high_gamma_bank(sr, line_noise=50)
    x = rng.randn(1500, 3)
    # scipy sequential, all-zero initial states
    y_ref = x
    for sos in chain:
        y_ref, _ = sig.sosfilt(sos, y_ref, axis=0, zi=np.zeros((sos.shape[0], 2, x.shape[1])))
    ss = iir.cascade_statespace([iir.sos_to_statespace(s) for s in chain])
    assert ss.dim == 48
    op = iir.make_blocked_iir(ss, 256, dtype=jnp.float64)
    y, _ = iir.iir_blocked(op, jnp.asarray(x), jnp.zeros((48, x.shape[1])))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-6, atol=1e-8)


def test_gl_lowpass_sos_matches_lfilter(rng):
    """The vocoder low-pass runs as an SOS cascade; it must agree with the
    reference's monolithic f64 lfilter far below one int16 LSB (3e-5)."""
    b, a = fd.gl_output_lowpass_ba()
    x = rng.randn(1000)
    zi = sig.lfiltic(b, a, np.array([]))  # zeros
    y_ref, _ = sig.lfilter(b, a, x, zi=zi)

    sos = fd.gl_output_lowpass_sos()
    ss = iir.sos_to_statespace(sos)
    op = iir.make_blocked_iir(ss, 160, dtype=jnp.float64)
    y, _ = iir.iir_blocked(op, jnp.asarray(x[:, None]), jnp.zeros((ss.dim, 1)))
    np.testing.assert_allclose(np.asarray(y)[:, 0], y_ref, rtol=0, atol=1e-7)

    # float32 stays usable too (the DF2T form would diverge to O(1) error)
    op32 = iir.make_blocked_iir(ss, 160, dtype=jnp.float32)
    y32, _ = iir.iir_blocked(op32, jnp.asarray(x[:, None], jnp.float32), jnp.zeros((ss.dim, 1), jnp.float32))
    assert np.abs(np.asarray(y32, np.float64)[:, 0] - y_ref).max() < 3e-4


def test_zero_input_response(rng):
    """Warm-start zero-fill == filtering zeros from zi (FrameBuffer.py:94-98)."""
    sos = fd.butter_bandstop_sos(1024.0, 148, 152)
    zi = fd.sosfilt_zi(sos)
    C = 3
    zi_full = np.repeat(zi[:, :, None], C, axis=2)
    zeros = np.zeros((41, C))
    y_ref, zf_ref = sig.sosfilt(sos, zeros, axis=0, zi=zi_full)
    ss = iir.sos_to_statespace(sos)
    op = iir.make_blocked_iir(ss, 64, dtype=jnp.float64)
    s0 = jnp.asarray(zi.reshape(-1)[:, None] * np.ones((1, C)))
    y, sN = iir.zero_input_response(op, s0, 41)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sN), zf_ref.reshape(-1, C), rtol=1e-8, atol=1e-12)


def test_float32_error_budget(rng):
    """f32 blocked filtering stays within a usable error budget vs f64."""
    sr = 1024.0
    chain = fd.high_gamma_bank(sr, line_noise=50)
    ss = iir.cascade_statespace([iir.sos_to_statespace(s) for s in chain])
    x = rng.randn(4096, 4)
    op64 = iir.make_blocked_iir(ss, 256, dtype=jnp.float64)
    y64, _ = iir.iir_blocked(op64, jnp.asarray(x), jnp.zeros((48, 4)))
    op32 = iir.make_blocked_iir(ss, 256, dtype=jnp.float32)
    y32, _ = iir.iir_blocked(op32, jnp.asarray(x, jnp.float32), jnp.zeros((48, 4), jnp.float32))
    scale = np.abs(np.asarray(y64)).max()
    err = np.abs(np.asarray(y32, np.float64) - np.asarray(y64)).max()
    assert err / scale < 5e-3, f"relative f32 error {err/scale:.2e}"
