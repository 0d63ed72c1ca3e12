"""Host-side IIR filter design (numpy/scipy, runs once at setup time).

The reference designs its filters through ``mne.filter.create_filter`` with
``iir_params={'order': 8, 'ftype': 'butter'}`` (reference
``livenodes/ECogFeatCalc.py:42-59``, ``local/offline.py:31-37``).  mne's
``construct_iir_filter`` is a thin wrapper that normalizes the band edges by
the Nyquist frequency and delegates to ``scipy.signal.iirfilter(order, Wp,
btype=..., ftype='butter', output='sos')``; we call scipy directly and skip
the wrapper.  ``l_freq < h_freq`` selects a band-pass, ``l_freq > h_freq`` a
band-stop over the swapped edges (reference passes (102, 98) and (152, 148)
for the EU line-noise harmonics, (122, 118) for US).

None of this runs in the hot path: design happens once, the resulting SOS /
state-space / blocked-IIR operators are baked into the decoder params pytree.
"""

from __future__ import annotations

import numpy as np
import scipy.signal as _sig

# Order used everywhere in the reference (ECogFeatCalc.py:43).
DEFAULT_IIR_ORDER = 8


def butter_bandpass_sos(sr: float, lo: float, hi: float, order: int = DEFAULT_IIR_ORDER) -> np.ndarray:
    """Butterworth band-pass as second-order sections, float64, shape (order, 6)."""
    nyq = sr / 2.0
    return _sig.iirfilter(order, [lo / nyq, hi / nyq], btype="bandpass", ftype="butter", output="sos")


def butter_bandstop_sos(sr: float, lo: float, hi: float, order: int = DEFAULT_IIR_ORDER) -> np.ndarray:
    """Butterworth band-stop as second-order sections, float64, shape (order, 6)."""
    nyq = sr / 2.0
    lo, hi = min(lo, hi), max(lo, hi)
    return _sig.iirfilter(order, [lo / nyq, hi / nyq], btype="bandstop", ftype="butter", output="sos")


def sosfilt_zi(sos: np.ndarray) -> np.ndarray:
    """Steady-state step-response initial conditions, shape (n_sections, 2).

    Matches ``scipy.signal.sosfilt_zi`` which the reference uses to warm-start
    its streaming filters (``livenodes/FrameBuffer.py:87``).
    """
    return _sig.sosfilt_zi(sos)


def high_gamma_bank(sr: float, line_noise: int = 50, order: int = DEFAULT_IIR_ORDER):
    """The reference's per-region filter chain (ECogFeatCalc.py:40-59).

    Returns a list of SOS arrays applied in order:
      EU (line_noise=50): [bandpass 70-170, bandstop 98-102, bandstop 148-152]
      US (line_noise=60): [bandpass 70-170, bandstop 118-122]
    """
    chain = [butter_bandpass_sos(sr, 70.0, 170.0, order)]
    if line_noise == 50:
        chain.append(butter_bandstop_sos(sr, 98.0, 102.0, order))
        chain.append(butter_bandstop_sos(sr, 148.0, 152.0, order))
    elif line_noise == 60:
        chain.append(butter_bandstop_sos(sr, 118.0, 122.0, order))
    else:
        raise ValueError(f"line_noise must be 50 or 60, got {line_noise}")
    return chain


def gl_output_lowpass_ba(sample_rate: float = 16000.0, frame_shift_ms: float = 10.0, cutoff: float = 7900.0):
    """(b, a) of the vocoder output low-pass (reference GriffinLim.py:53-58).

    Order is ``int(sr/1000 * shift_ms / 32)`` (=5 at 16 kHz / 10 ms); the
    reference applies it with ``lfilter`` (direct-form-II-transposed) from
    zero initial state.
    """
    order = int((sample_rate / 1000.0) * frame_shift_ms / 32.0)
    b, a = _sig.iirfilter(order, float(cutoff) / (sample_rate / 2.0), btype="lowpass")
    return np.asarray(b, np.float64), np.asarray(a, np.float64)


def gl_output_lowpass_sos(sample_rate: float = 16000.0, frame_shift_ms: float = 10.0, cutoff: float = 7900.0) -> np.ndarray:
    """The same low-pass as cascaded biquads.

    The reference's monolithic order-5 DF2T at 0.9875 normalized cutoff has
    an ~1e8 error-amplification factor: fine in the reference's float64, but
    float32 on device diverges completely (measured error O(1)).  The SOS
    cascade of the identical transfer function agrees with the reference's
    f64 ``lfilter`` to ~5e-9 (f64) / ~3e-5 (f32, below one int16 LSB), so the
    device path always uses this form.
    """
    b, a = gl_output_lowpass_ba(sample_rate, frame_shift_ms, cutoff)
    return _sig.tf2sos(b, a)
