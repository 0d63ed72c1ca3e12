"""Import the ACTUAL reference system (train.py / decode.py) for oracle use.

The reference-node oracle (tests/test_reference_oracle.py) runs reference
*nodes* in place; this helper goes the last mile and makes the composed
reference programs — ``train.train`` (train.py:132-168) and
``decode.perform_offline_decoding``/``setup_decoder`` (decode.py:71-96,
152-183) — importable and runnable UNMODIFIED, so the rebuild can be
A/B-tested against the reference *system*, params.h5 interchange included.

Four third-party packages the reference imports are not installed here.  None
of them participates in the offline numerics; each gets an honest stand-in:

* ``mne`` — used ONLY to design order-8 Butterworth SOS filters
  (ECogFeatCalc.py:42-59, offline.py:24-29; plus ``set_log_level`` and the
  interactive raw viewer that the offline path never touches).  mne's
  ``construct_iir_filter`` with an explicit ``order``/``ftype`` normalizes the
  band edges by Nyquist and delegates to ``scipy.signal.iirfilter(order, Wn,
  btype, ftype=ftype, output='sos')``; ``l_freq > h_freq`` selects band-stop
  over the swapped edges.  The stub implements exactly that documented path
  (independently of the rebuild's ops/filter_design.py — the two are tied
  together by the golden SOS constants in tests/test_ops.py, so a scipy
  upgrade or a stub error trips a test instead of silently shifting numbers).
* ``pylsl`` / ``fastdtw`` — imported at module scope by local/utils.py and
  local/marker.py but only called on the *online*/DTW paths; stubs raise if
  actually used.
* ``jack`` / ``samplerate`` — imported at module scope by decode.py (Linux
  branch) and livenodes/JackAudioSink.py; only constructed when
  ``include_soundcard=True``, which offline decoding never sets.

Additionally the reference targets 2018-era numpy, so (as in
test_reference_oracle.py) the long-removed aliases it relies on are shimmed:
``np.float``/``np.object``, ``scipy.blackman/hanning/zeros/real`` (plain
re-exports back then), and GriffinLim.py:104's ``self.inputBuffer == []``
buffer-allocation gate (valid then, a broadcast error on modern numpy) is
restored via an ndarray view installed by a post-``add_data`` hook — no
reference source is modified.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import scipy
import scipy.signal

REF_DIR = os.environ.get("CLSS_REFERENCE_DIR", "/root/reference")

_REF_MODULES = ("train", "decode", "local", "livenodes")


def _make_mne_stub():
    mne = types.ModuleType("mne")
    mne_filter = types.ModuleType("mne.filter")

    def _check_method(method, iir_params, extra_types=()):
        # mne.filter._check_method: validates and defaults iir_params
        # (order-4 butter when unspecified), returns (iir_params, method).
        if method == "iir" and iir_params is None:
            iir_params = dict(order=4, ftype="butter", output="sos")
        return iir_params, method

    def create_filter(data, sfreq, l_freq, h_freq, filter_length="auto",
                      l_trans_bandwidth="auto", h_trans_bandwidth="auto",
                      method="fir", iir_params=None, phase="zero",
                      fir_window="hamming", fir_design="firwin", verbose=None):
        if method != "iir":
            raise NotImplementedError("stub supports the reference's IIR path only")
        order, ftype = iir_params["order"], iir_params["ftype"]
        nyq = sfreq / 2.0
        if l_freq is None or h_freq is None:
            raise NotImplementedError("reference only designs band-pass/stop")
        # construct_iir_filter: l_freq < h_freq -> band-pass over [l, h];
        # l_freq > h_freq -> band-stop over [h, l].
        lo, hi = (l_freq, h_freq) if l_freq < h_freq else (h_freq, l_freq)
        btype = "bandpass" if l_freq < h_freq else "bandstop"
        sos = scipy.signal.iirfilter(order, [lo / nyq, hi / nyq],
                                     btype=btype, ftype=ftype, output="sos")
        out = dict(iir_params)
        out["sos"] = sos
        return out

    mne_filter._check_method = _check_method
    mne_filter.create_filter = create_filter
    mne.filter = mne_filter
    mne.set_log_level = lambda *a, **k: None

    def _unused(*a, **k):  # train.py's interactive viewer path, never taken
        raise NotImplementedError("mne stub: interactive channel view unavailable")

    mne.create_info = _unused
    mne.io = types.SimpleNamespace(RawArray=_unused)
    return {"mne": mne, "mne.filter": mne_filter}


def _make_misc_stubs():
    def _unavailable(name):
        def f(*a, **k):
            raise RuntimeError(f"{name} stub called — not available offline")
        return f

    pylsl = types.ModuleType("pylsl")
    pylsl.FOREVER = 32000000.0
    pylsl.resolve_stream = _unavailable("pylsl.resolve_stream")
    pylsl.StreamInlet = _unavailable("pylsl.StreamInlet")
    pylsl.StreamInfo = _unavailable("pylsl.StreamInfo")
    pylsl.StreamOutlet = _unavailable("pylsl.StreamOutlet")
    pylsl.local_clock = _unavailable("pylsl.local_clock")

    fastdtw = types.ModuleType("fastdtw")
    fastdtw.fastdtw = _unavailable("fastdtw.fastdtw")

    jack = types.ModuleType("jack")

    class JackError(Exception):
        pass

    jack.JackError = JackError
    jack.Client = _unavailable("jack.Client")

    samplerate = types.ModuleType("samplerate")
    samplerate.Resampler = _unavailable("samplerate.Resampler")
    samplerate.resample = _unavailable("samplerate.resample")

    return {"pylsl": pylsl, "fastdtw": fastdtw, "jack": jack,
            "samplerate": samplerate}


def _install_legacy_aliases():
    """2018-era numpy/scipy aliases the reference uses (plain re-exports then)."""
    undo = []
    for mod, name, val in ((np, "float", float), (np, "object", object),
                           (scipy, "blackman", np.blackman),
                           (scipy, "hanning", np.hanning),
                           (scipy, "zeros", np.zeros), (scipy, "real", np.real)):
        if not hasattr(mod, name):
            setattr(mod, name, val)
            undo.append((mod, name))
    return undo


class _EqArr(np.ndarray):
    """ndarray view restoring 2018 numpy's `ndarray == []` -> False scalar
    (GriffinLim.py:104 uses it as a buffer-allocation gate)."""

    def __eq__(self, other):
        if isinstance(other, list) and not other:
            return False
        return np.ndarray.__eq__(self, other)


def _patch_griffinlim_gate(gl_module):
    """Install a post-add_data hook keeping inputBuffer an _EqArr view."""
    cls = gl_module.GriffinLimSynthesis
    if getattr(cls, "_eqarr_patched", False):
        return
    orig = cls.add_data

    def add_data(self, data_frame, data_id=0):
        out = orig(self, data_frame, data_id)
        buf = self.inputBuffer
        if isinstance(buf, np.ndarray) and not isinstance(buf, _EqArr):
            self.inputBuffer = buf.view(_EqArr)
        return out

    cls.add_data = add_data
    cls._eqarr_patched = True


def import_reference_system(ref_dir: str = REF_DIR):
    """Import reference train/decode (plus local/livenodes) with stubs installed.

    Returns a SimpleNamespace with ``train`` and ``decode`` module objects.
    Raises ImportError if the reference tree is absent.
    """
    if not os.path.isdir(os.path.join(ref_dir, "local")):
        raise ImportError(f"reference repo not found at {ref_dir}")

    os.environ.setdefault("MPLBACKEND", "Agg")
    stubs = {}
    stubs.update(_make_mne_stub())
    stubs.update(_make_misc_stubs())
    for name, mod in stubs.items():
        sys.modules.setdefault(name, mod)
    _install_legacy_aliases()

    sys.path.insert(0, ref_dir)
    try:
        import decode as ref_decode
        import train as ref_train
        import livenodes.GriffinLim as ref_gl
        import livenodes.Sender as ref_sender
    finally:
        sys.path.remove(ref_dir)

    _patch_griffinlim_gate(ref_gl)
    return types.SimpleNamespace(train=ref_train, decode=ref_decode,
                                 gl=ref_gl, sender=ref_sender)


def deterministic_rand_rows(n_rows: int, n: int = 480, seed: int = 777) -> np.ndarray:
    """The per-block uniform phase inits GriffinLim.py:90 draws from
    np.random.rand — precomputed so the same rows can be injected into the
    reference node graph (via monkeypatching np.random.rand before the Sender
    fork; fork inherits the patch) and passed to the rebuild's
    ``offline_decode(rand_init=...)``."""
    return np.random.RandomState(seed).rand(n_rows, n)


def install_np_rand_rows(rows: np.ndarray):
    """Replace np.random.rand with a deterministic row iterator.  Returns an
    undo callable.  The replacement survives the multiprocessing fork the
    reference Sender performs, which is where the DAG (and hence GriffinLim's
    rand calls) actually runs."""
    it = iter([r.copy() for r in rows])
    orig = np.random.rand

    def rand(*shape):
        if shape == (rows.shape[1],):
            return next(it)
        return orig(*shape)

    np.random.rand = rand

    def undo():
        np.random.rand = orig

    return undo


def synth_session(seed: int = 2024, seconds: float = 62.0, eeg_sr: int = 1024,
                  audio_sr: int = 48000, n_channels: int = 6):
    """Synthetic sEEG+audio with a learnable coupling: speech-active windows
    carry extra 70-170 Hz band power on half the channels, so the trained
    LDAs actually discriminate quantization intervals (as in the paradigm the
    reference trains on)."""
    rs = np.random.RandomState(seed)
    T = int(seconds * eeg_sr)
    Ta = int(seconds * audio_sr)
    t_e = np.arange(T) / eeg_sr
    t_a = np.arange(Ta) / audio_sr

    # ~2 s on / 1 s off activity pattern
    act_e = ((t_e % 3.0) < 2.0).astype(np.float64)
    act_a = ((t_a % 3.0) < 2.0).astype(np.float64)

    eeg = rs.randn(T, n_channels)
    hg = rs.randn(T, n_channels)
    sos = scipy.signal.butter(4, [70 / (eeg_sr / 2), 170 / (eeg_sr / 2)],
                              btype="bandpass", output="sos")
    hg = scipy.signal.sosfilt(sos, hg, axis=0)
    gain = np.linspace(1.0, 3.0, n_channels)
    eeg += hg * act_e[:, None] * gain[None, :] * 4.0

    audio = 0.25 * np.sin(2 * np.pi * 220 * t_a) * act_a
    audio += 0.02 * rs.randn(Ta)
    return eeg.astype(np.float64), audio.astype(np.float64)
