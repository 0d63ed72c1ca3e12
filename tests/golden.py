"""NumPy/SciPy golden models of the reference's *streaming* semantics.

These are deliberately written as literal chunk-by-chunk simulators (growing
buffers, per-chunk sosfilt state, per-frame vocoder calls) — structurally the
opposite of the framework's batched JAX formulation — so agreement between
the two is a meaningful equivalence check of:

  * chunk-size invariance of the filter + framing chain,
  * the warm-start zero-fill and zi scaling rules,
  * the absolute-time frame schedule (banker's rounding),
  * the Griffin-Lim block/overlap-add/emission bookkeeping.

Semantics follow the reference (livenodes/FrameBuffer.py, ECogFeatCalc.py,
GriffinLim.py, Dequantization.py; file:line cited inline).  Everything is
float64.
"""

from __future__ import annotations

import numpy as np
import scipy.signal as sig
import scipy.signal.windows as win
from scipy.ndimage import gaussian_filter


class GoldenStreamFilter:
    """Streaming sosfilt with the FrameBuffer zi rules (FrameBuffer.py:86-98)."""

    def __init__(self, sos, warm_start: bool):
        self.sos = sos
        self.warm_start = warm_start
        self.state = None

    def process(self, chunk):
        if self.state is None:
            zi = sig.sosfilt_zi(self.sos)
            self.state = np.repeat(zi[:, :, None], chunk.shape[1], axis=2)
            if not self.warm_start:
                for c in range(chunk.shape[1]):
                    self.state[:, :, c] *= chunk[0, c]
        out, self.state = sig.sosfilt(self.sos, chunk, axis=0, zi=self.state)
        return out


class GoldenFramer:
    """Absolute-time framing with optional warm-start zero prefill
    (FrameBuffer.py:27-37, 94-98, 145-177)."""

    def __init__(self, frame_ms, shift_ms, sr, filt: GoldenStreamFilter | None, warm_start: bool):
        self.frame_size = int((float(frame_ms) / 1000.0) * float(sr))
        self.shift_ms = float(shift_ms)
        self.sr = float(sr)
        self.first_ms = (self.frame_size / self.sr) * 1000.0
        self.filt = filt
        self.warm_start = warm_start
        self.buf = None
        self.count = 0
        self.next_at = self.frame_size

    def process(self, chunk):
        """Feed one chunk; returns list of emitted frames (frame_size, C)."""
        if self.buf is None:
            self.buf = np.zeros((0, chunk.shape[1]))
            if self.warm_start:
                prefill = self.frame_size - int((self.shift_ms / 1000.0) * self.sr)
                filtered = self.filt.process(np.zeros((prefill, chunk.shape[1]))) if self.filt else np.zeros((prefill, chunk.shape[1]))
                self.buf = np.concatenate([self.buf, filtered])
        data = self.filt.process(chunk) if self.filt else chunk
        self.buf = np.concatenate([self.buf, data])
        frames = []
        while self.next_at <= self.buf.shape[0]:
            frames.append(self.buf[self.next_at - self.frame_size : self.next_at].copy())
            self.count += 1
            self.next_at = round(((self.first_ms + self.count * self.shift_ms) / 1000.0) * self.sr)
        return frames


class GoldenFeatureChain:
    """ECogFeatCalc equivalent: HG bandpass -> harmonic bandstop(s) ->
    50ms/10ms log-power -> 21-row stack buffer -> 5-tap stacker
    (ECogFeatCalc.py:40-104,117-144)."""

    def __init__(self, sr, line_noise=50, frame_len_ms=50, frame_shift_ms=10, model_order=4, step_size=5):
        import closed_loop_seeg_speech_synthesis_tpu.ops.filter_design as fd

        chain = fd.high_gamma_bank(sr, line_noise)
        # first N-1 filters are plain streaming passes (frame == shift == chunk)
        self.pre_filters = [GoldenStreamFilter(s, warm_start=False) for s in chain[:-1]]
        self.framer = GoldenFramer(frame_len_ms, frame_shift_ms, sr,
                                   GoldenStreamFilter(chain[-1], warm_start=True), warm_start=True)
        self.stack = GoldenFramer(model_order * step_size + 1, 1, 1000, None, warm_start=True)
        self.step_size = step_size

    def process(self, chunk):
        """Feed a raw sEEG chunk (n, C); returns list of stacked feature rows."""
        x = chunk
        for f in self.pre_filters:
            x = f.process(x)
        rows = []
        for frame in self.framer.process(x):
            feat = np.log(np.sum(frame**2, axis=0) + 0.01)[None, :]  # (1, C)
            for window in self.stack.process(feat):
                rows.append(window[:: self.step_size].T.flatten())
        return rows


class GoldenVocoder:
    """Streaming Griffin-Lim (GriffinLim.py:64-174) with injected inits.

    Emits one int16 chunk of 160 samples per input frame from the second
    frame onward.
    """

    def __init__(self, n_mel=40, num_iterations=8, norm_factor=10.0, phase_bug=True, lowpass="ba"):
        from closed_loop_seeg_speech_synthesis_tpu.ops import filter_design as fd
        from closed_loop_seeg_speech_synthesis_tpu.ops import mel as mel_ops

        self.fft_size, self.hop = 256, 160
        self.block = 480
        # np.blackman, NOT scipy.signal.windows.blackman: the reference's
        # ``scipy.blackman`` (GriffinLim.py:50,160) was a re-export of
        # numpy's, and the two differ by ~1 ulp — enough for the chaotic
        # phase iteration to diverge visibly on long sessions.
        self.win = np.blackman(self.fft_size)
        self.ola_win = np.blackman(self.block)
        _, self.Minv = mel_ops.mel_matrices(self.fft_size // 2 + 1, n_mel, 16000.0)
        self.iters = num_iterations
        self.norm = norm_factor
        self.phase_bug = phase_bug
        self.b, self.a = fd.gl_output_lowpass_ba()
        self.lp_state = np.zeros(max(len(self.a), len(self.b)) - 1)
        self.prev_re = None       # re of block b-1
        self.prev_prev_re = None  # re of block b-2
        self.prev_mel = None
        self.lowpass = lowpass
        if lowpass == "sos":
            self.lp_sos = fd.gl_output_lowpass_sos()
            self.lp_state = np.zeros((self.lp_sos.shape[0], 2))

    def _from_log_mels(self, m):
        out = np.exp(m) @ self.Minv
        out[~np.isfinite(out)] = 0.0
        return out

    def process_frame(self, mel_frame, rand_init):
        """mel_frame: (40,); rand_init: (480,). Returns int16 chunk or None."""
        if self.prev_mel is None:
            self.prev_mel = mel_frame
            return None
        spec = self._from_log_mels(np.stack([self.prev_mel, mel_frame]))  # (2, 129)
        self.prev_mel = mel_frame

        wav = rand_init.copy()
        for _ in range(self.iters):
            frames = np.stack([wav[0:256] * self.win, wav[160:416] * self.win])
            X = np.fft.rfft(frames, axis=1)
            if self.phase_bug:
                Z = spec * np.exp(np.angle(X))  # real (GriffinLim.py:93)
            else:
                Z = spec * np.exp(1j * np.angle(X))
            t = np.real(np.fft.irfft(Z, axis=1)) * self.win
            wav = np.zeros(self.block)
            wav[0:256] += t[0]
            wav[160:416] += t[1]
        re = wav

        acc = re[:160].copy()
        wsum = self.ola_win[:160].copy()
        if self.prev_re is not None:
            acc += self.prev_re[160:320]
            wsum += self.ola_win[160:320]
        if self.prev_prev_re is not None:
            acc += self.prev_prev_re[320:480]
            wsum += self.ola_win[320:480]
        out = acc.copy()
        nz = wsum != 0
        out[nz] = acc[nz] / wsum[nz]
        self.prev_prev_re = self.prev_re
        self.prev_re = re
        if self.lowpass == "sos":
            out, self.lp_state = sig.sosfilt(self.lp_sos, out, zi=self.lp_state)
        else:
            out, self.lp_state = sig.lfilter(self.b, self.a, out, zi=self.lp_state)
        return np.int16(np.clip(out / (self.norm * 1.01), -0.99, 0.99) * (2**15 - 1))


def golden_dequantize(frame_idx, medians):
    """Dequantization.py:15-17: median lookup + gaussian sigma=0.5."""
    vec = medians[np.arange(len(medians)), frame_idx.astype(int)]
    return gaussian_filter(vec, sigma=0.5)
