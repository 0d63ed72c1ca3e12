"""Numerics kernels: IIR filtering, framing, mel, STFT, Griffin-Lim, quantization."""

from . import filter_design, framing, griffinlim, iir, mel, quantization, smoothing, spectrogram, stft  # noqa: F401
