"""Evaluation suite: metrics, VAD, DTW, experiments 1-4, paper figures."""

from . import dtw, exp1, exp2, exp3, exp4, figures, metrics, vad  # noqa: F401
