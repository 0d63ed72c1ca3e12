"""Models: batched per-bin LDA and Spearman feature selection."""

from . import lda, selection  # noqa: F401
