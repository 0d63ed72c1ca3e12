"""Runtime: decoder pipelines (batch + online step), trainer, artifact store."""

from . import params, pipeline, trainer  # noqa: F401
