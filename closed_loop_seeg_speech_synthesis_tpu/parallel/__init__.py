"""Multi-chip scaling: device meshes, sharded training and replay fan-out."""

from . import mesh, sharded  # noqa: F401
