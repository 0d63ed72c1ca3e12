"""IO: recording loaders (HDF5/XDF), session/run accessors, config system."""

from . import config, loaders, session, utils, xdf  # noqa: F401
