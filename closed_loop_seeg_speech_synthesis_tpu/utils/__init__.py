"""General utilities: channel selection, audio coercion, wall-clock
benchmarking, pipeline tracing, platform checks.

(The host-side file helpers live in ``io.utils``; the tracing machinery in
``runtime.tracing`` — re-exported here as the framework's utility surface,
mirroring the reference's ``local/utils.py``.)
"""

from __future__ import annotations

import struct
import logging

from ..io.utils import benchmark, in_offline_mode, select_channels, squeeze_audio_to_float64  # noqa: F401
from ..runtime.tracing import StageTracer, activate_timing, timing_active  # noqa: F401

logger = logging.getLogger("utils")


def honor_platform_env() -> None:
    """Mirror ``JAX_PLATFORMS`` into ``jax.config`` before backend init.

    The hosted axon TPU plugin force-selects itself regardless of the
    ``JAX_PLATFORMS`` env var; ``jax.config.update`` has higher priority
    than both.  Without this, a relay outage makes even ``JAX_PLATFORMS=cpu``
    smoke runs hang inside ``make_c_api_client``.  Call at the top of any
    entrypoint that should respect the env var (benchmarks, tools); no-op
    when the variable is unset or a backend is already initialized.
    """
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    # A trailing "!" (e.g. JAX_PLATFORMS='tpu!') pins EXACTLY the listed
    # platforms — no cpu helper backend is appended, so accidental CPU
    # fallback fails loudly (ADVICE r4).  The marker is stripped before jax
    # sees the value (it is not valid platform syntax).
    strict = plat.endswith("!")
    plat = plat.rstrip("!")
    os.environ["JAX_PLATFORMS"] = plat
    # otherwise keep the in-process CPU backend available alongside the
    # selected accelerator (first entry stays the default backend): staging
    # helpers (eval/exp1_batched.fold_targets) use it to avoid shipping large
    # host arrays through a remote-device relay for trivially small compute
    if not strict and "cpu" not in [p.strip() for p in plat.split(",")]:
        plat = plat + ",cpu"
    try:
        jax.config.update("jax_platforms", plat)
    except Exception:  # backend already initialized; env var did its job
        pass


def check_if_python_shell_is_x64() -> bool:
    """Warn on 32-bit interpreters (reference utils.py:78-84)."""
    mode = struct.calcsize("P") * 8
    if mode != 64:
        logger.warning("Python shell is running in x%d, not x64; large "
                       "recordings may exhaust memory.", mode)
        return False
    return True


def dtw_warping(query_spec, reference):
    """Re-export of the DTW warping helper (reference utils.py:124-138)."""
    from ..eval.dtw import dtw_warping as _dtw

    return _dtw(query_spec, reference)
