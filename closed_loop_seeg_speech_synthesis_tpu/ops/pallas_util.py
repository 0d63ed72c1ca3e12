"""Shared pallas batching policy.

The streaming kernels (pallas_frontend, pallas_gl tail) carry state across
sequential grid steps in scratch, keyed on ``pl.program_id(0)`` for the
k == 0 reset.  vmap's default pallas batching rule prepends a batch grid
dimension, which silently breaks that pattern: the reset fires for one batch
element only and filter/OLA state leaks between elements.  ``sequential_vmap``
makes batching correct by construction — one kernel launch per element via
``lax.map`` (the same sequential-lane policy the exp1 runners use for
whole-graph batching, eval/exp1_batched.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequential_vmap(call):
    """Wrap ``call(*arrays) -> array`` so vmap maps it per batch element."""
    wrapped = jax.custom_batching.custom_vmap(call)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):
        def one(i):
            return call(*[a[i] if b else a for a, b in zip(args, in_batched)])
        return jax.lax.map(one, jnp.arange(axis_size)), True

    return wrapped
