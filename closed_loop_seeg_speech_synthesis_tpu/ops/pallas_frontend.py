"""Fused front-end kernel: warm-started IIR chain + windowed log-power.

One Pallas program per schedule period (the frame grid repeats every P
frames spanning exactly Ls samples; Ls equals the state-space block length).
TPU grid steps execute sequentially on a core, so the kernel carries the
filter's block-boundary state and the previous output chunk in scratch
across steps — the recurrence costs one (S,S)@(S,C) matmul per period, raw
sEEG is read from HBM exactly once and only the (P, C) feature rows per
period are written back.  The filtered signal never exists in HBM.

Replaces, in one kernel: the 3-pass blocked IIR (+ associative boundary
scan), the zero-fill prefix concat, and the periodic window matmul — the two
largest stages of the offline pipeline.

Geometry (see ops/framing.py): window i of period k covers, in
filtered-signal coordinates, ``[k*Ls + e_i - win - prefill,  ... + win)``
where ``e_i`` are the first P streaming frame ends.  Relative to the
(previous chunk | current chunk) span this is ``p = e_i - win - prefill +
Ls``, always inside [0, 2*Ls).  Period 0's "previous chunk" is the zero-fill
prefix ``[zeros, zf]`` — exactly the scratch initialization.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import framing
from .iir import BlockedIIR


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FrontendOps:
    """Constants for the fused kernel (built host-side, float64 -> dtype)."""

    Tmat: jnp.ndarray     # (Ls, Ls) causal Toeplitz of the combined chain
    Cpow: jnp.ndarray     # (Ls, S)
    Pmat: jnp.ndarray     # (S, Ls)
    A_L: jnp.ndarray      # (S, S)
    S_win: jnp.ndarray    # (P, 2*Ls) window selection in span coordinates
    prefix: jnp.ndarray   # (Ls,) previous-chunk init: [zeros, zf_prefix]

    def tree_flatten(self):
        return ((self.Tmat, self.Cpow, self.Pmat, self.A_L, self.S_win, self.prefix), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def Ls(self) -> int:
        return self.Tmat.shape[0]

    @property
    def P(self) -> int:
        return self.S_win.shape[0]


def make_frontend_ops(op: BlockedIIR, zf_prefix: np.ndarray, frame_ms: float,
                      shift_ms: float, sr: float, dtype=jnp.float32) -> FrontendOps | None:
    """Build kernel constants; None if the schedule/geometry doesn't fit
    (requires the IIR block length == one schedule period)."""
    win = framing.frame_size(frame_ms, sr)
    prefill = len(zf_prefix)
    table = framing.shift_table(frame_ms, shift_ms, sr)
    P = len(table)
    Ls = int(table.sum())
    if op.block != Ls or win + prefill > 2 * Ls:
        return None
    ends = framing.streaming_frame_ends(frame_ms, shift_ms, sr, 10 * Ls)[:P]
    S_win = np.zeros((P, 2 * Ls), np.float64)
    for i, e in enumerate(ends):
        p = int(e) - win - prefill + Ls
        if p < 0 or p + win > 2 * Ls:
            return None
        S_win[i, p : p + win] = 1.0
    prefix = np.zeros(Ls, np.float64)
    prefix[Ls - prefill :] = np.asarray(zf_prefix)
    to = lambda a: jnp.asarray(a, dtype)
    return FrontendOps(Tmat=op.Tmat.astype(dtype), Cpow=op.Cpow.astype(dtype),
                       Pmat=op.Pmat.astype(dtype), A_L=op.A_L.astype(dtype),
                       S_win=to(S_win), prefix=to(prefix))


def _frontend_kernel(u_ref, s0_ref, prefix_ref, tmat_ref, cpow_ref, pmat_ref,
                     alarge_ref, swin_ref, f_ref, y_prev, s_scr):
    k = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(k == 0)
    def _():
        s_scr[:] = s0_ref[:]
        y_prev[:] = prefix_ref[:].reshape(-1, 1) * jnp.ones((1, u_ref.shape[1]), f32)

    u = u_ref[:]                      # (Ls, C)
    s = s_scr[:]                      # (S, C)
    y = (jnp.dot(tmat_ref[:], u, preferred_element_type=f32)
         + jnp.dot(cpow_ref[:], s, preferred_element_type=f32))  # (Ls, C)
    span = jnp.concatenate([y_prev[:], y], axis=0)               # (2Ls, C)
    sums = jnp.dot(swin_ref[:], span * span, preferred_element_type=f32)  # (P, C)
    f_ref[0, :, :] = jnp.log(sums + f32(0.01))
    s_scr[:] = (jnp.dot(alarge_ref[:], s, preferred_element_type=f32)
                + jnp.dot(pmat_ref[:], u, preferred_element_type=f32))
    y_prev[:] = y


@partial(jax.jit, static_argnames=("n_frames", "interpret"))
def frontend_logpower(ops: FrontendOps, eeg: jnp.ndarray, s0: jnp.ndarray,
                      n_frames: int, interpret: bool = False) -> jnp.ndarray:
    """Raw eeg (T, C) + initial combined state s0 (S, C) -> log-power feature
    rows (n_frames, C), fused on-chip."""
    T, C = eeg.shape
    Ls, P = ops.Ls, ops.P
    K = -(-n_frames // P)
    need = K * Ls
    u = jnp.pad(eeg.astype(jnp.float32), ((0, max(0, need - T)), (0, 0)))[:need]
    S_dim = ops.A_L.shape[0]

    F = pl.pallas_call(
        _frontend_kernel,
        out_shape=jax.ShapeDtypeStruct((K, P, C), jnp.float32),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((Ls, C), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_dim, C), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls,), lambda k: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, Ls), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, S_dim), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_dim, Ls), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_dim, S_dim), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 2 * Ls), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Ls, C), jnp.float32),
            pltpu.VMEM((S_dim, C), jnp.float32),
        ],
        interpret=interpret,
    )(u, s0.astype(jnp.float32), ops.prefix, ops.Tmat, ops.Cpow, ops.Pmat, ops.A_L, ops.S_win)
    return F.reshape(K * P, C)[:n_frames]
