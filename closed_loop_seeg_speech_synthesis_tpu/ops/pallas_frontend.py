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
from .pallas_util import sequential_vmap


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

    call = lambda *arrays: pl.pallas_call(
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
    )(*arrays)
    # program_id-keyed scratch carries: vmap must launch per element
    F = sequential_vmap(call)(u, s0.astype(jnp.float32), ops.prefix, ops.Tmat,
                              ops.Cpow, ops.Pmat, ops.A_L, ops.S_win)
    return F.reshape(K * P, C)[:n_frames]


# ---------------------------------------------------------------------------
# Fully fused decode: front-end + context stack + LDA + dequant + smooth
# ---------------------------------------------------------------------------


def epilogue_constants(lda_coef_full, intercept, valid, classes, medians,
                       gauss_kernel, n_channels: int, model_order: int = 4):
    """Rearrange the decode epilogue's parameters for the fused kernel.

    jnp-traceable (exp1's batched retrain swaps LDA weights inside jit), so
    the constants are rebuilt from whatever the current params hold:

    * ``W5``   (M*C, K*B): LDA weights with rows in tap-major layout
      (row m*C+c = stacked feature channel c, tap m oldest-first — matching
      how the kernel slices its feature history) and columns k-major
      (col k*B+b), so per-slot score slabs are static column slices.
    * ``bm``   (1, K*B): intercept plus the invalid-slot mask folded into one
      additive constant (invalid slots get -1e30, never argmax winners).
    * ``med_slot`` (K, B): medians pre-indexed by each slot's class label —
      dequantization becomes a first-max select, no label gather.
    * ``smoothM`` (B, B): the gaussian sigma-0.5 'reflect' smoothing as an
      exact matrix (it is linear), applied as one (P,B)@(B,B) matmul.
    """
    from . import smoothing

    B, K, D = lda_coef_full.shape
    M = model_order + 1
    C = n_channels
    # D-index layout from framing.stack_context: d = c*M + m (taps oldest-first)
    W = lda_coef_full.reshape(B, K, C, M)            # (B, K, C, M)
    W5 = jnp.transpose(W, (3, 2, 1, 0)).reshape(M * C, K * B)
    bm = jnp.where(valid, intercept, jnp.asarray(-1e30, intercept.dtype))
    bm = jnp.transpose(bm, (1, 0)).reshape(1, K * B)
    med_slot = jnp.take_along_axis(medians, classes.astype(jnp.int32), axis=1)  # (B, K)
    med_slot = jnp.transpose(med_slot, (1, 0))       # (K, B)
    smoothM = smoothing.gaussian_smooth(jnp.eye(B, dtype=medians.dtype), gauss_kernel)
    return (W5.astype(jnp.float32), bm.astype(jnp.float32),
            med_slot.astype(jnp.float32), smoothM.astype(jnp.float32))


def _make_decode_kernel(P: int, depth: int, step: int, n_taps: int, K: int,
                        B: int, Ls: int, G: int = 1):
    """G = periods per grid step: the filter recurrence stays sequential
    (unrolled over the G sub-periods), but the epilogue then works on G*P
    frame rows at once — larger matmuls amortize the MXU and the sequential
    grid better at low channel counts."""

    def kernel(u_ref, s0_ref, prefix_ref, tmat_ref, cpow_ref, pmat_ref,
               alarge_ref, swin_ref, w5_ref, bm_ref, med_ref, smooth_ref,
               mel_ref, y_prev, s_scr, f_hist):
        k = pl.program_id(0)
        f32 = jnp.float32
        C = u_ref.shape[1]

        @pl.when(k == 0)
        def _():
            s_scr[:] = s0_ref[:]
            y_prev[:] = prefix_ref[:].reshape(-1, 1) * jnp.ones((1, C), f32)
            f_hist[:] = jnp.zeros_like(f_hist)

        s = s_scr[:]
        y_last = y_prev[:]
        f_parts = []
        for g in range(G):
            u = u_ref[g * Ls : (g + 1) * Ls, :]
            y = (jnp.dot(tmat_ref[:], u, preferred_element_type=f32)
                 + jnp.dot(cpow_ref[:], s, preferred_element_type=f32))
            span = jnp.concatenate([y_last, y], axis=0)
            sums = jnp.dot(swin_ref[:], span * span, preferred_element_type=f32)
            f_parts.append(jnp.log(sums + f32(0.01)))         # (P, C)
            s = (jnp.dot(alarge_ref[:], s, preferred_element_type=f32)
                 + jnp.dot(pmat_ref[:], u, preferred_element_type=f32))
            y_last = y
        f = f_parts[0] if G == 1 else jnp.concatenate(f_parts, axis=0)

        PG = G * P
        hist_cat = jnp.concatenate([f_hist[:], f], axis=0)    # (depth+G*P, C)
        # context stack folded into the LDA matmul: one (G*P,C)@(C,K*B) per tap
        scores = bm_ref[:]                                    # (1, K*B) bcast
        # HIGHEST: bf16-pass matmuls shift scores ~1e-2 and flip argmax
        # labels at near-ties; the epilogue FLOPs are negligible
        hi = jax.lax.Precision.HIGHEST
        for m in range(n_taps):
            tap = hist_cat[m * step : m * step + PG]          # (G*P, C)
            wm = w5_ref[m * C : (m + 1) * C, :]               # (C, K*B)
            scores = scores + jnp.dot(tap, wm, preferred_element_type=f32,
                                      precision=hi)

        # first-max dequantization over the K slots (k-major column slabs)
        mbest = scores[:, 0:B]
        for kk in range(1, K):
            mbest = jnp.maximum(mbest, scores[:, kk * B : (kk + 1) * B])
        taken = jnp.zeros_like(mbest)
        deq = jnp.zeros_like(mbest)
        for kk in range(K):
            sk = scores[:, kk * B : (kk + 1) * B]
            hit = jnp.where((sk >= mbest) & (taken == 0), f32(1), f32(0))
            deq = deq + hit * med_ref[kk : kk + 1, :]
            taken = taken + hit
        mel_ref[0, :, :] = jnp.dot(deq, smooth_ref[:], preferred_element_type=f32,
                                   precision=hi)

        f_hist[:] = hist_cat[PG:]
        s_scr[:] = s
        y_prev[:] = y_last

    return kernel


@partial(jax.jit, static_argnames=("n_frames", "model_order", "step_size",
                                   "periods_per_step", "interpret"))
def frontend_decode_mels(ops: FrontendOps, eeg: jnp.ndarray, s0: jnp.ndarray,
                         W5: jnp.ndarray, bm: jnp.ndarray, med_slot: jnp.ndarray,
                         smoothM: jnp.ndarray, n_frames: int, model_order: int = 4,
                         step_size: int = 5, periods_per_step: int = 1,
                         interpret: bool = False) -> jnp.ndarray:
    """Raw eeg (T, C) -> dequantized+smoothed logMel frames (n_frames, B),
    fully fused on-chip: the filtered signal, log-power features and stacked
    context never exist in HBM — per period only (P, B) mel rows are written.

    Fuses, beyond ``frontend_logpower``: context stacking
    (framing.stack_context, zero-padded warm start), the 40-bin LDA argmax
    (LDASynthesis.py:19-28), median dequantization + gaussian smoothing
    (Dequantization.py:15-17) — i.e. the whole decode path up to Griffin-Lim.
    """
    T, C = eeg.shape
    Ls, P = ops.Ls, ops.P
    G = periods_per_step
    K_slots, B = med_slot.shape
    depth = model_order * step_size
    n_taps = model_order + 1
    Kp = -(-n_frames // (G * P))
    need = Kp * G * Ls
    u = jnp.pad(eeg.astype(jnp.float32), ((0, max(0, need - T)), (0, 0)))[:need]
    S_dim = ops.A_L.shape[0]

    call = lambda *arrays: pl.pallas_call(
        _make_decode_kernel(P, depth, step_size, n_taps, K_slots, B, Ls, G),
        out_shape=jax.ShapeDtypeStruct((Kp, G * P, B), jnp.float32),
        grid=(Kp,),
        in_specs=[
            pl.BlockSpec((G * Ls, C), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_dim, C), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls,), lambda k: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, Ls), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ls, S_dim), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_dim, Ls), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_dim, S_dim), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 2 * Ls), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_taps * C, K_slots * B), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_slots * B), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_slots, B), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G * P, B), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Ls, C), jnp.float32),
            pltpu.VMEM((S_dim, C), jnp.float32),
            pltpu.VMEM((depth, C), jnp.float32),
        ],
        interpret=interpret,
    )(*arrays)
    # program_id-keyed scratch carries: vmap must launch per element
    mel = sequential_vmap(call)(u, s0.astype(jnp.float32), ops.prefix, ops.Tmat,
                                ops.Cpow, ops.Pmat, ops.A_L, ops.S_win, W5, bm,
                                med_slot, smoothM)
    return mel.reshape(Kp * G * P, B)[:n_frames]
