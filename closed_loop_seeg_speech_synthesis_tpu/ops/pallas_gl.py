"""Fused Griffin-Lim iteration kernel (Pallas, TPU).

The batched vocoder (ops/griffinlim.py) runs 8 iterations of
rfft -> phase -> irfft per 480-sample block.  In the XLA formulation each
iteration round-trips the (B, 480) waveforms and (B, 2, 129) spectra through
HBM; this kernel keeps a tile of blocks resident in VMEM for the whole
iteration loop — the DFT matrices (256x129), Blackman window and the block
tile all fit comfortably — so HBM sees each block exactly once in and once
out.

The kernel reproduces the reference semantics bit-for-bit with the jnp path
within float32 rounding, including the ``exp(angle)`` phase quirk and the
real-bin angle handling at DC/Nyquist (see ops/griffinlim.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .griffinlim import BLOCK_SAMPLES, FFT_SIZE, HOP, StreamingGLOps
from .pallas_util import sequential_vmap

_PAD_TAIL = BLOCK_SAMPLES - FFT_SIZE          # 224
_PAD_MID = BLOCK_SAMPLES - HOP - FFT_SIZE     # 64


def _atan_01(r):
    """atan on [0, 1], Cephes atanf scheme (~1e-7 rel error in f32)."""
    f32 = jnp.float32
    tan_pi8 = f32(0.4142135623730951)  # tan(pi/8)
    reduce = r > tan_pi8
    x = jnp.where(reduce, (r - 1.0) / (r + 1.0), r)
    z = x * x
    p = f32(8.05374449538e-2)
    p = p * z - f32(1.38776856032e-1)
    p = p * z + f32(1.99777106478e-1)
    p = p * z - f32(3.33329491539e-1)
    a = x + x * z * p
    return jnp.where(reduce, f32(np.pi / 4) + a, a)


def _atan2(y, x):
    """np.arctan2 for Pallas TPU (atan2 has no Mosaic lowering)."""
    f32 = jnp.float32
    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    mx = jnp.maximum(abs_x, abs_y)
    mn = jnp.minimum(abs_x, abs_y)
    r = mn / jnp.where(mx > 0, mx, 1.0)
    a = _atan_01(r)
    a = jnp.where(abs_y > abs_x, f32(np.pi / 2) - a, a)
    a = jnp.where(x < 0, f32(np.pi) - a, a)
    a = jnp.where(mx == 0, 0.0, a)
    return jnp.where(y < 0, -a, a)


def _gl_loop(lm0, lm1, wav, minv, minvn, fcos, fsin, fnyq, icos, isin, inyq,
             win, *, iterations: int, phase_bug: bool, mm_t):
    """The shared Griffin-Lim iteration body (values, not refs).

    The 256-point real DFT has K = 129 bins; a 129-wide matmul operand pads
    to 256 MXU lanes, wasting ~half the systolic-array work in the three hot
    matmuls.  The Nyquist bin (exactly real: F_sin[:,128] == 0, and its
    inverse row I_sin[128,:] == 0) is split out: the matmuls run on the
    clean first 128 bins, the Nyquist spectrum is a VPU lane-reduction
    against the alternating-sign row, and its inverse contribution is a
    rank-1 (TB,1)x(1,256) broadcast-add.  Bit-compatible with the unsplit
    form within f32 rounding.
    """
    f32 = jnp.float32
    pi = f32(np.pi)

    def from_log_mels(lm):
        # exp(logmels) @ Minv with NaN/Inf scrub (MelFilterBank.py:82-83)
        e = jnp.exp(lm)
        main = jnp.dot(e, minv, preferred_element_type=f32)       # (TB, 128)
        nyq = jnp.sum(e * minvn, axis=1, keepdims=True)           # (TB, 1)
        return (jnp.where(jnp.isfinite(main), main, 0.0),
                jnp.where(jnp.isfinite(nyq), nyq, 0.0))

    spec0, spec0n = from_log_mels(lm0)
    spec1, spec1n = from_log_mels(lm1)

    def one_frame(fr, spec, specn):
        frm = fr.astype(mm_t)
        xr = jnp.dot(frm, fcos, preferred_element_type=f32)       # (TB, 128)
        xi = -jnp.dot(frm, fsin, preferred_element_type=f32)
        xrn = jnp.sum(fr * fnyq, axis=1, keepdims=True)           # (TB, 1)
        if phase_bug:
            ang = _atan2(xi, xr)
            # the DC bin is exactly real: angle is 0 or +pi by np.angle
            # convention (see stft.make_rdft / griffinlim._gl_iteration)
            col = jax.lax.broadcasted_iota(jnp.int32, ang.shape, 1)
            ang = jnp.where(col == 0, jnp.where(xr < 0, pi, 0.0), ang)
            zr = spec * jnp.exp(ang)
            zrn = specn * jnp.exp(jnp.where(xrn < 0, pi, 0.0))
            t = jnp.dot(zr.astype(mm_t), icos, preferred_element_type=f32)
        else:
            r = jnp.sqrt(xr * xr + xi * xi)
            safe = r > 0
            inv = jnp.where(safe, 1.0 / jnp.where(safe, r, 1.0), 0.0)
            zr = spec * jnp.where(safe, xr * inv, 1.0)
            zi = spec * (xi * inv)
            # Nyquist imag part is exactly 0: phase is sign(xr) (1 at xr==0)
            zrn = specn * jnp.where(xrn < 0, f32(-1.0), f32(1.0))
            t = jnp.dot(zr.astype(mm_t), icos, preferred_element_type=f32) + jnp.dot(
                zi.astype(mm_t), isin, preferred_element_type=f32)
        return (t + zrn * inyq) * win

    for _ in range(iterations):
        f0 = wav[:, 0:FFT_SIZE] * win
        f1 = wav[:, HOP : HOP + FFT_SIZE] * win
        t0 = one_frame(f0, spec0, spec0n)
        t1 = one_frame(f1, spec1, spec1n)
        zeros_tail = jnp.zeros((wav.shape[0], _PAD_TAIL), f32)
        zeros_head = jnp.zeros((wav.shape[0], HOP), f32)
        zeros_mid = jnp.zeros((wav.shape[0], _PAD_MID), f32)
        wav = (jnp.concatenate([t0, zeros_tail], axis=1)
               + jnp.concatenate([zeros_head, t1, zeros_mid], axis=1))
    return wav


def _split_nyquist(ops: StreamingGLOps):
    """Pre-split the DFT/mel operators at the Nyquist bin (see _gl_loop)."""
    f32 = jnp.float32
    Km = FFT_SIZE // 2  # 128 clean bins; bin 128 (Nyquist) handled on the VPU
    return (ops.Minv[:, :Km].astype(f32), ops.Minv[:, Km][None, :].astype(f32),
            ops.rdft.F_cos[:, :Km].astype(f32), ops.rdft.F_sin[:, :Km].astype(f32),
            ops.rdft.F_cos[:, Km][None, :].astype(f32),
            ops.rdft.I_cos[:Km].astype(f32), ops.rdft.I_sin[:Km].astype(f32),
            ops.rdft.I_cos[Km][None, :].astype(f32))


def _gl_kernel(lm0_ref, lm1_ref, wav_ref, minv_ref, minvn_ref, fcos_ref,
               fsin_ref, fnyq_ref, icos_ref, isin_ref, inyq_ref, win_ref,
               out_ref, *, iterations: int, phase_bug: bool,
               bf16: bool = False):
    mm_t = jnp.bfloat16 if bf16 else jnp.float32
    out_ref[:] = _gl_loop(
        lm0_ref[:], lm1_ref[:], wav_ref[:], minv_ref[:], minvn_ref[:],
        fcos_ref[:].astype(mm_t), fsin_ref[:].astype(mm_t), fnyq_ref[:],
        icos_ref[:].astype(mm_t), isin_ref[:].astype(mm_t), inyq_ref[:],
        win_ref[:], iterations=iterations, phase_bug=phase_bug, mm_t=mm_t)


def _gl_audio_kernel(lm0_ref, lm1_ref, wav_ref, minv_ref, minvn_ref, fcos_ref,
                     fsin_ref, fnyq_ref, icos_ref, isin_ref, inyq_ref,
                     win_ref, winv_ref, tmatT_ref, pmatT_ref,
                     cpowT_ref, aT_ref, out_ref, prev1_scr, prev2_scr, lp_scr, *,
                     iterations: int, phase_bug: bool, norm: float, tile: int,
                     n_pow: int, bf16: bool = False):
    """GL iterations + the whole vocoder tail in one program.

    Fuses, after the per-block Griffin-Lim loop (identical to ``_gl_kernel``):
    cross-block overlap-add with window-sum normalization
    (``GriffinLim.py:144-166``), the 7.9 kHz output low-pass
    (``GriffinLim.py:169-170``), scaling and int16 conversion
    (``GriffinLim.py:172-174``).  The reconstructed 480-sample blocks never
    reach HBM; per tile only (tile*160) int16 samples leave.

    The low-pass runs blocked at L=160 (one hop per row, no re-layout: a
    Mosaic reshape of a (tile, 160) tile to longer rows is an unsupported
    lane-crossing shape cast).  The per-row boundary states are NOT a
    sequential recurrence: the row transition A^160 has spectral radius
    0.988^160 ~= 0.145, so states are an ``n_pow``-term truncated power sum
    S_all[i] = sum_p U[i-p] (A^160)^p with U = [s_in; Q] — shifted matmuls,
    error (0.145)^n_pow ~ 4e-14 at n_pow=16, below f32 resolution (the
    direct impulse response at radius 0.988 would need >1 k taps, which is
    why an FIR truncation of the filter itself is NOT viable).

    TPU grid steps run sequentially on a core, so scratch carries the OLA
    tail (last two blocks) and the low-pass state across steps — the same
    pattern as ops/pallas_frontend.
    """
    k = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(k == 0)
    def _():
        prev1_scr[:] = jnp.zeros_like(prev1_scr)
        prev2_scr[:] = jnp.zeros_like(prev2_scr)
        lp_scr[:] = jnp.zeros_like(lp_scr)

    # --- Griffin-Lim iterations (shared body, Nyquist-split matmuls) ---
    mm_t = jnp.bfloat16 if bf16 else f32
    wav = _gl_loop(
        lm0_ref[:], lm1_ref[:], wav_ref[:], minv_ref[:], minvn_ref[:],
        fcos_ref[:].astype(mm_t), fsin_ref[:].astype(mm_t), fnyq_ref[:],
        icos_ref[:].astype(mm_t), isin_ref[:].astype(mm_t),
        inyq_ref[:], win_ref[:], iterations=iterations, phase_bug=phase_bug,
        mm_t=mm_t)

    # --- overlap-add across blocks (carry = last two blocks of prev tile) ---
    # Row shifts concatenate FULL 480-wide rows (lane offset 0 on every
    # operand — Mosaic rejects concatenates whose operands carry different
    # lane offsets, which is what column-sliced operands would have); the
    # lane-misaligned column slices happen afterwards inside elementwise
    # adds, which relayout fine (same pattern as the GL loop's wav[:, HOP:]).
    p1 = prev1_scr[:]                            # (1, 480) block b-1
    p2 = prev2_scr[:]                            # (1, 480) block b-2
    w1 = jnp.concatenate([p1, wav[:-1]], axis=0)           # rows shifted by 1
    w2 = jnp.concatenate([p2, p1, wav[:-2]], axis=0)       # rows shifted by 2
    acc = (wav[:, :HOP] + w1[:, HOP : 2 * HOP] + w2[:, 2 * HOP :])  # (tile, 160)

    # window-sum normalization: winv is the precomputed per-row reciprocal
    # (rows 0/1 have partial sums, row>=2 is uniform; a (1,160)->(tile,160)
    # broadcast of the padded 160-lane layout has no Mosaic lowering, so it
    # arrives as a full (tile, 160) block input instead)
    chunk = acc * winv_ref[:]

    # --- blocked low-pass over the tile's audio, one 160-sample hop/row ---
    hi = jax.lax.Precision.HIGHEST
    S = lp_scr.shape[1]
    q = jnp.dot(chunk, pmatT_ref[:], preferred_element_type=f32, precision=hi)  # (tile, S)

    # boundary states via the truncated power sum (see docstring):
    # S_all[i] = sum_{p<n_pow} U[i-p] @ (A^160)^p,  U = [s_in; Q]
    # => S_all[0] = s_in (exact), S_all[i] = state before row i,
    #    S_all[tile] = state leaving the tile.
    u_all = jnp.concatenate([lp_scr[:], q], axis=0)      # (tile+1, S)
    acc = u_all
    contrib = u_all
    zrow = jnp.zeros((1, S), f32)
    for _p in range(1, n_pow):
        contrib = jnp.dot(jnp.concatenate([zrow, contrib[:-1]], axis=0),
                          aT_ref[:], preferred_element_type=f32, precision=hi)
        acc = acc + contrib
    s_before = acc[:tile]                                # (tile, S)
    y = (jnp.dot(s_before, cpowT_ref[:], preferred_element_type=f32, precision=hi)
         + jnp.dot(chunk, tmatT_ref[:], preferred_element_type=f32, precision=hi))

    # --- norm + int16 (GriffinLim.py:172-174) ---
    scaled = jnp.clip(y / f32(norm * 1.01), -0.99, 0.99) * f32(2**15 - 1)
    out_ref[:] = scaled.astype(jnp.int16)

    # --- carries ---
    prev1_scr[:] = wav[-1:, :]
    prev2_scr[:] = wav[-2:-1, :]
    lp_scr[:] = acc[tile:]


@partial(jax.jit, static_argnames=("iterations", "phase_bug", "norm", "tile",
                                   "n_pow", "interpret", "bf16"))
def gl_audio_pallas(log_mels: jnp.ndarray, rand_init: jnp.ndarray, ops: StreamingGLOps,
                    lp_op, norm: float, iterations: int = 8, phase_bug: bool = True,
                    tile: int = 256, n_pow: int = 16,
                    interpret: bool = False, bf16: bool = False) -> jnp.ndarray:
    """Fused GL + vocoder tail: logMel frames -> int16 audio in ONE kernel.

    log_mels: (B+1, n_mel); rand_init: (B, 480); lp_op: BlockedIIR of the
    output low-pass at block length HOP=160 (params.lowpass_op — the same
    operator the streaming path uses).  ``n_pow`` is the truncated-power-sum
    order of the in-kernel boundary-state computation; 16 puts the
    truncation error at ~4e-14 for the 7.9 kHz Butterworth (see
    ``_gl_audio_kernel``).  Returns int16 audio (B*160,) — the stream the
    reference hands its soundcard sink (GriffinLim.py:144-174).
    """
    B = rand_init.shape[0]
    n_mel = log_mels.shape[1]
    assert lp_op.block == HOP
    Bp = -(-B // tile) * tile
    lm0 = jnp.pad(log_mels[:-1].astype(jnp.float32), ((0, Bp - B), (0, 0)))
    lm1 = jnp.pad(log_mels[1:].astype(jnp.float32), ((0, Bp - B), (0, 0)))
    wav = jnp.pad(rand_init.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    win2d = ops.window.astype(jnp.float32)[None, :]
    # per-row window-sum reciprocal (GriffinLim.py:156-166): rows 0 and 1
    # see partial sums, every later row the full 3-term sum
    w = ops.ola_window.astype(jnp.float32)
    rows = jnp.arange(Bp)[:, None]
    wsum = (w[None, :HOP]
            + jnp.where(rows >= 1, w[None, HOP : 2 * HOP], 0.0)
            + jnp.where(rows >= 2, w[None, 2 * HOP :], 0.0))
    winv = jnp.where(wsum != 0, 1.0 / jnp.where(wsum != 0, wsum, 1.0), 1.0)
    Km = FFT_SIZE // 2
    S = lp_op.dim

    grid = (Bp // tile,)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    def call_kernel(*arrays):
        return pl.pallas_call(
            partial(_gl_audio_kernel, iterations=iterations, phase_bug=phase_bug,
                    norm=float(norm), tile=tile, n_pow=n_pow, bf16=bf16),
            out_shape=jax.ShapeDtypeStruct((Bp, HOP), jnp.int16),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, n_mel), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n_mel), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, BLOCK_SAMPLES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                full((n_mel, Km)),
                full((1, n_mel)),
                full((FFT_SIZE, Km)),
                full((FFT_SIZE, Km)),
                full((1, FFT_SIZE)),
                full((Km, FFT_SIZE)),
                full((Km, FFT_SIZE)),
                full((1, FFT_SIZE)),
                full((1, FFT_SIZE)),
                pl.BlockSpec((tile, HOP), lambda i: (i, 0), memory_space=pltpu.VMEM),
                full((HOP, HOP)),
                full((HOP, S)),
                full((S, HOP)),
                full((S, S)),
            ],
            out_specs=pl.BlockSpec((tile, HOP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, BLOCK_SAMPLES), jnp.float32),
                pltpu.VMEM((1, BLOCK_SAMPLES), jnp.float32),
                pltpu.VMEM((1, S), jnp.float32),
            ],
            interpret=interpret,
        )(*arrays)

    minv, minvn, fcos, fsin, fnyq, icos, isin, inyq = _split_nyquist(ops)
    # The kernel keys its scratch reset and cross-tile OLA/low-pass carries
    # on program_id(0): vmap must launch one kernel per batch element
    # (pallas_util.sequential_vmap) or state leaks between elements.
    out = sequential_vmap(call_kernel)(
        lm0, lm1, wav, minv, minvn, fcos, fsin, fnyq, icos, isin, inyq,
        win2d, winv,
        jnp.asarray(lp_op.Tmat, jnp.float32).T, jnp.asarray(lp_op.Pmat, jnp.float32).T,
        jnp.asarray(lp_op.Cpow, jnp.float32).T, jnp.asarray(lp_op.A_L, jnp.float32).T)
    return out.reshape(-1)[: B * HOP]


@partial(jax.jit, static_argnames=("iterations", "phase_bug", "tile", "interpret", "bf16"))
def gl_blocks_pallas(log_mels: jnp.ndarray, rand_init: jnp.ndarray, ops: StreamingGLOps,
                     iterations: int = 8, phase_bug: bool = True, tile: int = 256,
                     interpret: bool = False, bf16: bool = False) -> jnp.ndarray:
    """Fused GL iterations.  log_mels: (B+1, n_mel) dequantized frames (block
    b uses frames b, b+1; the mel inversion runs in-kernel); rand_init:
    (B, 480).  Returns reconstructed blocks (B, 480)."""
    B = rand_init.shape[0]
    n_mel = log_mels.shape[1]
    Bp = -(-B // tile) * tile
    lm0 = jnp.pad(log_mels[:-1].astype(jnp.float32), ((0, Bp - B), (0, 0)))
    lm1 = jnp.pad(log_mels[1:].astype(jnp.float32), ((0, Bp - B), (0, 0)))
    wav = jnp.pad(rand_init.astype(jnp.float32), ((0, Bp - B), (0, 0)))
    win2d = ops.window.astype(jnp.float32)[None, :]
    Km = FFT_SIZE // 2

    grid = (Bp // tile,)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_gl_kernel, iterations=iterations, phase_bug=phase_bug, bf16=bf16),
        out_shape=jax.ShapeDtypeStruct((Bp, BLOCK_SAMPLES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, n_mel), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n_mel), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, BLOCK_SAMPLES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const((n_mel, Km)),
            const((1, n_mel)),
            const((FFT_SIZE, Km)),
            const((FFT_SIZE, Km)),
            const((1, FFT_SIZE)),
            const((Km, FFT_SIZE)),
            const((Km, FFT_SIZE)),
            const((1, FFT_SIZE)),
            const((1, FFT_SIZE)),
        ],
        out_specs=pl.BlockSpec((tile, BLOCK_SAMPLES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lm0, lm1, wav, *_split_nyquist(ops), win2d)
    return out[:B]
