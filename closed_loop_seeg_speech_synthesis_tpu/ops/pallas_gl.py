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


def _gl_kernel(lm0_ref, lm1_ref, wav_ref, minv_ref, fcos_ref, fsin_ref, icos_ref,
               isin_ref, win_ref, out_ref, *, iterations: int, phase_bug: bool,
               bf16: bool = False):
    mm_t = jnp.bfloat16 if bf16 else jnp.float32
    f32 = jnp.float32
    fcos = fcos_ref[:].astype(mm_t)  # (N, K)
    fsin = fsin_ref[:].astype(mm_t)  # (N, K)
    icos = icos_ref[:].astype(mm_t)  # (K, N)
    isin = isin_ref[:].astype(mm_t)  # (K, N)
    win = win_ref[:]            # (1, N)

    def from_log_mels(lm):
        # exp(logmels) @ Minv with NaN/Inf scrub (MelFilterBank.py:82-83)
        out = jnp.dot(jnp.exp(lm), minv_ref[:], preferred_element_type=f32)
        return jnp.where(jnp.isfinite(out), out, 0.0)

    spec0 = from_log_mels(lm0_ref[:])  # (TB, K)
    spec1 = from_log_mels(lm1_ref[:])
    wav = wav_ref[:]            # (TB, 480)
    pi = f32(np.pi)

    def one_frame(fr, spec):
        fr = fr.astype(mm_t)
        xr = jnp.dot(fr, fcos, preferred_element_type=f32)
        xi = -jnp.dot(fr, fsin, preferred_element_type=f32)
        if phase_bug:
            ang = _atan2(xi, xr)
            # DC/Nyquist bins are exactly real: angle is 0 or +pi by np.angle
            # convention (see stft.make_rdft / griffinlim._gl_iteration)
            k = xr.shape[-1]
            col = jax.lax.broadcasted_iota(jnp.int32, ang.shape, 1)
            edge_bin = (col == 0) | (col == k - 1)
            ang = jnp.where(edge_bin, jnp.where(xr < 0, pi, 0.0), ang)
            zr = spec * jnp.exp(ang)
            t = jnp.dot(zr.astype(mm_t), icos, preferred_element_type=f32)
        else:
            r = jnp.sqrt(xr * xr + xi * xi)
            safe = r > 0
            inv = jnp.where(safe, 1.0 / jnp.where(safe, r, 1.0), 0.0)
            zr = spec * jnp.where(safe, xr * inv, 1.0)
            zi = spec * (xi * inv)
            t = jnp.dot(zr.astype(mm_t), icos, preferred_element_type=f32) + jnp.dot(
                zi.astype(mm_t), isin, preferred_element_type=f32)
        return t * win

    for _ in range(iterations):
        f0 = wav[:, 0:FFT_SIZE] * win
        f1 = wav[:, HOP : HOP + FFT_SIZE] * win
        t0 = one_frame(f0, spec0)
        t1 = one_frame(f1, spec1)
        zeros_tail = jnp.zeros((wav.shape[0], _PAD_TAIL), f32)
        zeros_head = jnp.zeros((wav.shape[0], HOP), f32)
        zeros_mid = jnp.zeros((wav.shape[0], _PAD_MID), f32)
        wav = (jnp.concatenate([t0, zeros_tail], axis=1)
               + jnp.concatenate([zeros_head, t1, zeros_mid], axis=1))
    out_ref[:] = wav


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
    K = ops.rdft.F_cos.shape[1]

    grid = (Bp // tile,)
    out = pl.pallas_call(
        partial(_gl_kernel, iterations=iterations, phase_bug=phase_bug, bf16=bf16),
        out_shape=jax.ShapeDtypeStruct((Bp, BLOCK_SAMPLES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, n_mel), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n_mel), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, BLOCK_SAMPLES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mel, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FFT_SIZE, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FFT_SIZE, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, FFT_SIZE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, FFT_SIZE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FFT_SIZE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, BLOCK_SAMPLES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lm0, lm1, wav, ops.Minv.astype(jnp.float32),
      ops.rdft.F_cos.astype(jnp.float32), ops.rdft.F_sin.astype(jnp.float32),
      ops.rdft.I_cos.astype(jnp.float32), ops.rdft.I_sin.astype(jnp.float32), win2d)
    return out[:B]
