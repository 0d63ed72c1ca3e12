"""Pallas kernels vs the jnp reference paths (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
from closed_loop_seeg_speech_synthesis_tpu.ops import framing, griffinlim as gl, mel as mel_ops
from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_frontend import frontend_logpower, make_frontend_ops
from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_gl import gl_blocks_pallas
from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline


@pytest.mark.parametrize("phase_bug", [True, False])
def test_pallas_gl_matches_jnp(rng, phase_bug):
    ops = gl.make_streaming_gl_ops(dtype=jnp.float32)
    logmels = jnp.asarray(rng.randn(20, 40) * 0.5 - 1.0, jnp.float32)
    rand = jnp.asarray(rng.rand(19, 480), jnp.float32)
    re_ref = gl.streaming_gl_blocks(logmels, rand, ops, 8, phase_bug)
    re_p = gl_blocks_pallas(logmels, rand, ops, 8, phase_bug, tile=8, interpret=True)
    # interpret mode executes the same jnp ops (incl. the real-atan2 in the
    # kernel, which matches arctan2 to ~1e-7)
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re_ref), atol=2e-4)


@pytest.mark.parametrize("sr", [1024.0, 2048.0])
def test_pallas_frontend_matches_jnp(rng, sr):
    C = 16
    T = int(sr * 2)
    eeg = rng.randn(T, C).astype(np.float32)
    cfg = pipeline.DecoderConfig(sr=sr, n_channels=C, dtype=jnp.float32)
    dummy = lda_mod.LDAParams(coef=jnp.zeros((40, 9, 20)), intercept=jnp.zeros((40, 9)),
                              classes=jnp.zeros((40, 9), jnp.int32), valid=jnp.ones((40, 9), bool))
    params = pipeline.build_decoder_params(cfg, dummy, np.zeros((40, 9)), np.arange(20))
    assert params.frontend_ops is not None

    ends = framing.streaming_frame_ends(50, 10, sr, T + cfg.prefill)
    nf = len(ends)
    s_cat, _ = pipeline._streaming_filter_chain(params, cfg, jnp.asarray(eeg))
    F_ref = np.asarray(framing.windowed_logpower(s_cat, jnp.asarray(ends, jnp.int32), cfg.win))

    x = jnp.asarray(eeg)
    s0 = params.filt_zi_scale[:, None] * x[0][None, :] + params.filt_s_const[:, None]
    F_p = np.asarray(frontend_logpower(params.frontend_ops, x, s0, nf, interpret=True))
    np.testing.assert_allclose(F_p, F_ref, atol=1e-4)
