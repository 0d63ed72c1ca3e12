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


@pytest.mark.parametrize("phase_bug", [True, False])
def test_pallas_gl_audio_matches_jnp_tail(rng, phase_bug):
    """Fused GL+tail kernel == jnp GL -> overlap_add_stream -> blocked
    low-pass -> int16, including the first-blocks window-sum special cases
    and the cross-tile OLA/low-pass carries (B spans multiple tiles and a
    partial tail tile)."""
    from closed_loop_seeg_speech_synthesis_tpu.ops import filter_design as fd
    from closed_loop_seeg_speech_synthesis_tpu.ops import iir
    from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_gl import gl_audio_pallas

    ops = gl.make_streaming_gl_ops(dtype=jnp.float32)
    B = 21  # tiles of 8 -> 2 full tiles + partial
    logmels = jnp.asarray(rng.randn(B + 1, 40) * 0.5 - 1.0, jnp.float32)
    rand = jnp.asarray(rng.rand(B, 480), jnp.float32)
    norm = 10.0

    re_ref = gl.streaming_gl_blocks(logmels, rand, ops, 8, phase_bug)
    raw = gl.overlap_add_stream(re_ref, ops)
    lp_ss = iir.sos_to_statespace(fd.gl_output_lowpass_sos())
    lp_op = iir.make_blocked_iir(lp_ss, 160, jnp.float32)
    lp, _ = iir.iir_blocked(lp_op, raw[:, None], jnp.zeros((lp_ss.dim, 1), jnp.float32))
    audio_ref = np.asarray(gl.to_int16(lp[:, 0], norm))

    audio_p = np.asarray(gl_audio_pallas(logmels, rand, ops, lp_op, norm, 8,
                                         phase_bug, tile=8, interpret=True))
    assert audio_p.shape == audio_ref.shape == (B * 160,)
    # f32 kernel vs f32 jnp path at different block lengths: within 1 LSB
    assert np.abs(audio_p.astype(int) - audio_ref.astype(int)).max() <= 1


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


@pytest.mark.parametrize("sr", [1024.0, 2048.0])
def test_pallas_fused_epilogue_matches_jnp(rng, sr):
    """Fully fused eeg->mel kernel == filter/framing/stack/LDA/dequant/smooth
    jnp pipeline (includes missing-class masking and argmax tie semantics)."""
    from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_frontend import (
        epilogue_constants, frontend_decode_mels)

    C = 8
    T = int(sr * 2)
    eeg = rng.randn(T, C).astype(np.float32)
    n_feats = 20
    coef = rng.randn(40, 9, n_feats) * 0.3
    valid = np.ones((40, 9), bool)
    valid[7, 1] = False   # a bin with a missing interval (train.py:86-91)
    valid[14, 8] = False
    lda = lda_mod.LDAParams(
        coef=jnp.asarray(coef, jnp.float32),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float32),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.asarray(valid),
    )
    medians = np.sort(rng.randn(40, 9), axis=1)
    select = rng.permutation(5 * C)[:n_feats]
    cfg = pipeline.DecoderConfig(sr=sr, n_channels=C, dtype=jnp.float32)
    params = pipeline.build_decoder_params(cfg, lda, medians, select)
    assert params.frontend_ops is not None

    ends = framing.streaming_frame_ends(50, 10, sr, T + cfg.prefill)
    nf = len(ends)

    # jnp reference: same f32 pipeline
    s_cat, _ = pipeline._streaming_filter_chain(params, cfg, jnp.asarray(eeg))
    F = framing.windowed_logpower(s_cat, jnp.asarray(ends, jnp.int32), cfg.win)
    stacked = framing.stack_context(F, cfg.model_order, cfg.step_size, zero_pad=True)
    mel_ref = np.asarray(pipeline._frames_to_mel(params, stacked))

    x = jnp.asarray(eeg)
    s0 = params.filt_zi_scale[:, None] * x[0][None, :] + params.filt_s_const[:, None]
    W5, bm, med_slot, smoothM = epilogue_constants(
        params.lda_coef_full, params.lda.intercept, params.lda.valid,
        params.lda.classes, params.medians, params.gauss_kernel, C)
    mel_p = np.asarray(frontend_decode_mels(params.frontend_ops, x, s0, W5, bm,
                                            med_slot, smoothM, nf, interpret=True))
    assert mel_p.shape == mel_ref.shape == (nf, 40)
    # different contraction order -> rare argmax flips at near-ties; demand
    # near-total agreement and no systematic deviation
    agree = np.isclose(mel_p, mel_ref, rtol=1e-5, atol=1e-6).mean()
    assert agree > 0.999, f"agreement {agree}"


def test_pallas_fused_epilogue_invalid_never_selected(rng):
    """Slots masked invalid must never win the argmax in the fused kernel."""
    from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_frontend import (
        epilogue_constants, frontend_decode_mels)

    C, sr = 8, 1024.0
    T = int(sr * 1)
    eeg = rng.randn(T, C).astype(np.float32)
    n_feats = 10
    # bin 3: only class 5 valid -> output must be exactly medians[3, 5] smoothed
    valid = np.zeros((40, 9), bool)
    valid[:, :] = True
    valid[3, :] = False
    valid[3, 5] = True
    coef = rng.randn(40, 9, n_feats)
    lda = lda_mod.LDAParams(
        coef=jnp.asarray(coef, jnp.float32),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float32),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.asarray(valid),
    )
    medians = np.sort(rng.randn(40, 9), axis=1)
    cfg = pipeline.DecoderConfig(sr=sr, n_channels=C, dtype=jnp.float32)
    params = pipeline.build_decoder_params(cfg, lda, medians, rng.permutation(5 * C)[:n_feats])
    ends = framing.streaming_frame_ends(50, 10, sr, T + cfg.prefill)
    x = jnp.asarray(eeg)
    s0 = params.filt_zi_scale[:, None] * x[0][None, :] + params.filt_s_const[:, None]
    W5, bm, med_slot, smoothM = epilogue_constants(
        params.lda_coef_full, params.lda.intercept, params.lda.valid,
        params.lda.classes, params.medians, params.gauss_kernel, C)
    mel_p = np.asarray(frontend_decode_mels(params.frontend_ops, x, s0, W5, bm,
                                            med_slot, smoothM, len(ends), interpret=True))
    # invert the smoothing to recover the dequantized values for bin 3
    Minv = np.linalg.inv(np.asarray(smoothM))
    deq = mel_p @ Minv
    np.testing.assert_allclose(deq[:, 3], medians[3, 5], atol=1e-4)


@pytest.mark.parametrize("G", [2, 4])
def test_pallas_fused_epilogue_multi_period(rng, G):
    """periods_per_step > 1 == the G=1 kernel exactly (same math, bigger
    epilogue matmuls)."""
    from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_frontend import (
        epilogue_constants, frontend_decode_mels)

    C, sr = 8, 1024.0
    T = int(sr * 3)
    eeg = rng.randn(T, C).astype(np.float32)
    lda = lda_mod.LDAParams(
        coef=jnp.asarray(rng.randn(40, 9, 20) * 0.3, jnp.float32),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float32),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.ones((40, 9), bool))
    medians = np.sort(rng.randn(40, 9), axis=1)
    cfg = pipeline.DecoderConfig(sr=sr, n_channels=C, dtype=jnp.float32)
    params = pipeline.build_decoder_params(cfg, lda, medians, rng.permutation(5 * C)[:20])
    ends = framing.streaming_frame_ends(50, 10, sr, T + cfg.prefill)
    nf = len(ends)
    x = jnp.asarray(eeg)
    s0 = params.filt_zi_scale[:, None] * x[0][None, :] + params.filt_s_const[:, None]
    args = epilogue_constants(params.lda_coef_full, params.lda.intercept,
                              params.lda.valid, params.lda.classes,
                              params.medians, params.gauss_kernel, C)
    m1 = np.asarray(frontend_decode_mels(params.frontend_ops, x, s0, *args, nf,
                                         interpret=True))
    mg = np.asarray(frontend_decode_mels(params.frontend_ops, x, s0, *args, nf,
                                         periods_per_step=G, interpret=True))
    np.testing.assert_allclose(mg, m1, rtol=1e-6, atol=1e-6)


def test_gl_audio_pallas_vmap_isolated(rng):
    """vmap over gl_audio_pallas must keep batch elements independent.

    The kernel carries OLA tails + low-pass state across grid steps keyed on
    program_id(0); the default pallas batching rule would prepend a batch
    grid dim and leak state between elements.  The custom_vmap rule launches
    one kernel per element — outputs must equal the per-element calls
    exactly."""
    from closed_loop_seeg_speech_synthesis_tpu.ops import filter_design as fd
    from closed_loop_seeg_speech_synthesis_tpu.ops import iir
    from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_gl import gl_audio_pallas

    ops = gl.make_streaming_gl_ops(dtype=jnp.float32)
    V, B = 3, 11
    logmels = jnp.asarray(rng.randn(V, B + 1, 40) * 0.5 - 1.0, jnp.float32)
    rand = jnp.asarray(rng.rand(V, B, 480), jnp.float32)
    lp_ss = iir.sos_to_statespace(fd.gl_output_lowpass_sos())
    lp_op = iir.make_blocked_iir(lp_ss, 160, jnp.float32)

    run = lambda lm, ri: gl_audio_pallas(lm, ri, ops, lp_op, 10.0, 4, True,
                                         tile=8, interpret=True)
    batched = np.asarray(jax.vmap(run)(logmels, rand))
    for v in range(V):
        one = np.asarray(run(logmels[v], rand[v]))
        np.testing.assert_array_equal(batched[v], one)


def test_frontend_kernels_vmap_isolated(rng):
    """vmap over the streaming frontend kernels launches per element
    (pallas_util.sequential_vmap): the program_id-keyed filter-state carries
    must not leak between batch elements."""
    from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_frontend import (
        epilogue_constants, frontend_decode_mels, frontend_logpower)

    sr, C, V = 1024.0, 8, 3
    T = int(sr * 1)
    eegs = rng.randn(V, T, C).astype(np.float32)
    n_feats = 20
    lda = lda_mod.LDAParams(
        coef=jnp.asarray(rng.randn(40, 9, n_feats) * 0.3, jnp.float32),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float32),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.ones((40, 9), bool),
    )
    cfg = pipeline.DecoderConfig(sr=sr, n_channels=C, dtype=jnp.float32)
    params = pipeline.build_decoder_params(
        cfg, lda, np.sort(rng.randn(40, 9), axis=1),
        rng.permutation(5 * C)[:n_feats])
    nf = len(framing.streaming_frame_ends(50, 10, sr, T + cfg.prefill))
    W5, bm, med_slot, smoothM = epilogue_constants(
        params.lda_coef_full, params.lda.intercept, params.lda.valid,
        params.lda.classes, params.medians, params.gauss_kernel, C)

    def run_lp(e):
        s0 = params.filt_zi_scale[:, None] * e[0][None, :] + params.filt_s_const[:, None]
        return frontend_logpower(params.frontend_ops, e, s0, nf, interpret=True)

    def run_mels(e):
        s0 = params.filt_zi_scale[:, None] * e[0][None, :] + params.filt_s_const[:, None]
        return frontend_decode_mels(params.frontend_ops, e, s0, W5, bm,
                                    med_slot, smoothM, nf, interpret=True)

    x = jnp.asarray(eegs)
    for fn in (run_lp, run_mels):
        batched = np.asarray(jax.vmap(fn)(x))
        for v in range(V):
            np.testing.assert_array_equal(batched[v], np.asarray(fn(x[v])))


@pytest.mark.parametrize("phase_bug", [True, False])
def test_gl_bf16_quality(rng, phase_bug):
    """bf16 GL matmuls (gl_bf16 knob): quality-gated, not LSB parity.

    Griffin-Lim's output phase is not unique — precision changes pick a
    different waveform solution — so the gate is what the vocoder promises:
    spectral-objective attainment ||(|STFT(x)| - target)|| / ||target||.
    Measured (48 smooth blocks, 8 iters): with the correct phase estimator
    bf16 attains the identical objective as f32 (0.2820 both); under the
    reference's exp(angle) quirk (phase_bug=True, where the objective never
    converges) attainment is within ~2.5% and the per-hop energy envelope
    correlates ~0.95."""
    ops = gl.make_streaming_gl_ops(dtype=jnp.float32)
    from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_gl import gl_blocks_pallas

    B = 48
    # smooth, speech-like mel trajectories (iid frames would make any
    # spectral-attainment comparison meaningless)
    walk = np.cumsum(rng.randn(B + 1, 40) * 0.15, axis=0)
    lm = walk - walk.mean() - 1.0
    rand = rng.rand(B, 480)
    r32 = np.asarray(gl_blocks_pallas(jnp.asarray(lm, jnp.float32),
                                      jnp.asarray(rand, jnp.float32), ops, 8,
                                      phase_bug, tile=8, interpret=True), np.float64)
    r16 = np.asarray(gl_blocks_pallas(jnp.asarray(lm, jnp.float32),
                                      jnp.asarray(rand, jnp.float32), ops, 8,
                                      phase_bug, tile=8, interpret=True,
                                      bf16=True), np.float64)
    assert np.all(np.isfinite(r16))
    target = np.exp(lm)[:B] @ np.asarray(ops.Minv, np.float64)
    w = np.asarray(ops.window, np.float64)

    def attainment(a):
        mag = np.abs(np.fft.rfft(a[:, :256] * w, axis=1))
        return np.linalg.norm(mag - target) / np.linalg.norm(target)

    a32, a16 = attainment(r32), attainment(r16)
    if phase_bug:
        assert a16 <= a32 * 1.1, (a32, a16)
        e32 = np.sqrt((r32 ** 2).mean(axis=1) + 1e-6)
        e16 = np.sqrt((r16 ** 2).mean(axis=1) + 1e-6)
        assert np.corrcoef(e32, e16)[0, 1] > 0.9
    else:
        assert a16 <= a32 * 1.02, (a32, a16)
