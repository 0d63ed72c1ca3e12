"""Reproducible stage profile of the offline decode path (TPU).

The round-2 BENCHMARKS.md stage table was measured ad hoc; this harness
commits the methodology so the profile can be regenerated and compared
across rounds.  Each stage runs as its own jitted program on the same
30-minute 128-channel session, timed with fetched-value gates, all stages
interleaved per repetition (relay/host drift hits every stage equally),
min-of-N reported.

Stages (split path, matching the round-2 table):
  filter_chain     48-dim blocked state-space warm-start IIR chain
  framing          periodic-grid log-power framing (matmul form)
  epilogue         context stack + 40-bin LDA + dequantize + smooth
  gl_kernel        Griffin-Lim iterations (pallas, VMEM-resident blocks)
  tail_xla         overlap-add + low-pass + int16 (XLA, pre-round-3 tail)
Fused alternatives:
  frontend_fused   eeg -> mel frames in ONE pallas kernel
  gl_tail_fused    mel -> int16 audio in ONE pallas kernel (round-3 tail)
End-to-end:
  full_split_tail  _offline_decode_jit with use_pallas_gl_tail=False
  full_fused       _offline_decode_jit with defaults (fused everywhere)

Run:  python benchmarks/stage_profile.py [duration_s] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main(duration_s=1800.0, reps=5):
    from closed_loop_seeg_speech_synthesis_tpu.utils import honor_platform_env
    honor_platform_env()
    import jax
    import jax.numpy as jnp
    from benchmarks.sweeps import _make
    from closed_loop_seeg_speech_synthesis_tpu.ops import framing, iir
    from closed_loop_seeg_speech_synthesis_tpu.ops import griffinlim as gl
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

    import dataclasses

    duration_s, reps = float(duration_s), int(reps)
    interp = jax.default_backend() == "cpu"  # pallas needs interpret mode on CPU smoke runs
    cfg, params = _make({}, 128)
    # use_pallas_gl_tail is a decode-time flag; share the built operators
    cfg_split_tail = dataclasses.replace(cfg, use_pallas_gl_tail=False)
    sr = cfg.sr
    T = int(sr * duration_s)
    ends = framing.streaming_frame_ends(cfg.frame_len_ms, cfg.frame_shift_ms, sr,
                                        T + cfg.prefill)
    n_frames = len(ends)
    S, Ls, P, origin = framing.periodic_window_matrix(ends, cfg.win)
    plan = (Ls, P, origin, n_frames)
    window_S = jnp.asarray(S, jnp.float32)
    ends_d = jnp.asarray(ends, jnp.int32)
    rand = gl.default_rand_init(jax.random.PRNGKey(0), n_frames - 1, 0, jnp.float32)

    eegs = [jax.jit(lambda k: jax.random.normal(k, (T, cfg.n_channels), jnp.float32))(
        jax.random.PRNGKey(i)) for i in range(2)]
    jax.block_until_ready(eegs)

    from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_frontend import (
        epilogue_constants, frontend_decode_mels, frontend_logpower)
    from closed_loop_seeg_speech_synthesis_tpu.ops.pallas_gl import (
        gl_audio_pallas, gl_blocks_pallas)

    W5, bm, med_slot, smoothM = epilogue_constants(
        params.lda_coef_full, params.lda.intercept, params.lda.valid,
        params.lda.classes, params.medians, params.gauss_kernel,
        cfg.n_channels, cfg.model_order)

    # NOTE: every big device array (eeg, s_cat, F, mel, re, rand) must be an
    # EXPLICIT jit argument, not a closure: closed-over arrays become XLA
    # constants embedded in the compile request, and the hosted relay rejects
    # multi-hundred-MB request bodies with HTTP 413.
    @jax.jit
    def run_filter(eeg):
        s0 = params.filt_zi_scale[:, None] * eeg[0][None, :] + params.filt_s_const[:, None]
        s_cat, _ = iir.iir_blocked(params.filt_op, eeg, s0)
        return s_cat

    @jax.jit
    def run_framing(s_cat):
        return framing.windowed_logpower_periodic(s_cat, window_S, Ls, n_frames, origin)

    @jax.jit
    def run_epilogue(F):
        stacked = framing.stack_context(F, cfg.model_order, cfg.step_size, zero_pad=True)
        return pipeline._frames_to_mel(params, stacked)

    @jax.jit
    def run_frontend_fused(eeg):
        s0 = params.filt_zi_scale[:, None] * eeg[0][None, :] + params.filt_s_const[:, None]
        return frontend_decode_mels(params.frontend_ops, eeg, s0, W5, bm, med_slot,
                                    smoothM, n_frames, cfg.model_order,
                                    cfg.step_size, periods_per_step=cfg.fused_periods,
                                    interpret=interp)

    @jax.jit
    def run_gl_kernel(mel, rand):
        return gl_blocks_pallas(mel, rand, params.gl_ops, cfg.gl_iterations,
                                cfg.phase_bug, interpret=interp)

    @jax.jit
    def run_tail_xla(re):
        raw = gl.overlap_add_stream(re, params.gl_ops)
        lp, _ = iir.iir_blocked(params.lowpass_op_batch, raw[:, None],
                                jnp.zeros((params.lowpass_op_batch.dim, 1), jnp.float32))
        return gl.to_int16(lp[:, 0], cfg.gl_norm)

    @jax.jit
    def run_gl_tail_fused(mel, rand):
        return gl_audio_pallas(mel, rand, params.gl_ops, params.lowpass_op,
                               float(cfg.gl_norm), cfg.gl_iterations, cfg.phase_bug,
                               interpret=interp)

    # single-fetch gate shared by all replay harnesses (benchmarks/gate.py);
    # big arrays are explicit jit args per the NOTE above (HTTP 413)
    from benchmarks.gate import gated_offline_decode

    def run_full(c, eeg):
        g = np.asarray(gated_offline_decode(params, c, eeg, ends_d, rand,
                                            window_S, plan))
        return float(g[0]), float(g[1])

    # stage inputs (device-resident, computed once)
    s_cat = jax.block_until_ready(run_filter(eegs[0]))
    F = jax.block_until_ready(run_framing(s_cat))
    mel = jax.block_until_ready(run_frontend_fused(eegs[0]))
    re = jax.block_until_ready(run_gl_kernel(mel, rand))

    stages = {
        "filter_chain": lambda e: float(jnp.sum(run_filter(e)[-1])),
        "framing": lambda e: float(jnp.sum(run_framing(s_cat)[-1])),
        "epilogue": lambda e: float(jnp.sum(run_epilogue(F)[-1])),
        "frontend_fused": lambda e: float(jnp.sum(run_frontend_fused(e)[-1])),
        "gl_kernel": lambda e: float(jnp.sum(run_gl_kernel(mel, rand)[-1])),
        "tail_xla": lambda e: int(run_tail_xla(re)[-1]),
        "gl_tail_fused": lambda e: int(run_gl_tail_fused(mel, rand)[-1]),
        "full_split_tail": lambda e: run_full(cfg_split_tail, e),
        "full_fused": lambda e: run_full(cfg, e),
    }

    for fn in stages.values():  # compile everything before any timing
        fn(eegs[0])

    walls = {k: [] for k in stages}
    for rep in range(reps):
        e = eegs[rep % len(eegs)]
        for name, fn in stages.items():
            t0 = time.perf_counter()
            fn(e)
            walls[name].append(time.perf_counter() - t0)

    for name in stages:
        w = min(walls[name])
        print(json.dumps({
            "metric": f"stage_{name}_ms", "value": round(w * 1e3, 1), "unit": "ms",
            "vs_baseline": round(duration_s / w / 1000, 2),
            "walls_ms": [round(x * 1e3, 1) for x in walls[name]],
        }), flush=True)
    tail_collapse = min(walls["tail_xla"]) + min(walls["gl_kernel"]) - min(walls["gl_tail_fused"])
    print(json.dumps({
        "metric": "stage_profile_verdict",
        "value": round(duration_s / min(walls["full_fused"]), 1), "unit": "x_realtime",
        "vs_baseline": round(duration_s / min(walls["full_fused"]) / 1000, 2),
        "tail_collapse_ms": round(tail_collapse * 1e3, 1),
        "full_fused_over_split_tail": round(
            min(walls["full_split_tail"]) / min(walls["full_fused"]), 3),
    }), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:3])
