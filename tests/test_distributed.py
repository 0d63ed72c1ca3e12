"""Multi-host DCN fan-out: 2 real processes x 4 virtual CPU devices run the
data-parallel replay over one global mesh; shards must equal the
single-process decode of the same sessions (SURVEY.md §2 DCN notes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
from closed_loop_seeg_speech_synthesis_tpu.ops import framing, griffinlim as gl
from closed_loop_seeg_speech_synthesis_tpu.parallel.distributed import dryrun_dcn
from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline


def test_dcn_dryrun_matches_local(tmp_path):
    shards, logs = dryrun_dcn(n_processes=2, n_local_devices=4,
                              workdir=str(tmp_path), port=52113)
    assert len(shards) == 2
    spec_dist = np.concatenate(shards, axis=0)          # (16, nf, 40)

    # single-process reference on the same deterministic inputs (the worker
    # script regenerates them from the same seeds)
    rng = np.random.RandomState(0)
    C, T, sr = 8, 2048, 1024.0
    cfg = pipeline.DecoderConfig(sr=sr, n_channels=C, dtype=jnp.float32)
    lda = lda_mod.LDAParams(
        coef=jnp.asarray(rng.randn(40, 9, 20) * 0.1, jnp.float32),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float32),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.ones((40, 9), bool))
    medians = np.sort(rng.randn(40, 9), axis=1)
    params = pipeline.build_decoder_params(cfg, lda, medians, rng.permutation(5 * C)[:20])
    ends = framing.streaming_frame_ends(50, 10, sr, T + cfg.prefill)
    nf = len(ends)
    B = 16
    eeg_all = rng.randn(B, T, C).astype(np.float32)
    assert spec_dist.shape == (B, nf, 40)
    for i in range(0, B, 5):
        rand = gl.default_rand_init(jax.random.PRNGKey(i), nf - 1, 0, jnp.float32)
        spec_i, _ = pipeline.offline_decode(params, cfg, eeg_all[i],
                                            rand_init=np.asarray(rand))
        np.testing.assert_allclose(spec_dist[i], np.asarray(spec_i),
                                   rtol=1e-4, atol=1e-4)


def test_dcn_train_matches_local(tmp_path):
    """Multi-host training fan-out: 2 processes x 4 virtual devices fit ONE
    model from the globally sharded session batch; every process fetches the
    same replica, and it matches a single-process fit of the pooled batch on
    an identically shaped (8 data x 1 model) mesh."""
    from closed_loop_seeg_speech_synthesis_tpu.parallel import (
        distributed as dist, mesh as mesh_lib, sharded)

    reps, logs = dist.dryrun_dcn_train(n_processes=2, n_local_devices=4,
                                       workdir=str(tmp_path), port=52119)
    assert len(reps) == 2
    for k in reps[0]:
        np.testing.assert_array_equal(reps[0][k], reps[1][k])

    # single-process reference: same pooled sessions (worker regenerates them
    # from the same seed), same mesh shape
    rng = np.random.RandomState(7)
    cfg = sharded.ShardedTrainConfig(dtype=jnp.float32, nb_feats=16, iir_block=128)
    T, C = 2048, 8
    Ta = int(T / cfg.sr * cfg.audio_sr)
    B = 16
    eeg = rng.randn(B, T, C).astype(np.float32)
    audio = (rng.randn(B, Ta) * 0.1).astype(np.float32)
    mesh = mesh_lib.make_mesh(8, model_axis=1)
    params, select, medians = dist.distributed_train(mesh, cfg, eeg, audio)

    np.testing.assert_array_equal(select, reps[0]["select"])
    np.testing.assert_allclose(medians, reps[0]["medians"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(params.coef, reps[0]["coef"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(params.intercept, reps[0]["intercept"],
                               rtol=1e-3, atol=1e-3)
