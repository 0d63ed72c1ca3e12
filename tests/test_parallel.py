"""Multi-device sharding on the forced 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.parallel import mesh as mesh_lib, sharded


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return mesh_lib.make_mesh(8)


def test_mesh_shape(mesh8):
    assert mesh8.shape["data"] * mesh8.shape["model"] == 8


def test_sharded_train_step_runs_and_matches_single_device(mesh8):
    rng = np.random.RandomState(0)
    cfg = sharded.ShardedTrainConfig(dtype=jnp.float64, nb_feats=12, iir_block=128)
    B, T, C = 4, 2048, 16
    Ta = int(T / cfg.sr * cfg.audio_sr)
    eeg = rng.randn(B, T, C)
    audio = rng.randn(B, Ta) * 0.1

    step, (eeg_sh, audio_sh) = sharded.make_sharded_train_step(mesh8, cfg, T, Ta, C)
    e = jax.device_put(jnp.asarray(eeg), eeg_sh)
    a = jax.device_put(jnp.asarray(audio), audio_sh)
    params, select, medians = step(e, a)
    jax.block_until_ready(params.coef)
    assert params.coef.shape == (40, 9, 12)
    assert np.isfinite(np.asarray(params.coef)).all()

    # single-device reference: same computation, no shardings
    mesh1 = mesh_lib.make_mesh(1)
    step1, _ = sharded.make_sharded_train_step(mesh1, cfg, T, Ta, C)
    p1, s1, m1 = step1(jnp.asarray(eeg), jnp.asarray(audio))
    np.testing.assert_array_equal(np.asarray(select), np.asarray(s1))
    np.testing.assert_allclose(np.asarray(medians), np.asarray(m1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(params.coef), np.asarray(p1.coef), rtol=1e-6, atol=1e-9)


def test_channel_sharded_decode(mesh8):
    """Channel-sharded decode == unsharded decode (bitwise path equality)."""
    from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
    from closed_loop_seeg_speech_synthesis_tpu.ops import framing, griffinlim as gl
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

    rng = np.random.RandomState(4)
    sr, C, T = 1024.0, 16, 2048
    cfg = pipeline.DecoderConfig(sr=sr, n_channels=C, dtype=jnp.float64)
    lda_params = lda_mod.LDAParams(
        coef=jnp.asarray(rng.randn(40, 9, 20), jnp.float64),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float64),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.ones((40, 9), bool),
    )
    dec = pipeline.build_decoder_params(cfg, lda_params, np.sort(rng.randn(40, 9), 1),
                                        rng.permutation(5 * C)[:20])
    ends = framing.streaming_frame_ends(50, 10, sr, T + cfg.prefill)
    nf = len(ends)
    eeg = rng.randn(T, C)
    rand = gl.default_rand_init(jax.random.PRNGKey(0), nf - 1, 0, jnp.float64)

    sharded_decode, eeg_sh = sharded.make_sharded_decode(mesh8, dec, cfg, nf)
    e_sharded = jax.device_put(jnp.asarray(eeg), eeg_sh)
    spec_s, audio_s = sharded_decode(e_sharded, jnp.asarray(ends, jnp.int32), rand)

    spec_r, audio_r = pipeline._offline_decode_jit(dec, cfg, jnp.asarray(eeg),
                                                   jnp.asarray(ends, jnp.int32), rand)
    np.testing.assert_allclose(np.asarray(spec_s), np.asarray(spec_r), rtol=1e-9, atol=1e-12)
    assert np.abs(np.asarray(audio_s, int) - np.asarray(audio_r, int)).max() <= 1


def test_batched_replay_sharding(mesh8):
    """Chance-run fan-out: decode a batch of sessions across the mesh."""
    from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
    from closed_loop_seeg_speech_synthesis_tpu.ops import framing, griffinlim as gl
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

    rng = np.random.RandomState(1)
    sr, C, T, B = 1024.0, 16, 2048, 4
    cfg = pipeline.DecoderConfig(sr=sr, n_channels=C, dtype=jnp.float64)
    lda_params = lda_mod.LDAParams(
        coef=jnp.asarray(rng.randn(40, 9, 20), jnp.float64),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float64),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.ones((40, 9), bool),
    )
    dec = pipeline.build_decoder_params(cfg, lda_params, np.sort(rng.randn(40, 9), 1),
                                        rng.permutation(5 * C)[:20])
    ends = framing.streaming_frame_ends(50, 10, sr, T + cfg.prefill)
    nf = len(ends)
    replay = sharded.make_batched_replay(mesh8, pipeline._offline_decode_jit, cfg, nf)
    eeg_b = jnp.asarray(rng.randn(B, T, C))
    rand_b = jnp.stack([gl.default_rand_init(jax.random.PRNGKey(i), nf - 1, 0, jnp.float64)
                        for i in range(B)])
    specs, audios = replay(dec, eeg_b, jnp.asarray(ends, jnp.int32), rand_b)
    assert specs.shape == (B, nf, 40)
    assert audios.shape == (B, (nf - 1) * 160)

    # batch result == per-session result
    s0, a0 = pipeline._offline_decode_jit(dec, cfg, eeg_b[0], jnp.asarray(ends, jnp.int32), rand_b[0])
    np.testing.assert_allclose(np.asarray(specs[0]), np.asarray(s0), rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(audios[0]), np.asarray(a0))


def test_make_mesh_errors():
    import pytest
    with pytest.raises(ValueError, match="only 8 exist"):
        mesh_lib.make_mesh(16)
    with pytest.raises(ValueError, match="does not divide"):
        mesh_lib.make_mesh(8, model_axis=3)
