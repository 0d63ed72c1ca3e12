"""2048 Hz / 64-sample-packet operating point (decode.py:115-116)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline, trainer
import golden


SR = 2048.0
C = 4
T = 6144  # 3 s


@pytest.fixture(scope="module")
def trained_2048():
    rng = np.random.RandomState(21)
    eeg = rng.randn(T, C)
    t = np.arange(int(T / SR * 48000)) / 48000.0
    audio = 0.4 * np.sin(2 * np.pi * 250 * t)
    res = trainer.train(eeg, audio, SR, 48000.0, bad_channels=[], nb_feats=12)
    cfg = pipeline.DecoderConfig(sr=SR, n_channels=C, packet_size=64, dtype=jnp.float64)
    dec = pipeline.build_decoder_params(cfg, res.lda, res.medians, res.select)
    return rng, eeg, res, cfg, dec


def test_offline_matches_golden_2048(trained_2048):
    rng, eeg, res, cfg, dec = trained_2048
    key = jax.random.PRNGKey(5)
    spec, audio = pipeline.offline_decode(dec, cfg, eeg, key=key)
    spec = np.asarray(spec)

    from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
    from closed_loop_seeg_speech_synthesis_tpu.ops import griffinlim as gl

    ests = lda_mod.to_sklearn_estimators(res.lda)
    chain = golden.GoldenFeatureChain(SR, line_noise=50)
    rand = np.asarray(gl.default_rand_init(key, spec.shape[0] - 1, 0, jnp.float64))
    voc = golden.GoldenVocoder(num_iterations=8, norm_factor=10.0, phase_bug=True, lowpass="sos")

    g_spec, g_chunks, fidx = [], [], 0
    for i in range(0, T, 64):
        for row in chain.process(eeg[i : i + 64]):
            feats = row[res.select][None, :]
            pred = np.array([est.predict(feats)[0] for est in ests])
            mel = golden.golden_dequantize(pred, res.medians)
            g_spec.append(mel)
            chunk = voc.process_frame(mel, rand[fidx - 1] if fidx >= 1 else None)
            if chunk is not None:
                g_chunks.append(chunk)
            fidx += 1
    g_spec = np.asarray(g_spec)
    assert spec.shape == g_spec.shape
    np.testing.assert_allclose(spec, g_spec, rtol=1e-9, atol=1e-11)
    g_audio = np.concatenate(g_chunks)
    assert np.abs(np.asarray(audio, int) - g_audio.astype(int)).max() <= 1


def test_online_matches_offline_2048(trained_2048):
    rng, eeg, res, cfg, dec = trained_2048
    key = jax.random.PRNGKey(5)
    spec_ref, audio_ref = pipeline.offline_decode(dec, cfg, eeg, key=key)
    step = pipeline.make_online_step(dec, cfg, key)
    carry = pipeline.init_online_carry(dec, cfg)
    specs, chunks = [], []
    for i in range(0, T, 64):
        carry, out = step(carry, jnp.asarray(eeg[i : i + 64]))
        specs.append(np.asarray(out["spec"])[np.asarray(out["spec_valid"])])
        chunks.append(np.asarray(out["audio"])[np.asarray(out["audio_valid"])])
    spec_on = np.concatenate(specs)
    audio_on = np.concatenate(chunks).reshape(-1)
    np.testing.assert_allclose(spec_on, np.asarray(spec_ref), rtol=1e-9, atol=1e-11)
    assert np.abs(audio_on.astype(int) - np.asarray(audio_ref).astype(int)).max() <= 1
