"""512 Hz operating point: >4 frames per 32-sample packet (dynamic slots).

Regression for the review finding that a fixed 4-slot online step silently
corrupts decoding for slower amplifiers (shift = 5.12 samples -> up to 7
frame ends per packet).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline, trainer


SR = 512.0
C = 3
T = 4096  # 8 s


def test_online_matches_offline_512():
    rng = np.random.RandomState(31)
    eeg = rng.randn(T, C)
    t = np.arange(int(T / SR * 48000)) / 48000.0
    audio = 0.3 * np.sin(2 * np.pi * 200 * t)
    res = trainer.train(eeg, audio, SR, 48000.0, bad_channels=[], nb_feats=10)
    cfg = pipeline.DecoderConfig(sr=SR, n_channels=C, packet_size=32, dtype=jnp.float64)
    dec = pipeline.build_decoder_params(cfg, res.lda, res.medians, res.select)

    assert pipeline.max_frames_per_packet(32, np.asarray(dec.shift_table)) > 4

    key = jax.random.PRNGKey(2)
    spec_ref, audio_ref = pipeline.offline_decode(dec, cfg, eeg, key=key)

    step = pipeline.make_online_step(dec, cfg, key)
    carry = pipeline.init_online_carry(dec, cfg)
    specs, chunks = [], []
    for i in range(0, T, 32):
        carry, out = step(carry, jnp.asarray(eeg[i : i + 32]))
        specs.append(np.asarray(out["spec"])[np.asarray(out["spec_valid"])])
        chunks.append(np.asarray(out["audio"])[np.asarray(out["audio_valid"])])
    spec_on = np.concatenate(specs)
    audio_on = np.concatenate(chunks).reshape(-1)

    assert spec_on.shape == np.asarray(spec_ref).shape
    np.testing.assert_allclose(spec_on, np.asarray(spec_ref), rtol=1e-9, atol=1e-10)
    assert np.abs(audio_on.astype(int) - np.asarray(audio_ref).astype(int)).max() <= 1
