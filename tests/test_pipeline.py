"""End-to-end decoder equivalence: batch offline == online step == golden.

This is the framework's core correctness gate (BASELINE.md): a trained model
decoded over a recorded session must produce identical spectrogram frames
and int16 audio across (a) the fully-batched offline path, (b) the
packet-by-packet online step, and (c) the literal NumPy golden simulator of
the reference's streaming semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
from closed_loop_seeg_speech_synthesis_tpu.ops import griffinlim as gl
from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline, trainer, params as params_io
import golden


SR = 1024.0
C = 6
T = 4096  # 4 s


@pytest.fixture(scope="module")
def trained():
    rng = np.random.RandomState(7)
    eeg = rng.randn(T, C)
    # synthetic audio with band content (3 s at 48 kHz)
    t = np.arange(int(T / SR * 48000)) / 48000.0
    audio = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.randn(len(t))
    res = trainer.train(eeg, audio, SR, 48000.0, bad_channels=[], nb_feats=20)
    cfg = pipeline.DecoderConfig(sr=SR, n_channels=C, packet_size=32, dtype=jnp.float64)
    dec = pipeline.build_decoder_params(cfg, res.lda, res.medians, res.select)
    return rng, eeg, res, cfg, dec


def test_offline_decode_shapes(trained):
    rng, eeg, res, cfg, dec = trained
    spec, audio = pipeline.offline_decode(dec, cfg, eeg, key=jax.random.PRNGKey(3))
    n_frames = spec.shape[0]
    assert spec.shape == (n_frames, 40)
    assert audio.shape == ((n_frames - 1) * 160,)
    assert audio.dtype == jnp.int16
    # decoded spectrogram values come from the medians table (then smoothed):
    assert np.isfinite(np.asarray(spec)).all()


def test_offline_matches_golden_stream(trained):
    """Batch decode == literal chunked reference-semantics simulator."""
    rng, eeg, res, cfg, dec = trained
    n_frames_expect = None

    # golden: feature chain + LDA + dequant + vocoder, 32-sample packets
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis  # noqa: F401
    ests = lda_mod.to_sklearn_estimators(res.lda)
    chain = golden.GoldenFeatureChain(SR, line_noise=50)

    # shared random inits
    key = jax.random.PRNGKey(3)
    spec, audio = pipeline.offline_decode(dec, cfg, eeg, key=key)
    spec = np.asarray(spec)
    n_frames = spec.shape[0]
    rand = np.asarray(gl.default_rand_init(key, n_frames - 1, 0, jnp.float64))

    voc = golden.GoldenVocoder(num_iterations=8, norm_factor=10.0, phase_bug=True, lowpass="sos")
    g_spec, g_chunks = [], []
    fidx = 0
    for i in range(0, T, 32):
        for row in chain.process(eeg[i : i + 32]):
            feats = row[res.select][None, :]
            pred = np.array([est.predict(feats)[0] for est in ests])
            mel = golden.golden_dequantize(pred, res.medians)
            g_spec.append(mel)
            chunk = voc.process_frame(mel, rand[fidx - 1] if fidx >= 1 else None)
            if chunk is not None:
                g_chunks.append(chunk)
            fidx += 1
    g_spec = np.asarray(g_spec)
    g_audio = np.concatenate(g_chunks)

    assert spec.shape == g_spec.shape
    np.testing.assert_allclose(spec, g_spec, rtol=1e-9, atol=1e-11)
    assert np.abs(np.asarray(audio, int) - g_audio.astype(int)).max() <= 1


def test_online_step_matches_offline(trained):
    """Packet-by-packet jitted step == batch decode (same key => same audio)."""
    rng, eeg, res, cfg, dec = trained
    key = jax.random.PRNGKey(3)
    spec_ref, audio_ref = pipeline.offline_decode(dec, cfg, eeg, key=key)
    spec_ref, audio_ref = np.asarray(spec_ref), np.asarray(audio_ref)

    step = pipeline.make_online_step(dec, cfg, key)
    carry = pipeline.init_online_carry(dec, cfg)
    specs, chunks = [], []
    for i in range(0, T, 32):
        carry, out = step(carry, jnp.asarray(eeg[i : i + 32]))
        sv = np.asarray(out["spec_valid"])
        av = np.asarray(out["audio_valid"])
        specs.append(np.asarray(out["spec"])[sv])
        chunks.append(np.asarray(out["audio"])[av])
    spec_on = np.concatenate(specs)
    audio_on = np.concatenate(chunks).reshape(-1)

    assert spec_on.shape == spec_ref.shape
    np.testing.assert_allclose(spec_on, spec_ref, rtol=1e-9, atol=1e-11)
    assert audio_on.shape == audio_ref.shape
    assert np.abs(audio_on.astype(int) - audio_ref.astype(int)).max() <= 1


def test_chunked_dispatch_matches_single(trained):
    """OnlineDecoder(chunk_steps=K) decodes K packets per dispatch;
    bit-identical outputs to per-packet dispatch, including a stream tail
    that is not a multiple of K (drained through the single-step program)."""
    from closed_loop_seeg_speech_synthesis_tpu.runtime.online import OnlineDecoder

    rng, eeg, res, cfg, dec = trained
    n_pkts = 101  # NOT a multiple of 4: exercises the tail drain
    packets = [eeg[i * 32 : (i + 1) * 32] for i in range(n_pkts)]

    outs = []
    for chunk_steps, pipelined in ((1, False), (4, False), (4, True)):
        d = OnlineDecoder(cfg, dec, key=jax.random.PRNGKey(3),
                          chunk_steps=chunk_steps, pipelined=pipelined)
        for p in packets:
            d.process_packet(p)
        outs.append(d.results())
    for spec, audio, received in outs[1:]:
        np.testing.assert_array_equal(spec, outs[0][0])
        np.testing.assert_array_equal(audio, outs[0][1])
        np.testing.assert_array_equal(received, outs[0][2])


def test_params_roundtrip(tmp_path, trained):
    rng, eeg, res, cfg, dec = trained
    path = params_io.store_training(str(tmp_path), res, bad_channels=[2, 5])
    loaded = params_io.load_params(path, dtype=jnp.float64)
    np.testing.assert_array_equal(loaded["bad_channels"], [2, 5])
    np.testing.assert_array_equal(loaded["select"], res.select)
    np.testing.assert_allclose(loaded["medians"], res.medians)
    np.testing.assert_allclose(np.asarray(loaded["lda"].coef), np.asarray(res.lda.coef), rtol=1e-12)

    # pickled-blob fallback path (reference-produced params.h5)
    import h5py
    with h5py.File(path, "r+") as hf:
        for k in ["lda_coef", "lda_intercept", "lda_classes", "lda_valid"]:
            del hf[k]
    loaded2 = params_io.load_params(path, dtype=jnp.float64)
    X = rng.randn(50, res.x_train.shape[1])
    p1 = np.asarray(lda_mod.predict(loaded["lda"], jnp.asarray(X)))
    p2 = np.asarray(lda_mod.predict(loaded2["lda"], jnp.asarray(X)))
    np.testing.assert_array_equal(p1, p2)
