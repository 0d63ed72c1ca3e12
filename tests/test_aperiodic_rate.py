"""Sample rates with rounding-tie (aperiodic) frame schedules.

sr=1025 Hz: banker's rounding at exact .5 fractions makes the streaming
frame grid non-periodic.  Offline decoding must work through the
non-periodic framing path; the online step (which needs the exact integer
shift table for unbounded sessions) must refuse with a clear error.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
from closed_loop_seeg_speech_synthesis_tpu.ops import framing
from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline


SR = 1025.0


def _params(rng, C):
    cfg = pipeline.DecoderConfig(sr=SR, n_channels=C, dtype=jnp.float64)
    lda_params = lda_mod.LDAParams(
        coef=jnp.asarray(rng.randn(40, 9, 10), jnp.float64),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float64),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.ones((40, 9), bool),
    )
    dec = pipeline.build_decoder_params(cfg, lda_params, np.sort(rng.randn(40, 9), 1),
                                        rng.permutation(5 * C)[:10])
    return cfg, dec


def test_shift_table_rejects_aperiodic():
    with pytest.raises(ValueError, match="not exactly periodic"):
        framing.shift_table(50, 10, SR)


def test_offline_decode_works_online_refuses(rng):
    C = 3
    cfg, dec = _params(rng, C)
    assert dec.shift_table.shape[0] == 0  # sentinel: no exact period
    eeg = rng.randn(3 * int(SR), C)
    spec, audio = pipeline.offline_decode(dec, cfg, eeg, key=jax.random.PRNGKey(0))
    n = spec.shape[0]
    assert n > 250 and audio.shape == ((n - 1) * 160,)

    # frame ends match the reference grid exactly (golden arithmetic)
    ends = framing.streaming_frame_ends(50, 10, SR, eeg.shape[0] + cfg.prefill)
    assert len(ends) == n

    with pytest.raises(ValueError, match="online decoding"):
        pipeline.make_online_step(dec, cfg, jax.random.PRNGKey(0))
