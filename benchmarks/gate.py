"""Single-fetch timing gate shared by every offline-replay harness.

Timed runs must gate on FETCHED values (the hosted TPU relay acks
``block_until_ready`` early in some paths), but each fetch is a serialized
~25 ms relay RPC — fetching the spec-sum and the audio tail separately
charges a second round trip to every timed run (the round-2 methodology
did exactly that, and the round-3 "26 ms XLA glue" reading was this RTT).

Every harness therefore gates on ONE packed 2-element array produced here:
``[sum(|spec|), audio[-1]]``.  Changing what is gated in one harness and
not another silently skews their numbers relative to each other, so the
gate lives in exactly one place.

Big arrays (eeg, params) are explicit jit arguments, not closure
constants: the relay rejects oversized constant uploads (HTTP 413).
"""

from functools import partial

_jitted = None


def gated_offline_decode(params, cfg, eeg, ends, rand, window_S, plan):
    """Run one offline decode and return the packed 2-element gate array.

    ``cfg`` (frozen DecoderConfig) and ``plan`` (tuple of ints) are static
    jit arguments; everything else is traced.  Fetch the result with ONE
    ``np.asarray`` call and read both gate values from it.
    """
    global _jitted
    if _jitted is None:
        import jax
        import jax.numpy as jnp
        from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

        @partial(jax.jit, static_argnames=("cfg", "plan"))
        def f(params, cfg, eeg, ends, rand, window_S, plan):
            spec, audio = pipeline._offline_decode_jit(
                params, cfg, eeg, ends, rand, window_S, plan)
            return jnp.stack([jnp.sum(jnp.abs(spec)),
                              audio[-1].astype(jnp.float32)])

        _jitted = f
    return _jitted(params, cfg, eeg, ends, rand, window_S, plan)
