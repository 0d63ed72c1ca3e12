"""Failure handling: stream loss, rebuffering invariance, overwrite guards."""

import configparser
import os
import threading
import time

import numpy as np
import pytest

os.environ.setdefault("NSX_REGISTRY_DIR", "/tmp/nsx_pytest")

import jax.numpy as jnp

from closed_loop_seeg_speech_synthesis_tpu.io import config as config_mod
from closed_loop_seeg_speech_synthesis_tpu.runtime.online import PacketRebuffer


def test_packet_rebuffer_chunk_invariance(rng):
    """Arbitrary inlet chunking -> identical fixed packets."""
    data = rng.randn(1000, 3).astype(np.float32)
    ref = PacketRebuffer(32, 3)
    packets_ref = ref.push(data)

    rb = PacketRebuffer(32, 3)
    packets = []
    i = 0
    while i < len(data):
        n = int(rng.randint(1, 50))
        packets += rb.push(data[i : i + n])
        i += n
    assert len(packets) == len(packets_ref) == 1000 // 32
    for a, b in zip(packets, packets_ref):
        np.testing.assert_array_equal(a, b)


def test_overwrite_guard(tmp_path):
    """overwrite_on_rerun=False refuses to clobber (train.py:242-248)."""
    d = tmp_path / "sess"
    config_mod.make_output_dir(str(d), overwrite=False)
    with pytest.raises(FileExistsError):
        config_mod.make_output_dir(str(d), overwrite=False)
    config_mod.make_output_dir(str(d), overwrite=True)  # ok


def test_decoder_survives_stream_loss(rng):
    """Producer dies mid-run -> decoder stops cleanly with partial results
    (reference policy: log and stop, lsl_socket.py:44-49)."""
    from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
    from closed_loop_seeg_speech_synthesis_tpu.runtime import nsx, online, pipeline

    C = 4
    cfg = pipeline.DecoderConfig(sr=1024.0, n_channels=C, packet_size=32, dtype=jnp.float32)
    lda_params = lda_mod.LDAParams(
        coef=jnp.asarray(rng.randn(40, 9, 10), jnp.float32),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float32),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.ones((40, 9), bool),
    )
    dec_params = pipeline.build_decoder_params(cfg, lda_params, np.sort(rng.randn(40, 9), 1),
                                               rng.permutation(5 * C)[:10])
    decoder = online.OnlineDecoder(cfg, dec_params)

    out = nsx.Outlet("dying_stream", "EEG", C, 1024.0)
    results = {}

    def run():
        # interactive mode (max_packets=None): termination must come from the
        # EOF -> ConnectionError path, not an idle timeout
        results["r"] = decoder.run_stream("dying_stream", backend="nsx", max_packets=None)

    t = threading.Thread(target=run)
    t.start()
    deadline = time.time() + 10
    while out.subscriber_count() == 0 and time.time() < deadline:
        time.sleep(0.02)
    for _ in range(5):
        out.push_chunk(rng.randn(32, C).astype(np.float32))
    time.sleep(0.5)
    out.close()  # producer dies
    t.join(timeout=60)
    assert not t.is_alive()
    spec, audio, received = results["r"]
    assert received.shape[0] == 5 * 32  # everything sent before the loss


def test_packet_rebuffer_burst_growth_and_no_aliasing(rng):
    """Oversized bursts grow the preallocated buffer once; returned packets
    stay valid after later pushes reuse the buffer."""
    data = rng.randn(5000, 3).astype(np.float32)
    rb = PacketRebuffer(32, 3)
    got, i = [], 0
    while i < len(data):
        n = int(rng.randint(1, 3000))  # includes bursts > initial capacity
        got += rb.push(data[i : i + n])
        i += n
    expected = [data[k * 32 : (k + 1) * 32] for k in range(5000 // 32)]
    assert len(got) == len(expected)
    for a, b in zip(got, expected):
        np.testing.assert_array_equal(a, b)

    p = PacketRebuffer(4, 2)
    outs = p.push(np.arange(8, dtype=np.float32).reshape(4, 2))
    snap = outs[0].copy()
    p.push(np.full((8, 2), 99, np.float32))
    np.testing.assert_array_equal(outs[0], snap)
