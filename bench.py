"""Headline benchmark: offline replay throughput (xRT) on one TPU chip.

BASELINE.md north star: decode a recorded session at >1000x real-time
(the reference replays through its node graph in a single Python process at
roughly real-time scale).  Setup mirrors the reference's operating point:
1024 Hz sEEG, 128 channels, 10 ms frames, 40 mel bins, 8 Griffin-Lim
iterations, norm factor 10 (decode.py:115-164, config/experiment.ini).

Prints one JSON line: metric / value / unit / vs_baseline (value / 1000).
"""

import json
import os
import time

import numpy as np


def main():
    from closed_loop_seeg_speech_synthesis_tpu.utils import honor_platform_env
    honor_platform_env()
    import jax
    import jax.numpy as jnp
    from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
    from closed_loop_seeg_speech_synthesis_tpu.ops import framing
    from closed_loop_seeg_speech_synthesis_tpu.ops import griffinlim as gl
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

    # operating point (decode.py:115-116): 1024 Hz / 32-sample packets by
    # default, 2048 Hz / 64-sample packets via CLSS_BENCH_SR=2048 — the
    # packet cadence is 31.25 ms at both
    sr = float(os.environ.get("CLSS_BENCH_SR", 1024))
    packet_size = 64 if sr == 2048 else 32
    sr_tag = "" if sr == 1024 else f"_sr{int(sr)}"
    n_channels = int(os.environ.get("CLSS_BENCH_CHANNELS", 128))
    # 30-minute session per decode call (env knob for CPU smoke runs only)
    duration_s = float(os.environ.get("CLSS_BENCH_DURATION_S", 1800.0))
    T = int(sr * duration_s)

    rng = np.random.RandomState(0)
    cfg = pipeline.DecoderConfig(sr=sr, n_channels=n_channels, packet_size=packet_size, dtype=jnp.float32)
    nf = min(150, 5 * n_channels)
    lda_params = lda_mod.LDAParams(
        coef=jnp.asarray(rng.randn(40, 9, nf) * 0.1, jnp.float32),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float32),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.ones((40, 9), bool),
    )
    medians = np.sort(rng.randn(40, 9), axis=1)
    select = rng.permutation(5 * n_channels)[:nf]
    params = pipeline.build_decoder_params(cfg, lda_params, medians, select)

    ends = framing.streaming_frame_ends(cfg.frame_len_ms, cfg.frame_shift_ms, sr, T + cfg.prefill)
    n_frames = len(ends)
    ends_d = jax.device_put(jnp.asarray(ends, jnp.int32))
    rand = gl.default_rand_init(jax.random.PRNGKey(0), n_frames - 1, 0, jnp.float32)

    # Synthesize sessions on-device (no host->device transfer in the loop);
    # distinct inputs per run so no layer can short-circuit repeated calls.
    make_eeg = jax.jit(lambda k: jax.random.normal(k, (T, n_channels), jnp.float32))
    eegs = [make_eeg(jax.random.PRNGKey(i)) for i in range(3)]
    jax.block_until_ready((eegs, ends_d, rand))

    window_S, frame_plan = None, None
    pw = framing.periodic_window_matrix(ends, cfg.win)
    if pw is not None:
        S, Ls, P, origin = pw
        window_S = jax.device_put(jnp.asarray(S, jnp.float32))
        frame_plan = (Ls, P, origin, n_frames)

    # Single-fetch gate shared by all replay harnesses (benchmarks/gate.py).
    from benchmarks.gate import gated_offline_decode

    def _decode_gated(e, r):
        return gated_offline_decode(params, cfg, e, ends_d, r, window_S, frame_plan)

    def run(e):
        g = np.asarray(_decode_gated(e, rand))
        return float(g[0]), float(g[1])

    # compile + warmup; the hosted relay occasionally drops a remote-compile
    # connection, so retry before giving up
    for attempt in range(3):
        try:
            run(eegs[0])
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(10)
    times = []
    for e in eegs:
        t0 = time.perf_counter()
        run(e)
        times.append(time.perf_counter() - t0)
    wall = sorted(times)[1]  # median of 3
    xrt = duration_s / wall

    # Steady-state pipelined throughput: M independent sessions dispatched
    # back-to-back, every session's outputs still forced through the gate,
    # but the M 2-element gates are concatenated by a final program and
    # fetched ONCE — amortizing the irreducible ~25 ms relay RTT across M
    # sessions the way a locally attached chip's back-to-back replay pays
    # no RTT at all.  This is the closest the relay harness can get to the
    # local-hardware throughput number.
    # M=12 measured best (62,412x vs 58,127x at M=6): per-session wall
    # ~28.8 ms vs ~26 ms device time — the concatenated gate's RTT is fully
    # amortized and the residual is per-dispatch RPC submission.
    M = int(os.environ.get("CLSS_BENCH_PIPELINE_SESSIONS", 12))
    pack = jax.jit(lambda *gs: jnp.concatenate(gs))
    np.asarray(pack(*[_decode_gated(eegs[i % len(eegs)], rand) for i in range(M)]))  # compile
    t0 = time.perf_counter()
    gs = [_decode_gated(eegs[i % len(eegs)], rand) for i in range(M)]
    packed = np.asarray(pack(*gs))
    pipelined_wall = (time.perf_counter() - t0) / M
    assert packed.shape == (2 * M,) and np.all(np.isfinite(packed))
    xrt_pipelined = duration_s / pipelined_wall

    # closed-loop per-dispatch latency (BASELINE.md p99 < 10 ms budget):
    # device-side estimate = step dispatch wall minus the relay's echo floor
    # (the tunnel RTT does not exist on locally attached hardware); see
    # benchmarks/sweeps.py:measure_dispatch_latency for the methodology.
    latency = {}
    try:
        from benchmarks.sweeps import measure_dispatch_latency

        step = pipeline.make_online_step(params, cfg, jax.random.PRNGKey(7))
        carry = pipeline.init_online_carry(params, cfg)
        pkts = np.asarray(rng.randn(32, cfg.packet_size, n_channels), np.float32)
        stats = measure_dispatch_latency(step, carry, pkts, n_meas=40, n_floor=30)
        latency = {
            "closed_loop_p99_ms": stats["device_p99_ms"],
            "relay_rtt_floor_ms": stats["floor_p50_ms"],
            "wall_p99_through_relay_ms": stats["wall_p99_ms"],
        }
        # p50 after relay-floor subtraction often collapses below the
        # harness's timer resolution — keep the field numeric (the 0.05 ms
        # resolution bound) and flag it, so trend/diff consumers never see a
        # type change (ADVICE r4); the scan-amortized per-packet device time
        # below is the trustworthy central estimate
        p50 = stats["device_p50_ms"]
        if p50 <= 0.05:
            latency["closed_loop_p50_ms"] = 0.05
            latency["closed_loop_p50_sub_resolution"] = True
        else:
            latency["closed_loop_p50_ms"] = p50
            latency["closed_loop_p50_sub_resolution"] = False

        # sustained pipelined cadence (double-buffered dispatch at full
        # packet rate): the rate metric that matters when per-dispatch p99
        # through the relay exceeds the 31.25 ms packet period — overlapping
        # dispatch hides the RTT as long as the SUSTAINED per-packet wall
        # stays under the cadence (VERDICT r2 weak #4).
        from closed_loop_seeg_speech_synthesis_tpu.runtime.online import OnlineDecoder

        dec = OnlineDecoder(cfg, params, key=jax.random.PRNGKey(2), pipelined=True)
        dec.process_packet(pkts[0])  # compile
        dec.reset()
        t0 = time.perf_counter()
        for i in range(100):
            dec.process_packet(pkts[i % len(pkts)])
        dec.flush()
        sustained_ms = (time.perf_counter() - t0) / 100 * 1e3
        latency["sustained_pipelined_ms_per_packet"] = round(sustained_ms, 2)
        latency["sustained_margin_vs_cadence"] = round(31.25 / sustained_ms, 2)

        # scan-amortized per-packet device time: N chained steps in ONE
        # program, so the relay RTT is paid once — the number a locally
        # attached chip would sustain per packet (VERDICT r3 weak #2)
        raw_step = step.__wrapped__  # factory returns jax.jit(step)

        @jax.jit
        def scan_j(c, ps):
            def body(cc, p):
                c2, out = raw_step(cc, p)
                return c2, out["audio_valid"]
            c_end, flags = jax.lax.scan(body, c, ps)
            return c_end.sample_count, jnp.sum(flags)

        big = jnp.asarray(np.tile(pkts, (16, 1, 1)))  # 512 packets
        jax.block_until_ready(scan_j(carry, big))
        t0 = time.perf_counter()
        jax.block_until_ready(scan_j(pipeline.init_online_carry(params, cfg), big))
        per_pkt = (time.perf_counter() - t0) / big.shape[0] * 1e3
        latency["scan_amortized_per_packet_device_ms"] = round(per_pkt, 3)
        latency["meets_cadence_on_local_hw"] = bool(per_pkt < 31.25)
        if sustained_ms > 31.25:
            latency["sustained_note"] = (
                "tunnel-bound: ~3 serialized relay RPCs per packet; device "
                "time per packet is scan_amortized_per_packet_device_ms")
            latency["tunnel_bound"] = True

        # K-step micro-batched dispatch (K packets per device call; the
        # relay/TPU amortization mode, VERDICT r2 item #5) at the default
        # sweep's best K
        K = 4
        mstep = pipeline.make_online_multi_step(params, cfg, jax.random.PRNGKey(7), K)
        mpkts = np.asarray(rng.randn(8, K, cfg.packet_size, n_channels), np.float32)
        mstats = measure_dispatch_latency(mstep, pipeline.init_online_carry(params, cfg),
                                          mpkts, n_meas=40)
        latency[f"chunkedK{K}_per_packet_device_ms"] = round(
            mstats["device_p50_ms"] / K, 3)
    except Exception as e:  # keep the headline metric robust to relay hiccups
        latency = {"latency_error": str(e)[:120]}

    # Recorded-dataset embeds: metrics too long to re-run inside bench (the
    # 100x10 exp1 protocol, quiet-window latency datasets, long soaks) are
    # recorded once into benchmarks/recorded/*.json; embedding them here puts
    # them in the driver-captured BENCH_r*.json line.
    recorded = {}
    rec_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "recorded")
    if os.path.isdir(rec_dir):
        for fn in sorted(os.listdir(rec_dir)):
            if fn.endswith(".json"):
                try:
                    with open(os.path.join(rec_dir, fn)) as f:
                        recorded[fn[:-5]] = json.load(f)
                except (OSError, ValueError):
                    pass

    print(json.dumps({
        "metric": f"offline_replay_xrt_{n_channels}ch{sr_tag}",
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 1000.0, 3),
        "pipelined_xrt": round(xrt_pipelined, 1),
        "pipelined_sessions": M,
        # active decoder policy — the JSON is interpretable standalone
        "policy": {
            "sr": int(sr), "packet_size": packet_size,
            "pallas_frontend": bool(cfg.use_pallas_frontend),
            "fused_epilogue": bool(cfg.fused_epilogue),
            "epilogue_periods_G": cfg.fused_periods,
            "pallas_gl": bool(cfg.use_pallas_gl),
            "fused_gl_tail": bool(cfg.fused_gl_tail),
            "gate": "single-fetch packed (benchmarks/gate.py)",
        },
        **latency,
        **({"recorded": recorded} if recorded else {}),
    }))


if __name__ == "__main__":
    main()
