"""Benchmark sweep harness (BASELINE.md config matrix).

Sweeps: Griffin-Lim iterations (8/16/32), channel scaling (64/128/256),
fused-kernel periods-per-grid-step (G x channels, informs the
``DecoderConfig.epilogue_periods`` auto-policy) and the online per-packet
step latency.  Each prints one JSON line per point.

Run:  python -m benchmarks.sweeps [gl_iters|channels|fused_periods|matrix|latency|chunked|all]
("matrix" = the interleaved full-matrix dataset; not part of "all" because
it subsumes the channel/G sweeps at 3x the runtime)

Latency note: under the hosted TPU tunnel every dispatch pays a ~30 ms
network round trip that does not exist on local hardware, so the latency
sweep reports the scan-amortized per-packet device time (1000 chained steps
in one program) alongside the raw dispatch wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Operating point (decode.py:115-116): 1024 Hz / 32-sample packets by
# default; CLSS_BENCH_SR=2048 selects the 2048 Hz / 64-sample-packet point.
SR = float(os.environ.get("CLSS_BENCH_SR", 1024))
PACKET = 64 if SR == 2048 else 32
_TAG = "" if SR == 1024 else f"_sr{int(SR)}"


def _make(cfg_kwargs, n_channels, seed=0):
    import jax
    import jax.numpy as jnp
    from closed_loop_seeg_speech_synthesis_tpu.models import lda as lda_mod
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

    rng = np.random.RandomState(seed)
    cfg = pipeline.DecoderConfig(sr=SR, n_channels=n_channels, packet_size=PACKET,
                                 dtype=jnp.float32, **cfg_kwargs)
    lda_params = lda_mod.LDAParams(
        coef=jnp.asarray(rng.randn(40, 9, 150) * 0.1, jnp.float32),
        intercept=jnp.asarray(rng.randn(40, 9), jnp.float32),
        classes=jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32), (40, 9)),
        valid=jnp.ones((40, 9), bool),
    )
    medians = np.sort(rng.randn(40, 9), axis=1)
    select = rng.permutation(5 * n_channels)[:150]
    params = pipeline.build_decoder_params(cfg, lda_params, medians, select)
    return cfg, params


def _time_replay(cfg, params, duration_s=600.0, n=3):
    import jax
    import jax.numpy as jnp
    from closed_loop_seeg_speech_synthesis_tpu.ops import framing, griffinlim as gl
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

    T = int(cfg.sr * duration_s)
    ends = framing.streaming_frame_ends(cfg.frame_len_ms, cfg.frame_shift_ms, cfg.sr, T + cfg.prefill)
    nf = len(ends)
    ends_d = jnp.asarray(ends, jnp.int32)
    rand = gl.default_rand_init(jax.random.PRNGKey(0), nf - 1, 0, jnp.float32)
    S, Ls, P, origin = framing.periodic_window_matrix(ends, cfg.win)
    S_d = jnp.asarray(S, jnp.float32)
    plan = (Ls, P, origin, nf)
    eegs = [jax.random.normal(jax.random.PRNGKey(i), (T, cfg.n_channels), jnp.float32) for i in range(n)]
    jax.block_until_ready((eegs, rand, S_d))

    # single-fetch gate shared by all replay harnesses (benchmarks/gate.py)
    from benchmarks.gate import gated_offline_decode

    def run(e):
        g = np.asarray(gated_offline_decode(params, cfg, e, ends_d, rand, S_d, plan))
        return float(g[0]), float(g[1])

    run(eegs[0])
    times = []
    for e in eegs:
        t0 = time.perf_counter()
        run(e)
        times.append(time.perf_counter() - t0)
    return duration_s / sorted(times)[len(times) // 2]


def sweep_gl_iters():
    for iters in (8, 16, 32):
        cfg, params = _make({"gl_iterations": iters}, 128)
        xrt = _time_replay(cfg, params)
        print(json.dumps({"metric": f"replay_xrt_gl{iters}{_TAG}", "value": round(xrt, 1),
                          "unit": "x_realtime", "vs_baseline": round(xrt / 1000, 3)}))


def sweep_channels():
    for ch in (64, 128, 256):
        cfg, params = _make({}, ch)
        xrt = _time_replay(cfg, params)
        print(json.dumps({"metric": f"replay_xrt_{ch}ch{_TAG}", "value": round(xrt, 1),
                          "unit": "x_realtime", "vs_baseline": round(xrt / 1000, 3)}))


def sweep_fused_periods():
    """G-sweep for the fully fused decode kernel: periods per grid step.

    Informs DecoderConfig.epilogue_periods='auto' — larger G means fewer,
    larger epilogue matmuls on the sequential grid (helps at low channel
    counts where per-period matmuls underfill the MXU) but more VMEM and
    more tail padding."""
    for ch in (64, 128, 256):
        for G in (1, 2, 4, 8):
            cfg, params = _make({"use_pallas_epilogue": True,
                                 "epilogue_periods": G}, ch)
            xrt = _time_replay(cfg, params)
            print(json.dumps({"metric": f"replay_xrt_fused_{ch}ch_G{G}{_TAG}",
                              "value": round(xrt, 1), "unit": "x_realtime",
                              "vs_baseline": round(xrt / 1000, 3)}))


def sweep_matrix(reps=5, duration_s=1800.0, only_ch=None):
    """The full config matrix as ONE interleaved dataset (VERDICT r2 #3).

    Round-robins every config of a channel group through the same
    measurement loop — rep r of config A runs seconds before rep r of
    config B — so host/relay drift hits all configs equally and min-of-N
    is comparable across the whole table.  Groups by channel count only to
    bound live HBM (each group's replay buffers are freed before the next).

    Points per group: split front-end, fused G in {1,2,4,8}; at 128 ch
    additionally gl_iters {16,32} and the vocoder-tail A/B (fused GL+tail
    kernel vs GL kernel + XLA tail).  Emits one JSON line per point with
    all rep walls, plus a policy-suggestion line per group.
    """
    import jax
    import jax.numpy as jnp
    from closed_loop_seeg_speech_synthesis_tpu.ops import framing, griffinlim as gl
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

    for ch in (64, 128, 256):
        if only_ch is not None and ch != only_ch:
            continue
        points = [("split", {"use_pallas_epilogue": False})]
        points += [(f"fusedG{G}", {"use_pallas_epilogue": True, "epilogue_periods": G})
                   for G in (1, 2, 4, 8)]
        if ch == 128:
            points += [(f"gl{it}", {"gl_iterations": it}) for it in (16, 32)]
            points += [("tail_split", {"use_pallas_gl_tail": False})]

        built = []
        T = int(SR * duration_s)
        eegs = [jax.random.normal(jax.random.PRNGKey(i), (T, ch), jnp.float32)
                for i in range(2)]
        # one param build per channel group: every swept knob is a
        # decode-time flag, so the operators are identical across points
        import dataclasses

        base_cfg, params = _make({}, ch)
        for name, kw in points:
            cfg = dataclasses.replace(base_cfg, **kw)
            ends = framing.streaming_frame_ends(cfg.frame_len_ms, cfg.frame_shift_ms,
                                                cfg.sr, T + cfg.prefill)
            nf = len(ends)
            S, Ls, P, origin = framing.periodic_window_matrix(ends, cfg.win)
            aux = (jnp.asarray(ends, jnp.int32),
                   gl.default_rand_init(jax.random.PRNGKey(0), nf - 1, 0, jnp.float32),
                   jnp.asarray(S, jnp.float32), (Ls, P, origin, nf))
            built.append((name, cfg, params, aux))
        jax.block_until_ready(eegs)

        from benchmarks.gate import gated_offline_decode

        def run(entry, e):
            _name, cfg, params, (ends_d, rand, S_d, plan) = entry
            # single-fetch gate shared by all replay harnesses (benchmarks/gate.py)
            g = np.asarray(gated_offline_decode(params, cfg, e, ends_d, rand, S_d, plan))
            return float(g[0]), float(g[1])

        for entry in built:  # compile everything before any timing
            run(entry, eegs[0])

        walls = {name: [] for name, *_ in built}
        for rep in range(reps):
            for entry in built:
                e = eegs[rep % len(eegs)]
                t0 = time.perf_counter()
                run(entry, e)
                walls[entry[0]].append(time.perf_counter() - t0)

        xrts = {}
        for name, *_ in built:
            w = min(walls[name])
            xrts[name] = duration_s / w
            print(json.dumps({"metric": f"matrix_xrt_{ch}ch_{name}{_TAG}",
                              "value": round(duration_s / w, 1), "unit": "x_realtime",
                              "vs_baseline": round(duration_s / w / 1000, 3),
                              "walls_s": [round(x, 4) for x in walls[name]]}))
        best_g = max((n for n in xrts if n.startswith("fusedG")), key=lambda n: xrts[n])
        print(json.dumps({"metric": f"matrix_policy_{ch}ch{_TAG}", "value": xrts[best_g],
                          "unit": "x_realtime", "vs_baseline": 0.0,
                          "best": best_g,
                          "fused_over_split": round(
                              max(xrts[n] for n in xrts if n.startswith("fusedG"))
                              / xrts["split"], 3)}))
        del built, eegs


def sweep_latency(n_packets=200):
    import jax
    import jax.numpy as jnp
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

    cfg, params = _make({}, 128)
    key = jax.random.PRNGKey(0)
    step = pipeline.make_online_step(params, cfg, key)
    carry0 = pipeline.init_online_carry(params, cfg)

    # scan-amortized device time: N steps chained inside one program
    packets = jax.random.normal(jax.random.PRNGKey(1), (n_packets, cfg.packet_size, cfg.n_channels), jnp.float32)
    # the factory returns jax.jit(step, ...); scan over the unjitted body
    raw_step = step.__wrapped__

    @jax.jit
    def run_scan(carry, pkts):
        def body(c, p):
            c2, out = raw_step(c, p)
            return c2, out["audio_valid"]
        c_end, flags = jax.lax.scan(body, carry, pkts)
        return c_end.sample_count, jnp.sum(flags)

    out = run_scan(carry0, packets)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    sc, nv = run_scan(pipeline.init_online_carry(params, cfg), packets)
    int(sc)
    amortized = (time.perf_counter() - t0) / n_packets

    # Per-dispatch methodology (BASELINE.md: p99 < 10 ms per frame):
    # every dispatch through the hosted relay pays a network round trip that
    # a locally attached chip does not, so measure the dispatch FLOOR with a
    # trivial jitted echo (scalar in/out, fetched) and subtract its median
    # from the step walls.  What remains — per-dispatch launch, 16 KB packet
    # H2D, step execution, ~1 KB D2H readback — is the per-dispatch
    # device-side latency a local closed loop would pay.
    stats = measure_dispatch_latency(step, pipeline.init_online_carry(params, cfg),
                                     packets, n_meas=60)

    print(json.dumps({"metric": "online_step_device_ms" + _TAG, "value": round(amortized * 1e3, 3),
                      "unit": "ms_per_packet_scan_amortized", "vs_baseline": round(10.0 / (amortized * 1e3), 2)}))
    print(json.dumps({"metric": "online_step_p99_ms" + _TAG,
                      "value": stats["device_p99_ms"],
                      "unit": "ms_per_dispatch_device_side (relay floor subtracted)",
                      "vs_baseline": round(10.0 / max(stats["device_p99_ms"], 1e-9), 2)}))
    print(json.dumps({"metric": "dispatch_floor_p50_ms" + _TAG, "value": stats["floor_p50_ms"],
                      "unit": "ms (relay RTT, absent on local hardware)",
                      "vs_baseline": 0.0}))
    print(json.dumps({"metric": "online_step_wall_p99_ms" + _TAG, "value": stats["wall_p99_ms"],
                      "unit": "ms (through the relay, harness artifact)",
                      "vs_baseline": 0.0}))

    # sustained pipelined cadence: double-buffered OnlineDecoder at full rate
    from closed_loop_seeg_speech_synthesis_tpu.runtime.online import OnlineDecoder

    dec = OnlineDecoder(cfg, params, key=jax.random.PRNGKey(2), pipelined=True)
    pkts_np = np.asarray(packets)
    dec.process_packet(pkts_np[0])  # warmup/compile
    dec.reset()
    t0 = time.perf_counter()
    for i in range(100):
        dec.process_packet(pkts_np[i % n_packets])
    dec.flush()
    sustained = (time.perf_counter() - t0) / 100
    print(json.dumps({"metric": "online_pipelined_sustained_ms" + _TAG,
                      "value": round(sustained * 1e3, 2),
                      "unit": "ms_per_packet (double-buffered, incl. relay)",
                      "vs_baseline": round(31.25 / (sustained * 1e3), 2)}))


def sweep_chunked_dispatch(n_meas=40):
    """Per-packet cost of K-step micro-batched dispatch (K packets buffered,
    ONE device call via pipeline.make_online_multi_step).  Reports the
    per-packet device-side time (relay floor subtracted, then divided by K)
    and the raw per-dispatch wall — the knob trades (K-1) packet periods of
    playout latency for ~K x less dispatch overhead where the persistent
    io_callback loop cannot run (VERDICT r2 item #5)."""
    import jax
    import jax.numpy as jnp
    from closed_loop_seeg_speech_synthesis_tpu.runtime import pipeline

    cfg, params = _make({}, 128)
    key = jax.random.PRNGKey(0)
    for K in (1, 2, 4, 8):
        if K == 1:
            step = pipeline.make_online_step(params, cfg, key)
        else:
            step = pipeline.make_online_multi_step(params, cfg, key, K)
        shape = ((cfg.packet_size, cfg.n_channels) if K == 1
                 else (K, cfg.packet_size, cfg.n_channels))
        pkts = jax.random.normal(jax.random.PRNGKey(1), (8,) + shape, jnp.float32)
        stats = measure_dispatch_latency(step, pipeline.init_online_carry(params, cfg),
                                         pkts, n_meas=n_meas)
        print(json.dumps({
            "metric": f"online_chunkK{K}_per_packet_device_ms{_TAG}",
            "value": round(stats["device_p50_ms"] / K, 3),
            "unit": "ms_per_packet (relay floor subtracted; p50/K)",
            "vs_baseline": round(10.0 / max(stats["device_p50_ms"] / K, 1e-9), 2),
            "dispatch_device_p50_ms": stats["device_p50_ms"],
            "dispatch_device_p99_ms": stats["device_p99_ms"],
            "dispatch_wall_p50_ms": stats["wall_p50_ms"],
            "added_playout_latency_ms": round((K - 1) * 31.25, 2),
        }))


def measure_dispatch_latency(step, carry, packets, n_meas=60, n_floor=None):
    """Per-dispatch latency of `step` vs an RPC-pattern-matched floor.

    Both measurements are one dispatch + one array fetch with the same
    payload sizes (the step's outputs are packed into a single array
    in-graph; the floor echoes the packet into an identically sized zero
    array doing no work), taken in interleaved pairs so slow relay drift
    cancels.  The paired difference estimates what a LOCALLY attached chip
    pays per dispatch: launch + packet H2D + step execution + readback."""
    import jax
    import jax.numpy as jnp

    pkts_np = np.asarray(packets)
    raw = getattr(step, "__wrapped__", step)

    @jax.jit
    def step_packed(c, pkt):
        c2, o = raw(c, pkt)
        packed = jnp.concatenate([
            o["spec"].ravel().astype(jnp.float32),
            o["spec_valid"].ravel().astype(jnp.float32),
            o["audio"].ravel().astype(jnp.float32),
            o["audio_valid"].ravel().astype(jnp.float32),
        ])
        return c2, packed

    carry, out = step_packed(carry, pkts_np[0])  # compile
    n_out = int(out.shape[0])
    np.asarray(out)

    floor_fn = jax.jit(lambda pkt: jnp.zeros((n_out,), jnp.float32) + pkt.ravel()[0])
    np.asarray(floor_fn(pkts_np[0]))  # compile

    floors, walls = [], []
    for i in range(n_meas):
        pkt = pkts_np[i % len(pkts_np)]
        t0 = time.perf_counter()
        np.asarray(floor_fn(pkt))
        floors.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        carry, out = step_packed(carry, pkt)
        np.asarray(out)
        walls.append(time.perf_counter() - t0)
    floors = np.asarray(floors[3:])
    walls = np.asarray(walls[3:])

    device = np.maximum(walls - floors, 0.0)  # paired: drift cancels
    return {
        "wall_p50_ms": round(float(np.percentile(walls, 50)) * 1e3, 3),
        "wall_p99_ms": round(float(np.percentile(walls, 99)) * 1e3, 3),
        "floor_p50_ms": round(float(np.percentile(floors, 50)) * 1e3, 3),
        "floor_p99_ms": round(float(np.percentile(floors, 99)) * 1e3, 3),
        "device_p50_ms": round(float(np.percentile(device, 50)) * 1e3, 3),
        "device_p99_ms": round(float(np.percentile(device, 99)) * 1e3, 3),
    }


def main():
    from closed_loop_seeg_speech_synthesis_tpu.utils import honor_platform_env
    honor_platform_env()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("gl_iters", "all"):
        sweep_gl_iters()
    if which in ("channels", "all"):
        sweep_channels()
    if which in ("fused_periods", "all"):
        sweep_fused_periods()
    if which.startswith("matrix"):
        # "matrix" = all channel groups; "matrix:128" = one group (relay
        # drops mid-run cost a whole group, not the whole matrix)
        only = int(which.split(":")[1]) if ":" in which else None
        sweep_matrix(only_ch=only)
    if which in ("latency", "all"):
        sweep_latency()
    if which in ("chunked", "all"):
        sweep_chunked_dispatch()


if __name__ == "__main__":
    main()
