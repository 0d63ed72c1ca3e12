"""Assemble a markdown benchmark report from a battery output directory.

Reads the JSON lines that every benchmarks/ harness prints (one line per
metric) out of ``<dir>/*.log`` (as written by benchmarks/run_battery.sh)
and renders the BENCHMARKS.md tables, so recorded tables are transcribed
mechanically instead of by hand.

Run:  python benchmarks/collect.py [/tmp/bench_battery]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load(out_dir):
    metrics = {}
    for path in sorted(glob.glob(os.path.join(out_dir, "*.log"))):
        phase = os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "metric" in rec:
                    rec["_phase"] = phase
                    metrics[rec["metric"]] = rec  # last occurrence wins
    return metrics


def fmt(v):
    if isinstance(v, float):
        return f"{v:,.1f}" if abs(v) >= 100 else f"{v:.3g}"
    if isinstance(v, int):
        return f"{v:,}"
    return str(v)


def main(out_dir="/tmp/bench_battery"):
    m = load(out_dir)
    get = lambda k, f="value": (m.get(k, {}) or {}).get(f)

    print(f"# Battery report ({out_dir}, {len(m)} metrics)\n")

    def _ch_key(k):
        # numeric channel-count order ("64ch" before "128ch"), sr tag last
        tail = k[len("offline_replay_xrt_"):]
        num = tail.split("ch")[0]
        return (int(num) if num.isdigit() else 10**9, tail)

    head_keys = sorted((k for k in m if k.startswith("offline_replay_xrt_")),
                       key=_ch_key)
    if head_keys:
        print("## Headline (bench.py)\n")
    for hk in head_keys:
        r = m[hk]
        ch = hk[len("offline_replay_xrt_"):]
        print("| metric | value |")
        print("|---|---|")
        print(f"| offline replay xRT @{ch} (30-min session) | **{fmt(r['value'])}x** |")
        if "pipelined_xrt" in r:
            print(f"| pipelined throughput ({r.get('pipelined_sessions')} sessions, "
                  f"one concatenated gate fetch) | **{fmt(r['pipelined_xrt'])}x** |")
        for k, label in [
            ("closed_loop_p50_ms", "closed-loop per-dispatch p50 (relay floor subtracted)"),
            ("closed_loop_p99_ms", "closed-loop per-dispatch p99 (relay floor subtracted)"),
            ("relay_rtt_floor_ms", "relay RTT floor (absent on local hardware)"),
            ("wall_p99_through_relay_ms", "per-dispatch wall p99 through the relay"),
            ("sustained_pipelined_ms_per_packet", "sustained pipelined ms/packet (through relay)"),
            ("scan_amortized_per_packet_device_ms", "scan-amortized per-packet device ms (local-hw estimate)"),
            ("chunkedK4_per_packet_device_ms", "chunked K=4 per-packet device ms"),
        ]:
            if k in r:
                print(f"| {label} | {fmt(r[k])} ms |")
        print()

    stages = {k: v for k, v in m.items() if k.startswith("stage_") and k != "stage_profile_verdict"}
    if stages:
        print("## Stage profile (30-min session; min over reps, incl. relay RTT)\n")
        print("| stage | ms |")
        print("|---|---|")
        for k, v in stages.items():
            print(f"| {k[len('stage_'):-len('_ms')]} | {fmt(v['value'])} |")
        if "stage_profile_verdict" in m:
            v = m["stage_profile_verdict"]
            print(f"\nfull fused: {fmt(v['value'])}x realtime; tail collapse "
                  f"{fmt(v.get('tail_collapse_ms'))} ms; fused/split-tail speedup "
                  f"{fmt(v.get('full_fused_over_split_tail'))}x\n")

    groups = [ch for ch in (64, 128, 256) if f"matrix_policy_{ch}ch" in m]
    if groups:
        print("## Config matrix (interleaved min-of-N per channel group, 30-min sessions)\n")
        names = ["split", "fusedG1", "fusedG2", "fusedG4", "fusedG8", "gl16", "gl32", "tail_split"]
        present = [n for n in names if any(f"matrix_xrt_{ch}ch_{n}" in m for ch in groups)]
        print("| channels | " + " | ".join(present) + " | best G | fused/split |")
        print("|---" * (len(present) + 3) + "|")
        for ch in groups:
            row = [fmt(get(f"matrix_xrt_{ch}ch_{n}")) if get(f"matrix_xrt_{ch}ch_{n}") else "—"
                   for n in present]
            pol = m[f"matrix_policy_{ch}ch"]
            print(f"| {ch} | " + " | ".join(row) +
                  f" | {pol.get('best', '—')} | {fmt(pol.get('fused_over_split'))}x |")
        print()

    lat = [k for k in m if k.startswith("online_") and not k.startswith("online_chunk")]
    if lat:
        print("## Online latency (sweeps latency)\n")
        print("| metric | value | unit |")
        print("|---|---|---|")
        for k in lat:
            print(f"| {k} | {fmt(m[k]['value'])} | {m[k].get('unit', '')} |")
        print()

    chunk = sorted((k for k in m if k.startswith("online_chunkK")),
                   key=lambda k: int(k.split("chunkK")[1].split("_")[0]))
    if chunk:
        print("## K-step micro-batched dispatch\n")
        print("| K | per-packet device ms | dispatch wall p50 ms | wall ms/packet | added playout ms |")
        print("|---|---|---|---|---|")
        for k in chunk:
            r = m[k]
            K = int(k.split("chunkK")[1].split("_")[0])
            wpp = r.get("dispatch_wall_p50_ms")
            print(f"| {K} | {fmt(r['value'])} | {fmt(wpp)} | "
                  f"{fmt(wpp / K) if wpp else '—'} | {fmt(r.get('added_playout_latency_ms'))} |")
        print()

    if "train_wall_s" in m:
        r = m["train_wall_s"]
        print("## Training path (train_bench.py)\n")
        print("| arm | wall s |")
        print("|---|---|")
        dur = r.get("duration_s", 0) or 0
        print(f"| TPU trainer, steady state ({fmt(dur)} s session, "
              f"{r.get('channels')} ch) | **{fmt(r['value'])}** |")
        if "first_call_s" in r:
            print(f"| TPU trainer, first call (compile included) | {fmt(r['first_call_s'])} |")
        if "cpu_reference_s" in r:
            print(f"| reference-architecture CPU twin (scipy/sklearn) | {fmt(r['cpu_reference_s'])} |")
            print(f"\nSpeedup vs the CPU reference twin: "
                  f"**{fmt(r.get('speedup_vs_cpu_reference'))}x**; CPU phase split: "
                  f"{json.dumps(r.get('cpu_phases', {}))}\n")
        else:
            print()

    for k in ("soak_paced_realtime", "exp1_ab_speedup", "eval_full_figures_s",
              "xdf_native_scan_speedup"):
        if k in m:
            print(f"## {k}\n\n```json\n{json.dumps(m[k], indent=1)}\n```\n")

    rest = {k for k in m} - set(stages) \
        - {x for x in m if x.startswith(("matrix_", "online_", "stage_", "offline_replay_xrt_"))} \
        - {"soak_paced_realtime", "exp1_ab_speedup",
           "eval_full_figures_s", "xdf_native_scan_speedup", "train_wall_s"}
    if rest:
        print("## Other metrics\n")
        for k in sorted(rest):
            r = dict(m[k])
            phase = r.pop("_phase", "")
            print(f"- `{k}` = {fmt(r.get('value'))} {r.get('unit', '')} ({phase})")


if __name__ == "__main__":
    main(*sys.argv[1:2])
