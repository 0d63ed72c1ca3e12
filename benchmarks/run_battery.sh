#!/bin/bash
# Full TPU benchmark battery, resumable: each phase logs to $OUT/<phase>.log
# and is skipped when its log already ends with the phase's final metric.
# The hosted relay drops connections on multi-minute runs, so every phase
# gets a timeout and one retry (harnesses cache their staging to disk).
#
# Usage: benchmarks/run_battery.sh [OUT_DIR]
set -u
OUT=${1:-/tmp/bench_battery}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

phase() { # name timeout_s final_marker command...
  local name=$1 tmo=$2 marker=$3; shift 3
  local log="$OUT/$name.log"
  if [ -f "$log" ] && grep -q "$marker" "$log"; then
    echo "== $name: already done =="
    return 0
  fi
  for attempt in 1 2; do
    echo "== $name (attempt $attempt, timeout ${tmo}s) =="
    timeout "$tmo" "$@" >> "$log" 2>&1
    if grep -q "$marker" "$log"; then
      echo "== $name: OK =="
      return 0
    fi
    echo "== $name: attempt $attempt did not finish =="
  done
  return 1
}

phase probe        120  "8.0"                       python -c "import jax,jax.numpy as jnp;print(float(jnp.arange(8.).sum()))" || exit 1
phase stage_profile 2400 stage_profile_verdict       python benchmarks/stage_profile.py
phase bench        2400 offline_replay_xrt          python bench.py
phase sweeps_lat   2400 online_pipelined_sustained  python -m benchmarks.sweeps latency
phase sweeps_chunk 2400 online_chunkK8              python -m benchmarks.sweeps chunked
phase matrix64     3600 matrix_policy_64ch          python -m benchmarks.sweeps matrix:64
phase matrix128    4800 matrix_policy_128ch         python -m benchmarks.sweeps matrix:128
phase matrix256    4800 matrix_policy_256ch         python -m benchmarks.sweeps matrix:256
# K=1 through the relay is dispatch-bound by the tunnel (criteria_ok=false
# without refuting the decoder), so its criteria-bearing marker is no_loss
phase soak         900  '"no_loss": true'           python benchmarks/soak.py 60 128
phase soak_k4      900  '"criteria_ok": true'       python benchmarks/soak.py 60 128 4
phase soak_k4_256  900  '"criteria_ok": true'       python benchmarks/soak.py 60 256 4
phase lat_quiet    2400 '"meets_budget": true'      python -m benchmarks.latency_quiet 128 10 80
phase lat_quiet_2048 2400 '"meets_budget": true'    env CLSS_BENCH_SR=2048 python -m benchmarks.latency_quiet 128 10 80
phase lat_quiet_256  2400 '"meets_budget": true'    python -m benchmarks.latency_quiet 256 10 80
phase exp1_ab      10800 exp1_ab_speedup            python benchmarks/exp1_ab.py /tmp/exp1_ab 3
# the reference's full 100-run chance protocol; chunk-checkpointed, so the
# retry resumes instead of restarting (~2 h of lax.map retrain+decode lanes)
phase exp1_protocol 10800 exp1_protocol_artifacts   python benchmarks/exp1_protocol.py /tmp/exp1_protocol 128 100
phase eval_full    7200 eval_full_figures_s         python benchmarks/eval_full.py /tmp/eval_full
phase vmap_repro   3600 verdict                     python tools/vmap_miscompile_repro.py --mode vmap --lanes 6 --train-s 270 --channels 64
phase native_scan  1200 xdf_native_scan_speedup                 python benchmarks/native_scan.py
phase train_bench  3600 train_wall_s                python benchmarks/train_bench.py
echo "battery complete; logs in $OUT"
