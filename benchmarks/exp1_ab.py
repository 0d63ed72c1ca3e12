"""Contention-proof exp1 A/B: batched one-program folds vs sequential folds.

Round-2 recorded walls for the batched exp1 path were ~8x WORSE than the
round-1 sequential baselines (2,654 s vs 305 s), blamed on host-VM
contention but never measured under like-for-like conditions.  This harness
settles it:

* **Interleaved A/B** — within each repetition the batched arm and the
  sequential arm run back-to-back in one process, so any contention window
  hits both arms equally; min-of-N per arm is the contention-immune
  statistic (same technique as the headline fused-vs-split A/B).
* **Phase decomposition** — the batched arm is split into host staging
  (fold_targets + stacking, pure host), compile (first runner call minus
  steady state), and steady-state device wall (runner call on staged
  arrays, gated on fetched values).  If a wall is host-bound, this table
  shows it instead of leaving it to narrative.

Reference workload being compared: eval_steps/exp1.py:105-160 (10 CV folds
of full retrain+decode, serialized through ThreadPool(1)).

Run:  python benchmarks/exp1_ab.py [workdir] [reps]
Emits one JSON line per measurement plus a final verdict line.
"""

from __future__ import annotations

import configparser
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "examples"))


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main(workdir="/tmp/exp1_ab", reps=3, n_words=100, n_channels=64):
    from closed_loop_seeg_speech_synthesis_tpu.utils import honor_platform_env
    honor_platform_env()
    from demo import make_synthetic_session
    import jax
    import jax.numpy as jnp
    from closed_loop_seeg_speech_synthesis_tpu.eval import exp1 as exp1_mod
    from closed_loop_seeg_speech_synthesis_tpu.eval.exp1_batched import (
        fold_targets, make_proposed_runner)
    from closed_loop_seeg_speech_synthesis_tpu.runtime import params as params_io
    from closed_loop_seeg_speech_synthesis_tpu.runtime import trainer

    reps = int(reps)
    os.makedirs(workdir, exist_ok=True)
    rec = os.path.join(workdir, "speech1.hdf")
    if not os.path.exists(rec):
        make_synthetic_session(rec, n_words=int(n_words), n_channels=int(n_channels))
    if not os.path.exists(os.path.join(workdir, "params.h5")):
        import h5py

        with h5py.File(rec) as hf:
            eeg, audio = hf["sEEG"][:], hf["Audio"][:]
            eeg_sr, audio_sr = int(hf["sEEG_sr"][()]), int(hf["Audio_sr"][()])
        res = trainer.train(eeg, audio, eeg_sr, audio_sr, bad_channels=[])
        params_io.store_training(workdir, res, bad_channels=[])

    cfg = configparser.ConfigParser()
    cfg["Experiment1"] = {"griffin_lim_norm": "10"}
    dest = os.path.join(workdir, "eval")
    os.makedirs(dest, exist_ok=True)
    e = exp1_mod.Experiment1(cfg, workdir, dest, rng=np.random.RandomState(0))

    # The hosted relay drops connections on multi-minute runs; fold
    # construction costs ~10 min of small device dispatches, so cache the
    # constructed datasets and restart straight into measurement.
    cache = os.path.join(workdir, "fold_args.npz")
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        args = list(z["args"])
        construct_s = 0.0
    else:
        t0 = time.perf_counter()
        args = e._construct_datasets_for_run(10)
        construct_s = time.perf_counter() - t0
        _emit(metric="exp1_ab_fold_construct_s", value=round(construct_s, 1),
              unit="s (cold cache; threaded staging)")
        boxed = np.empty(len(args), dtype=object)
        for i, a in enumerate(args):
            boxed[i] = a
        np.savez(cache, args=boxed)

    # ---- batched arm, decomposed -------------------------------------
    # (mirrors Experiment1._run_folds_batched for the uniform-KFold case:
    # one shape group, all 10 folds in one lax.map program)
    (k0, xt0, yt0, xe0, _yt, eeg_sr, audio_sr, bad, norm) = args[0]
    mask = np.ones(xt0.shape[1], bool)
    if len(bad):
        mask[np.asarray(bad, int)] = False
    nf = min(150, exp1_mod._N_TAPS * int(mask.sum()))
    dtype = jnp.float32

    t0 = time.perf_counter()
    tcache = os.path.join(workdir, "fold_targets.npz")
    targets = {}
    if os.path.exists(tcache):
        z = np.load(tcache)
        targets = {int(k.split("_")[1]): None for k in z.files if k.startswith("q_")}
        targets = {k: (z[f"q_{k}"], z[f"med_{k}"], z[f"ym_{k}"]) for k in targets}
    key = jax.random.PRNGKey(0)
    fresh = False

    # per-fold target staging in threads (quantization + masked f64 copies
    # release the GIL) — the cold-cache staging wall was 249 s single-
    # threaded in round 3 (VERDICT r3 #6)
    def stage_fold(a):
        (k, x_train, y_train, x_test, y_test, *_rest) = a
        if k in targets:
            q, medians, y_mean = targets[k]
            new = None
        else:
            q, medians, y_mean = fold_targets(y_train)
            new = (k, (np.asarray(q), np.asarray(medians), np.asarray(y_mean)))
        return (np.asarray(x_train, np.float64)[:, mask],
                np.asarray(x_test, np.float64)[:, mask],
                q, y_mean, medians, jax.random.fold_in(key, k), new)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(args), os.cpu_count() or 4)) as ex:
        staged_folds = list(ex.map(stage_fold, args))
    xts, xes, qs, yms, meds, keys = ([s[i] for s in staged_folds] for i in range(6))
    for s in staged_folds:
        if s[6] is not None:
            targets[s[6][0]] = s[6][1]
            fresh = True
    if fresh:
        np.savez(tcache, **{f"{p}_{k}": v for k, (q_, m_, y_) in targets.items()
                            for p, v in (("q", q_), ("med", m_), ("ym", y_))})
    staged = (jnp.asarray(np.stack(xts), dtype), jnp.asarray(np.stack(xes), dtype),
              jnp.asarray(np.stack(qs), jnp.int32), jnp.asarray(np.stack(yms), dtype),
              jnp.asarray(np.stack(meds), dtype), jnp.stack(keys))
    jax.block_until_ready(staged)
    host_staging_s = time.perf_counter() - t0
    _emit(metric="exp1_ab_host_staging_s", value=round(host_staging_s, 2), unit="s")

    runner, _n_frames = make_proposed_runner(
        xt0.shape[0], xe0.shape[0], int(mask.sum()), float(eeg_sr), float(norm),
        nb_feats=nf, dtype=dtype)

    def run_batched():
        reco_b, audio_b = runner(*staged)
        # gate on fetched values (relay acks block_until_ready early on
        # some paths; see bench.py)
        return float(jnp.sum(jnp.abs(reco_b))), int(audio_b[-1, -1])

    t0 = time.perf_counter()
    chk = run_batched()
    first_call_s = time.perf_counter() - t0
    _emit(metric="exp1_ab_batched_first_call_s", value=round(first_call_s, 1), unit="s")
    _emit(metric="exp1_ab_cold_start_to_first_number_s",
          value=round(construct_s + host_staging_s + first_call_s, 1),
          unit="s (fold construction + target staging + compile + batched arm)")

    # ---- sequential arm (round-1 baseline conditions) ----------------
    def run_sequential():
        reco, orig, _w = e._run_folds(args)
        return reco, orig

    # warmup: compile the per-fold train+decode programs once so the
    # interleaved reps compare steady states of both arms
    t0 = time.perf_counter()
    reco_seq, orig = run_sequential()
    seq_first_s = time.perf_counter() - t0
    _emit(metric="exp1_ab_sequential_first_call_s", value=round(seq_first_s, 1), unit="s")

    # ---- interleaved repetitions -------------------------------------
    walls_b, walls_s = [], []
    for rep in range(reps):
        t0 = time.perf_counter()
        run_batched()
        walls_b.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_sequential()
        walls_s.append(time.perf_counter() - t0)
        _emit(metric="exp1_ab_rep", rep=rep, batched_s=round(walls_b[-1], 1),
              sequential_s=round(walls_s[-1], 1))

    best_b, best_s = min(walls_b), min(walls_s)
    compile_s = max(first_call_s - best_b, 0.0)
    _emit(metric="exp1_ab_batched_10fold_s", value=round(best_b, 1), unit="s",
          reps=reps, all=[round(w, 1) for w in walls_b],
          compile_s=round(compile_s, 1),
          host_staging_s=round(host_staging_s, 2))
    _emit(metric="exp1_ab_sequential_10fold_s", value=round(best_s, 1), unit="s",
          reps=reps, all=[round(w, 1) for w in walls_s])

    # quality guard on the batched output (per-fold, same as exp1_full)
    reco_b, _ = runner(*staged)
    reco_b = np.vstack(np.asarray(reco_b))
    n = min(len(reco_b), len(orig))
    fold_rs = []
    fpf = n // 10
    for f in range(10):
        o, r = orig[f * fpf:(f + 1) * fpf], reco_b[f * fpf:(f + 1) * fpf]
        rs = [np.corrcoef(o[:, b], r[:, b])[0, 1] for b in range(o.shape[1])]
        fold_rs.append(float(np.nanmean(rs)))
    assert min(fold_rs) > 0.5, f"fold-level decode quality collapse: {fold_rs}"

    _emit(metric="exp1_ab_speedup", value=round(best_s / best_b, 2), unit="x",
          batched_s=round(best_b, 1), sequential_s=round(best_s, 1),
          min_fold_r=round(min(fold_rs), 3),
          note="interleaved min-of-%d per arm, same process" % reps)


if __name__ == "__main__":
    main(*sys.argv[1:3])
