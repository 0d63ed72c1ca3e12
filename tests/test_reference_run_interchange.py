"""Artifact-interchange oracle: reference TOOLING consumes repo-produced runs.

The system oracle (tests/test_reference_system_oracle.py) proves the numeric
halves of the interchange contract (params.h5 both directions, decoded audio
parity).  This closes the remaining half — the *artifact directories*:

* a decode run dir written by the rebuild's writers (`cli/decode.py:
  store_decoding_to_file` plus the online marker-logger row format of
  `runtime/online.py:read_markers`, whose live output tests/
  test_online_loopback.py already exercises) is loaded by the REFERENCE's own
  `local/data_loader.DecodingRun` (data_loader.py:253-325) and processed by
  the reference's `eval_steps/extract_trials.py` executed verbatim
  (extract_trials.py:27-47), and every extracted trial is identical to what
  the rebuild's twins (io/session.py, eval/figures.py) extract;
* a training session dir written by `io/loaders.save_hdf5` is loaded by the
  reference's `Session` (data_loader.py:196-251) with identical trials.

If the reference's post-hoc analysis stack runs unmodified on directories the
rebuild produced, a user can mix tools from both systems freely.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import refsys  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(refsys.REF_DIR, "eval_steps")),
    reason="reference repo not available",
)

T0 = 1000.0  # stream first-timestamp (arbitrary epoch, as LSL clocks are)
# (monotonic offset, label): two trials, one on an uneven offset so the
# round-to-10ms path (data_loader.py:277) is exercised.
MARKER_ROWS = [
    (0.1, "experimentStarted"),
    (0.5, "start;avond"),
    (2.5, "end;avond"),
    (3.5177, "start;gevaar"),
    (5.5177, "end;gevaar"),
    (7.9, "experimentEnded"),
]


def _ref_modules():
    refsys.import_reference_system()
    return sys.modules["local.data_loader"]


def _import_ref_extract_trials():
    _ref_modules()  # stubs + local.data_loader in sys.modules
    spec = importlib.util.spec_from_file_location(
        "ref_extract_trials",
        os.path.join(refsys.REF_DIR, "eval_steps", "extract_trials.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def repo_run_dir(tmp_path_factory):
    """A decode run dir produced by the rebuild's real writers, next to a
    session dir holding the training artifacts, the session recording
    (speech1.hdf) and one other-task XDF — everything the reference's
    post-hoc tooling expects of a session tree."""
    import configparser

    import jax.numpy as jnp

    from closed_loop_seeg_speech_synthesis_tpu.cli import decode as decode_cli
    from closed_loop_seeg_speech_synthesis_tpu.io import loaders
    from closed_loop_seeg_speech_synthesis_tpu.runtime import params as params_io, trainer

    tmp = tmp_path_factory.mktemp("interchange")
    rng = np.random.RandomState(17)
    eeg_sr, audio_sr = 1024, 48000
    eeg = rng.randn(8 * eeg_sr, 4)
    t = np.arange(8 * audio_sr) / audio_sr
    audio = 0.3 * np.sin(2 * np.pi * 180 * t)
    res = trainer.train(eeg, audio, eeg_sr, audio_sr, bad_channels=[1], nb_feats=12)
    sess_dir = tmp / "sess"
    sess_dir.mkdir()
    params_io.store_training(str(sess_dir), res, bad_channels=[1])
    loaded = params_io.load_params(os.path.join(sess_dir, "params.h5"), dtype=jnp.float64)

    # the session recording (words on the fixed 3 s grid Session assumes)
    sess_markers = [["experimentStarted"], ["start;avond"], ["end;avond"],
                    ["start;gevaar"], ["end;gevaar"], ["experimentEnded"]]
    loaders.save_hdf5(str(sess_dir / "speech1.hdf"), eeg, eeg_sr, audio, audio_sr,
                      ch_names=[f"A{i}" for i in range(4)], markers=sess_markers)

    # one other-task recording (for exp2's chance-segment pool)
    from test_io import write_test_xdf

    ot_eeg = rng.randn(4 * eeg_sr, 4).astype(np.float32)
    ot_audio = (0.1 * rng.randn(4 * audio_sr)).astype(np.float32)
    ot_markers = [(100.2, "experimentStarted"), (103.8, "experimentEnded")]
    write_test_xdf(str(sess_dir / "othertask.xdf"), ot_eeg, eeg_sr, ot_audio,
                   audio_sr, ot_markers, [f"A{i}" for i in range(4)])

    spec, out_audio, received, sr = decode_cli.perform_offline_decoding(loaded, eeg, eeg_sr, 10)
    run_dir = tmp / "run_001"
    run_dir.mkdir()
    cfg = configparser.ConfigParser()
    cfg["General"] = {"storage_dir": str(tmp), "session": "run_001"}
    decode_cli.store_decoding_to_file(str(run_dir), cfg, spec, out_audio, received, sr)

    # first_timestamp + markers.csv in the online writers' exact formats
    # (runtime/online.py:498-511 writes "walltime,stream_ts,label" rows; the
    # live writer itself is exercised by tests/test_online_loopback.py).
    np.save(run_dir / "first_timestamp.npy", np.float64(T0))
    with open(run_dir / "markers.csv", "w") as f:
        for off, label in MARKER_ROWS:
            f.write(f"2026-08-19 12:00:{off:09.6f},{T0 + off!r},{label}\n")
    return str(run_dir)


def test_reference_decodingrun_reads_repo_run(repo_run_dir):
    """Reference DecodingRun (data_loader.py:253-325) on a repo-written run
    extracts trials identical to the rebuild's io/session.DecodingRun."""
    ref_dl = _ref_modules()
    from closed_loop_seeg_speech_synthesis_tpu.io.session import DecodingRun

    ref = ref_dl.DecodingRun(repo_run_dir)
    ours = DecodingRun(repo_run_dir)

    assert ref.words == ours.words == ["avond", "gevaar"]
    np.testing.assert_array_equal(ref.trial_starts_in_sec, ours.trial_starts_in_sec)
    np.testing.assert_array_equal(ref.trial_starts_in_sec, [0.5, 3.52])
    assert int(ref.audio_sr) == int(ours.audio_sr) == 16000
    assert int(ref.eeg_sr) == int(ours.eeg_sr) == 1024
    np.testing.assert_array_equal(ref.audio, ours.audio)
    np.testing.assert_array_equal(ref.eeg, ours.eeg)
    np.testing.assert_array_equal(ref.word_starts_indices_audio, ours.word_starts_indices_audio)
    np.testing.assert_array_equal(ref.word_starts_indices_eeg, ours.word_starts_indices_eeg)

    for i in range(len(ref.words)):
        for rest in (False, True):
            w_r, e_r, a_r = ref.get_trial_by_index(i, include_rest=rest)
            w_o, e_o, a_o = ours.get_trial_by_index(i, include_rest=rest)
            assert w_r == w_o
            np.testing.assert_array_equal(e_r, e_o)
            np.testing.assert_array_equal(a_r, a_o)
            assert a_r.size == (3 if rest else 2) * 16000  # inside the audio


def test_reference_extract_trials_on_repo_run(repo_run_dir, tmp_path):
    """eval_steps/extract_trials.py verbatim on the repo-written run produces
    byte-identical per-trial wavs and an equivalent .lab to the rebuild's
    eval/figures twins."""
    ref_et = _import_ref_extract_trials()
    from closed_loop_seeg_speech_synthesis_tpu.eval import figures

    ref_out, repo_out = tmp_path / "ref", tmp_path / "repo"
    ref_out.mkdir(), repo_out.mkdir()
    ref_et.extract_wavs_from_decoding_trials(run_dir=repo_run_dir, temp_dir=str(ref_out))
    ref_et.generate_trial_label_file(run_dir=repo_run_dir, temp_dir=str(ref_out))
    figures.extract_wavs_from_decoding_trials(repo_run_dir, str(repo_out))
    figures.generate_trial_label_file(repo_run_dir, str(repo_out))

    name = os.path.basename(repo_run_dir)
    ref_wavs = sorted(os.listdir(ref_out / f"{name}_wavs"))
    repo_wavs = sorted(os.listdir(repo_out / f"{name}_wavs"))
    assert ref_wavs == repo_wavs == ["001-avond.wav", "002-gevaar.wav"]
    for f in ref_wavs:
        rb = (ref_out / f"{name}_wavs" / f).read_bytes()
        ob = (repo_out / f"{name}_wavs" / f).read_bytes()
        assert rb == ob, f"wav bytes differ for {f}"

    # .lab parity: parse fields (pandas vs str() float formatting could in
    # principle differ in repr, so compare values, not bytes)
    def parse(p):
        rows = []
        for line in p.read_text().strip().splitlines():
            s, e, w = line.split("\t")
            rows.append((float(s), float(e), w))
        return rows

    ref_rows = parse(ref_out / f"{name}_trials.lab")
    repo_rows = parse(repo_out / f"{name}_trials.lab")
    assert ref_rows == repo_rows
    assert [w for _, _, w in ref_rows] == ["avond", "gevaar"]


def test_reference_exp3_verbatim_on_repo_run(repo_run_dir, tmp_path):
    """The reference's Experiment3 (eval_steps/exp3.py:18-68) executed
    verbatim on the repo-written run dir: speech-amount numbers exactly equal
    to the rebuild's eval/exp3.py (dither stream held equal) and byte-equal
    VAD .lab exports."""
    import configparser

    _ref_modules()
    import matplotlib

    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location(
        "ref_exp3", os.path.join(refsys.REF_DIR, "eval_steps", "exp3.py"))
    ref_exp3 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_exp3)

    from closed_loop_seeg_speech_synthesis_tpu.eval.exp3 import Experiment3

    cfg = configparser.ConfigParser()
    cfg["Experiment3"] = {  # reference config/evaluation.ini values
        "vad_energy_threshold": "0.5", "vad_energy_mean_scale": "1",
        "vad_frames_context": "5", "vad_proportion_threshold": "0.6",
    }

    np.random.seed(7)
    ref = ref_exp3.Experiment3(cfg, repo_run_dir)
    ref_trials, ref_rest = ref.run()

    np.random.seed(7)
    ours = Experiment3(cfg, repo_run_dir, rng=np.random)
    our_trials, our_rest = ours.run()

    assert (ref_trials, ref_rest) == (our_trials, our_rest)
    np.testing.assert_array_equal(ref.vad_mask, ours.vad_mask)
    assert ref_trials + ref_rest > 0  # the decode produced audible energy

    ref_lab, our_lab = tmp_path / "ref_run.lab", tmp_path / "our_run.lab"
    ref.vad.convert_vad_to_lab(str(ref_lab), ref.vad_mask)
    ours.export_lab(str(our_lab))
    assert ref_lab.read_bytes() == our_lab.read_bytes()


def test_reference_exp2_verbatim_on_repo_run(repo_run_dir):
    """The reference's Experiment_2 (eval_steps/exp2.py:65-134) executed
    verbatim on the repo-produced session tree: the constructor consumes the
    repo's run dir, session recording AND other-task XDF (reference pyxdf
    parser vs the rebuild's fresh parser on the same file), and the
    matched-trials DTW correlations equal the rebuild's eval/exp2.py.

    The DTW engine is held equal as in test_reference_eval_oracle.py
    (fastdtw at radius=len(query) degenerates to exact full-window DTW; the
    third-party library is not reference code).  The chance path is not
    A/B'd here: reference chance_level_worker hardcodes sfreq=2048
    (exp2.py:55) while the rebuild uses the run's true rate; the worker's
    ingredients (params-tuple decode, dtw_warping, pearson_correlation) are
    each oracled elsewhere."""
    import configparser
    import types

    _ref_modules()
    from closed_loop_seeg_speech_synthesis_tpu.eval import dtw as repo_dtw
    from closed_loop_seeg_speech_synthesis_tpu.eval.exp2 import Experiment2

    fake = types.ModuleType("fastdtw")
    fake.fastdtw = lambda x, y, dist=None, radius=None: repo_dtw.dtw_path(x, y)
    orig_fd = sys.modules.get("fastdtw")
    sys.modules["fastdtw"] = fake
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_exp2_full", os.path.join(refsys.REF_DIR, "eval_steps", "exp2.py"))
        ref_exp2 = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_exp2)
    finally:
        if orig_fd is not None:
            sys.modules["fastdtw"] = orig_fd

    sess_dir = os.path.join(os.path.dirname(repo_run_dir), "sess")
    cfg = configparser.ConfigParser()
    cfg["Experiment2"] = {"griffin_lim_norm": "10"}

    np.random.seed(5)
    ref = ref_exp2.Experiment_2(cfg, sess_dir, repo_run_dir,
                                other_tasks=["othertask.xdf"], dest_dir=sess_dir)
    np.random.seed(5)
    ours = Experiment2(cfg, sess_dir, repo_run_dir,
                       other_tasks=["othertask.xdf"], dest_dir=sess_dir,
                       rng=np.random)

    # constructor parity: same dithered session audio, and the reference's
    # vendored-pyxdf other-task loader and the rebuild's fresh parser agree
    # on the repo-written XDF
    np.testing.assert_array_equal(ref.sess.audio, ours.sess.audio)
    np.testing.assert_array_equal(ref.other_tasks_eeg, ours.other_tasks_eeg)

    ref_corrs = ref._compute_correlation_of_matching_trials()
    our_corrs = ours.matching_trials()
    assert len(ref_corrs) == len(our_corrs) == 2
    np.testing.assert_allclose(sorted(our_corrs), sorted(ref_corrs),
                               rtol=0, atol=1e-9)
    assert all(-1.0 <= c <= 1.0 for c in ref_corrs)


@pytest.fixture(scope="module")
def repo_session_2048(tmp_path_factory):
    """A session tree at the 2048 Hz operating point — the rate at which the
    reference's exp2 chance worker (exp2.py:55, hardcoded sfreq=2048) is
    self-consistent, so the chance path can be A/B'd exactly."""
    import configparser

    import jax.numpy as jnp

    from closed_loop_seeg_speech_synthesis_tpu.cli import decode as decode_cli
    from closed_loop_seeg_speech_synthesis_tpu.io import loaders
    from closed_loop_seeg_speech_synthesis_tpu.runtime import params as params_io, trainer
    from test_io import write_test_xdf

    tmp = tmp_path_factory.mktemp("interchange2048")
    rng = np.random.RandomState(23)
    eeg_sr, audio_sr = 2048, 48000
    eeg = rng.randn(8 * eeg_sr, 4)
    t = np.arange(8 * audio_sr) / audio_sr
    audio = 0.3 * np.sin(2 * np.pi * 180 * t)
    res = trainer.train(eeg, audio, eeg_sr, audio_sr, bad_channels=[1], nb_feats=12)
    sess_dir = tmp / "sess"
    sess_dir.mkdir()
    params_io.store_training(str(sess_dir), res, bad_channels=[1])
    loaded = params_io.load_params(os.path.join(sess_dir, "params.h5"), dtype=jnp.float64)

    sess_markers = [["experimentStarted"], ["start;avond"], ["end;avond"],
                    ["start;gevaar"], ["end;gevaar"], ["experimentEnded"]]
    loaders.save_hdf5(str(sess_dir / "speech1.hdf"), eeg, eeg_sr, audio, audio_sr,
                      ch_names=[f"A{i}" for i in range(4)], markers=sess_markers)

    ot_eeg = rng.randn(5 * eeg_sr, 4).astype(np.float32)
    ot_audio = (0.1 * rng.randn(5 * audio_sr)).astype(np.float32)
    write_test_xdf(str(sess_dir / "othertask.xdf"), ot_eeg, eeg_sr, ot_audio,
                   audio_sr, [(100.2, "experimentStarted"), (104.8, "experimentEnded")],
                   [f"A{i}" for i in range(4)])

    spec, out_audio, received, sr = decode_cli.perform_offline_decoding(loaded, eeg, eeg_sr, 10)
    run_dir = tmp / "run_2048"
    run_dir.mkdir()
    cfg = configparser.ConfigParser()
    cfg["General"] = {"storage_dir": str(tmp), "session": "run_2048"}
    decode_cli.store_decoding_to_file(str(run_dir), cfg, spec, out_audio, received, sr)
    np.save(run_dir / "first_timestamp.npy", np.float64(T0))
    with open(run_dir / "markers.csv", "w") as f:
        for off, label in MARKER_ROWS:
            f.write(f"2026-08-19 12:00:{off:09.6f},{T0 + off!r},{label}\n")
    return str(sess_dir), str(run_dir)


def test_reference_exp2_chance_verbatim_2048(repo_session_2048):
    """The reference's full exp2 chance protocol (_estimate_chance_level +
    chance_level_worker, exp2.py:41-62,92-113) executed verbatim at 2048 Hz
    (where its hardcoded sfreq is self-consistent) on the repo session tree:
    params-tuple loading from the repo-written params.h5, random other-task
    cutoffs, word cycling, node-graph decode, DTW scoring — chance
    correlations equal the rebuild's Experiment2.chance_level to 1e-9 (the
    decoded spectrogram is pre-vocoder, so GL phase RNG cannot differ)."""
    import configparser
    import types

    _ref_modules()
    from closed_loop_seeg_speech_synthesis_tpu.eval import dtw as repo_dtw
    from closed_loop_seeg_speech_synthesis_tpu.eval.exp2 import Experiment2

    sess_dir, run_dir = repo_session_2048
    fake = types.ModuleType("fastdtw")
    fake.fastdtw = lambda x, y, dist=None, radius=None: repo_dtw.dtw_path(x, y)
    orig_fd = sys.modules.get("fastdtw")
    sys.modules["fastdtw"] = fake
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_exp2_chance", os.path.join(refsys.REF_DIR, "eval_steps", "exp2.py"))
        ref_exp2 = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_exp2)
    finally:
        if orig_fd is not None:
            sys.modules["fastdtw"] = orig_fd

    cfg = configparser.ConfigParser()
    cfg["Experiment2"] = {"griffin_lim_norm": "10"}
    cfg["General"] = {"storage_dir": os.path.dirname(sess_dir),
                      "session": os.path.basename(sess_dir)}
    ref_exp2.config = cfg  # the module global __main__ would have set

    RUNS = 3
    np.random.seed(13)
    ref = ref_exp2.Experiment_2(cfg, sess_dir, run_dir,
                                other_tasks=["othertask.xdf"], dest_dir=sess_dir)
    ref_chance = ref._estimate_chance_level(runs=RUNS)

    np.random.seed(13)
    ours = Experiment2(cfg, sess_dir, run_dir,
                       other_tasks=["othertask.xdf"], dest_dir=sess_dir,
                       rng=np.random)
    our_chance = ours.chance_level(runs=RUNS)

    assert ref_chance.shape == our_chance.shape == (RUNS,)
    # NaN chance runs are the reference's own semantic: a chance decode whose
    # LDA pins some bin to one class for every frame yields an
    # exactly-constant spectrogram column, scipy's pearsonr returns NaN for
    # it, and Experiment_2.run() drops the run.  The rebuild must reproduce
    # the NaN pattern, not paper over it with a finite ~1e-15 ratio (the bug
    # this oracle caught in eval/metrics.pearson_per_bin).
    np.testing.assert_array_equal(np.isnan(ref_chance), np.isnan(our_chance))
    np.testing.assert_allclose(our_chance, ref_chance, rtol=0, atol=1e-9,
                               equal_nan=True)


def test_reference_session_reads_repo_session(tmp_path):
    """Reference Session (data_loader.py:196-251) on a save_hdf5-written
    training dir: identical trials + byte-identical extract_wavs output."""
    from closed_loop_seeg_speech_synthesis_tpu.io import loaders
    from closed_loop_seeg_speech_synthesis_tpu.io.session import Session

    ref_dl = _ref_modules()
    ref_et = _import_ref_extract_trials()

    rng = np.random.RandomState(3)
    eeg_sr, audio_sr, n_words = 1024, 48000, 3
    secs = 3 * n_words + 1
    eeg = rng.randn(secs * eeg_sr, 4)
    audio = 0.1 * rng.randn(secs * audio_sr)
    words = ["avond", "gevaar", "woord"]
    markers = [["experimentStarted"]]
    for w in words:
        markers += [[f"start;{w}"], [f"end;{w}"]]
    markers += [["experimentEnded"]]
    sess_dir = tmp_path / "sessdir"
    sess_dir.mkdir()
    loaders.save_hdf5(str(sess_dir / "speech1.hdf"), eeg, eeg_sr, audio, audio_sr,
                      ch_names=[f"A{i}" for i in range(4)], markers=markers)

    # both constructors dither with np.random.normal; equalize the stream
    np.random.seed(99)
    ref = ref_dl.Session(str(sess_dir))
    np.random.seed(99)
    ours = Session(str(sess_dir))

    assert ref.words == ours.words == words
    assert int(ref.eeg_sr) == int(ours.eeg_sr) == eeg_sr
    assert int(ref.audio_sr) == int(ours.audio_sr) == 16000
    np.testing.assert_array_equal(ref.audio, ours.audio)
    np.testing.assert_array_equal(ref.eeg, ours.eeg)
    for i in range(n_words):
        w_r, e_r, a_r = ref.get_trial_by_index(i, include_rest=True)
        w_o, e_o, a_o = ours.get_trial_by_index(i, include_rest=True)
        assert w_r == w_o
        np.testing.assert_array_equal(e_r, e_o)
        np.testing.assert_array_equal(a_r, a_o)

    from closed_loop_seeg_speech_synthesis_tpu.eval import figures

    ref_out, repo_out = tmp_path / "ref_sess", tmp_path / "repo_sess"
    ref_out.mkdir(), repo_out.mkdir()
    np.random.seed(99)
    ref_et.extract_wavs_from_session(session_dir=str(sess_dir), temp_dir=str(ref_out))
    np.random.seed(99)
    figures.extract_wavs_from_session(str(sess_dir), str(repo_out))
    ref_wavs = sorted(os.listdir(ref_out / "train_wavs"))
    repo_wavs = sorted(os.listdir(repo_out / "train_wavs"))
    assert ref_wavs == repo_wavs == ["001-avond.wav", "002-gevaar.wav", "003-woord.wav"]
    for f in ref_wavs:
        assert (ref_out / "train_wavs" / f).read_bytes() == \
            (repo_out / "train_wavs" / f).read_bytes(), f"wav bytes differ for {f}"
