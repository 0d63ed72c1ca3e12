"""Eval-layer oracle: the reference's ``eval_steps/exp1.py`` executed verbatim.

The system oracle (tests/test_reference_system_oracle.py) covers
train+decode; this runs the layer above — the reference *experiment*
program — unmodified: its ``Experiment1`` class, its fold construction, its
``train_decode_worker`` (reference train + reference node-graph decode per
fold), and its correlation distribution, on a small synthetic session.  The
only intervention is injecting the two module GLOBALS the reference script
sets in ``__main__`` (``config`` and ``dest_dir``, eval_steps/exp1.py:217+)
— no source is modified.

Asserted against the rebuild's eval/exp1.py on the identical session (same
recording file, same dithered audio via a shared RNG stream):

* fold dataset construction is array-identical (masks, alignment clamp,
  test spectrograms);
* the correlation machinery (`_extract_corrs_for_distribution`) agrees to
  float tolerance on identical inputs;
* the full proposed-method pipeline (reference: sequential reference folds;
  rebuild: one lax.map program of retrained folds) lands on the same
  per-bin correlation distribution within the models' documented ~1e-12 fit
  difference (occasional near-tie label flips move single frames, so the
  gate is a tight distribution comparison, not bit equality).
"""

from __future__ import annotations

import configparser
import importlib.util
import os
import sys

import h5py
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import refsys  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(refsys.REF_DIR, "eval_steps")),
    reason="reference repo not available",
)

N_WORDS, NB_FOLDS, SEED = 8, 4, 777


def _import_ref_exp1():
    refsys.import_reference_system()  # stubs + legacy aliases + ref modules
    import matplotlib

    matplotlib.use("Agg")
    saved = matplotlib.rcParams.copy()   # module applies ggplot style globally
    sys.path.insert(0, refsys.REF_DIR)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_eval_exp1", os.path.join(refsys.REF_DIR, "eval_steps", "exp1.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(refsys.REF_DIR)
        dict.update(matplotlib.rcParams, saved)
    return mod


@pytest.fixture(scope="module")
def eval_ab(tmp_path_factory):
    examples_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples")
    if examples_dir not in sys.path:
        sys.path.insert(0, examples_dir)
    from demo import make_synthetic_session

    from closed_loop_seeg_speech_synthesis_tpu.eval import exp1 as repo_exp1

    session_dir = str(tmp_path_factory.mktemp("ref_eval_sess"))
    rec = os.path.join(session_dir, "speech1.hdf")
    make_synthetic_session(rec, n_words=N_WORDS, n_channels=8, seed=3)
    # both fold constructions read only bad_channels from params.h5
    with h5py.File(os.path.join(session_dir, "params.h5"), "w") as hf:
        hf.create_dataset("bad_channels", data=np.array([], np.int64))

    cfg = configparser.ConfigParser()
    cfg["Experiment1"] = {"griffin_lim_norm": "10"}
    cfg["Decoding"] = {"griffin_lim_norm": "10"}

    mod = _import_ref_exp1()
    ref_dest = str(tmp_path_factory.mktemp("ref_dest"))
    os.makedirs(os.path.join(ref_dest, "reco_wavs"), exist_ok=True)
    # the script-level globals __main__ would have set (exp1.py:217+)
    mod.config = cfg
    mod.dest_dir = ref_dest

    # identical dither: the reference Session draws from GLOBAL np.random;
    # seeding right before construction matches RandomState(SEED)'s stream
    np.random.seed(SEED)
    ref_e = mod.Experiment1(cfg, session_dir, ref_dest)

    repo_dest = str(tmp_path_factory.mktemp("repo_dest"))
    repo_e = repo_exp1.Experiment1(cfg, session_dir, repo_dest,
                                   rng=np.random.RandomState(SEED))
    assert np.array_equal(ref_e.sess.audio, repo_e.sess.audio)
    return mod, ref_e, repo_e


def test_fold_construction_parity(eval_ab):
    mod, ref_e, repo_e = eval_ab
    ref_args = ref_e._construct_datasets_for_run(nb_folds=NB_FOLDS)
    repo_args = repo_e._construct_datasets_for_run(nb_folds=NB_FOLDS)
    assert len(ref_args) == len(repo_args) == NB_FOLDS
    for ra, pa in zip(ref_args, repo_args):
        assert ra[0] == pa[0]                       # fold id
        for i in (1, 2, 3):                         # x_train y_train x_test: exact
            np.testing.assert_array_equal(np.asarray(ra[i]), np.asarray(pa[i]))
        # y_test is a computed spectrogram (reference: numpy offline.py;
        # rebuild: jnp) — float-tolerance, not bit equality
        np.testing.assert_allclose(np.asarray(ra[4]), np.asarray(pa[4]),
                                   rtol=1e-9, atol=1e-11)
        assert (ra[5], ra[6], ra[8]) == (pa[5], pa[6], pa[8])


def test_corr_distribution_machinery(eval_ab):
    mod, ref_e, _repo_e = eval_ab
    from closed_loop_seeg_speech_synthesis_tpu.eval.metrics import (
        extract_corrs_for_distribution,
    )

    rng = np.random.RandomState(0)
    orig = rng.randn(400, 40)
    reco = orig * 0.5 + rng.randn(400, 40)
    want_m, want_s = mod.Experiment1._extract_corrs_for_distribution(orig, reco)
    got_m, got_s = extract_corrs_for_distribution(orig, reco, n_folds=5)
    np.testing.assert_allclose(got_m, want_m, rtol=0, atol=1e-12)
    np.testing.assert_allclose(got_s, want_s, rtol=0, atol=1e-12)


def test_statistics_core_oracle(eval_ab):
    """The reference's correlation statistics (local/offline.py:195-216 +
    extract_corrs_for_distribution) executed in place vs the rebuild's
    metrics on shared inputs — the numbers behind figure_3/figure_4's
    Mann-Whitney inputs (figure_3.py:42,111,142)."""
    del eval_ab  # just ensures refsys import side effects are in place
    sys.path.insert(0, refsys.REF_DIR)
    try:
        from local.offline import extract_corrs_for_distribution as ref_ecd
        from local.offline import pearson_correlation as ref_pc
    finally:
        sys.path.remove(refsys.REF_DIR)
    from closed_loop_seeg_speech_synthesis_tpu.eval import metrics

    rng = np.random.RandomState(1)
    a = rng.randn(300, 40)
    b = 0.4 * a + rng.randn(300, 40)
    wm, ws, wr = ref_pc(a, b, return_means=True)
    gm, gs, gr = metrics.pearson_correlation(a, b, return_means=True)
    np.testing.assert_allclose(gr, wr, rtol=0, atol=1e-12)
    np.testing.assert_allclose([gm, gs], [wm, ws], rtol=0, atol=1e-12)
    wm2, ws2 = ref_ecd(a, b)
    gm2, gs2 = metrics.extract_corrs_for_distribution(a, b)
    np.testing.assert_allclose(gm2, wm2, rtol=0, atol=1e-12)
    np.testing.assert_allclose(gs2, ws2, rtol=0, atol=1e-12)


def test_exp2_dtw_warping_oracle(eval_ab):
    """The reference's DTW warping code (eval_steps/exp2.py:24-38:
    ``get_warping_path`` + ``dtw_warping``) executed verbatim vs the
    rebuild's eval/dtw.py, with the DTW ENGINE held equal: the reference
    calls third-party ``fastdtw`` with ``radius=len(query)`` — degenerate to
    exact full-window DTW (the repo's documented equivalence,
    eval/dtw.py:3-7) — and fastdtw-the-library is not part of the reference
    repo, so the oracle injects the same exact-DTW engine into both sides
    and proves the reference's OWN code (path unzipping, linear-interp
    warping index, boundary fixup, warped gather) matches."""
    mod, _ref_e, _repo_e = eval_ab
    import importlib.util as _ilu

    from closed_loop_seeg_speech_synthesis_tpu.eval import dtw as repo_dtw

    # inject the exact engine as `fastdtw` and (re)load the reference module
    import types

    fake = types.ModuleType("fastdtw")
    fake.fastdtw = lambda x, y, dist=None, radius=None: repo_dtw.dtw_path(x, y)
    orig = sys.modules.get("fastdtw")
    sys.modules["fastdtw"] = fake
    sys.path.insert(0, refsys.REF_DIR)
    try:
        spec = _ilu.spec_from_file_location(
            "ref_eval_exp2", os.path.join(refsys.REF_DIR, "eval_steps", "exp2.py"))
        ref2 = _ilu.module_from_spec(spec)
        spec.loader.exec_module(ref2)
    finally:
        sys.path.remove(refsys.REF_DIR)
        if orig is not None:
            sys.modules["fastdtw"] = orig

    rng = np.random.RandomState(7)
    for trial in range(3):
        # the reference's interp1d domain requires len(reference) <= len(query)
        # (exp2.py:27 raises otherwise) — its exp2 inputs satisfy this
        n = rng.randint(50, 90)
        m = rng.randint(40, n + 1)
        reco = rng.randn(n, 40)
        orig_spec = rng.randn(m, 40)
        want = ref2.dtw_warping(reco, orig_spec)
        got = repo_dtw.dtw_warping(reco, orig_spec)
        np.testing.assert_array_equal(got, want)


def test_proposed_method_end_to_end(eval_ab):
    """Reference Experiment1 proposed method (sequential reference-node
    folds) vs the rebuild's one-program batched folds on the same session."""
    mod, ref_e, repo_e = eval_ab
    # the reference hardcodes nb_folds=10 inside _proposed_method_train_decode;
    # drive its own pieces at NB_FOLDS instead (same statements, small session)
    from multiprocessing.pool import ThreadPool

    ref_args = ref_e._construct_datasets_for_run(nb_folds=NB_FOLDS)
    with ThreadPool(processes=1) as p:
        results = p.starmap(mod.train_decode_worker, ref_args)
    results = sorted(results, key=lambda x: x[0])
    _ks, reco, orig, _wav = zip(*results)
    reco_ref, orig_ref = np.vstack(reco), np.vstack(orig)
    ref_m, ref_s = mod.Experiment1._extract_corrs_for_distribution(orig_ref, reco_ref)

    repo_m, repo_s = repo_e.proposed_method(nb_folds=NB_FOLDS)

    assert repo_m.shape == ref_m.shape == (40,)
    # identical session + ~1e-12 model-fit differences: the distributions
    # must coincide tightly (single near-tie label flips move single frames)
    assert np.max(np.abs(repo_m - ref_m)) < 5e-3, (repo_m - ref_m)
    assert np.max(np.abs(repo_s - ref_s)) < 5e-3
    assert np.corrcoef(repo_m, ref_m)[0, 1] > 0.9999
    # and the experiment actually discriminates (learnable synthetic session)
    assert np.nanmean(ref_m) > 0.5 and np.nanmean(repo_m) > 0.5
