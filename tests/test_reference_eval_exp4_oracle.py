"""exp4 oracle: the reference's Haufe-transform code executed verbatim.

``eval_steps/exp4.py`` hardcodes its study session's shape (122 shaft
channel names x 5 taps = 610 stacked features, 150 selected, sklearn LDA
estimators where bins 7 and 14 miss quantization class 1).  We fabricate a
params.h5 + training_features.npy matching those assumptions exactly, run
the reference ``Experiment4.compute_activations`` unmodified, and compare
against the rebuild on the same artifacts.

The comparison emulates a documented reference QUIRK: for its missing-class
bins the reference pads the masked inverse via ``tmp[mask, :][:, mask] =
inv`` (exp4.py:95-100) — numpy chained fancy indexing that assigns into a
temporary COPY, so those two bins' activation slices are silently all-zero
in its output.  The rebuild computes the proper masked inverse
(``np.ix_``); zeroing its bins 7/14 reproduces the reference output on the
remaining 38 well-posed bins to float tolerance (the reference computes
class scores with a per-row matvec loop, so bit equality is not defined).
"""

from __future__ import annotations

import importlib.util
import os
import pickle
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


def _import_ref_exp4():
    refsys.import_reference_system()
    import matplotlib

    matplotlib.use("Agg")
    # the module mutates GLOBAL matplotlib rcParams at import (ggplot style,
    # usetex=True — which breaks every later plot on a TeX-less host);
    # snapshot and restore so other tests' figure rendering stays intact
    saved = matplotlib.rcParams.copy()
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_eval_exp4", os.path.join(refsys.REF_DIR, "eval_steps", "exp4.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        dict.update(matplotlib.rcParams, saved)
    return mod


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    """Artifacts shaped exactly like the reference's hardcoded session."""
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis

    mod = _import_ref_exp4()
    rng = np.random.RandomState(11)
    n, d_sel = 420, 150
    X = rng.randn(n, d_sel)
    estimators = []
    for b in range(40):
        classes = np.arange(9)
        if b in (7, 14):
            classes = np.array([0, 2, 3, 4, 5, 6, 7, 8])
        y = rng.choice(classes, size=n)
        y[: len(classes)] = classes  # every class present
        # full-rank class means: a rank-1 shift (0.3*y) makes the class
        # scores collinear and cov(W^T x) near-singular, amplifying ulp
        # noise unboundedly through the inverse in BOTH implementations
        mu = rng.randn(9, d_sel)
        est = LinearDiscriminantAnalysis()
        est.fit(X + mu[y], y)
        estimators.append(est)

    # the reference hardcodes 122 shaft channel names x 5 taps = 610 names
    select = np.sort(rng.permutation(610)[:d_sel])
    sd = str(tmp_path_factory.mktemp("exp4_sess"))
    with h5py.File(os.path.join(sd, "params.h5"), "w") as hf:
        hf.create_dataset("bad_channels", data=np.array([], np.int64))
        hf.create_dataset("medians_array", data=np.sort(rng.randn(40, 9), 1))
        hf.create_dataset("estimators", data=np.void(pickle.dumps(estimators)))
        hf.create_dataset("select", data=select)
    np.save(os.path.join(sd, "training_features.npy"), X)
    return mod, sd


def test_exp4_oracle(session):
    """Why no tight tolerance: sklearn LDA's coef_ spans at most k-1
    dimensions, so the reference's ``sigma_s`` (k x k score covariance,
    exp4.py:92) is singular BY CONSTRUCTION and ``np.linalg.inv`` amplifies
    precision noise by ~eps/lambda_min (~1e-2 relative here).  The
    reference's own output moves by that much under a 1-ulp input
    perturbation — measured below and used as the comparison envelope: the
    rebuild must sit inside the reference's own reproducibility noise."""
    from closed_loop_seeg_speech_synthesis_tpu.eval import exp4 as repo_exp4

    mod, sd = session
    ref_e = mod.Experiment4(sd)
    want = ref_e.compute_activations()

    # the reference's own sensitivity: perturb the observations by 1 ulp
    ref_p = mod.Experiment4(sd)
    ref_p.obs_data = ref_p.obs_data * (1.0 + 2e-16)
    want_p = ref_p.compute_activations()
    env = np.abs(want - want_p)
    sel = want != 0

    repo_e = repo_exp4.Experiment4(sd, ref_e.channel_names)
    assert repo_e.sel_features == ref_e.sel_features
    _matrix, all_A, _act = repo_e.compute_activations(return_all=True)

    # reference quirk emulation: its bins 7/14 slices are silently zero
    all_A_q = all_A.copy()
    all_A_q[:, :, [7, 14]] = 0.0
    act_q = np.mean(np.abs(all_A_q), axis=(1, 2))
    got = repo_e._scatter(act_q)

    assert got.shape == want.shape == (122, 5)
    # zero cells (unselected features) must agree exactly
    np.testing.assert_array_equal(got[~sel], want[~sel])
    # Selected cells: the strongest statement the math permits.  Measured on
    # this fixture, the REFERENCE's own output under the 1-ulp perturbation
    # has median relative change ~1.08 and self-correlation r~0.35 — the
    # values are singular-inverse noise, NOT reproducible numbers (any BLAS
    # change would move them this much).  The gate is therefore: the
    # rebuild's deviation sits inside the reference's own reproducibility
    # envelope (it does, with ~2x margin: median 0.006 vs 0.015).
    d = np.abs(got[sel] - want[sel])
    assert np.median(d) <= 2 * np.median(env[sel]), (np.median(d), np.median(env[sel]))
    assert d.max() <= 2 * env[sel].max(), (d.max(), env[sel].max())

    # and the rebuild's proper masked inverse actually fixes those bins:
    # their activation slices are nonzero (the quirk loses them entirely)
    assert np.abs(all_A[:, :, [7, 14]]).max() > 0.0
