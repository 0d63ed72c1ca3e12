"""Experiment 4: LDA activation maps via the Haufe transform
(twin of reference ``eval_steps/exp4.py``).

A = cov(X) @ W @ inv(cov(Wᵀ X)) per mel bin; |A| averaged over classes and
bins, scattered onto a (channel, context-lag) grid through the selected
feature names.  Where the reference hardcodes the study patient's shaft
names and the two bins with a missing quantization interval
(exp4.py:33-43,70-83), we take channel names as input and read missing
classes from the model's validity mask.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ..runtime import params as params_io

logger = logging.getLogger("eval.exp4")


def feature_names(channel_names, n_taps: int = 5):
    """Stacked-feature names, channel-major with lag taps newest-first
    (exp4.py:50: '{ch}-{tap}' for taps reversed(range(5)))."""
    return ["{}-{}".format(c, t) for c in channel_names for t in reversed(range(n_taps))]


class Experiment4:
    def __init__(self, session_dir, channel_names, n_taps: int = 5):
        self.session_dir = session_dir
        self.channel_names = list(channel_names)
        self.n_taps = n_taps
        loaded = params_io.load_params(os.path.join(session_dir, "params.h5"))
        self.lda = loaded["lda"]
        self.select = loaded["select"]
        names = feature_names(self.channel_names, n_taps)
        self.sel_features = [f for i, f in enumerate(names) if i in set(self.select.tolist())]
        self.obs_data = np.load(os.path.join(session_dir, "training_features.npy"))

    def compute_activations(self):
        coef = np.asarray(self.lda.coef, np.float64)        # (n_bins, k, d)
        valid = np.asarray(self.lda.valid)                  # (n_bins, k)
        n_bins, k, d = coef.shape
        X = np.asarray(self.obs_data, np.float64)
        sigma_x = np.cov(X.T)                               # (d, d)

        all_A = np.zeros((d, k, n_bins))
        for b in range(n_bins):
            m = valid[b]
            W = coef[b].T                                   # (d, k) with absent-class cols zero
            s = X @ W                                       # (n, k)
            sigma_s = np.cov(s.T)
            try:
                inv = np.zeros((k, k))
                sub = np.linalg.inv(sigma_s[np.ix_(m, m)])
                inv[np.ix_(m, m)] = sub
                all_A[:, :, b] = sigma_x @ W @ inv
            except np.linalg.LinAlgError:
                logger.warning("Singular class covariance in bin %d", b)

        activations = np.mean(np.abs(all_A), axis=(1, 2))   # (d,)

        matrix = np.zeros((len(self.channel_names), self.n_taps))
        for f in self.sel_features:
            ch, tap = f.rsplit("-", 1)
            matrix[self.channel_names.index(ch), int(tap)] = activations[self.sel_features.index(f)]
        return matrix

    def plot(self, matrix, filename):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        vmax = np.abs(matrix).max()
        fig, ax = plt.subplots(figsize=(12, 3))
        im = ax.imshow(matrix.T, aspect="auto", origin="lower", cmap="RdBu_r", vmin=-vmax, vmax=vmax)
        ax.set_xticks(range(len(self.channel_names)))
        ax.set_xticklabels(self.channel_names, rotation=90, fontsize=4)
        ax.set_ylabel("context lag (x50 ms)")
        fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(filename, dpi=300)
        plt.close(fig)
