"""stats layer: metagene scores, KS / GMM thresholds, classify_by_threshold.

Golden-value strategy per SURVEY.md §4: numpy oracles reimplement the
reference algorithms independently inside the tests; the GMM is checked
against sklearn's GaussianMixture for agreement on well-separated data.
"""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp
from scipy.stats import norm as scipy_norm

from spatialcore_tpu.stats import (
    compute_metagene_score, threshold_gmm, threshold_ks)
from spatialcore_tpu.stats.thresholding import fit_gmm1d, gmm_posterior

from conftest import make_adata


# ---------------------------------------------------------------------------
# metagene
# ---------------------------------------------------------------------------

def test_metagene_methods_match_numpy():
    rng = np.random.default_rng(0)
    X = rng.gamma(2.0, 1.0, size=(500, 4)).astype(np.float32)
    c = 0.1
    got = np.asarray(compute_metagene_score(X, "shifted_geometric_mean", c))
    want = np.exp(np.log(X + c).mean(axis=1)) - c
    np.testing.assert_allclose(got, want, rtol=1e-5)

    np.testing.assert_allclose(
        np.asarray(compute_metagene_score(X, "arithmetic_mean")),
        X.mean(axis=1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(compute_metagene_score(X, "median")),
        np.median(X, axis=1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(compute_metagene_score(X, "minimum")),
        X.min(axis=1), rtol=1e-6)


def test_metagene_geometric_zero_collapses():
    X = np.array([[1.0, 2.0, 0.0], [1.0, 2.0, 4.0]], np.float32)
    got = np.asarray(compute_metagene_score(X, "geometric_mean"))
    assert got[0] == 0.0
    np.testing.assert_allclose(got[1], (1 * 2 * 4) ** (1 / 3), rtol=1e-5)


# ---------------------------------------------------------------------------
# KS threshold
# ---------------------------------------------------------------------------

def _ks_oracle(scores, background_quantile=0.5):
    s = np.sort(scores)
    n = len(s)
    bg = s[:max(int(n * background_quantile), 10)]
    mu, sd = bg.mean(), bg.std()
    if sd < 1e-10:
        q25, q75 = np.percentile(s, [25, 75])
        sd = (q75 - q25) / 1.35 if q75 - q25 > 1e-10 else max(
            (s[-1] - s[0]) * 0.1, 1e-6)
    D = np.arange(1, n + 1) / n - scipy_norm.cdf(s, mu, sd)
    thr = s[np.argmax(D)]
    if thr <= mu:
        thr = np.percentile(s, 90)
    return float(thr)


def test_ks_threshold_separates_populations():
    rng = np.random.default_rng(1)
    bg = rng.normal(0.5, 0.2, 1800)
    sig = rng.normal(3.0, 0.4, 200)
    scores = np.clip(np.concatenate([bg, sig]), 0, None).astype(np.float32)
    thr, dev, params = threshold_ks(scores)
    assert 1.0 < thr < 2.8
    assert abs(thr - _ks_oracle(scores)) < 0.15
    assert dev.min() >= 0 and dev.max() <= 1
    assert (dev[scores <= thr] == 0).all()


def test_ks_zero_variance_background_fallback():
    rng = np.random.default_rng(2)
    scores = np.concatenate([np.zeros(900), rng.normal(4, 0.5, 100)]).astype(
        np.float32)
    thr, dev, params = threshold_ks(scores)
    assert np.isfinite(thr) and thr > 0
    assert params["background_std"] > 0


# ---------------------------------------------------------------------------
# GMM threshold
# ---------------------------------------------------------------------------

def test_gmm_bimodal_matches_sklearn():
    from sklearn.mixture import GaussianMixture

    rng = np.random.default_rng(3)
    lo = rng.normal(0.5, 0.25, 1500)
    hi = rng.normal(4.0, 0.5, 500)
    scores = np.concatenate([lo, hi]).astype(np.float32)

    thr, labels, prob, params = threshold_gmm(scores, n_components=2)
    assert 1.2 < thr < 3.2
    means = sorted(params["gmm_means"])
    assert abs(means[0] - 0.5) < 0.15 and abs(means[1] - 4.0) < 0.25

    sk = GaussianMixture(2, random_state=0, n_init=5).fit(scores[:, None])
    sk_hi = int(np.argmax(sk.means_.ravel()))
    sk_labels = (sk.predict_proba(scores[:, None])[:, sk_hi] > 0.3).astype(int)
    agreement = (labels == sk_labels).mean()
    assert agreement > 0.98


def test_gmm_trimodal_threshold_between_first_two():
    rng = np.random.default_rng(4)
    scores = np.concatenate([
        rng.normal(0.0, 0.1, 1000), rng.normal(1.5, 0.2, 600),
        rng.normal(4.5, 0.4, 400)]).astype(np.float32)
    thr, labels, prob, params = threshold_gmm(scores, n_components=3)
    means = np.sort(params["gmm_means"])
    assert abs(thr - (means[0] + means[1]) / 2) < 1e-6
    # high prob = everything not in background component
    assert prob[np.argmax(scores)] > 0.9
    assert prob[np.argmin(np.abs(scores))] < 0.3


def test_gmm_determinism():
    rng = np.random.default_rng(5)
    scores = np.concatenate([rng.normal(0, 0.3, 800),
                             rng.normal(3, 0.4, 200)]).astype(np.float32)
    t1 = threshold_gmm(scores, seed=7)
    t2 = threshold_gmm(scores, seed=7)
    assert t1[0] == t2[0]
    np.testing.assert_array_equal(t1[1], t2[1])


def test_gmm_posterior_reuse():
    rng = np.random.default_rng(6)
    scores = np.concatenate([rng.normal(0, 0.3, 800),
                             rng.normal(3, 0.4, 200)]).astype(np.float32)
    model = fit_gmm1d(scores, n_components=2, seed=0)
    post = np.asarray(gmm_posterior(scores, model))
    np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# classify_by_threshold
# ---------------------------------------------------------------------------

def _bimodal_adata(n=1200, seed=0):
    rng = np.random.default_rng(seed)
    half = n // 2
    g1 = np.concatenate([rng.gamma(1.0, 0.3, half), rng.gamma(8, 0.6, n - half)])
    g2 = np.concatenate([rng.gamma(1.0, 0.3, half), rng.gamma(7, 0.5, n - half)])
    noise = rng.gamma(2.0, 1.0, (n, 3))
    X = np.column_stack([g1, g2, noise]).astype(np.float32)
    adata = make_adata(n_obs=n, n_vars=5)
    adata.X = sp.csr_matrix(X)
    adata.var_names = pd.Index(["MK1", "MK2", "N1", "N2", "N3"])
    return adata, half


def test_classify_multivariate_genes():
    adata, half = _bimodal_adata()
    adata = __import__("spatialcore_tpu").stats.classify_by_threshold(
        adata, ["MK1", "MK2"], threshold_method="gmm", plot=False)
    cl = adata.obs["threshold_cluster"].to_numpy()
    # second half is the high population
    assert (cl[half:] == 1).mean() > 0.9
    assert (cl[:half] == 0).mean() > 0.9
    params = adata.uns["threshold_params"]
    assert params["n_high"] + params["n_low"] == adata.n_obs
    assert "gmm_means" in params and "gmm_model" not in params


def test_classify_univariate_ks_and_obs_feature():
    # KS regime: sparse signal (~10% positive), background-dominated.
    adata = make_adata(n_obs=2000, n_vars=3)
    rng = np.random.default_rng(1)
    marker = np.clip(rng.normal(0.5, 0.2, 2000), 0, None)
    sig_idx = rng.choice(2000, 200, replace=False)
    marker[sig_idx] = rng.normal(4.0, 0.4, 200)
    adata.obs["marker_score"] = marker.astype(np.float32)
    adata = __import__("spatialcore_tpu").stats.classify_by_threshold(
        adata, ["marker_score"], threshold_method="ks",
        column_prefix="ks", plot=False)
    assert adata.uns["ks_params"]["metagene_method"] is None
    assert "background_mean" in adata.uns["ks_params"]
    cl = adata.obs["ks_cluster"].to_numpy()
    sig_mask = np.zeros(2000, bool)
    sig_mask[sig_idx] = True
    assert (cl[sig_mask] == 1).mean() > 0.9      # signal recovered
    assert (cl[~sig_mask] == 1).mean() < 0.15    # few background positives


def test_classify_obsm_colon_syntax():
    adata, _ = _bimodal_adata(seed=2)
    adata.obsm["lisa"] = np.asarray(adata.X.todense())[:, :2]
    adata.uns["lisa_params"] = {"genes": ["MK1", "MK2"]}
    out = __import__("spatialcore_tpu").stats.classify_by_threshold(
        adata, ["lisa:MK2", "lisa:0"], plot=False, column_prefix="cs")
    assert "cs_score" in out.obs.columns
    with pytest.raises(ValueError, match="not found"):
        __import__("spatialcore_tpu").stats.classify_by_threshold(
            adata, ["lisa:NOPE"], plot=False)


def test_classify_invalid_cells_and_errors(tmp_path):
    adata, _ = _bimodal_adata(seed=3)
    feats = np.asarray(adata.X.todense())[:, 0].copy()
    feats[:30] = np.nan
    adata.obs["f"] = feats
    out = __import__("spatialcore_tpu").stats.classify_by_threshold(
        adata, ["f"], plot=False, column_prefix="inv")
    assert (out.obs["inv_cluster"].to_numpy()[:30] == -1).all()
    assert out.uns["inv_params"]["n_invalid"] == 30

    small = make_adata(n_obs=80, n_vars=3)
    small.obs["x"] = np.random.default_rng(0).normal(size=80)
    with pytest.raises(ValueError, match="at least 100"):
        __import__("spatialcore_tpu").stats.classify_by_threshold(
            small, ["x"], plot=False)

    adata.obs["neg"] = -np.abs(feats)
    adata.obs["neg2"] = np.abs(feats)
    with pytest.raises(ValueError, match="Negative"):
        __import__("spatialcore_tpu").stats.classify_by_threshold(
            adata, ["neg", "neg2"], metagene_method="geometric_mean",
            plot=False)


def test_classify_gpairs_plot(tmp_path):
    adata, _ = _bimodal_adata(seed=4)
    __import__("spatialcore_tpu").stats.classify_by_threshold(
        adata, ["MK1", "MK2"], plot=True, output_dir=tmp_path,
        column_prefix="pp", n_sample_plot=500)
    assert (tmp_path / "pp_gpairs.png").exists()
