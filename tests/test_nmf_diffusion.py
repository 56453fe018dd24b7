"""NMF and diffusion modules (the reference's 'coming soon' placeholders)."""

import numpy as np
import pytest

import spatialcore_tpu as sct
from spatialcore_tpu.diffusion import diffusion_map, smooth_expression
from spatialcore_tpu.nmf import nmf_fit, run_nmf

from conftest import make_adata


def test_nmf_recovers_low_rank():
    rng = np.random.default_rng(0)
    W_true = rng.gamma(2.0, 1.0, (300, 4)).astype(np.float32)
    H_true = rng.gamma(2.0, 1.0, (4, 50)).astype(np.float32)
    X = W_true @ H_true + rng.gamma(1.0, 0.05, (300, 50)).astype(np.float32)
    res = nmf_fit(X, n_components=4, seed=0, max_iter=300)
    assert float(res.loss) < 0.08          # near-exact low-rank recovery
    W, H = np.asarray(res.W), np.asarray(res.H)
    assert (W >= 0).all() and (H >= 0).all()
    rel = np.linalg.norm(X - W @ H) / np.linalg.norm(X)
    assert rel < 0.08


def test_run_nmf_api_and_validation():
    adata = make_adata(n_obs=200, n_vars=30)
    adata = run_nmf(adata, n_components=5, seed=0)
    assert adata.obsm["X_nmf"].shape == (200, 5)
    assert adata.varm["nmf_components"].shape == (30, 5)
    params = adata.uns["nmf_params"]
    assert len(params["top_genes"]) == 5
    # determinism
    a2 = run_nmf(make_adata(n_obs=200, n_vars=30), n_components=5, seed=0)
    np.testing.assert_allclose(adata.obsm["X_nmf"], a2.obsm["X_nmf"],
                               rtol=1e-5)
    bad = make_adata(n_obs=50, n_vars=10)
    bad.X = bad.X - 5.0
    with pytest.raises(ValueError, match="non-negative"):
        run_nmf(bad, n_components=3)


def test_smooth_expression_reduces_noise():
    rng = np.random.default_rng(1)
    n = 800
    adata = make_adata(n_obs=n, n_vars=3)
    coords = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    adata.obsm["spatial"] = coords
    signal = np.sin(coords[:, 0] / 15.0)
    noisy = signal + rng.normal(0, 1.0, n)
    X = np.column_stack([noisy, rng.normal(0, 1, n),
                         rng.normal(0, 1, n)]).astype(np.float32)
    adata.X = X
    adata = smooth_expression(adata, n_steps=4, alpha=0.6, n_neighbors=10)
    sm = adata.layers["diffused"][:, 0]
    err_before = np.mean((noisy - signal) ** 2)
    err_after = np.mean((sm - signal) ** 2)
    assert err_after < 0.5 * err_before
    with pytest.raises(ValueError, match="alpha"):
        smooth_expression(adata, alpha=0.0)


def test_diffusion_map_embedding():
    rng = np.random.default_rng(2)
    # two spatial clusters → leading diffusion component separates them
    a = rng.normal([0, 0], 3.0, (200, 2))
    b = rng.normal([100, 0], 3.0, (200, 2))
    adata = make_adata(n_obs=400, n_vars=3, with_spatial=False)
    adata.obsm["spatial"] = np.vstack([a, b]).astype(np.float32)
    adata = diffusion_map(adata, n_components=3, n_neighbors=10, seed=0)
    emb = adata.obsm["X_diffmap"]
    assert emb.shape == (400, 3)
    lead = emb[:, 0]
    side_a, side_b = lead[:200].mean(), lead[200:].mean()
    assert np.sign(side_a) != np.sign(side_b)
    assert abs(side_a - side_b) > 3 * (lead[:200].std() + lead[200:].std())
    evals = adata.uns["X_diffmap_evals"]
    assert all(abs(e) <= 1.0 + 1e-3 for e in evals)


def test_facade_exposes_new_modules():
    assert "nmf" in sct.available_modules()
    assert "diffusion" in sct.available_modules()
    assert hasattr(sct.nmf, "run_nmf")
    assert hasattr(sct.diffusion, "smooth_expression")
