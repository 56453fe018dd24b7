"""Ripley's K/L: brute-force golden checks, CSR behavior, cross-type K."""

import numpy as np
import pytest

from spatialcore_tpu.ops.ripley import cross_type_k, ripley_k
from spatialcore_tpu.spatial import cross_type_ripleys_k, ripleys_k

from conftest import make_adata


def _brute_k(coords, radii, area):
    n = len(coords)
    d2 = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.array([area * (d2 <= r * r).sum() / (n * (n - 1))
                     for r in radii])


def test_ripley_k_matches_bruteforce():
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 100, (800, 2)).astype(np.float32)
    radii = np.array([2.0, 5.0, 10.0, 20.0], np.float32)
    area = float(np.prod(coords.max(0) - coords.min(0)))
    res = ripley_k(coords, radii)
    want = _brute_k(coords, radii, area)
    np.testing.assert_allclose(res["K"], want, rtol=1e-4)
    np.testing.assert_allclose(res["L"], np.sqrt(want / np.pi), rtol=1e-4)


def test_ripley_csr_envelope_contains_uniform():
    rng = np.random.default_rng(1)
    coords = rng.uniform(0, 100, (600, 2)).astype(np.float32)
    radii = np.array([5.0, 10.0], np.float32)
    res = ripley_k(coords, radii, n_simulations=39, seed=0)
    # uniform data: observed K inside (or very near) the CSR envelope
    assert (res["K"] <= res["K_env_hi"] * 1.15).all()
    assert (res["K"] >= res["K_env_lo"] * 0.85).all()


def test_ripley_clustered_exceeds_envelope():
    rng = np.random.default_rng(2)
    centers = rng.uniform(10, 90, (12, 2))
    coords = (centers[rng.integers(0, 12, 800)]
              + rng.normal(0, 1.2, (800, 2))).astype(np.float32)
    radii = np.array([4.0], np.float32)
    res = ripley_k(coords, radii, n_simulations=39, seed=0)
    assert res["K"][0] > res["K_env_hi"][0]  # clustering detected


def test_cross_type_k_attraction_and_segregation():
    rng = np.random.default_rng(3)
    # types A and B co-located in blobs; type C elsewhere
    centers = rng.uniform(20, 80, (8, 2))
    a = centers[rng.integers(0, 8, 300)] + rng.normal(0, 1.0, (300, 2))
    b = centers[rng.integers(0, 8, 300)] + rng.normal(0, 1.0, (300, 2))
    c = rng.uniform(0, 100, (300, 2))
    coords = np.vstack([a, b, c]).astype(np.float32)
    codes = np.array([0] * 300 + [1] * 300 + [2] * 300, np.int32)
    radii = np.array([3.0], np.float32)
    res = cross_type_k(coords, codes, 3, radii, n_permutations=19, seed=0)
    k = res["K_cross"][0]          # [3, 3] at r=3
    lo, hi = res["K_cross_env_lo"][0], res["K_cross_env_hi"][0]
    assert k[0, 1] > hi[0, 1]      # A-B attraction above the null
    assert k[0, 2] <= hi[0, 2] * 1.2   # A-C consistent with CSR-ish


def test_cross_type_k_matches_bruteforce():
    rng = np.random.default_rng(4)
    coords = rng.uniform(0, 50, (400, 2)).astype(np.float32)
    codes = rng.integers(0, 2, 400).astype(np.int32)
    radii = np.array([5.0], np.float32)
    area = float(np.prod(coords.max(0) - coords.min(0)))
    res = cross_type_k(coords, codes, 2, radii)
    d2 = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    within = d2 <= 25.0
    n0, n1 = (codes == 0).sum(), (codes == 1).sum()
    want01 = area * within[np.ix_(codes == 0, codes == 1)].sum() / (n0 * n1)
    np.testing.assert_allclose(res["K_cross"][0, 0, 1], want01, rtol=1e-4)


def test_public_api_and_uns():
    adata = make_adata(n_obs=400, n_vars=5)
    adata = ripleys_k(adata, radii=[20, 50], n_simulations=9, seed=0)
    assert "ripley_k" in adata.uns
    assert len(adata.uns["ripley_k"]["K"]) == 2
    adata = cross_type_ripleys_k(adata, "cell_type", radii=[30.0],
                                 n_permutations=9, seed=0)
    assert "ripley_k_cross" in adata.uns
    types = adata.uns["ripley_k_cross_types"]
    K = np.asarray(adata.uns["ripley_k_cross"]["K_cross"])
    assert K.shape == (1, len(types), len(types))
    with pytest.raises(ValueError, match="radii"):
        ripleys_k(adata, radii=[0.0, 5.0])


def test_co_occurrence_detects_attraction():
    from spatialcore_tpu.spatial import co_occurrence

    rng = np.random.default_rng(7)
    centers = rng.uniform(20, 80, (8, 2))
    a = centers[rng.integers(0, 8, 250)] + rng.normal(0, 1.0, (250, 2))
    b = centers[rng.integers(0, 8, 250)] + rng.normal(0, 1.0, (250, 2))
    c = rng.uniform(0, 100, (500, 2))
    adata = make_adata(n_obs=1000, n_vars=3, with_spatial=False)
    adata.obsm["spatial"] = np.vstack([a, b, c]).astype(np.float32)
    adata.obs["ct"] = ["A"] * 250 + ["B"] * 250 + ["C"] * 500
    adata = co_occurrence(adata, "ct", radii=[3.0, 10.0, 40.0])
    score = adata.uns["co_occurrence"]["score"]
    types = adata.uns["co_occurrence_types"]
    iA, iB, iC = (types.index(t) for t in ("A", "B", "C"))
    # at close range, B is enriched around A, C is depleted
    assert score[0, iA, iB] > 1.5
    assert score[0, iA, iC] < 0.7
    # at the largest shell the ratio decays toward 1
    assert abs(score[2, iA, iB] - 1.0) < 0.5
    with pytest.raises(ValueError, match="not found"):
        co_occurrence(adata, "nope")
