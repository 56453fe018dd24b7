"""Neighborhood enrichment: exact counts + null behavior."""

import numpy as np
import pytest

from spatialcore_tpu.spatial import neighborhood_enrichment

from conftest import make_adata


def test_counts_match_bruteforce_and_enrichment_detected():
    rng = np.random.default_rng(0)
    # two interleaved types in one blob (enriched A-B contact),
    # third type far away (depleted contact with both)
    ab = rng.uniform(0, 100, (400, 2))
    c = rng.uniform(500, 600, (200, 2))
    coords = np.vstack([ab, c]).astype(np.float32)
    labels = np.array(["A", "B"] * 200 + ["C"] * 200)
    adata = make_adata(n_obs=600, n_vars=3, with_spatial=False)
    adata.obsm["spatial"] = coords
    adata.obs["ct"] = labels

    adata = neighborhood_enrichment(adata, "ct", n_permutations=200,
                                    seed=0, n_neighbors=6)
    res = adata.uns["ct_nhood_enrichment"]
    types = res["types"]
    assert types == ["A", "B", "C"]

    # brute-force count check on the stored graph
    g = adata.uns["spatial_graph"]
    idx = np.asarray(g["neighbor_idx"])
    code = {t: i for i, t in enumerate(types)}
    codes = np.array([code[l] for l in labels])
    want = np.zeros((3, 3))
    for i in range(600):
        for j in idx[i]:
            want[codes[i], codes[j]] += 1
    np.testing.assert_allclose(res["count"], want)

    z = res["zscore"]
    iA, iB, iC = 0, 1, 2
    assert z[iA, iB] > 3          # A-B strongly enriched
    assert z[iC, iC] > 3          # C self-adjacent (spatially isolated)
    assert z[iA, iC] < -3         # A-C depleted


def test_nhood_determinism_and_validation():
    adata = make_adata(n_obs=300, n_vars=3)
    adata = neighborhood_enrichment(adata, "cell_type", n_permutations=50,
                                    seed=1)
    z1 = adata.uns["cell_type_nhood_enrichment"]["zscore"].copy()
    adata = neighborhood_enrichment(adata, "cell_type", n_permutations=50,
                                    seed=1)
    np.testing.assert_array_equal(
        z1, adata.uns["cell_type_nhood_enrichment"]["zscore"])
    with pytest.raises(ValueError, match="not found"):
        neighborhood_enrichment(adata, "nope")
