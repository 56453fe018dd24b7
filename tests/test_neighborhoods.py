"""Neighborhood profiles vs cKDTree reference; niches vs sklearn KMeans."""

import numpy as np
import pandas as pd
import pytest
from scipy.spatial import cKDTree

from conftest import make_adata


def ref_profile(coords, types, k, normalize=True):
    """Independent cKDTree implementation of the kNN composition profile."""
    uniq = sorted(set(types))
    t2i = {t: i for i, t in enumerate(uniq)}
    tree = cKDTree(coords)
    _, idx = tree.query(coords, k=k + 1)
    prof = np.zeros((len(types), len(uniq)), np.float32)
    for i in range(len(types)):
        nbrs = idx[i][idx[i] != i][:k]
        for j in nbrs:
            prof[i, t2i[types[j]]] += 1
    if normalize:
        prof /= prof.sum(1, keepdims=True)
    return prof, uniq


@pytest.fixture
def typed_adata():
    adata = make_adata(n_obs=300, n_vars=5, seed=2)
    return adata


def test_profile_matches_ckdtree(typed_adata):
    from spatialcore_tpu.spatial import compute_neighborhood_profile

    adata = typed_adata
    compute_neighborhood_profile(adata, "cell_type", k=10)
    types = adata.obs["cell_type"].astype(str).tolist()
    ref, uniq = ref_profile(np.asarray(adata.obsm["spatial"]), types, 10)
    assert adata.uns["neighborhood_profile_celltypes"] == uniq
    got = adata.obsm["neighborhood_profile"]
    assert got.shape == ref.shape
    # proportions sum to 1
    np.testing.assert_allclose(got.sum(1), 1.0, atol=1e-5)
    # allow rare tie-order differences in kNN
    assert (np.abs(got - ref) < 1e-5).mean() > 0.995


def test_profile_counts_mode(typed_adata):
    from spatialcore_tpu.spatial import compute_neighborhood_profile

    compute_neighborhood_profile(typed_adata, "cell_type", k=7, normalize=False)
    got = typed_adata.obsm["neighborhood_profile"]
    np.testing.assert_allclose(got.sum(1), 7.0, atol=1e-5)


def test_profile_radius_mode(typed_adata):
    from spatialcore_tpu.spatial import compute_neighborhood_profile

    compute_neighborhood_profile(typed_adata, "cell_type", method="radius",
                                 radius=150.0, k_max=128)
    got = typed_adata.obsm["neighborhood_profile"]
    types = typed_adata.obs["cell_type"].astype(str).to_numpy()
    uniq = typed_adata.uns["neighborhood_profile_celltypes"]
    coords = np.asarray(typed_adata.obsm["spatial"])
    tree = cKDTree(coords)
    for i in [0, 50, 299]:
        nbrs = [j for j in tree.query_ball_point(coords[i], 150.0) if j != i]
        ref = np.zeros(len(uniq))
        for j in nbrs:
            ref[uniq.index(types[j])] += 1
        ref /= max(ref.sum(), 1)
        np.testing.assert_allclose(got[i], ref, atol=1e-5)


def test_profile_validation_errors(typed_adata):
    from spatialcore_tpu.spatial import compute_neighborhood_profile

    with pytest.raises(ValueError, match="not found"):
        compute_neighborhood_profile(typed_adata, "nope")
    with pytest.raises(ValueError, match="radius must be provided"):
        compute_neighborhood_profile(typed_adata, "cell_type", method="radius")
    with pytest.raises(ValueError, match="k must be >= 1"):
        compute_neighborhood_profile(typed_adata, "cell_type", k=0)
    single = typed_adata.copy()
    single.obs["cell_type"] = "only"
    with pytest.raises(ValueError, match="At least 2 unique"):
        compute_neighborhood_profile(single, "cell_type")


def test_profile_empty_neighborhood_raises():
    from spatialcore_tpu.spatial import compute_neighborhood_profile

    adata = make_adata(n_obs=50, n_vars=3, seed=4)
    coords = np.asarray(adata.obsm["spatial"])
    coords[0] = [1e6, 1e6]  # isolate one cell
    adata.obsm["spatial"] = coords
    with pytest.raises(ValueError, match="empty neighborhood"):
        compute_neighborhood_profile(adata, "cell_type", method="radius",
                                     radius=50.0, k_max=32)


def _blob_profiles(n_per=150, seed=0):
    """Three well-separated niche archetypes in composition space."""
    rng = np.random.default_rng(seed)
    archetypes = np.array([[0.8, 0.1, 0.1], [0.1, 0.8, 0.1], [0.1, 0.1, 0.8]])
    X, y = [], []
    for a, arch in enumerate(archetypes):
        X.append(np.clip(arch + rng.normal(0, 0.05, (n_per, 3)), 0, 1))
        y += [a] * n_per
    return np.vstack(X).astype(np.float32), np.array(y)


def test_kmeans_recovers_blobs_and_matches_sklearn_quality():
    from sklearn.cluster import KMeans as SKKMeans
    from sklearn.metrics import adjusted_rand_score, normalized_mutual_info_score

    from spatialcore_tpu.ops.kmeans import kmeans

    X, y = _blob_profiles()
    res = kmeans(X, 3, seed=0, n_init=5, max_iter=100)
    labels = np.asarray(res.labels)
    assert adjusted_rand_score(y, labels) > 0.95
    sk = SKKMeans(n_clusters=3, n_init=5, random_state=0).fit(X)
    assert normalized_mutual_info_score(sk.labels_, labels) > 0.95
    # inertia within 2% of sklearn's
    assert float(res.inertia) < sk.inertia_ * 1.02 + 1e-6


def test_minibatch_kmeans_quality():
    from sklearn.metrics import adjusted_rand_score

    from spatialcore_tpu.ops.kmeans import minibatch_kmeans

    X, y = _blob_profiles(n_per=400, seed=1)
    res = minibatch_kmeans(X, 3, seed=0, batch_size=128, n_steps=80)
    assert adjusted_rand_score(y, np.asarray(res.labels)) > 0.9


def test_identify_niches_end_to_end(typed_adata):
    from spatialcore_tpu.spatial import (compute_neighborhood_profile,
                                         identify_niches)

    adata = typed_adata
    compute_neighborhood_profile(adata, "cell_type", k=10)
    identify_niches(adata, n_niches=3, random_state=0, n_init=3)
    assert adata.obs["niche"].dtype.name == "category"
    assert set(adata.obs["niche"].cat.categories) == {"niche_1", "niche_2", "niche_3"}
    assert adata.uns["niche_centroids"].shape == (3, 3)
    assert adata.uns["niche_params"]["inertia"] > 0
    # determinism
    a2 = typed_adata.copy()
    compute_neighborhood_profile(a2, "cell_type", k=10)
    identify_niches(a2, n_niches=3, random_state=0, n_init=3)
    assert (a2.obs["niche"] == adata.obs["niche"]).all()


def test_identify_niches_validation(typed_adata):
    from spatialcore_tpu.spatial import identify_niches

    with pytest.raises(ValueError, match="not found"):
        identify_niches(typed_adata, 3)
    typed_adata.obsm["neighborhood_profile"] = np.random.default_rng(0).random(
        (300, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="n_niches must be >= 2"):
        identify_niches(typed_adata, 1)


def test_niche_stability_prefers_true_k():
    """Profiles with 3 well-separated composition clusters → ARI peaks at 3."""
    from spatialcore_tpu.spatial import niche_stability

    rng = np.random.default_rng(0)
    n = 600
    adata = make_adata(n_obs=n, n_vars=4)
    base = np.eye(3, 5, dtype=np.float32)
    prof = base[rng.integers(0, 3, n)] + rng.uniform(0, 0.08, (n, 5))
    prof /= prof.sum(axis=1, keepdims=True)
    adata.obsm["neighborhood_profile"] = prof.astype(np.float32)
    adata = niche_stability(adata, n_niches_range=[2, 3, 6],
                            n_restarts=4, seed=0)
    rows = {r["n_niches"]: r for r in adata.uns["niche_stability"]}
    assert rows[3]["ari_mean"] > 0.95         # true structure is stable
    assert rows[3]["ari_mean"] >= rows[6]["ari_mean"] - 1e-6
    assert rows[6]["ari_mean"] < 0.9          # overclustering is unstable
