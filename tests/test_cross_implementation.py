"""Cross-implementation validation of the niche pipeline.

The reference's core quality claim is cross-implementation agreement:
its Python niche pipeline vs an independent R (FNN + ClusterR)
reimplementation on Xenium liver scores NMI 0.769 / ARI 0.618
(/root/reference/docs/domains/neighborhood_analysis.md "Validation:
Python vs R"; SURVEY.md §4 item 1, §6 table). The real datasets are
unreachable here, so this test runs the same harness on synthetic
tissue with planted niche structure: the package pipeline
(build_graph → compute_neighborhood_profile → identify_niches) versus a
fully independent reimplementation (scipy cKDTree kNN → numpy one-hot
composition → sklearn KMeans) sharing only hyperparameters. Agreement
must clear the reference's published bars with margin.
"""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp
from scipy.spatial import cKDTree

import spatialcore_tpu as sct
from spatialcore_tpu.plotting import agreement_metrics

K = 20
N_NICHES = 3
TYPES = ["epithelial", "fibroblast", "T cell", "B cell", "macrophage",
         "endothelial"]

# planted niche compositions (rows sum to 1): tumor-like, stroma-like,
# lymphoid-aggregate-like
NICHE_MIX = np.array([
    [0.60, 0.10, 0.05, 0.02, 0.13, 0.10],
    [0.10, 0.50, 0.05, 0.02, 0.13, 0.20],
    [0.05, 0.10, 0.40, 0.30, 0.10, 0.05],
])


def _synthetic_tissue(n_cells=4000, seed=0):
    """Three spatial bands, each with its own cell-type composition."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 3000, (n_cells, 2)).astype(np.float32)
    band = np.minimum((xy[:, 0] / 1000).astype(int), N_NICHES - 1)
    labels = np.array(
        [rng.choice(TYPES, p=NICHE_MIX[b]) for b in band], object)
    a = sct.SpatialData(
        X=sp.csr_matrix(rng.poisson(1.0, (n_cells, 12)).astype("f4")))
    a.obsm["spatial"] = xy
    a.obs["cell_type"] = labels
    return a, band


def _independent_pipeline(a, seed=1):
    """cKDTree + numpy + sklearn — shares no code with the package."""
    from sklearn.cluster import KMeans

    xy = np.asarray(a.obsm["spatial"], float)
    # k+1 then drop self: the package's kNN graph excludes self
    _, idx = cKDTree(xy).query(xy, k=K + 1)
    idx = idx[:, 1:]
    types = sorted(pd.unique(a.obs["cell_type"].astype(str)))
    code = a.obs["cell_type"].astype(str).map(
        {t: i for i, t in enumerate(types)}).to_numpy()
    onehot = np.eye(len(types), dtype=np.float64)[code]
    prof = onehot[idx].sum(axis=1)
    prof /= prof.sum(axis=1, keepdims=True)
    km = KMeans(N_NICHES, n_init=10, random_state=seed).fit(prof)
    return prof, km.labels_


@pytest.fixture(scope="module")
def pipelines():
    a, band = _synthetic_tissue()
    sct.spatial.compute_neighborhood_profile(a, "cell_type", k=K)
    sct.spatial.identify_niches(a, n_niches=N_NICHES, random_state=0,
                                n_init=10)
    prof_ind, niches_ind = _independent_pipeline(a)
    return a, band, prof_ind, niches_ind


def test_profiles_agree_exactly(pipelines):
    a, _, prof_ind, _ = pipelines
    # same type order (both sort unique labels), same kNN convention —
    # the two profile matrices must agree to float tolerance
    prof_pkg = np.asarray(a.obsm["neighborhood_profile"], np.float64)
    assert a.uns["neighborhood_profile_celltypes"] == sorted(
        pd.unique(a.obs["cell_type"].astype(str)))
    np.testing.assert_allclose(prof_pkg, prof_ind, atol=1e-5)


def test_niche_agreement_beats_reference_bar(pipelines):
    a, _, _, niches_ind = pipelines
    ours = a.obs["niche"].astype(str).to_numpy()
    m = agreement_metrics(ours, niches_ind)
    # reference's published cross-implementation bars: NMI 0.769 / ARI 0.618
    assert m["nmi"] >= 0.769, m
    assert m["ari"] >= 0.618, m


def test_niches_recover_planted_structure(pipelines):
    a, band, _, _ = pipelines
    ours = a.obs["niche"].astype(str).to_numpy()
    m = agreement_metrics(ours, band)
    # planted bands blur at their borders (the kNN window straddles
    # them), so demand strong but not perfect recovery
    assert m["nmi"] >= 0.6, m
    assert m["ari"] >= 0.6, m
