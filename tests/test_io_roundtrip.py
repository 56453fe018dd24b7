"""h5ad round-trip of a fully-analyzed dataset (every output kind we write)."""

import numpy as np
import pandas as pd
import pytest

import spatialcore_tpu as sct

from conftest import make_adata


def test_full_analysis_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 800
    adata = make_adata(n_obs=n, n_vars=8, sparse=True)
    blob = rng.normal([300, 300], 25, (n // 4, 2))
    rest = rng.uniform(0, 1000, (n - n // 4, 2))
    adata.obsm["spatial"] = np.vstack([blob, rest]).astype(np.float32)
    adata.obs["cell_type"] = (["B cell"] * (n // 4)
                              + list(rng.choice(["T cell", "Macrophage"],
                                                n - n // 4)))

    adata = sct.spatial.morans_i(adata, n_permutations=19, seed=0)
    adata = sct.spatial.compute_neighborhood_profile(adata, "cell_type",
                                                     k=8)
    adata = sct.spatial.identify_niches(adata, n_niches=3, random_state=0)
    adata = sct.spatial.make_spatial_domains(
        adata, "cell_type == 'B cell'", platform="xenium",
        min_target_cells_domain=10, domain_prefix="B")
    adata, _, _ = sct.annotation.add_ontology_ids(adata)

    path = tmp_path / "full.h5ad"
    sct.write_h5ad(adata, path)
    back = sct.read_h5ad(path)

    assert back.n_obs == n and back.n_vars == 8
    # obs: categorical + numeric + object columns survive
    pd.testing.assert_series_equal(
        back.obs["cell_type"].astype(str), adata.obs["cell_type"].astype(str),
        check_names=False)
    assert (back.obs["spatial_domain"].isna()
            == adata.obs["spatial_domain"].isna()).all()
    got_ids = back.obs["cell_type_ontology_term_id"].dropna().unique()
    assert "CL:0000236" in set(map(str, got_ids))
    # obsm matrices
    np.testing.assert_allclose(back.obsm["neighborhood_profile"],
                               adata.obsm["neighborhood_profile"])
    np.testing.assert_allclose(back.obsm["spatial"], adata.obsm["spatial"])
    # uns: DataFrame, dict-of-arrays (boundaries), nested params, graph
    pd.testing.assert_frame_equal(back.uns["morans_i"],
                                  adata.uns["morans_i"])
    assert back.uns["spatial_domain_params"]["n_domains"] \
        == adata.uns["spatial_domain_params"]["n_domains"]
    for k, v in adata.uns["spatial_domain_boundaries"].items():
        np.testing.assert_allclose(back.uns["spatial_domain_boundaries"][k],
                                   v)
    np.testing.assert_array_equal(
        back.uns["spatial_graph"]["neighbor_idx"],
        adata.uns["spatial_graph"]["neighbor_idx"])
    # provenance ledger restored as structured records
    ops = [o["function"] for o in
           back.uns["spatialcore_metadata"]["operations"]]
    assert "morans_i" in ops and "make_spatial_domains" in ops


def test_update_metadata_after_h5ad_stringify():
    """Appending an op after prepare_metadata_for_h5ad (stringified
    ledger) must restore the dict instead of crashing (round-3 fix)."""
    import numpy as np
    import pandas as pd

    from spatialcore_tpu.core.container import SpatialData
    from spatialcore_tpu.core.metadata import (
        get_operations, prepare_metadata_for_h5ad, update_metadata)

    a = SpatialData(X=np.zeros((3, 2), np.float32),
                    var=pd.DataFrame(index=["g0", "g1"]))
    update_metadata(a, "op_a", parameters={}, outputs={})
    prepare_metadata_for_h5ad(a)
    assert isinstance(a.uns["spatialcore_metadata"], str)
    update_metadata(a, "op_b", parameters={}, outputs={})
    ops = get_operations(a)
    assert [o["function"] for o in ops] == ["op_a", "op_b"]
