"""Smoke coverage for exported names previously never exercised by any
test: plotting extras, profiling helpers, sparse moments, registry IO,
p_from_z, print_info."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from conftest import make_adata

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)


def test_sparse_gene_moments_matches_dense():
    from spatialcore_tpu.utils import sparse_gene_moments

    rng = np.random.default_rng(0)
    X = rng.poisson(1.5, (300, 20)).astype(np.float32)
    Xs = sp.csr_matrix(X)
    m_d, v_d, s_d = sparse_gene_moments(X)
    m_s, v_s, s_s = sparse_gene_moments(Xs)
    np.testing.assert_allclose(m_s, m_d, rtol=1e-6)
    np.testing.assert_allclose(v_s, v_d, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(v_d, X.var(axis=0), rtol=1e-5)


def test_p_from_z_tails():
    from scipy import stats

    from spatialcore_tpu.ops import p_from_z

    z = jnp.asarray([-2.0, 0.0, 1.5])
    np.testing.assert_allclose(np.asarray(p_from_z(z, "greater")),
                               stats.norm.sf([-2.0, 0.0, 1.5]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_from_z(z, "two-sided")),
                               2 * stats.norm.sf(np.abs([-2.0, 0.0, 1.5])),
                               rtol=1e-5)


def test_profiling_helpers(capsys):
    from spatialcore_tpu.utils import timed, timer

    store = {}
    with timer("stage", sync=False, store=store):
        _ = sum(range(100))
    assert "stage" in store and store["stage"] >= 0

    @timed
    def f(x):
        return x + 1

    assert f(1) == 2


def test_print_info(capsys):
    import spatialcore_tpu as sct

    sct.print_info()
    out = capsys.readouterr().out
    assert "spatialcore_tpu" in out


def test_load_registry_roundtrip(tmp_path):
    import json

    from spatialcore_tpu.annotation import load_registry

    p = tmp_path / "registry.json"
    p.write_text(json.dumps({"modelA": str(tmp_path / "a.pkl")}))
    reg = load_registry(p)
    assert reg["modelA"].endswith("a.pkl")


def test_plot_gpairs_and_distance_map(tmp_path):
    from spatialcore_tpu.plotting import plot_distance_map, plot_gpairs

    rng = np.random.default_rng(1)
    n = 300
    feats = rng.standard_normal((n, 2)).astype(np.float32)
    scores = feats.sum(axis=1)
    clusters = (scores > 0).astype(np.int32)
    out = plot_gpairs(feats, scores, 0.0, clusters, ["f0", "f1"],
                      tmp_path / "gpairs.png")
    assert out.exists()

    adata = make_adata(n_obs=n, n_vars=4)
    adata.obs["distance_to_target"] = rng.uniform(0, 50, n)
    adata.obs["nearest_target_domain"] = rng.integers(1, 3, n)
    p = tmp_path / "dist.png"
    plot_distance_map(adata, path=p)
    assert p.exists()


def test_plot_ontology_mapping_table(tmp_path):
    from spatialcore_tpu.plotting import plot_ontology_mapping_table

    adata = make_adata(n_obs=60, n_vars=4)
    adata.obs["cell_type"] = pd.Categorical(["T cell", "B cell"] * 30)
    adata.obs["cell_type_ontology_term_id"] = pd.Categorical(
        ["CL:0000084", "CL:0000236"] * 30)
    fig = plot_ontology_mapping_table(adata, save=tmp_path / "tab.png")
    assert (tmp_path / "tab.png").exists()
