"""Clark-Evans NN test + Moran scatterplot smoke."""

import numpy as np
import pytest

import spatialcore_tpu as sct

from conftest import make_adata


def _adata_with_coords(coords):
    a = make_adata(n_obs=len(coords), n_vars=3, with_spatial=False)
    a.obsm["spatial"] = np.asarray(coords, np.float32)
    return a


def test_clark_evans_clustered_vs_random():
    rng = np.random.default_rng(0)
    clustered = np.vstack([rng.normal([20, 20], 2, (750, 2)),
                           rng.normal([80, 80], 2, (750, 2))])
    a = sct.spatial.clark_evans(_adata_with_coords(clustered))
    ce = a.uns["clark_evans"]
    assert ce["R"] < 0.5 and ce["z"] < -10 and ce["p_value"] < 1e-6

    random = rng.uniform(0, 100, (1500, 2))
    b = sct.spatial.clark_evans(_adata_with_coords(random))
    ce = b.uns["clark_evans"]
    assert 0.9 < ce["R"] < 1.1

    # regular grid: dispersed, R > 1
    g = np.stack(np.meshgrid(np.arange(40.0), np.arange(40.0)),
                 -1).reshape(-1, 2)
    c = sct.spatial.clark_evans(_adata_with_coords(g))
    assert c.uns["clark_evans"]["R"] > 1.5


def test_clark_evans_validation():
    a = _adata_with_coords(np.zeros((2, 2)))
    with pytest.raises(ValueError, match=">= 3 cells"):
        sct.spatial.clark_evans(a)


def test_correlogram_and_cooccurrence_plots():
    import matplotlib

    matplotlib.use("Agg")
    from spatialcore_tpu.plotting import plot_co_occurrence, plot_correlogram

    rng = np.random.default_rng(3)
    n = 1500
    coords = np.vstack([rng.normal([30, 30], 6, (n // 2, 2)),
                        rng.uniform(0, 100, (n - n // 2, 2))]).astype(
        np.float32)
    X = np.stack([np.sin(coords[:, 0] / 20) + rng.normal(0, 0.3, n),
                  rng.normal(0, 1, n)], axis=1).astype(np.float32)
    a = _adata_with_coords(coords)
    a.X = np.abs(X)[:, :2].repeat(2, axis=1)[:, :3]
    a.obs["ct"] = ["A"] * (n // 2) + ["B"] * (n - n // 2)

    a = sct.spatial.moran_correlogram(a, genes=[a.var_names[0]],
                                      bands=[0.0, 1.0, 2.0, 3.0],
                                      k_max=256)
    fig = plot_correlogram(a)
    assert fig.axes[0].lines

    a = sct.spatial.co_occurrence(a, "ct", n_radii=6)
    fig = plot_co_occurrence(a, "A")
    assert len(fig.axes[0].lines) >= 2
    with pytest.raises(ValueError, match="not in"):
        plot_co_occurrence(a, "ZZZ")


def test_moran_scatter_plot():
    import matplotlib

    matplotlib.use("Agg")
    from spatialcore_tpu.plotting import plot_moran_scatter

    rng = np.random.default_rng(1)
    n = 800
    coords = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    X = np.stack([np.sin(coords[:, 0] / 9.0) + rng.normal(0, 0.3, n),
                  rng.normal(0, 1, n), rng.normal(0, 1, n)],
                 axis=1).astype(np.float32)
    a = make_adata(n_obs=n, n_vars=3, with_spatial=False)
    a.obsm["spatial"] = coords
    a.X = X
    a = sct.spatial.local_morans_i(a, n_permutations=49, seed=0)
    gene = a.uns["local_morans_params"]["genes"][0]
    fig = plot_moran_scatter(a, gene)
    # the slope annotation is the global Moran's I: positive & large for
    # the structured gene
    assert "I = 0." in fig.axes[0].get_title()
    with pytest.raises(ValueError, match="not in"):
        plot_moran_scatter(a, "NOT_A_GENE")
