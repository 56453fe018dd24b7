"""End-to-end vignette: synthetic Xenium-like tissue through the full stack.

The reference validates itself with docs-as-integration-tests (SURVEY.md §4
item 4): each vignette is a complete run with committed output figures.
This script is ours — it synthesizes a structured tissue (three cell-type
neighborhoods, one gene expression gradient, a B-cell follicle), runs every
major subsystem, asserts the biology comes back out, and writes the figures
into docs/images/.

Run:  JAX_PLATFORM_NAME=cpu python examples/end_to_end.py [outdir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

# runnable from any cwd without an installed package
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import scipy.sparse as sp


def synthesize(n=20_000, seed=0):
    """Xenium-like tissue: follicle of B cells, T-cell ring, stroma."""
    rng = np.random.default_rng(seed)
    extent = 4000.0
    coords = rng.uniform(0, extent, (n, 2)).astype(np.float32)

    center = np.array([1500.0, 2000.0])
    d_center = np.linalg.norm(coords - center, axis=1)
    p_b = np.exp(-(d_center / 220.0) ** 2)              # follicle core
    p_t = np.exp(-((d_center - 350.0) / 150.0) ** 2)    # ring around it
    u = rng.uniform(size=n)
    types = np.where(u < p_b, "B cell",
                     np.where(u < p_b + p_t, "T cell",
                              rng.choice(["Fibroblast", "Macrophage",
                                          "Endothelial"], n)))

    genes = ["MS4A1", "CD79A", "CD3D", "TRAC", "COL1A1", "LUM",
             "CD68", "C1QA", "PECAM1", "VWF", "GRAD1", "NOISE1",
             "NOISE2", "NOISE3"]
    markers = {"B cell": ["MS4A1", "CD79A"], "T cell": ["CD3D", "TRAC"],
               "Fibroblast": ["COL1A1", "LUM"],
               "Macrophage": ["CD68", "C1QA"],
               "Endothelial": ["PECAM1", "VWF"]}
    counts = rng.poisson(0.3, (n, len(genes))).astype(np.float32)
    gi = {g: i for i, g in enumerate(genes)}
    for ct, mk in markers.items():
        rows = types == ct
        for g in mk:
            counts[rows, gi[g]] += rng.poisson(6.0, rows.sum())
    # smooth spatial gradient gene
    counts[:, gi["GRAD1"]] += rng.poisson(
        3.0 * (1 + np.sin(coords[:, 0] / 400.0)), n).astype(np.float32)

    import spatialcore_tpu as sct

    adata = sct.SpatialData(
        X=sp.csr_matrix(counts),
        obs=pd.DataFrame({"true_type": types},
                         index=[f"cell_{i}" for i in range(n)]),
        var=pd.DataFrame(index=genes))
    adata.layers["counts"] = sp.csr_matrix(counts)
    adata.obsm["spatial"] = coords
    return adata, markers


def main(outdir="docs/images"):
    import spatialcore_tpu as sct
    from spatialcore_tpu.annotation import train_and_annotate, TrainingConfig
    from spatialcore_tpu.plotting.spatial import (
        plot_distance_map, plot_domain_distances, plot_spatial_celltype, plot_spatial_gene,
        plot_spatial_hotspots)
    from spatialcore_tpu.plotting.validation import plot_marker_heatmap

    t0 = time.time()
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    adata, markers = synthesize()
    print(f"[1/7] synthesized {adata.n_obs:,} cells × {adata.n_vars} genes")

    # --- annotation: train on a disjoint synthetic reference -------------
    ref, _ = synthesize(n=8000, seed=42)
    ref.obs["cell_type"] = ref.obs["true_type"]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        sct.write_h5ad(ref, f"{td}/ref.h5ad")
        adata, model = train_and_annotate(
            adata, references=[f"{td}/ref.h5ad"],
            config=TrainingConfig(references=[], epochs=15,
                                  confidence_threshold=0.6,
                                  make_plots=False, seed=0))
    acc = (adata.obs["cell_type"].astype(str)
           == adata.obs["true_type"].astype(str)).mean()
    print(f"[2/7] annotation accuracy vs ground truth: {acc:.3f}")
    assert acc > 0.85, acc

    # --- spatial autocorrelation ------------------------------------------
    # fused pass: Moran's I AND Geary's C from one permutation scan
    # (bitwise-identical to separate morans_i/gearys_c calls, ~2x faster
    # at scale — the per-draw row gather is shared)
    adata = sct.spatial.global_autocorrelation(adata, n_permutations=99,
                                               seed=0, n_neighbors=8)
    mi = adata.uns["morans_i"].set_index("gene")
    gc = adata.uns["gearys_c"].set_index("gene")
    # the two statistics agree on the structured gene
    assert gc.loc["GRAD1", "C"] < 0.9 and gc.loc["GRAD1", "p_value"] <= 0.05
    print("[3/7] Moran's I:", {g: round(float(mi.loc[g, 'I']), 3)
                               for g in ["GRAD1", "MS4A1", "NOISE1"]})
    assert mi.loc["GRAD1", "I"] > 0.15        # gradient is autocorrelated
    # follicle marker: small global I (local structure) but significant
    assert mi.loc["MS4A1", "I"] > 0.02
    assert mi.loc["MS4A1", "p_value"] <= 0.05
    assert abs(mi.loc["NOISE1", "I"]) < 0.02  # noise is not
    assert mi.loc["GRAD1", "p_value"] <= 0.0101  # min p with 99 perms (f32)
    # the quantized int8 null (half the bytes, exact integer MXU dots)
    # reaches the same decisions; observed I stays exact f32
    a8 = sct.spatial.morans_i(adata.copy(), n_permutations=99, seed=0,
                              n_neighbors=8, null_method="banded_int8",
                              key_added="morans_i_int8")
    m8 = a8.uns["morans_i_int8"].set_index("gene")
    assert (m8["I"] - mi["I"]).abs().max() < 1e-5
    assert ((m8["p_value"] < 0.05) == (mi["p_value"] < 0.05)).all()

    # --- niches ---------------------------------------------------------
    adata = sct.spatial.compute_neighborhood_profile(adata, "cell_type",
                                                     k=30)
    adata = sct.spatial.identify_niches(adata, n_niches=4, random_state=0)
    follicle = adata.obs["niche"][
        adata.obs["true_type"].astype(str) == "B cell"]
    frac_dominant = follicle.value_counts(normalize=True).iloc[0]
    print(f"[4/7] niches: follicle B cells {frac_dominant:.0%} in one niche")

    # --- neighborhood enrichment ------------------------------------------
    adata = sct.spatial.neighborhood_enrichment(adata, "cell_type",
                                                n_permutations=200, seed=0)
    z = adata.uns["cell_type_nhood_enrichment"]["zscore"]
    tps = adata.uns["cell_type_nhood_enrichment"]["types"]
    bb = z[tps.index("B cell"), tps.index("B cell")]
    print(f"[5/7] B-B adjacency z = {bb:.1f}")
    assert bb > 5

    # --- local statistics (round-2 additions) ------------------------------
    adata.obs["is_b"] = adata.obs["cell_type"].astype(str) == "B cell"
    adata = sct.spatial.local_join_counts(adata, "is_b", n_permutations=99,
                                          seed=0)
    jc_sig = (adata.obs["is_b_local_jc_p"] < 0.05)[
        adata.obs["true_type"].astype(str) == "B cell"].mean()
    print(f"[5b/7] local join counts: {jc_sig:.0%} of follicle B cells "
          "in significant 1-1 clusters")
    assert jc_sig > 0.3

    # Getis-Ord hot spots: MS4A1 (follicle marker) should be hot inside
    # the follicles and nowhere near hot for noise
    adata = sct.spatial.getis_ord_gi(adata, genes=["MS4A1", "NOISE1"],
                                     n_neighbors=8, seed=0)
    hs = adata.obsm["getis_ord_hotspot"]
    b_mask = (adata.obs["true_type"].astype(str) == "B cell").to_numpy()
    hot_b = (hs[b_mask, 0] == 1).mean()
    print(f"[5c/7] Getis-Ord: {hot_b:.0%} of follicle B cells are MS4A1 "
          f"hot spots; noise hot fraction {(hs[:, 1] == 1).mean():.1%}")
    assert hot_b > 0.5
    assert (hs[:, 1] == 1).mean() < 0.02

    # distance-band correlogram (one device dispatch for all bands):
    # the follicle marker's autocorrelation must decay with distance
    adata = sct.spatial.moran_correlogram(adata, genes=["MS4A1"],
                                          n_bands=4, n_permutations=49,
                                          seed=0)
    cg = adata.uns["moran_correlogram"].sort_values("band_lo")
    print("[5d/7] correlogram I(d) for MS4A1:",
          [round(float(v), 3) for v in cg["I"]])
    assert float(cg["I"].iloc[0]) > float(cg["I"].iloc[-1])
    assert float(cg["p_sim"].iloc[0]) <= 0.05

    # point-pattern aggregation: this synthetic field is near-CSR overall
    # (uniform background + follicles), so R ≈ 1 — a sanity check that the
    # index is calibrated, not a clustering claim
    adata = sct.spatial.clark_evans(adata)
    print(f"[5d/7] Clark-Evans R = {adata.uns['clark_evans']['R']:.2f}")
    assert 0.8 < adata.uns["clark_evans"]["R"] < 1.1

    # --- domains + distances ------------------------------------------------
    adata = sct.spatial.make_spatial_domains(
        adata, "cell_type == 'B cell'", platform="xenium",
        domain_prefix="follicle", cell_dist_um=80.0,
        min_target_cells_domain=50)
    n_dom = adata.uns["spatial_domain_params"]["n_domains"]
    adata = sct.spatial.calculate_domain_distances(
        adata, "spatial_domain", "spatial_domain")
    print(f"[6/7] domains: {n_dom} follicle domain(s)")
    assert n_dom >= 1
    # ordered polygon chains (marching squares) exist and are closed
    polys = adata.uns["spatial_domain_polygons"]
    assert polys and all(v.shape[1] == 2 for v in polys.values())

    # --- figures ---------------------------------------------------------
    plot_spatial_celltype(adata, path=out / "vignette_celltypes.png")
    plot_spatial_gene(adata, "GRAD1", path=out / "vignette_gradient.png")
    plot_marker_heatmap(adata, markers=markers,
                        path=out / "vignette_markers.png")
    plot_distance_map(adata, boundaries_key="spatial_domain_boundaries",
                      path=out / "vignette_domains.png")
    plot_domain_distances(adata, "spatial_domain",
                          save=out / "vignette_domain_connections.png")
    plot_spatial_hotspots(adata, "MS4A1",
                          path=out / "vignette_hotspots.png")
    print(f"[7/7] figures → {out}  (total {time.time() - t0:.0f}s)")
    print("VIGNETTE_OK")


if __name__ == "__main__":
    main(*sys.argv[1:])
