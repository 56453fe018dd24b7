"""Xenium-scale docs vignette on the deterministic simulated tissue.

The reference's vignettes run on named public datasets (CosMx colon
366,938 cells; Xenium lung 93,162 cells — /root/reference/docs/spatial/
spatial_stats.md, docs/celltyping/benchmarks.md) that this environment
cannot download. This vignette reproduces their DEPTH on the committed
generator (`spatialcore_tpu.utils.simulate_xenium`): a panel-sized gene
set (256 genes, 13 cell types x 8-marker modules), spatially organized
niches with ground truth, and every pipeline stage with asserted
numbers — normalization QC, annotation (train + annotate + confidence),
fused global Moran+Geary, streamed LISA, niches (NMI vs truth), domain
polygons, and the standard QC figures.

Usage: python examples/xenium_vignette.py [outdir] — the committed
figures under docs/images/xenium_*.png come from the default run
(25k cells on CPU; scale up with XEN_CELLS/XEN_GENES env).
"""

import os
import sys
import time
from pathlib import Path

# runnable from any cwd / clean env (the CI test spawns a bare subprocess)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(outdir="docs/images"):
    import spatialcore_tpu as sct
    from spatialcore_tpu.annotation import TrainingConfig, train_and_annotate
    from spatialcore_tpu.plotting.spatial import (
        plot_distance_map, plot_spatial_celltype, plot_spatial_gene)
    from spatialcore_tpu.plotting.validation import plot_marker_heatmap
    from spatialcore_tpu.utils.simulate import simulate_xenium

    t0 = time.time()
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    n_cells = int(os.environ.get("XEN_CELLS", 25_000))
    n_genes = int(os.environ.get("XEN_GENES", 256))
    adata, truth = simulate_xenium(n_cells=n_cells, n_genes=n_genes, seed=0)
    print(f"[1/8] simulated {adata.n_obs:,} cells × {adata.n_vars} genes, "
          f"{adata.obs['true_niche'].nunique()} true niches")

    # --- normalization state detection ------------------------------------
    status = sct.core.check_normalization_status(adata)
    assert status["x_state"] == "raw" and status["is_usable"], status
    print(f"[2/8] normalization detector: x_state={status['x_state']}, "
          f"raw_source={status['raw_source']}")

    # --- annotation: disjoint simulated reference -> LR train/annotate ----
    ref, _ = simulate_xenium(n_cells=8_000, n_genes=n_genes, seed=99)
    ref.obs["cell_type"] = ref.obs["true_type"]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        sct.write_h5ad(ref, f"{td}/ref.h5ad")
        adata, model = train_and_annotate(
            adata, references=[f"{td}/ref.h5ad"],
            config=TrainingConfig(references=[], epochs=20,
                                  confidence_threshold=0.5,
                                  make_plots=False, seed=0))
    assigned = adata.obs["cell_type"].astype(str)
    acc = (assigned == adata.obs["true_type"].astype(str)).mean()
    print(f"[3/8] annotation accuracy vs ground truth: {acc:.3f} "
          f"(unassigned {(assigned == 'Unassigned').mean():.1%})")
    assert acc > 0.75, acc

    # --- fused global Moran + Geary on the full panel ----------------------
    adata = sct.spatial.global_autocorrelation(
        adata, n_permutations=99, seed=0, n_neighbors=8,
        null_method="banded_int8")
    mi = adata.uns["morans_i"].set_index("gene")
    grad_p = mi.loc[truth["gradient_genes"], "p_value"]
    noise_p = mi.loc[truth["noise_genes"], "p_value"]
    print(f"[4/8] Moran: gradient genes all p<=0.01 "
          f"({(grad_p <= 0.0101).all()}), noise sig frac "
          f"{(noise_p < 0.05).mean():.2f}")
    assert (grad_p <= 0.0101).all()
    assert (mi.loc[truth["gradient_genes"], "I"] > 0.05).all()
    assert (noise_p < 0.05).mean() <= 0.12   # ~alpha on null genes
    # marker genes cluster spatially because the types do
    b_markers = [g for g in truth["markers"]["B cell"]
                 if g in mi.index][:2]
    assert (mi.loc[b_markers, "p_value"] <= 0.05).all()

    # --- streamed LISA (compact output mode) -------------------------------
    adata = sct.spatial.local_morans_i(
        adata, genes=truth["gradient_genes"] + truth["noise_genes"][:4],
        n_neighbors=8, n_permutations=99, seed=0,
        null_method="banded_int8", output_mode="compact",
        key_added="lisa")
    p = np.asarray(adata.obsm["lisa_p"], np.float32)
    sig_grad = (p[:, 0] < 0.05).mean()
    sig_noise = (p[:, -1] < 0.05).mean()
    print(f"[5/8] LISA: {sig_grad:.0%} of cells significant on GRAD0, "
          f"{sig_noise:.1%} on noise")
    assert sig_grad > 3 * max(sig_noise, 0.01)

    # --- niches: recovered composition clusters vs ground truth ------------
    adata = sct.spatial.compute_neighborhood_profile(adata, "cell_type",
                                                     k=30)
    adata = sct.spatial.identify_niches(
        adata, n_niches=len(truth["niche_names"]), random_state=0)
    from sklearn.metrics import normalized_mutual_info_score

    nmi = normalized_mutual_info_score(adata.obs["true_niche"],
                                       adata.obs["niche"])
    print(f"[6/8] niches: NMI vs true niches = {nmi:.3f} "
          f"(reference's own Python-vs-R bar is 0.769)")
    assert nmi > 0.45, nmi

    # --- domains on the epithelial band ------------------------------------
    adata = sct.spatial.make_spatial_domains(
        adata, "cell_type == 'Epithelial'", platform="xenium",
        domain_prefix="epi", cell_dist_um=100.0,
        min_target_cells_domain=100)
    n_dom = adata.uns["spatial_domain_params"]["n_domains"]
    in_dom = adata.obs["spatial_domain"].notna() \
        if adata.obs["spatial_domain"].isna().any() \
        else (adata.obs["spatial_domain"].astype(str) != "nan")
    epi = adata.obs["true_type"].astype(str) == "Epithelial"
    cover = (in_dom & epi).sum() / max(epi.sum(), 1)
    print(f"[7/8] domains: {n_dom} epithelial domain(s), "
          f"{cover:.0%} of epithelial cells covered")
    assert n_dom >= 1 and cover > 0.5
    adata = sct.spatial.calculate_domain_distances(
        adata, "spatial_domain", "spatial_domain")

    # --- figures ------------------------------------------------------------
    plot_spatial_celltype(adata, path=out / "xenium_celltypes.png")
    plot_spatial_gene(adata, "GRAD0", path=out / "xenium_gradient.png")
    plot_marker_heatmap(
        adata, markers={t: m[:3] for t, m in truth["markers"].items()},
        path=out / "xenium_markers.png")
    plot_distance_map(adata, boundaries_key="spatial_domain_boundaries",
                      path=out / "xenium_domains.png")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 6))
    coords = np.asarray(adata.obsm["spatial"])
    for ni, name in enumerate(sorted(set(adata.obs["niche"].astype(str)))):
        m = (adata.obs["niche"].astype(str) == name).to_numpy()
        ax.scatter(coords[m, 0], coords[m, 1], s=1.2, label=name,
                   rasterized=True)
    ax.set_title(f"Recovered niches (NMI vs truth {nmi:.2f})")
    ax.legend(markerscale=8, fontsize=7)
    fig.savefig(out / "xenium_niches.png", dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"[8/8] figures → {out}  (total {time.time() - t0:.0f}s)")
    print("XENIUM_VIGNETTE_OK "
          f"acc={acc:.3f} nmi={nmi:.3f} n_domains={n_dom}")


if __name__ == "__main__":
    main(*sys.argv[1:])
