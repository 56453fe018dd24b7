"""Full-scale Ensembl→HUGO builtin mapping (regenerated from BioMart data)."""

import numpy as np
import pandas as pd

from spatialcore_tpu.core.genes import (
    load_ensembl_to_hugo_mapping, normalize_gene_names)


def test_builtin_mapping_is_full_scale():
    mapping = load_ensembl_to_hugo_mapping(auto_download=False)
    # the BioMart export carries ~48.7k stable IDs with a usable symbol
    assert len(mapping) > 40_000
    # canonical marker genes resolve
    sym = set(mapping.values())
    for gene in ("CD3E", "MS4A1", "EPCAM", "PECAM1", "PTPRC", "COL1A1",
                 "LYZ", "NKG7", "CD68", "VWF", "KRT18", "ACTA2"):
        assert gene in sym, gene


def test_normalize_gene_names_resolves_panel():
    from spatialcore_tpu.core.container import SpatialData

    mapping = load_ensembl_to_hugo_mapping(auto_download=False)
    # a Xenium-like panel: 300 real Ensembl IDs sampled deterministically
    ids = sorted(mapping)[:5000:17][:300]
    rng = np.random.default_rng(0)
    ad = SpatialData(
        X=rng.poisson(1.0, (50, len(ids))).astype(np.float32),
        obs=pd.DataFrame(index=[f"c{i}" for i in range(50)]),
        var=pd.DataFrame(index=ids))
    normalize_gene_names(ad)
    resolved = sum(1 for v in ad.var_names if not str(v).startswith("ENSG"))
    assert resolved / len(ids) >= 0.99, f"{resolved}/{len(ids)}"
