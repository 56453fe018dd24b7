#!/usr/bin/env python
"""Live-service smoke checks for the network-backed annotation modules.

The cellxgene / synapse / gs:// discovery modules cannot be exercised in
the build environment (no network egress, SDKs absent) — they are marked
"experimental" in PARITY.md. The FIRST time their SDKs and network access
exist, running this script flips each to validated:

    SPATIALCORE_SMOKE_CELLXGENE=1 \
    SPATIALCORE_SMOKE_SYNAPSE=1  SYNAPSE_AUTH_TOKEN=... \
    SPATIALCORE_SMOKE_GCS=1      SPATIALCORE_SMOKE_GCS_PREFIX=gs://bucket/path \
        python tools/live_service_smoke.py

Each block is independently env-gated and prints PASS / SKIP / FAIL; the
exit code is non-zero iff any attempted block fails. The same checks are
importable from tests (tests/test_live_services.py runs them under
pytest with skip markers).
"""

from __future__ import annotations

import os
import sys
import tempfile


def smoke_cellxgene() -> str:
    """3-step census query on a tiny slice (IDs -> sample -> fetch)."""
    try:
        import cellxgene_census  # noqa: F401
    except ImportError:
        return "SKIP (cellxgene-census not installed)"
    from spatialcore_tpu.annotation.cellxgene import (
        list_available_datasets, query_cellxgene_census)
    from spatialcore_tpu.core.io import read_h5ad

    reg = list_available_datasets()
    assert len(reg), "curated registry is empty"
    with tempfile.TemporaryDirectory() as td:
        out_path = os.path.join(td, "census_smoke.h5ad")
        query_cellxgene_census(
            value_filter=("tissue_general == 'lung' "
                          "and is_primary_data == True"),
            output_path=out_path,
            organism="homo_sapiens",
            max_cells=500,
            seed=0,
        )
        adata = read_h5ad(out_path)
        assert 0 < adata.n_obs <= 500
        assert "cell_type" in adata.obs.columns
        return f"PASS ({adata.n_obs} cells x {adata.n_vars} genes)"


def smoke_synapse() -> str:
    """Token auth + public entity metadata (no download)."""
    try:
        import synapseclient  # noqa: F401
    except ImportError:
        return "SKIP (synapseclient not installed)"
    if not os.environ.get("SYNAPSE_AUTH_TOKEN"):
        return "SKIP (SYNAPSE_AUTH_TOKEN unset)"
    from spatialcore_tpu.annotation.synapse import get_synapse_entity_info

    # syn21041850: public HCA census reference used in SpatialCore docs
    info = get_synapse_entity_info("syn21041850")
    assert info.get("id") == "syn21041850"
    return f"PASS (entity {info.get('name', '?')})"


def smoke_gcs() -> str:
    """gs:// discovery with the retry wrapper + one cached download."""
    try:
        import gcsfs  # noqa: F401
    except ImportError:
        return "SKIP (gcsfs not installed)"
    prefix = os.environ.get("SPATIALCORE_SMOKE_GCS_PREFIX")
    if not prefix:
        return "SKIP (SPATIALCORE_SMOKE_GCS_PREFIX unset)"
    from spatialcore_tpu.annotation.acquisition import resolve_uri_to_local
    from spatialcore_tpu.annotation.discovery import discover_training_data

    found = discover_training_data(prefix)
    assert isinstance(found, list)
    if found:
        with tempfile.TemporaryDirectory() as td:
            local = resolve_uri_to_local(found[0].path, cache_dir=td)
            assert os.path.exists(local)
            # second resolve must hit the cache (no re-download)
            local2 = resolve_uri_to_local(found[0].path, cache_dir=td)
            assert local == local2
    return f"PASS ({len(found)} datasets under {prefix})"


BLOCKS = [
    ("SPATIALCORE_SMOKE_CELLXGENE", "cellxgene", smoke_cellxgene),
    ("SPATIALCORE_SMOKE_SYNAPSE", "synapse", smoke_synapse),
    ("SPATIALCORE_SMOKE_GCS", "gcs", smoke_gcs),
]


def main() -> int:
    failed = False
    for env, name, fn in BLOCKS:
        if not os.environ.get(env):
            print(f"[smoke] {name}: SKIP ({env} unset)")
            continue
        try:
            print(f"[smoke] {name}: {fn()}")
        except Exception as e:  # report and keep going
            failed = True
            print(f"[smoke] {name}: FAIL — {type(e).__name__}: {e}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
