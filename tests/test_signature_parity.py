"""Reference keyword compatibility: every public callable accepts every
reference parameter (directly or via a param alias).

Driven by tools/signature_audit.py, which AST-parses the reference tree
(/root/reference, read-only) against the live spatialcore_tpu package.
A newly diverging signature fails here with the offending parameter names;
either accept the parameter (preferred) or record a reviewed exception in
the tool's ALLOWED_MISSING table with a reason.
"""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/src/spatialcore")

sys.path.insert(0, str(REPO / "tools"))


@pytest.mark.skipif(not REF.exists(), reason="reference tree not present")
def test_no_unreviewed_missing_parameters():
    import signature_audit

    rows = signature_audit.audit()
    assert len(rows) > 100, "audit should cover the full public surface"
    bad = {f"{r['module']}.{r['name']}": r["missing"]
           for r in rows if r["missing"]}
    assert not bad, f"unreviewed missing reference parameters: {bad}"


@pytest.mark.skipif(not REF.exists(), reason="reference tree not present")
def test_aliases_route_to_canonical():
    """Spot-check that legacy spellings still work through param_aliases."""
    import numpy as np
    import pandas as pd

    from spatialcore_tpu.annotation import (generate_color_scheme,
                                            validate_cell_type_column)
    from conftest import make_adata

    # legacy spelling
    legacy = generate_color_scheme(classes=["a", "b"])
    canonical = generate_color_scheme(cell_types=["a", "b"])
    assert legacy == canonical
    with pytest.raises(TypeError, match="pass one"):
        generate_color_scheme(classes=["a"], cell_types=["a"])

    adata = make_adata(n_obs=60, n_vars=4)
    adata.obs["ct"] = ["T cell"] * 30 + ["B cell"] * 30
    res_new = validate_cell_type_column(adata, "ct", max_cell_types=100)
    res_old = validate_cell_type_column(adata, "ct", max_types=100)
    assert res_new.valid == res_old.valid == True  # noqa: E712
