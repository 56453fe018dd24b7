"""Every public name the reference exports resolves here.

The fixture (tests/fixtures/reference_exports.json) snapshots the
``__all__`` lists of the reference's core/spatial/stats/annotation/
plotting packages and its top level, so the check runs without the
reference tree present (e.g. in CI).
"""

import json
from pathlib import Path

import pytest

import spatialcore_tpu as sct

FIXTURE = Path(__file__).parent / "fixtures" / "reference_exports.json"


@pytest.fixture(scope="module")
def exports():
    return json.loads(FIXTURE.read_text())


@pytest.mark.parametrize("module", ["core", "spatial", "stats",
                                    "annotation", "plotting", "top"])
def test_all_reference_names_resolve(exports, module):
    target = sct if module == "top" else getattr(sct, module)
    missing = []
    for name in exports[module]:
        obj = getattr(target, name, None)
        if obj is None:
            # top-level fallback: the façade may flatten some names
            obj = getattr(sct, name, None)
        if obj is None:
            missing.append(name)
    assert not missing, f"{module}: {missing}"
