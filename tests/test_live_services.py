"""Env-gated live-service smoke tests (round-3 VERDICT item 10).

All three skip in the build environment (SDKs/network absent); the first
time credentials + SDKs exist, run

    SPATIALCORE_SMOKE_CELLXGENE=1 ... pytest tests/test_live_services.py

or `python tools/live_service_smoke.py` to flip the PARITY.md
"experimental" rows to validated.
"""

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import live_service_smoke as smoke  # noqa: E402


@pytest.mark.parametrize("env,fn", [
    ("SPATIALCORE_SMOKE_CELLXGENE", smoke.smoke_cellxgene),
    ("SPATIALCORE_SMOKE_SYNAPSE", smoke.smoke_synapse),
    ("SPATIALCORE_SMOKE_GCS", smoke.smoke_gcs),
])
def test_live_service(env, fn):
    if not os.environ.get(env):
        pytest.skip(f"{env} unset (live service gate)")
    result = fn()
    if result.startswith("SKIP"):
        pytest.skip(result)
    assert result.startswith("PASS"), result


def test_smoke_script_runs_clean_without_gates():
    """With no gates set, the script must exit 0 and print only SKIPs."""
    assert smoke.main() == 0
