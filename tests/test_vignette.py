"""Docs-as-integration-test: the end-to-end vignette must stay green.

Mirrors the reference's validation strategy (SURVEY.md §4 item 4: every
docs vignette is a full run with checked outputs).
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def test_end_to_end_vignette(tmp_path):
    res = subprocess.run(
        [sys.executable, str(REPO / "examples" / "end_to_end.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=900,
        env={"JAX_PLATFORM_NAME": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": str(Path.home())})
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert "VIGNETTE_OK" in res.stdout
    for f in ["vignette_celltypes.png", "vignette_gradient.png",
              "vignette_markers.png", "vignette_domains.png"]:
        assert (tmp_path / f).exists()


def test_xenium_vignette(tmp_path):
    """The Xenium-scale simulated-tissue vignette (VERDICT r3 item 8):
    full pipeline with asserted numbers at a CI-sized world."""
    res = subprocess.run(
        [sys.executable, str(REPO / "examples" / "xenium_vignette.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=1500,
        env={"JAX_PLATFORM_NAME": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": str(Path.home()), "XEN_CELLS": "12000"})
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert "XENIUM_VIGNETTE_OK" in res.stdout
    for f in ["xenium_celltypes.png", "xenium_gradient.png",
              "xenium_markers.png", "xenium_domains.png",
              "xenium_niches.png"]:
        assert (tmp_path / f).exists()
