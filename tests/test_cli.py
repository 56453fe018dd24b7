"""CLI smoke tests: info / moran / domains subcommands."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import scipy.sparse as sp

import spatialcore_tpu as sct

from conftest import make_adata

ENV = {"JAX_PLATFORM_NAME": "cpu", "PATH": "/usr/bin:/bin",
       "HOME": str(Path.home())}


def _cli(*args):
    return subprocess.run([sys.executable, "-m", "spatialcore_tpu", *args],
                          capture_output=True, text=True, env=ENV,
                          timeout=600)


def test_cli_info():
    r = _cli("info")
    assert r.returncode == 0
    assert "spatialcore_tpu" in r.stdout
    assert "spatial" in r.stdout and "ok" in r.stdout


def test_cli_moran_and_domains(tmp_path):
    rng = np.random.default_rng(0)
    n = 800
    adata = make_adata(n_obs=n, n_vars=6, sparse=True)
    X = np.asarray(adata.X.todense())
    coords = np.asarray(adata.obsm["spatial"])
    X[:, 0] += np.sin(coords[:, 0] / 100).astype(np.float32) * 3
    adata.X = sp.csr_matrix(X)
    adata.obs["cell_type"] = rng.choice(["A", "B"], n)
    path = tmp_path / "q.h5ad"
    sct.write_h5ad(adata, path)

    r = _cli("moran", str(path), "--permutations", "19", "--top", "3")
    assert r.returncode == 0, r.stderr[-500:]
    assert "GENE0" in r.stdout.splitlines()[-3]  # structured gene ranks #1

    out = tmp_path / "dom.h5ad"
    r = _cli("domains", str(path), "cell_type == 'A'",
             "--platform", "xenium", "--out", str(out))
    assert r.returncode == 0, r.stderr[-500:]
    assert "n_cells" in r.stdout
    assert out.exists()
    back = sct.read_h5ad(out)
    assert "spatial_domain" in back.obs.columns
