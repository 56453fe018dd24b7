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

    # --geary: fused Moran+Geary table with both statistics' columns
    r = _cli("moran", str(path), "--permutations", "19", "--top", "3",
             "--geary")
    assert r.returncode == 0, r.stderr[-500:]
    header = r.stdout.splitlines()[-4]   # 3 rows follow the table header
    assert "I" in header.split() and "C" in header.split()
    assert "p_value_C" in header

    out = tmp_path / "dom.h5ad"
    r = _cli("domains", str(path), "cell_type == 'A'",
             "--platform", "xenium", "--out", str(out))
    assert r.returncode == 0, r.stderr[-500:]
    assert "n_cells" in r.stdout
    assert out.exists()
    back = sct.read_h5ad(out)
    assert "spatial_domain" in back.obs.columns


def test_cli_pipeline(tmp_path):
    rng = np.random.default_rng(1)
    TYPES = ["A", "B", "C"]
    n_per = 120
    n = n_per * 3
    counts = rng.poisson(1.0, (n, 18)).astype(np.float32)
    for t in range(3):
        counts[t * n_per:(t + 1) * n_per, t * 5:t * 5 + 5] += rng.poisson(
            7.0, (n_per, 5))
    ref = make_adata(n_obs=n, n_vars=18)
    ref.X = sp.csr_matrix(counts)
    ref.layers["counts"] = sp.csr_matrix(counts)
    ref.obs["cell_type"] = np.repeat(TYPES, n_per)
    sct.write_h5ad(ref, tmp_path / "ref.h5ad")

    q = make_adata(n_obs=n, n_vars=18)
    qc = counts[rng.permutation(n)]
    q.X = sp.csr_matrix(qc)
    q.layers["counts"] = sp.csr_matrix(qc)
    sct.write_h5ad(q, tmp_path / "q.h5ad")

    from spatialcore_tpu.annotation import TrainingConfig

    TrainingConfig(references=[str(tmp_path / "ref.h5ad")], epochs=8,
                   confidence_threshold=0.5, make_plots=False,
                   ).to_yaml(tmp_path / "cfg.yaml")

    r = _cli("pipeline", str(tmp_path / "cfg.yaml"),
             "--adata", str(tmp_path / "q.h5ad"),
             "--out", str(tmp_path / "annotated.h5ad"))
    assert r.returncode == 0, r.stderr[-800:]
    assert "annotated" in r.stdout
    back = sct.read_h5ad(tmp_path / "annotated.h5ad")
    assert back.obs["cell_type"].notna().all()
    assert back.uns["spatialcore_annotation"]["n_types"] == 3


def test_cli_benchmark(tmp_path):
    rng = np.random.default_rng(1)
    n = 400
    adata = make_adata(n_obs=n, n_vars=8, sparse=True)
    adata.obs["cell_type"] = rng.choice(["A", "B", "C"], n)
    path = tmp_path / "b.h5ad"
    sct.write_h5ad(adata, path)

    r = _cli("benchmark", str(path), "--columns", "cell_type")
    assert r.returncode == 0, r.stderr[-500:]
    for metric in ("unassigned_rate", "deg_log2fc", "marker_purity"):
        assert metric in r.stdout
