#!/usr/bin/env python
"""Generate cross-implementation golden fixtures by RUNNING the reference.

The reference's local Moran's I, Lee's L, spatial weights, and thresholding
kernels are pure numpy/scipy/sklearn (no squidpy/scanpy in those paths), so
they execute here against stub modules and this build's AnnData-compatible
container. The outputs are committed under tests/fixtures/ and
tests/test_reference_golden.py asserts 1e-5-level agreement — the
cross-implementation check SURVEY.md §7 hard part 1 calls for, with the
reference itself as the independent implementation.

Usage: python tools/gen_reference_fixtures.py [reference_root]
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _load(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules():
    class _FakeAnnData:  # typing-only placeholder
        pass

    _stub("anndata", AnnData=_FakeAnnData)
    _stub("squidpy", gr=types.SimpleNamespace())  # morans_i path not used
    base = REF / "src" / "spatialcore"
    for pkg in ("spatialcore", "spatialcore.core", "spatialcore.spatial",
                "spatialcore.stats"):
        m = types.ModuleType(pkg)
        m.__path__ = []
        sys.modules.setdefault(pkg, m)
    _load("spatialcore.core.logging", base / "core" / "logging.py")
    _load("spatialcore.core.metadata", base / "core" / "metadata.py")
    auto = _load("spatialcore.spatial.autocorrelation",
                 base / "spatial" / "autocorrelation.py")
    thr = _load("spatialcore.stats._thresholding",
                base / "stats" / "_thresholding.py")
    return auto, thr


def make_world(seed=11, n=500, g=6):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    X = np.stack(
        [np.sin(coords[:, 0] / 10.0) + rng.normal(0, 0.25, n),
         np.cos(coords[:, 1] / 8.0) + rng.normal(0, 0.25, n),
         coords[:, 0] / 100.0 + rng.normal(0, 0.2, n)]
        + [rng.normal(0, 1, n) for _ in range(g - 3)], axis=1
    ).astype(np.float32)
    return coords, X


def main():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    auto, thr = load_reference_modules()
    from spatialcore_tpu.core.container import SpatialData
    import pandas as pd

    OUT.mkdir(parents=True, exist_ok=True)
    coords, X = make_world()
    n, g = X.shape
    genes = [f"GENE{i}" for i in range(g)]
    adata = SpatialData(
        X=X.copy(),
        obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
        var=pd.DataFrame(index=genes))
    adata.obsm["spatial"] = coords

    # 1. spatial weights (sklearn ball-tree kNN -> row-normalized CSR)
    W = auto.build_spatial_weights(adata, n_neighbors=6)
    # 2. reference local Moran's I (full pipeline incl. p-values, quadrants)
    auto.local_morans_i(adata, genes=genes, n_neighbors=6,
                        n_permutations=199, seed=0)
    keys = sorted(k for k in adata.obsm.keys() if k.startswith("local_moran"))
    print("obsm keys:", keys)
    # 3. reference Lee's L (global + local, deterministic parts)
    res_pairs = auto.lees_l(adata, gene_pairs=[("GENE0", "GENE1"),
                                               ("GENE0", "GENE3")],
                            n_neighbors=6, n_permutations=199, seed=0)
    auto.lees_l_local(adata, gene_pairs=[("GENE0", "GENE1")],
                      n_neighbors=6, compute_cell_pvalues=False)
    # 4. thresholding kernels on synthetic mixtures
    rng = np.random.default_rng(5)
    bimodal = np.concatenate([rng.normal(1.0, 0.3, 700),
                              rng.normal(4.0, 0.6, 300)]).astype(np.float64)
    trimodal = np.concatenate([rng.normal(0.5, 0.2, 500),
                               rng.normal(2.5, 0.4, 300),
                               rng.normal(5.0, 0.5, 200)]).astype(np.float64)
    feat = np.abs(rng.normal(2.0, 1.0, (400, 3))) + 0.1
    scores = {m: thr.compute_metagene_score(feat, method=m)
              for m in ("shifted_geometric_mean", "geometric_mean",
                        "arithmetic_mean", "median", "minimum")}
    ks_t, ks_scores, ks_params = thr.threshold_ks(bimodal)
    gmm_t, _, gmm_prob, _ = thr.threshold_gmm(
        bimodal, n_components=2, random_state=0)
    gmm3_t, _, gmm3_prob, _ = thr.threshold_gmm(
        trimodal, n_components=3, random_state=0)

    lee_pair = {f"lee_{i}_{k}": v for i, r in enumerate(res_pairs)
                for k, v in r.items() if isinstance(v, (int, float))}
    np.savez_compressed(
        OUT / "reference_numerics.npz",
        coords=coords, X=X,
        W_indices=W.indices, W_indptr=W.indptr, W_data=W.data,
        **{f"lisa_{k}": np.asarray(adata.obsm[k]) for k in keys},
        lee_local=np.asarray(adata.obs["GENE0_GENE1_lees_l"]),
        bimodal=bimodal, trimodal=trimodal, feat=feat,
        **{f"metagene_{m}": v for m, v in scores.items()},
        ks_threshold=ks_t, ks_scores=ks_scores,
        gmm2_threshold=gmm_t, gmm2_prob=gmm_prob,
        gmm3_threshold=gmm3_t, gmm3_prob=gmm3_prob,
        **lee_pair,
    )
    print("saved", OUT / "reference_numerics.npz")
    print("lee globals:", lee_pair)
    print("ks_t", ks_t, "gmm2_t", gmm_t, "gmm3_t", gmm3_t)


if __name__ == "__main__":
    main()
