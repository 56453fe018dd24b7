"""Public Ripley's K/L API on the SpatialData container.

BASELINE config 3: univariate K/L with CSR envelopes and cross-type K with
random-labeling envelopes (extension beyond the reference; see
ops/ripley.py for the kernel design).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

from ..core.logging import get_logger
from ..core.metadata import update_metadata
from ..ops.ripley import co_occurrence_counts, cross_type_k, ripley_k

logger = get_logger("spatial.ripley")


def _default_radii(coords: np.ndarray, n_radii: int) -> np.ndarray:
    span = coords.max(axis=0) - coords.min(axis=0)
    r_max = 0.25 * float(min(span[0], span[1]))
    return np.linspace(r_max / n_radii, r_max, n_radii).astype(np.float32)


def ripleys_k(
    adata,
    radii: Optional[Sequence[float]] = None,
    n_radii: int = 20,
    n_simulations: int = 99,
    seed: int = 0,
    spatial_key: str = "spatial",
    key_added: str = "ripley_k",
    copy: bool = False,
):
    """Univariate Ripley's K/L with CSR envelopes → ``uns[key_added]``."""
    start = time.time()
    if copy:
        adata = adata.copy()
    if spatial_key not in adata.obsm:
        raise ValueError(f"adata.obsm['{spatial_key}'] not found")
    coords = np.asarray(adata.obsm[spatial_key], np.float32)[:, :2]
    if radii is None:
        radii = _default_radii(coords, n_radii)
    radii = np.asarray(sorted(radii), np.float32)
    if radii.min() <= 0:
        raise ValueError("All radii must be > 0")

    logger.info(f"Ripley's K: {adata.n_obs:,} cells, {len(radii)} radii, "
                f"{n_simulations} CSR simulations")
    res = ripley_k(coords, radii, n_simulations=n_simulations, seed=seed)
    res = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
           for k, v in res.items()}
    res["computation_time_seconds"] = round(time.time() - start, 2)
    adata.uns[key_added] = res
    update_metadata(adata, "ripleys_k",
                    parameters={"n_radii": len(radii),
                                "n_simulations": n_simulations,
                                "seed": seed},
                    outputs={"uns": key_added})
    return adata


def co_occurrence(
    adata,
    cluster_key: str,
    radii: Optional[Sequence[float]] = None,
    n_radii: int = 20,
    spatial_key: str = "spatial",
    key_added: str = "co_occurrence",
    copy: bool = False,
):
    """Conditional co-occurrence score per distance interval (squidpy-style).

    ``score[r, a, b] = P(type b | within shell r of an a-cell) / P(type b)``
    over distance shells between consecutive radii. >1 ⇒ b is enriched
    around a at that range. Output: ``uns[key_added]`` with ``score``
    [R, T, T], ``interval`` edges, and the type order in
    ``uns[f"{key_added}_types"]``.
    """
    start = time.time()
    if copy:
        adata = adata.copy()
    if spatial_key not in adata.obsm:
        raise ValueError(f"adata.obsm['{spatial_key}'] not found")
    if cluster_key not in adata.obs.columns:
        raise ValueError(f"adata.obs['{cluster_key}'] not found")
    coords = np.asarray(adata.obsm[spatial_key], np.float32)[:, :2]
    labels = adata.obs[cluster_key]
    if labels.isna().any():
        raise ValueError(
            f"adata.obs['{cluster_key}'] contains null labels; drop or "
            "fill them first.")
    labels = labels.astype(str)
    types = sorted(labels.unique())
    if len(types) < 2:
        raise ValueError("co_occurrence needs ≥2 types")
    codes = labels.map({t: i for i, t in enumerate(types)}).to_numpy(np.int32)
    if radii is None:
        radii = _default_radii(coords, n_radii)
    radii = np.asarray(sorted(radii), np.float32)

    logger.info(f"co_occurrence: {adata.n_obs:,} cells, {len(types)} types, "
                f"{len(radii)} distance shells")
    cum = co_occurrence_counts(coords, codes, len(types), radii)  # [R,T,T]
    shells = np.diff(np.concatenate([np.zeros((1,) + cum.shape[1:]), cum],
                                    axis=0), axis=0)              # per shell
    totals = shells.sum(axis=2, keepdims=True)                    # pairs a→*
    cond = shells / np.maximum(totals, 1.0)                       # P(b | a, r)
    frac = (np.bincount(codes, minlength=len(types))
            / len(codes))[None, None, :]
    score = np.where(totals > 0, cond / frac, np.nan)
    adata.uns[key_added] = {
        "score": score.astype(np.float32),
        "interval": radii.tolist(),
        "computation_time_seconds": round(time.time() - start, 2),
    }
    adata.uns[f"{key_added}_types"] = types
    update_metadata(adata, "co_occurrence",
                    parameters={"cluster_key": cluster_key,
                                "n_radii": len(radii)},
                    outputs={"uns": [key_added, f"{key_added}_types"]})
    return adata


def cross_type_ripleys_k(
    adata,
    cluster_key: str,
    radii: Optional[Sequence[float]] = None,
    n_radii: int = 20,
    n_permutations: int = 99,
    seed: int = 0,
    spatial_key: str = "spatial",
    key_added: str = "ripley_k_cross",
    copy: bool = False,
):
    """Cross-type K for all type pairs with random-labeling envelopes.

    ``uns[key_added]``: K_cross [R, T, T] (+ envelopes), type order in
    ``uns[f"{key_added}_types"]``.
    """
    start = time.time()
    if copy:
        adata = adata.copy()
    if spatial_key not in adata.obsm:
        raise ValueError(f"adata.obsm['{spatial_key}'] not found")
    if cluster_key not in adata.obs.columns:
        raise ValueError(f"adata.obs['{cluster_key}'] not found")
    coords = np.asarray(adata.obsm[spatial_key], np.float32)[:, :2]
    labels = adata.obs[cluster_key]
    if labels.isna().any():
        raise ValueError(
            f"adata.obs['{cluster_key}'] contains null labels; drop or "
            "fill them first.")
    labels = labels.astype(str)
    types = sorted(labels.unique())
    if len(types) < 2:
        raise ValueError("cross_type_ripleys_k needs ≥2 types")
    codes = labels.map({t: i for i, t in enumerate(types)}).to_numpy(np.int32)
    if radii is None:
        radii = _default_radii(coords, n_radii)
    radii = np.asarray(sorted(radii), np.float32)

    logger.info(f"Cross-type K: {adata.n_obs:,} cells, {len(types)} types, "
                f"{len(radii)} radii, {n_permutations} label permutations")
    res = cross_type_k(coords, codes, len(types), radii,
                       n_permutations=n_permutations, seed=seed)
    res = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
           for k, v in res.items()}
    res["computation_time_seconds"] = round(time.time() - start, 2)
    adata.uns[key_added] = res
    adata.uns[f"{key_added}_types"] = types
    update_metadata(adata, "cross_type_ripleys_k",
                    parameters={"cluster_key": cluster_key,
                                "n_radii": len(radii),
                                "n_permutations": n_permutations,
                                "seed": seed},
                    outputs={"uns": [key_added, f"{key_added}_types"]})
    return adata


def clark_evans(
    adata,
    spatial_key: str = "spatial",
    area: Optional[float] = None,
    copy: bool = False,
):
    """Clark-Evans nearest-neighbor aggregation index with z-test.

    R = observed mean NN distance / expected under CSR (0.5/√λ).
    R < 1 → clustered, R ≈ 1 → random, R > 1 → dispersed/regular. The
    z-test uses Clark & Evans (1954): SE = 0.26136/√(nλ). No edge
    correction (fine for R as a descriptive aggregation index at the
    cell counts typical here; the boundary bias shrinks as 1/√n).
    Classic point-pattern companion to :func:`ripleys_k` — an extension;
    the reference has no point-pattern statistics.

    Writes ``uns["clark_evans"] = {"R", "z", "p_value", "mean_nn", ...}``.
    """
    import jax.numpy as jnp
    from scipy.stats import norm as _norm

    from ..ops.graph import knn_exact, knn_grid

    start = time.time()
    if copy:
        adata = adata.copy()
    if spatial_key not in adata.obsm:
        raise ValueError(f"adata.obsm['{spatial_key}'] not found")
    coords = np.asarray(adata.obsm[spatial_key], np.float32)[:, :2]
    n = len(coords)
    if n < 3:
        raise ValueError(f"clark_evans needs >= 3 cells, got {n}")
    if n > 50_000:
        _, dist = knn_grid(coords, 1)
    else:
        _, dist = knn_exact(jnp.asarray(coords), 1)
    mean_nn = float(np.asarray(dist).ravel().mean())
    if area is None:
        lo, hi = coords.min(0), coords.max(0)
        area = float((hi[0] - lo[0]) * (hi[1] - lo[1]))
    lam = n / max(area, 1e-12)
    expected = 0.5 / np.sqrt(lam)
    R = mean_nn / expected
    se = 0.26136 / np.sqrt(n * lam)
    z = (mean_nn - expected) / se
    p = 2.0 * float(_norm.sf(abs(z)))
    adata.uns["clark_evans"] = {
        "R": R, "z": z, "p_value": p, "mean_nn_distance": mean_nn,
        "expected_nn_distance": expected, "n_cells": n, "area": area,
        "computation_time_seconds": time.time() - start,
    }
    update_metadata(adata, "clark_evans", parameters={
        "n_cells": n, "area": area},
        outputs={"uns": "clark_evans"})
    logger.info(f"Clark-Evans R={R:.3f} (z={z:.1f}) — "
                f"{'clustered' if R < 1 else 'dispersed' if R > 1 else 'random'}")
    return adata
