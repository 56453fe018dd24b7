"""Differential expression: Wilcoxon rank-sum per gene, group vs rest.

The reference delegates DEG to scanpy's ``rank_genes_groups`` (wilcoxon)
inside its validation plots (/root/reference/src/spatialcore/plotting/
validation.py:732). Here the rank-sum test is a JAX kernel: per-gene average
ranks via argsort + segment means over tie runs, z-scores against the
rank-sum null, all genes in one ``lax.map`` over gene tiles. Output layout
follows the scanpy convention (``uns['rank_genes_groups']`` with names /
scores / pvals / pvals_adj / logfoldchanges per group).
"""

from __future__ import annotations

import functools
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..core.logging import get_logger
from ..core.metadata import update_metadata
from ..ops.fdr import apply_fdr

logger = get_logger("stats.deg")


@functools.partial(jax.jit, static_argnames=("tie_correct",))
def _rank_stats(X, masks, tie_correct: bool = False):
    """Wilcoxon rank-sum z [G, K] for K groups vs rest, ranks shared.

    Ranks (and the tie-correction term) depend only on X, never on the
    group — so they are computed ONCE and every group's rank sum is one
    column of a single [G, N] @ [N, K] matmul (the per-group recompute
    paid the dominant O(G·N log N) sort K times).
    """
    n, g = X.shape

    def one_gene(x):
        order = jnp.argsort(x)
        sx = x[order]
        pos = jnp.arange(1, n + 1, dtype=jnp.float32)
        new_run = jnp.concatenate([jnp.ones((1,), bool), sx[1:] != sx[:-1]])
        run_id = jnp.cumsum(new_run) - 1
        sum_pos = jax.ops.segment_sum(pos, run_id, num_segments=n)
        cnt = jax.ops.segment_sum(jnp.ones_like(pos), run_id, num_segments=n)
        avg = sum_pos / jnp.maximum(cnt, 1.0)
        ranks = jnp.zeros((n,), jnp.float32).at[order].set(avg[run_id])
        tie_term = jnp.sum(cnt ** 3 - cnt) / (n * (n - 1.0))
        return ranks, tie_term

    ranks, tie = jax.lax.map(one_gene, X.T)       # [G, N], [G]
    n1 = jnp.sum(masks, axis=0)                    # [K]
    n2 = n - n1
    R1 = ranks @ masks                             # [G, K]
    expected = n1 * (n + 1) / 2.0
    if tie_correct:
        var = (n1 * n2 / 12.0)[None, :] * ((n + 1.0) - tie[:, None])
    else:
        var = jnp.broadcast_to((n1 * n2 * (n + 1.0) / 12.0)[None, :],
                               R1.shape)
    return (R1 - expected[None, :]) / jnp.sqrt(jnp.maximum(var, 1e-9))


def rank_genes_groups(
    adata,
    groupby: str,
    groups: Optional[Sequence[str]] = None,
    reference: str = "rest",
    method: str = "wilcoxon",
    n_genes: Optional[int] = None,
    tie_correct: bool = False,
    min_cells: int = 2,
    key_added: str = "rank_genes_groups",
    copy: bool = False,
):
    """Per-group marker ranking (group vs rest), scanpy-compatible output.

    ``uns[key_added]``: dict with per-group ordered ``names``, ``scores``
    (z), ``pvals``, ``pvals_adj`` (BH), ``logfoldchanges``
    (log2 of expm1-mean ratios, scanpy convention).
    """
    start = time.time()
    if copy:
        adata = adata.copy()
    if groupby not in adata.obs.columns:
        raise ValueError(f"Column '{groupby}' not found in obs")
    if method != "wilcoxon":
        raise ValueError(
            f"Only method='wilcoxon' is implemented, got '{method}'")
    if reference != "rest":
        raise ValueError("Only reference='rest' is implemented")

    raw = adata.obs[groupby]
    na = raw.isna().to_numpy()
    if na.any():
        # scanpy semantics: null-labeled cells take no part in the test
        # (they silently contaminated every group's "rest" before)
        logger.info(f"rank_genes_groups: excluding {int(na.sum()):,} "
                    f"cells with null '{groupby}'")
    labels = raw[~na].astype(str)
    all_groups = [g for g, c in labels.value_counts().items()
                  if c >= min_cells]
    if groups is not None:
        missing = [g for g in groups if g not in set(labels.unique())]
        if missing:
            raise ValueError(f"Groups not present: {missing}")
        too_small = [g for g in groups if g not in all_groups
                     and g not in missing]
        if too_small:
            raise ValueError(
                f"Requested groups below min_cells={min_cells}: "
                f"{too_small}")
        use_groups = list(groups)
    else:
        use_groups = sorted(all_groups)
    if len(use_groups) < 1 or labels.nunique() < 2:
        raise ValueError("Need ≥2 groups with enough cells for DEG")

    X = adata.X
    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X, np.float32)[~na]
    Xj = jnp.asarray(X)
    var_names = np.asarray(adata.var_names, object)
    n_top = n_genes or X.shape[1]

    from scipy.stats import norm as scipy_norm

    result = {"params": {"groupby": groupby, "reference": reference,
                         "method": method, "tie_correct": tie_correct},
              "names": {}, "scores": {}, "pvals": {}, "pvals_adj": {},
              "logfoldchanges": {}}
    masks_np = np.stack([(labels == grp).to_numpy()
                         for grp in use_groups], axis=1).astype(np.float32)
    z_all = np.asarray(_rank_stats(Xj, jnp.asarray(masks_np),
                                   tie_correct=tie_correct))   # [G, K]
    total = X.sum(axis=0)
    n_kept = X.shape[0]
    for ki, grp in enumerate(use_groups):
        mask = masks_np[:, ki].astype(bool)
        z = z_all[:, ki]
        pvals = 2.0 * scipy_norm.sf(np.abs(z))
        padj = np.asarray(apply_fdr(jnp.asarray(pvals), method="bh"))
        n1 = int(mask.sum())
        mean_in = X[mask].mean(axis=0)
        mean_out = (total - mean_in * n1) / max(n_kept - n1, 1)
        lfc = np.log2((np.expm1(mean_in) + 1e-9)
                      / (np.expm1(mean_out) + 1e-9))
        order = np.argsort(-z)[:n_top]
        result["names"][grp] = var_names[order].tolist()
        result["scores"][grp] = z[order].tolist()
        result["pvals"][grp] = pvals[order].tolist()
        result["pvals_adj"][grp] = padj[order].tolist()
        result["logfoldchanges"][grp] = lfc[order].tolist()

    adata.uns[key_added] = result
    logger.info(f"rank_genes_groups: {len(use_groups)} groups × "
                f"{X.shape[1]} genes ({time.time() - start:.1f}s)")
    update_metadata(adata, "rank_genes_groups",
                    parameters={"groupby": groupby, "method": method,
                                "n_groups": len(use_groups)},
                    outputs={"uns": key_added})
    return adata
