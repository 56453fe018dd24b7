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
def _ranksum_z(X, in_group, tie_correct: bool = False):
    """Wilcoxon rank-sum z per gene (columns of X) for in-group vs rest."""
    n, g = X.shape
    n1 = jnp.sum(in_group.astype(jnp.float32))
    n2 = n - n1

    def one_gene(x):
        order = jnp.argsort(x)
        sx = x[order]
        pos = jnp.arange(1, n + 1, dtype=jnp.float32)
        new_run = jnp.concatenate([jnp.ones((1,), bool), sx[1:] != sx[:-1]])
        run_id = jnp.cumsum(new_run) - 1
        sum_pos = jax.ops.segment_sum(pos, run_id, num_segments=n)
        cnt = jax.ops.segment_sum(jnp.ones_like(pos), run_id, num_segments=n)
        avg = sum_pos / jnp.maximum(cnt, 1.0)
        ranks_sorted = avg[run_id]
        rank_sum_in = jnp.sum(
            jnp.where(in_group[order], ranks_sorted, 0.0))
        expected = n1 * (n + 1) / 2.0
        if tie_correct:
            tie_term = jnp.sum(cnt ** 3 - cnt) / (n * (n - 1.0))
            var = n1 * n2 / 12.0 * ((n + 1.0) - tie_term)
        else:
            var = n1 * n2 * (n + 1.0) / 12.0
        return (rank_sum_in - expected) / jnp.sqrt(jnp.maximum(var, 1e-9))

    return jax.lax.map(one_gene, X.T)


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

    labels = adata.obs[groupby].astype(str)
    all_groups = [g for g, c in labels.value_counts().items()
                  if c >= min_cells]
    if groups is not None:
        missing = [g for g in groups if g not in set(labels.unique())]
        if missing:
            raise ValueError(f"Groups not present: {missing}")
        use_groups = [g for g in groups if g in all_groups]
    else:
        use_groups = sorted(all_groups)
    if len(use_groups) < 1 or labels.nunique() < 2:
        raise ValueError("Need ≥2 groups with enough cells for DEG")

    X = adata.X
    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X, np.float32)
    Xj = jnp.asarray(X)
    var_names = np.asarray(adata.var_names, object)
    n_top = n_genes or X.shape[1]

    from scipy.stats import norm as scipy_norm

    result = {"params": {"groupby": groupby, "reference": reference,
                         "method": method, "tie_correct": tie_correct},
              "names": {}, "scores": {}, "pvals": {}, "pvals_adj": {},
              "logfoldchanges": {}}
    for grp in use_groups:
        mask = (labels == grp).to_numpy()
        z = np.asarray(_ranksum_z(Xj, jnp.asarray(mask),
                                  tie_correct=tie_correct))
        pvals = 2.0 * scipy_norm.sf(np.abs(z))
        padj = np.asarray(apply_fdr(jnp.asarray(pvals), method="bh"))
        mean_in = X[mask].mean(axis=0)
        mean_out = X[~mask].mean(axis=0)
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
