"""Multiple-testing corrections, scipy-free and jit-friendly.

Parity with the reference's Benjamini-Hochberg (monotonicity via reversed
cumulative minimum) and Bonferroni
(/root/reference/src/spatialcore/spatial/autocorrelation.py:132-211).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def benjamini_hochberg(p_values: jax.Array, axis: int = 0) -> jax.Array:
    """BH-adjusted p-values along ``axis`` (vectorized over other axes)."""
    p = jnp.asarray(p_values, jnp.float32)
    p = jnp.moveaxis(p, axis, -1)
    m = p.shape[-1]
    order = jnp.argsort(p, axis=-1)
    p_sorted = jnp.take_along_axis(p, order, axis=-1)
    ranks = jnp.arange(1, m + 1, dtype=jnp.float32)
    scaled = p_sorted * m / ranks
    # enforce monotonicity: reversed cumulative min
    adj = jnp.flip(jax.lax.cummin(jnp.flip(scaled, axis=-1), axis=p.ndim - 1),
                   axis=-1)
    adj = jnp.minimum(adj, 1.0)
    # undo sort
    inv = jnp.argsort(order, axis=-1)
    adj = jnp.take_along_axis(adj, inv, axis=-1)
    return jnp.moveaxis(adj, -1, axis)


def bonferroni(p_values: jax.Array, axis: int = 0) -> jax.Array:
    m = p_values.shape[axis]
    return jnp.minimum(jnp.asarray(p_values, jnp.float32) * m, 1.0)


def apply_fdr(p_values: jax.Array, method: str = "fdr_bh", axis: int = 0) -> jax.Array:
    """Dispatch: 'fdr_bh' | 'bonferroni' | 'none'."""
    if method in ("fdr_bh", "bh"):
        return benjamini_hochberg(p_values, axis=axis)
    if method == "bonferroni":
        return bonferroni(p_values, axis=axis)
    if method in ("none", None):
        return jnp.asarray(p_values, jnp.float32)
    raise ValueError(f"Unknown FDR method '{method}' "
                     "(expected 'fdr_bh', 'bonferroni', or 'none')")
