"""Multiple-testing corrections, scipy-free and jit-friendly.

Parity with the reference's Benjamini-Hochberg (monotonicity via reversed
cumulative minimum) and Bonferroni
(/root/reference/src/spatialcore/spatial/autocorrelation.py:132-211).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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


def benjamini_hochberg_discrete(p_values: jax.Array, n_levels: int,
                                axis: int = 0) -> jax.Array:
    """BH for p-values on the grid ``{(c+1)/n_levels : c = 0..n_levels-1}``.

    Permutation p-values are exactly this grid ((count+1)/(P+1)), which
    makes the sort in :func:`benjamini_hochberg` pure waste: ranks follow
    from per-level COUNTS. One counting pass + an [n_levels] suffix-min
    table replaces two million-row sorts and their unsort gathers — at
    1M cells x 512 genes the sort path moves ~100x the bytes.

    Bitwise-equal to :func:`benjamini_hochberg` on grid inputs:

    * the candidate at level ``l`` uses the same f32 expression
      ``(p*m)/rank`` with rank = the level's cumulative count — exactly
      the value the reversed cummin keeps for a tie block (its largest
      rank; mid-block ranks give strictly larger candidates);
    * ``p`` is the STORED f32 value at that level (segment-min over the
      level's members), not ``(l+1)/n_levels`` recomputed — callers
      produce the grid through differing f32 expressions (e.g. the
      two-sided ``2*min(lo,hi)`` doubling) that land 1 ulp off the
      direct division, and within one call equal counts always yield
      identical bits, so the representative is exact;
    * an EMPTY level's representative is ``+inf``, inert in the suffix
      min — exactly the sort path, where absent values contribute no
      candidate;
    * ranks are exact in f32 for m < 2^24, same as the sort path's
      ``arange``.
    """
    p = jnp.asarray(p_values, jnp.float32)
    pm = jnp.moveaxis(p, axis, 0)
    m = pm.shape[0]
    rest = pm.shape[1:]
    R = int(np.prod(rest)) if rest else 1
    pmf = pm.reshape(m, R)
    lev = jnp.clip(jnp.round(pmf * n_levels).astype(jnp.int32) - 1,
                   0, n_levels - 1)
    # LEVEL-BLOCKED histogram + LUT apply: per-element scatter/gather on
    # TPU runs issue-bound (~40 M updates/s — 12.8 s for the [1M, 512]
    # plane at P=1000, measured round 5, same class as the per-level
    # lax.map it replaced), while compare+reduce over a virtual
    # [Lb, m, R] block fuses into vector passes. Counts/min-reps are the
    # same exact quantities, and the apply step exploits that ``adj`` is
    # NON-DECREASING in level (a suffix min over a shrinking suffix), so
    # ``adj[lev]`` == max over l <= lev of adj[l] — bitwise-equal to the
    # take_along_axis lookup.
    Lb = 32
    n_blk = -(-n_levels // Lb)
    pad_L = n_blk * Lb
    blocks = jnp.arange(pad_L, dtype=jnp.int32).reshape(n_blk, Lb)

    def hist_step(_, blk):
        hit = lev[None, :, :] == blk[:, None, None]       # fused virtual
        cnt_b = jnp.sum(hit, axis=1, dtype=jnp.int32)     # [Lb, R]
        rep_b = jnp.min(jnp.where(hit, pmf[None], jnp.inf), axis=1)
        return None, (cnt_b, rep_b)

    _, (cnt, rep) = jax.lax.scan(hist_step, None, blocks)
    cnt = cnt.reshape(pad_L, R)[:n_levels]
    rep = rep.reshape(pad_L, R)[:n_levels]
    ranks = jnp.cumsum(cnt, axis=0).astype(jnp.float32)
    cand = rep * m / ranks            # empty level -> +inf, inert
    adj = jnp.minimum(
        jnp.flip(jax.lax.cummin(jnp.flip(cand, 0), axis=0), 0), 1.0)
    # padded levels carry adj 0 and block ids >= n_levels > every lev, so
    # they never win the max below
    adj_pad = jnp.pad(adj, ((0, pad_L - n_levels), (0, 0)))
    adj_blk = adj_pad.reshape(n_blk, Lb, R)

    def apply_step(acc, args):
        blk, adj_b = args
        contrib = jnp.max(
            jnp.where(blk[:, None, None] <= lev[None, :, :],
                      adj_b[:, None, :], 0.0), axis=0)
        return jnp.maximum(acc, contrib), None

    out, _ = jax.lax.scan(apply_step, jnp.zeros((m, R), jnp.float32),
                          (blocks, adj_blk))
    return jnp.moveaxis(out.reshape((m,) + rest), 0, axis)


def bonferroni(p_values: jax.Array, axis: int = 0) -> jax.Array:
    m = p_values.shape[axis]
    return jnp.minimum(jnp.asarray(p_values, jnp.float32) * m, 1.0)


def apply_fdr(p_values: jax.Array, method: str = "fdr_bh", axis: int = 0,
              n_levels: int = 0) -> jax.Array:
    """Dispatch: 'fdr_bh' | 'bonferroni' | 'none'.

    ``n_levels > 0`` asserts the p-values lie on the discrete grid
    ``(c+1)/n_levels`` (true for every permutation p in this package)
    and routes BH through the sort-free
    :func:`benjamini_hochberg_discrete`.
    """
    if method in ("fdr_bh", "bh"):
        if n_levels:
            return benjamini_hochberg_discrete(p_values, n_levels,
                                               axis=axis)
        return benjamini_hochberg(p_values, axis=axis)
    if method == "bonferroni":
        return bonferroni(p_values, axis=axis)
    if method in ("none", None):
        return jnp.asarray(p_values, jnp.float32)
    raise ValueError(f"Unknown FDR method '{method}' "
                     "(expected 'fdr_bh', 'bonferroni', or 'none')")
