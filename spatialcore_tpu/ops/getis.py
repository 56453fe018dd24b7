"""Getis-Ord Gi/Gi* hot-spot statistics (Ord & Getis 1995).

Neither the reference nor squidpy implements Gi*; it is the standard
local hot-spot z-score (esda ``G_Local`` is the ecosystem analog) and
rides the same fixed-degree graph substrate as the other local
statistics here (ops/graph.py). Conventions follow Ord & Getis (1995)
with binary weights over the k nearest neighbors:

    Gi*_i: star variant, self included with weight 1
        z_i = (Σ_j w_ij x_j − x̄ W_i) / (s √[(n S1_i − W_i²)/(n−1)])
    with x̄, s over all n observations, W_i = Σ_j w_ij, S1_i = Σ_j w_ij².

    Gi (self excluded): the same form with x̄_(i), s_(i) computed over the
    n−1 observations j≠i and n replaced by n−1.

Gi*/Gi z-scores are invariant to uniform per-row weight scaling, so the
binary formulation here matches a row-standardized one exactly for
fixed-degree rows; results are comparable with esda's binary-weight
``G_Local(star=True)``.

Permutation nulls shuffle whole value columns (one shared shuffle per
draw across genes), matching :func:`ops.moran.local_moran`'s convention;
the analytic normal p-values are the common usage and the default.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.rng import key_for
from .graph import SpatialGraph


class GetisOrdResult(NamedTuple):
    G: jax.Array        # [N, G] raw Gi(*) ratio statistic
    z_score: jax.Array  # [N, G] analytic z under randomization
    p_value: jax.Array  # [N, G] analytic normal p (per ``alternative``)
    p_sim: jax.Array    # [N, G] permutation p ((#extreme+1)/(P+1), per
                        # ``alternative``); ones if P=0


def _binary_lag(graph: SpatialGraph, X: jax.Array) -> jax.Array:
    """Σ_{j∈N(i)} x_j — unweighted neighbor sum (masked invalid slots)."""
    k = graph.neighbor_idx.shape[1]
    sequence = X.shape[0] * X.shape[1] > 50_000_000
    lag = jnp.zeros_like(X)
    for j in range(k):
        contrib = jnp.where(graph.valid[:, j:j + 1],
                            X[graph.neighbor_idx[:, j]], 0.0)
        lag = lag + contrib
        if sequence:
            lag = jax.lax.optimization_barrier(lag)
    return lag


@functools.partial(jax.jit, static_argnames=("star", "alternative",
                                             "n_permutations"))
def getis_ord(
    graph: SpatialGraph,
    X: jax.Array,
    star: bool = True,
    alternative: str = "two-sided",
    seed: int = 0,
    n_permutations: int = 0,
) -> GetisOrdResult:
    """Gi*/Gi per cell × gene on RAW values ``X`` [N, G] (not z-scored)."""
    if alternative not in ("two-sided", "greater", "less"):
        raise ValueError("alternative must be 'two-sided', 'greater' or "
                         f"'less', got {alternative!r}")
    X = jnp.asarray(X)
    if X.ndim == 1:
        X = X[:, None]
    if X.dtype not in (jnp.float32, jnp.float64):
        X = X.astype(jnp.float32)
    n = X.shape[0]
    deg = jnp.sum(graph.valid, axis=1).astype(X.dtype)       # [N]

    def stat(Xv):
        lag = _binary_lag(graph, Xv)
        if star:
            lag_s = lag + Xv
            W = deg + 1.0
            m = n
            xbar = jnp.mean(Xv, axis=0, keepdims=True)       # [1, G]
            s2 = jnp.mean(Xv * Xv, axis=0, keepdims=True) - xbar ** 2
        else:
            lag_s = lag
            W = deg
            m = n - 1
            tot = jnp.sum(Xv, axis=0, keepdims=True)
            xbar = (tot - Xv) / m                            # [N, G] x̄_(i)
            sq = jnp.sum(Xv * Xv, axis=0, keepdims=True)
            s2 = (sq - Xv * Xv) / m - xbar ** 2
        s2 = jnp.maximum(s2, 0.0)
        s = jnp.sqrt(jnp.where(s2 > 0, s2, 1.0))
        S1 = W                                               # binary: Σw² = W
        denom_i = jnp.sqrt(jnp.maximum(
            (m * S1 - W ** 2) / jnp.maximum(m - 1.0, 1.0), 0.0))
        z = (lag_s - xbar * W[:, None]) / (s * denom_i[:, None])
        # raw G ratio: Σ_j w_ij x_j / Σ_j x_j (star: totals include i)
        tot_all = jnp.sum(Xv, axis=0, keepdims=True)
        gden = tot_all if star else tot_all - Xv
        G = lag_s / jnp.where(gden != 0, gden, 1.0)
        return G, z, lag_s

    G, z, lag_obs = stat(X)
    if alternative == "two-sided":
        p = 2.0 * jax.scipy.stats.norm.sf(jnp.abs(z))
    elif alternative == "greater":
        p = jax.scipy.stats.norm.sf(z)
    else:
        p = jax.scipy.stats.norm.cdf(z)

    if n_permutations == 0:
        return GetisOrdResult(G, z, p, jnp.ones_like(p))

    base = key_for(seed, "perm_getis", 0)

    def body(count, step):
        key = jax.random.fold_in(base, step)
        perm = jax.random.permutation(key, n)
        _, zp, _ = stat(X[perm])
        # extremeness matches `alternative` so p_sim and the analytic p
        # answer the same hypothesis (advisor finding, round 2)
        if alternative == "greater":
            extreme = zp >= z
        elif alternative == "less":
            extreme = zp <= z
        else:
            extreme = jnp.abs(zp) >= jnp.abs(z)
        return count + extreme.astype(jnp.int32), None

    count, _ = jax.lax.scan(body, jnp.zeros_like(z, jnp.int32),
                            jnp.arange(n_permutations))
    p_sim = (count + 1.0) / (n_permutations + 1.0)
    return GetisOrdResult(G, z, p, p_sim)
