"""Lee's L bivariate spatial-association kernels.

Estimator conventions follow the reference's core
(/root/reference/src/spatialcore/spatial/autocorrelation.py:273-334):
    lag   = W @ z_y            (z population-standardized)
    L_i   = z_{x,i} · lag_i
    L     = Σ_i L_i            (reference's un-normalized global sum)
    p     : shuffle z_y only; two-tailed (#{|L_perm| ≥ |L|} + 1)/(P + 1)
Permutations are counter-based and run as a scanned vmap on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.rng import key_for
from .graph import SpatialGraph, spatial_lag


class LeesLResult(NamedTuple):
    L_local: jax.Array      # [N, P?] local values
    L_global: jax.Array     # scalar (or [pairs])
    lag_zy: jax.Array
    p_global: jax.Array
    p_local: jax.Array      # ones unless requested


@functools.partial(jax.jit, static_argnames=("n_permutations", "chunk",
                                             "compute_cell_pvalues"))
def lees_l_pairs(
    graph: SpatialGraph,
    Zx: jax.Array,           # [N, P] standardized gene-x columns per pair
    Zy: jax.Array,           # [N, P]
    seed: int,
    n_permutations: int = 0,
    compute_cell_pvalues: bool = False,
    chunk: int = 16,
) -> LeesLResult:
    """Lee's L for P gene pairs at once (vectorized over the pair axis).

    ``chunk`` is accepted for API compatibility but ignored: each draw is
    one scan step so peak memory stays O(N·P).
    """
    del chunk
    lag = spatial_lag(graph, Zy)
    L_local = Zx * lag
    L_global = jnp.sum(L_local, axis=0)

    if n_permutations == 0:
        ones_local = jnp.ones_like(L_local)
        return LeesLResult(L_local, L_global, lag, jnp.ones_like(L_global),
                           ones_local)

    n = Zx.shape[0]
    abs_g = jnp.abs(L_global)
    abs_l = jnp.abs(L_local)
    base = key_for(seed, "perm_lee", 0)

    def body(carry, p):
        count_g, count_l = carry
        key = jax.random.fold_in(base, p)
        perm = jax.random.permutation(key, n)
        lag_p = spatial_lag(graph, Zy[perm])
        Lp_local = Zx * lag_p
        Lp = jnp.sum(Lp_local, axis=0)
        count_g = count_g + (jnp.abs(Lp) >= abs_g).astype(jnp.int32)
        if compute_cell_pvalues:
            count_l = count_l + (jnp.abs(Lp_local) >= abs_l).astype(jnp.int32)
        return (count_g, count_l), None

    init = (jnp.zeros_like(L_global, dtype=jnp.int32),
            jnp.zeros(L_local.shape, dtype=jnp.int32))
    (count_g, count_l), _ = jax.lax.scan(body, init,
                                         jnp.arange(n_permutations))
    P = n_permutations
    p_g = (count_g + 1.0) / (P + 1.0)
    p_l = ((count_l + 1.0) / (P + 1.0)) if compute_cell_pvalues \
        else jnp.ones_like(L_local)
    return LeesLResult(L_local, L_global, lag, p_g, p_l)
