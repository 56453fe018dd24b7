"""Sharded spatial statistics: the multi-chip entry points.

Gene-sharded execution of the autocorrelation kernels: ``Z`` is placed with
its gene axis split across the mesh's ``genes`` axis, the fixed-degree graph
is replicated, and the exact single-device kernels from ``ops.moran`` run
under ``jit`` — XLA keeps every permutation draw local to its gene shard
(no collectives in the hot loop) and the counter-based keys make results
bitwise identical to the single-device run. This is the design SURVEY.md
§2.9 calls for in place of the reference's Python batching.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh

from ..ops.graph import SpatialGraph
from ..ops.moran import (
    local_moran, moran_observed, permutation_test_global, standardize)
from .mesh import gene_sharding, replicated


def _place(graph: SpatialGraph, X: jax.Array, mesh: Mesh):
    """Device placement: graph replicated, X gene-sharded."""
    rep = replicated(mesh)
    gs = gene_sharding(mesh, ndim=2)
    graph = SpatialGraph(
        neighbor_idx=jax.device_put(graph.neighbor_idx, rep),
        neighbor_w=jax.device_put(graph.neighbor_w, rep),
        valid=jax.device_put(graph.valid, rep),
        distances=jax.device_put(graph.distances, rep))
    return graph, jax.device_put(X, gs)


def sharded_moran(
    graph: SpatialGraph,
    X: jax.Array,
    S0: float,
    mesh: Mesh,
) -> jax.Array:
    """Global Moran's I per gene, gene-sharded over the mesh."""
    graph, X = _place(graph, X, mesh)
    with mesh:
        Z, _ = jax.jit(standardize)(X)
        return jax.jit(moran_observed, static_argnames=())(graph, Z, S0)


def sharded_permutation_test(
    graph: SpatialGraph,
    X: jax.Array,
    S0: float,
    seed: int,
    n_permutations: int,
    mesh: Mesh,
    stat: str = "moran",
    alternative: str = "greater",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(p, null_mean, null_std) per gene; draws shard-local per gene shard.

    Bitwise equal to the single-device kernel: the permutation for draw p is
    keyed by (seed, draw) only, so every shard applies the same shuffle to
    its own gene columns.
    """
    graph, X = _place(graph, X, mesh)
    with mesh:
        Z, _ = jax.jit(standardize)(X)
        observed = moran_observed(graph, Z, S0)
        return permutation_test_global(
            graph, Z, S0, observed, seed=seed,
            n_permutations=n_permutations, stat=stat,
            alternative=alternative)


def sharded_lees_l(
    graph: SpatialGraph,
    Zx: jax.Array,
    Zy: jax.Array,
    seed: int,
    n_permutations: int,
    mesh: Mesh,
    compute_cell_pvalues: bool = False,
):
    """Lee's L for many gene pairs, pair-axis sharded over the mesh.

    ``Zx``/``Zy`` are [N, P] standardized pair columns; the pair axis maps
    onto the mesh's ``genes`` axis (each draw's shuffle is shared across
    pairs via counter-based keys, so shards never communicate).
    """
    from ..ops.lee import lees_l_pairs

    rep = replicated(mesh)
    gs = gene_sharding(mesh, ndim=2)
    graph = SpatialGraph(
        neighbor_idx=jax.device_put(graph.neighbor_idx, rep),
        neighbor_w=jax.device_put(graph.neighbor_w, rep),
        valid=jax.device_put(graph.valid, rep),
        distances=jax.device_put(graph.distances, rep))
    Zx = jax.device_put(Zx, gs)
    Zy = jax.device_put(Zy, gs)
    with mesh:
        return lees_l_pairs(graph, Zx, Zy, seed=seed,
                            n_permutations=n_permutations,
                            compute_cell_pvalues=compute_cell_pvalues)


def sharded_local_moran(
    graph: SpatialGraph,
    X: jax.Array,
    seed: int,
    n_permutations: int,
    mesh: Mesh,
):
    """LISA with permutation p-values, gene-sharded; [N, G] outputs keep
    the gene axis sharded."""
    graph, X = _place(graph, X, mesh)
    with mesh:
        Z, _ = jax.jit(standardize)(X)
        return local_moran(graph, Z, seed=seed,
                           n_permutations=n_permutations)
