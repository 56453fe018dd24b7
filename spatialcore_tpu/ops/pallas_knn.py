"""Pallas TPU kernel: tiled pairwise-distance + running top-k (exact kNN).

The BASELINE's named hot kernel ("tiled Pallas pairwise-distance + top-k",
BASELINE.json north_star). Grid = (query tiles × candidate tiles); the
candidate axis is innermost so the [TQ, K] output block is revisited and
acts as the running top-k accumulator in VMEM. The merge extracts K minima
from the pooled [TQ, K + TC] distances with reductions only — argmin is
done by reducing lane iotas under an is-min mask, so no dynamic gathers
touch the kernel (TPU-friendly). Distances stay squared in-kernel.

Candidates arrive pre-transposed as [2, N] so the [1, TC] broadcast row is
a plain slice (TPU transposes inside kernels are restricted).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # python float: jnp constants would be captured consts


def _knn_kernel(n_ref, q_ref, qid_ref, cT_ref, out_d_ref, out_i_ref, *,
                k: int, tile_c: int, include_self: bool):
    j = pl.program_id(1)
    n = n_ref[0]

    @pl.when(j == 0)
    def _init():
        out_d_ref[:] = jnp.full_like(out_d_ref, _BIG)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    qx = q_ref[:, 0:1]                      # [TQ, 1]
    qy = q_ref[:, 1:2]
    cx = cT_ref[0:1, :]                     # [1, TC]
    cy = cT_ref[1:2, :]
    dist = (qx - cx) ** 2 + (qy - cy) ** 2  # [TQ, TC]

    tq = dist.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, tile_c), 1)
    cand_gid = j * tile_c + lane            # [TQ, TC]
    valid = cand_gid < n
    if not include_self:
        valid &= cand_gid != qid_ref[:]     # [TQ, 1] broadcast
    dist = jnp.where(valid, dist, _BIG)

    # pool previous best with this tile's distances
    pool_d = jnp.concatenate([out_d_ref[:], dist], axis=1)      # [TQ, K+TC]
    pool_i = jnp.concatenate([out_i_ref[:], cand_gid], axis=1)
    pool_lane = jax.lax.broadcasted_iota(jnp.int32, pool_d.shape, 1)

    for s in range(k):
        m = jnp.min(pool_d, axis=1, keepdims=True)              # [TQ, 1]
        is_min = pool_d <= m
        first = jnp.min(jnp.where(is_min, pool_lane, 2 ** 30),
                        axis=1, keepdims=True)                  # [TQ, 1]
        sel = pool_lane == first
        gid = jnp.max(jnp.where(sel, pool_i, -1), axis=1)       # [TQ]
        out_d_ref[:, s] = m[:, 0]
        out_i_ref[:, s] = gid
        pool_d = jnp.where(sel, _BIG, pool_d)


@functools.partial(jax.jit,
                   static_argnames=("k", "include_self", "tile_q", "tile_c",
                                    "interpret"))
def _pallas_knn_padded(coords, coords_T, n, k, include_self, tile_q, tile_c,
                       interpret):
    n_pad = coords.shape[0]
    grid = (n_pad // tile_q, n_pad // tile_c)
    qids = jnp.arange(n_pad, dtype=jnp.int32)[:, None]

    kernel = functools.partial(_knn_kernel, k=k, tile_c=tile_c,
                               include_self=include_self)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # n scalar
            pl.BlockSpec((tile_q, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),               # queries
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),               # query ids
            pl.BlockSpec((2, tile_c), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),               # candidates
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray([n], jnp.int32), coords, qids, coords_T)
    return out_d, out_i


def pallas_knn(
    coords,
    k: int,
    include_self: bool = False,
    tile_q: int = 256,
    tile_c: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN over all pairs; returns (indices int32[N,k], dists f32[N,k]).

    Results are sorted ascending by distance (ties broken by candidate id,
    matching a stable scan). Interpreted automatically off-TPU so the same
    tests run on the CPU mesh.
    """
    coords = np.asarray(coords, np.float32)
    n, d = coords.shape
    if d != 2:
        raise ValueError("pallas_knn supports 2D coordinates")
    if k >= n:
        raise ValueError(f"k={k} must be < n_cells={n}")
    # center for f32 conditioning, pad to tile multiples
    coords = coords - coords.mean(axis=0, keepdims=True)
    pad = (-n) % max(tile_q, tile_c)
    if pad:
        coords_p = np.vstack([coords,
                              np.full((pad, 2), 1e18, np.float32)])
    else:
        coords_p = coords
    interpret = jax.default_backend() != "tpu"
    out_d, out_i = _pallas_knn_padded(
        jnp.asarray(coords_p), jnp.asarray(coords_p.T.copy()), n, k,
        include_self, tile_q, tile_c, interpret)
    return out_i[:n], jnp.sqrt(out_d[:n])
