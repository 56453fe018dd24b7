"""Ripley's K / L and cross-type K with permutation envelopes.

BASELINE config 3 extension (not implemented in the reference — suggested in
its docs only, /root/reference/docs/spatial/spatial_stats.md "Sparse
Markers"). TPU design: a uniform-grid bucket table bounds the O(N²) pair sum
to pairs within ``r_max``; a ``lax.map`` over query tiles computes candidate
distances and accumulates per-radius counts on device. Envelopes:

- univariate K: CSR simulations (uniform points in the bounding window),
  counter-based keys, same kernel;
- cross-type K: random-labeling permutations — distances are fixed, only
  the label gathers change per draw, so each draw is one cheap pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rng import key_for


class BucketGrid(NamedTuple):
    table: jax.Array      # int32 [nb, C] cell ids (−1 pad)
    bx: jax.Array         # int32 [N] bucket x per cell
    by: jax.Array         # int32 [N]
    nbx: int
    nby: int
    window: int           # bucket-window radius covering r_max


def build_bucket_grid(coords_np: np.ndarray, r_max: float,
                      target_window: int = 2,
                      bbox=None,
                      min_capacity: int = 0) -> BucketGrid:
    """Bucket cells so a (2w+1)² window covers every pair within r_max.

    ``bbox=(mins, maxs)`` and ``min_capacity`` pin the grid geometry and the
    padded bucket capacity so repeated calls (CSR envelope simulations)
    reuse one compiled kernel instead of recompiling per table shape.
    """
    coords_np = np.asarray(coords_np, np.float32)
    n = coords_np.shape[0]
    if bbox is None:
        mins = coords_np.min(axis=0)
        maxs = coords_np.max(axis=0)
    else:
        mins, maxs = (np.asarray(b, np.float32) for b in bbox)
    span = np.maximum(maxs - mins, 1e-9)
    # bucket edge ≥ r_max / window so the window covers r_max
    edge = r_max / max(target_window, 1)
    nbx = max(1, min(int(span[0] / edge) + 1, 4096))
    nby = max(1, min(int(span[1] / edge) + 1, 4096))
    h = span / np.array([nbx, nby])
    window = int(np.ceil(r_max / min(h[0], h[1])))
    bx = np.clip((coords_np[:, 0] - mins[0]) // h[0], 0, nbx - 1).astype(np.int64)
    by = np.clip((coords_np[:, 1] - mins[1]) // h[1], 0, nby - 1).astype(np.int64)
    bucket = bx * nby + by
    order = np.argsort(bucket, kind="stable")
    counts = np.bincount(bucket[order], minlength=nbx * nby)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    C = max(int(counts.max()), 1, min_capacity)
    if min_capacity == 0:
        # round up so near-identical datasets share one compiled shape
        C = 1 << int(np.ceil(np.log2(C)))
    table = np.full((nbx * nby, C), -1, np.int32)
    pos = np.arange(n) - offsets[bucket[order]]
    table[bucket[order], pos] = order.astype(np.int32)
    return BucketGrid(jnp.asarray(table), jnp.asarray(bx.astype(np.int32)),
                      jnp.asarray(by.astype(np.int32)), nbx, nby, window)


@functools.partial(jax.jit, static_argnames=("window", "n_radii", "n_types"))
def _pair_counts(coords, table, bx, by, nbx, nby, radii_sq, type_codes,
                 window: int, n_radii: int, n_types: int,
                 tile: int = 4096):
    """Σ_{i≠j, d_ij ≤ r} per radius — overall [R] and per type pair [R,T,T].

    ``type_codes`` int32 [N] (0..n_types−1); with n_types == 1 the per-pair
    output collapses to the univariate count. Ordered pairs are counted
    (i→j and j→i), matching the K estimator's double sum.
    """
    n = coords.shape[0]
    pad = (-n) % tile
    qc = jnp.pad(coords, ((0, pad), (0, 0)), constant_values=3e18)
    qi = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, pad),
                 constant_values=-2)
    qbx = jnp.pad(bx, (0, pad), constant_values=-10 * window)
    qby = jnp.pad(by, (0, pad), constant_values=-10 * window)
    qt = jnp.pad(type_codes, (0, pad), constant_values=0)
    n_tiles = qc.shape[0] // tile

    def one_tile(args):
        q, qid, tbx, tby, qtype = args
        counts = jnp.zeros((n_radii,), jnp.float32)
        counts_t = jnp.zeros((n_radii, n_types, n_types), jnp.float32)
        for dy in range(-window, window + 1):
            for dx in range(-window, window + 1):
                gx = tbx + dx
                gy = tby + dy
                ok = (gx >= 0) & (gx < nbx) & (gy >= 0) & (gy < nby)
                b = jnp.where(ok, gx * nby + gy, 0)
                cand = table[b]                          # [T, C]
                valid = (cand >= 0) & ok[:, None] & (cand != qid[:, None])
                cc = coords[jnp.maximum(cand, 0)]
                d2 = jnp.sum((q[:, None, :] - cc) ** 2, axis=-1)
                d2 = jnp.where(valid, d2, jnp.inf)
                ct = type_codes[jnp.maximum(cand, 0)]    # [T, C]
                if n_types > 1:
                    oh_q = jax.nn.one_hot(qtype, n_types, dtype=jnp.float32)
                    oh_c = jax.nn.one_hot(ct, n_types, dtype=jnp.float32)
                for ri in range(n_radii):
                    within = d2 <= radii_sq[ri]          # [T, C]
                    counts = counts.at[ri].add(jnp.sum(within))
                    if n_types > 1:
                        # pair_sum[a,b] = Σ_t Σ_c within[t,c]·1[q_t=a]·1[c_tc=b]
                        w = within.astype(jnp.float32)
                        m = jnp.einsum("tc,tcb->tb", w, oh_c)   # [T, Tt]
                        counts_t = counts_t.at[ri].add(oh_q.T @ m)
        return counts, counts_t

    c, ct = jax.lax.map(one_tile, (qc.reshape(n_tiles, tile, 2),
                                   qi.reshape(n_tiles, tile),
                                   qbx.reshape(n_tiles, tile),
                                   qby.reshape(n_tiles, tile),
                                   qt.reshape(n_tiles, tile)))
    return c.sum(axis=0), ct.sum(axis=0)


def ripley_k(
    coords: np.ndarray,
    radii: np.ndarray,
    n_simulations: int = 0,
    seed: int = 0,
    area: Optional[float] = None,
) -> dict:
    """Univariate Ripley's K(r) (no edge correction) + CSR envelopes.

    K̂(r) = A·Σ_{i≠j} 1[d_ij ≤ r] / (n(n−1));  L(r) = sqrt(K/π).
    Envelopes simulate ``n_simulations`` uniform CSR point sets in the
    bounding box with counter-based keys.
    """
    coords = np.asarray(coords, np.float32)
    n = coords.shape[0]
    radii = np.asarray(radii, np.float32)
    r_max = float(radii.max())
    mins, maxs = coords.min(axis=0), coords.max(axis=0)
    if area is None:
        area = float(np.prod(np.maximum(maxs - mins, 1e-9)))

    # pin grid geometry + bucket capacity so every CSR simulation reuses
    # one compiled kernel (table shape would otherwise vary per draw)
    base_grid = build_bucket_grid(coords, r_max, bbox=(mins, maxs))
    capacity = int(base_grid.table.shape[1] * 2)

    def counts_for(c_np):
        grid = build_bucket_grid(c_np, r_max, bbox=(mins, maxs),
                                 min_capacity=capacity)
        c, _ = _pair_counts(
            jnp.asarray(c_np), grid.table, grid.bx, grid.by,
            grid.nbx, grid.nby, jnp.asarray(radii ** 2),
            jnp.zeros(c_np.shape[0], jnp.int32),
            window=grid.window, n_radii=len(radii), n_types=1)
        return np.asarray(c)

    k_obs = area * counts_for(coords) / (n * (n - 1))
    out = {"radii": radii, "K": k_obs,
           "L": np.sqrt(np.maximum(k_obs, 0) / np.pi)}

    if n_simulations > 0:
        sims = np.empty((n_simulations, len(radii)), np.float32)
        for s in range(n_simulations):
            key = key_for(seed, "ripley_csr", s)
            u = np.asarray(jax.random.uniform(key, (n, 2)))
            sim = (mins + u * (maxs - mins)).astype(np.float32)
            sims[s] = area * counts_for(sim) / (n * (n - 1))
        out["K_env_lo"] = np.quantile(sims, 0.025, axis=0)
        out["K_env_hi"] = np.quantile(sims, 0.975, axis=0)
        out["L_env_lo"] = np.sqrt(np.maximum(out["K_env_lo"], 0) / np.pi)
        out["L_env_hi"] = np.sqrt(np.maximum(out["K_env_hi"], 0) / np.pi)
        out["n_simulations"] = n_simulations
    return out


def co_occurrence_counts(
    coords: np.ndarray,
    type_codes: np.ndarray,
    n_types: int,
    radii: np.ndarray,
) -> np.ndarray:
    """Cumulative ordered pair counts per (radius, type_a, type_b).

    Shared kernel with cross-type K; callers turn these into conditional
    co-occurrence ratios or K estimates.
    """
    coords = np.asarray(coords, np.float32)
    radii = np.asarray(radii, np.float32)
    grid = build_bucket_grid(coords, float(radii.max()))
    _, ct = _pair_counts(
        jnp.asarray(coords), grid.table, grid.bx, grid.by, grid.nbx,
        grid.nby, jnp.asarray(radii ** 2),
        jnp.asarray(np.asarray(type_codes, np.int32)),
        window=grid.window, n_radii=len(radii), n_types=n_types)
    return np.asarray(ct)


def cross_type_k(
    coords: np.ndarray,
    type_codes: np.ndarray,
    n_types: int,
    radii: np.ndarray,
    n_permutations: int = 0,
    seed: int = 0,
    area: Optional[float] = None,
) -> dict:
    """Cross-type K_AB(r) for all type pairs + random-labeling envelopes.

    K̂_AB(r) = A·Σ_{i∈A, j∈B, i≠j} 1[d_ij ≤ r] / (n_A·n_B). The envelope
    permutes labels (positions fixed), the standard null for attraction/
    segregation between cell types.
    """
    coords = np.asarray(coords, np.float32)
    type_codes = np.asarray(type_codes, np.int32)
    radii = np.asarray(radii, np.float32)
    n = coords.shape[0]
    r_max = float(radii.max())
    mins, maxs = coords.min(axis=0), coords.max(axis=0)
    if area is None:
        area = float(np.prod(np.maximum(maxs - mins, 1e-9)))
    n_per_type = np.bincount(type_codes, minlength=n_types).astype(np.float64)
    denom = np.outer(n_per_type, n_per_type)
    np.fill_diagonal(denom, n_per_type * (n_per_type - 1))
    denom = np.maximum(denom, 1.0)

    grid = build_bucket_grid(coords, r_max)
    coords_j = jnp.asarray(coords)
    radii_sq = jnp.asarray(radii ** 2)

    def counts_for(codes_j):
        _, ct = _pair_counts(
            coords_j, grid.table, grid.bx, grid.by, grid.nbx, grid.nby,
            radii_sq, codes_j, window=grid.window,
            n_radii=len(radii), n_types=n_types)
        return np.asarray(ct)          # [R, T, T]

    k_obs = area * counts_for(jnp.asarray(type_codes)) / denom[None]
    out = {"radii": radii, "K_cross": k_obs}

    if n_permutations > 0:
        sims = np.empty((n_permutations,) + k_obs.shape, np.float32)
        for s in range(n_permutations):
            key = key_for(seed, "ripley_labelperm", s)
            perm = np.asarray(jax.random.permutation(key, n))
            sims[s] = area * counts_for(
                jnp.asarray(type_codes[perm])) / denom[None]
        out["K_cross_env_lo"] = np.quantile(sims, 0.025, axis=0)
        out["K_cross_env_hi"] = np.quantile(sims, 0.975, axis=0)
        out["n_permutations"] = n_permutations
    return out
