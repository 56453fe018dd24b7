"""Ripley's K / L and cross-type K with permutation envelopes.

BASELINE config 3 extension (not implemented in the reference — suggested in
its docs only, /root/reference/docs/spatial/spatial_stats.md "Sparse
Markers"). TPU design: a uniform-grid bucket table bounds the O(N²) pair sum
to pairs within ``r_max``; a ``lax.map`` over query tiles computes candidate
distances and accumulates per-radius counts on device.

Access-pattern rules (measured, benchmarks/probe_ripley.py):

- never gather per-candidate rows (``coords[cand]`` is a [tile·C] random
  gather of 8-byte rows — row-rate bound at ~45M rows/s, ~7 s/pass at
  500k cells). Instead pre-gather the bucket tables ONCE per pass into
  ``[nb, C, 2]`` coordinate / ``[nb, C]`` type tables and fetch whole
  bucket rows per window offset: ~25× fewer row gathers (~0.5 s/pass).
- envelope draws never touch the host: binning (sort + scatter), CSR
  uniform draws and label permutations all run on device; the per-draw
  loop costs one dispatch each.

Envelopes:

- univariate K: CSR simulations (uniform points in the bounding window),
  counter-based keys, same kernel;
- cross-type K: random-labeling permutations — distances are fixed, only
  the label table changes per draw.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rng import key_for


class GridSpec(NamedTuple):
    """Static bucket-grid geometry, shared by every pass of one analysis."""
    mins: np.ndarray      # f32 [2]
    span: np.ndarray      # f32 [2]
    nbx: int
    nby: int
    window: int           # bucket-window radius covering r_max
    capacity: int         # padded per-bucket capacity


def make_grid_spec(coords_np: np.ndarray, r_max: float,
                   target_window: int = 2,
                   bbox=None,
                   capacity_slack: float = 1.0) -> GridSpec:
    """Choose grid geometry so a (2w+1)² window covers every pair ≤ r_max.

    ``nbx = floor(span/edge)`` keeps the bucket edge ≥ r_max/target_window,
    so ``window == target_window`` exactly (a +1 here once made the edge
    epsilon-smaller than r_max/2 and silently grew the window to 3 —
    doubling the candidate work). Capacity is the observed max bucket
    count × slack, rounded to a power of two so near-identical datasets
    share one compiled kernel.
    """
    coords_np = np.asarray(coords_np, np.float32)
    if bbox is None:
        mins = coords_np.min(axis=0)
        maxs = coords_np.max(axis=0)
    else:
        mins, maxs = (np.asarray(b, np.float32) for b in bbox)
    span = np.maximum(maxs - mins, 1e-9).astype(np.float32)
    edge = r_max / max(target_window, 1)
    nbx = int(max(1, min(span[0] / edge, 4096)))
    nby = int(max(1, min(span[1] / edge, 4096)))
    h = span / np.array([nbx, nby])
    window = int(np.ceil(r_max / min(h[0], h[1]) - 1e-6))
    # observed max bucket occupancy (host side, one-time)
    bx = np.clip((coords_np[:, 0] - mins[0]) // h[0], 0, nbx - 1).astype(np.int64)
    by = np.clip((coords_np[:, 1] - mins[1]) // h[1], 0, nby - 1).astype(np.int64)
    max_count = int(np.bincount(bx * nby + by, minlength=nbx * nby).max())
    C = 1 << int(np.ceil(np.log2(max(max_count, 1) * max(capacity_slack, 1.0))))
    return GridSpec(mins=mins, span=span, nbx=nbx, nby=nby, window=window,
                    capacity=int(C))


@functools.partial(jax.jit, static_argnames=("nbx", "nby", "C"))
def _bin_points(coords, mins, span, nbx: int, nby: int, C: int):
    """Bucket-table build on device: sort by bucket id, scatter positions.

    Returns ``table int32 [nbx·nby, C]`` (−1 pad), per-point bucket coords,
    and the max bucket occupancy (overflowing points land in a discard
    column; callers must check ``max_count <= C``).
    """
    n = coords.shape[0]
    h = span / jnp.array([nbx, nby], jnp.float32)
    bx = jnp.clip(jnp.floor((coords[:, 0] - mins[0]) / h[0]).astype(jnp.int32),
                  0, nbx - 1)
    by = jnp.clip(jnp.floor((coords[:, 1] - mins[1]) / h[1]).astype(jnp.int32),
                  0, nby - 1)
    bucket = bx * nby + by
    order = jnp.argsort(bucket)
    sb = bucket[order]
    first = jnp.searchsorted(sb, sb, side="left")
    pos = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    # width C+1: overflow writes go to the sliced-off discard column
    tbl = jnp.full((nbx * nby, C + 1), -1, jnp.int32)
    tbl = tbl.at[sb, jnp.minimum(pos, C)].set(order.astype(jnp.int32))
    return tbl[:, :C], bx, by, jnp.max(pos) + 1


@functools.partial(jax.jit,
                   static_argnames=("nbx", "nby", "window", "n_radii",
                                    "n_types", "tile"))
def _pair_counts(coords, table, bx, by, radii_sq, type_codes,
                 nbx: int, nby: int, window: int, n_radii: int,
                 n_types: int, tile: int = 4096):
    """Σ_{i≠j, d_ij ≤ r} per radius — overall [R] and per type pair [R,T,T].

    ``type_codes`` int32 [N] (0..n_types−1); with n_types == 1 the per-pair
    output collapses to the univariate count. Ordered pairs are counted
    (i→j and j→i), matching the K estimator's double sum.

    The bucket tables are pre-gathered once per call (``tcoords [nb,C,2]``,
    ``ttypes [nb,C]``): every window offset then fetches whole bucket rows
    — no per-candidate gathers anywhere in the tile loop.
    """
    n = coords.shape[0]
    C = table.shape[1]
    safe = jnp.maximum(table, 0)
    # invalid slots get far-away coords so d2 = huge without extra masking
    tcoords = jnp.where((table >= 0)[:, :, None], coords[safe], 3e18)
    ttypes = type_codes[safe] if n_types > 1 else None

    pad = (-n) % tile
    qc = jnp.pad(coords, ((0, pad), (0, 0)), constant_values=3e18)
    qi = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, pad),
                 constant_values=-2)
    qbx = jnp.pad(bx, (0, pad), constant_values=-10 * (window + 1))
    qby = jnp.pad(by, (0, pad), constant_values=-10 * (window + 1))
    qt = jnp.pad(type_codes, (0, pad), constant_values=0)
    n_tiles = qc.shape[0] // tile

    def one_tile(args):
        q, qid, tbx, tby, qtype = args
        counts = jnp.zeros((n_radii,), jnp.float32)
        counts_t = jnp.zeros((n_radii, n_types, n_types), jnp.float32)
        if n_types > 1:
            oh_q = jax.nn.one_hot(qtype, n_types, dtype=jnp.float32)
        for dy in range(-window, window + 1):
            for dx in range(-window, window + 1):
                gx = tbx + dx
                gy = tby + dy
                ok = (gx >= 0) & (gx < nbx) & (gy >= 0) & (gy < nby)
                b = jnp.where(ok, gx * nby + gy, 0)
                cand = table[b]                          # [T, C] ids
                cc = tcoords[b]                          # [T, C, 2]
                d2 = jnp.sum((q[:, None, :] - cc) ** 2, axis=-1)
                bad = (~ok[:, None]) | (cand == qid[:, None]) | (cand < 0)
                d2 = jnp.where(bad, jnp.inf, d2)
                if n_types > 1:
                    oh_c = jax.nn.one_hot(ttypes[b], n_types,
                                          dtype=jnp.float32)
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


class BucketGrid(NamedTuple):
    """Back-compat host-built grid (tests/callers outside the hot paths)."""
    table: jax.Array
    bx: jax.Array
    by: jax.Array
    nbx: int
    nby: int
    window: int


def build_bucket_grid(coords_np: np.ndarray, r_max: float,
                      target_window: int = 2,
                      bbox=None,
                      min_capacity: int = 0) -> BucketGrid:
    """Bucket cells on device so a (2w+1)² window covers pairs within r_max."""
    coords_np = np.asarray(coords_np, np.float32)
    spec = make_grid_spec(coords_np, r_max, target_window=target_window,
                          bbox=bbox)
    C = max(spec.capacity, min_capacity)
    table, bx, by, mc = _bin_points(
        jnp.asarray(coords_np), jnp.asarray(spec.mins),
        jnp.asarray(spec.span), spec.nbx, spec.nby, C)
    if int(mc) > C:
        raise ValueError(
            f"bucket capacity overflow: max occupancy {int(mc)} > {C}")
    return BucketGrid(table, bx, by, spec.nbx, spec.nby, spec.window)


def _counts_pass(coords_j, spec: GridSpec, radii_sq_j, codes_j, n_types,
                 mins_j, span_j):
    """One full pass: device binning + pair counts. Returns device arrays."""
    table, bx, by, mc = _bin_points(coords_j, mins_j, span_j,
                                    spec.nbx, spec.nby, spec.capacity)
    c, ct = _pair_counts(coords_j, table, bx, by, radii_sq_j, codes_j,
                         nbx=spec.nbx, nby=spec.nby, window=spec.window,
                         n_radii=radii_sq_j.shape[0], n_types=n_types)
    return c, ct, mc


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
    bounding box with counter-based keys; every draw (uniform sample,
    binning, pair counting) runs on device.
    """
    coords = np.asarray(coords, np.float32)
    n = coords.shape[0]
    radii = np.asarray(radii, np.float32)
    r_max = float(radii.max())
    mins, maxs = coords.min(axis=0), coords.max(axis=0)
    if area is None:
        area = float(np.prod(np.maximum(maxs - mins, 1e-9)))

    # capacity slack 2× the observed max: covers CSR draws (uniform
    # occupancy tails are far below clustered observed data + slack)
    spec = make_grid_spec(coords, r_max, bbox=(mins, maxs),
                          capacity_slack=2.0)
    mins_j = jnp.asarray(spec.mins)
    span_j = jnp.asarray(spec.span)
    radii_sq_j = jnp.asarray(radii ** 2)
    codes0 = jnp.zeros(n, jnp.int32)
    norm = area / (n * (n - 1))

    coords_j = jnp.asarray(coords)
    c, _, mc = _counts_pass(coords_j, spec, radii_sq_j, codes0, 1,
                            mins_j, span_j)
    if int(mc) > spec.capacity:
        raise ValueError(
            f"bucket capacity overflow: {int(mc)} > {spec.capacity}")
    k_obs = norm * np.asarray(c)
    out = {"radii": radii, "K": k_obs,
           "L": np.sqrt(np.maximum(k_obs, 0) / np.pi)}

    if n_simulations > 0:
        span_full = jnp.asarray((maxs - mins).astype(np.float32))
        mins_full = jnp.asarray(mins)
        sims = np.empty((n_simulations, len(radii)), np.float32)
        overflow = []
        for s in range(n_simulations):
            key = key_for(seed, "ripley_csr", s)
            sim = mins_full + jax.random.uniform(key, (n, 2)) * span_full
            c, _, mc = _counts_pass(sim, spec, radii_sq_j, codes0, 1,
                                    mins_j, span_j)
            sims[s] = norm * np.asarray(c)
            overflow.append(mc)
        bad = max(int(m) for m in overflow)
        if bad > spec.capacity:   # pragma: no cover - slack makes this rare
            raise ValueError(
                f"CSR simulation bucket overflow: {bad} > {spec.capacity}; "
                "re-run with a larger capacity_slack")
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
    spec = make_grid_spec(coords, float(radii.max()))
    _, ct, mc = _counts_pass(
        jnp.asarray(coords), spec, jnp.asarray(radii ** 2),
        jnp.asarray(np.asarray(type_codes, np.int32)), n_types,
        jnp.asarray(spec.mins), jnp.asarray(spec.span))
    if int(mc) > spec.capacity:
        raise ValueError(
            f"bucket capacity overflow: {int(mc)} > {spec.capacity}")
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
    permutes labels (positions fixed — binning happens once; each draw is
    one on-device label shuffle + counting pass), the standard null for
    attraction/segregation between cell types.
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

    spec = make_grid_spec(coords, r_max, bbox=(mins, maxs))
    mins_j = jnp.asarray(spec.mins)
    span_j = jnp.asarray(spec.span)
    coords_j = jnp.asarray(coords)
    radii_sq_j = jnp.asarray(radii ** 2)
    codes_j = jnp.asarray(type_codes)

    # positions are fixed: bin once, count many
    table, bx, by, mc = _bin_points(coords_j, mins_j, span_j,
                                    spec.nbx, spec.nby, spec.capacity)
    if int(mc) > spec.capacity:
        raise ValueError(
            f"bucket capacity overflow: {int(mc)} > {spec.capacity}")

    def counts_for(codes):
        _, ct = _pair_counts(coords_j, table, bx, by, radii_sq_j, codes,
                             nbx=spec.nbx, nby=spec.nby, window=spec.window,
                             n_radii=len(radii), n_types=n_types)
        return np.asarray(ct)          # [R, T, T]

    k_obs = area * counts_for(codes_j) / denom[None]
    out = {"radii": radii, "K_cross": k_obs}

    if n_permutations > 0:
        sims = np.empty((n_permutations,) + k_obs.shape, np.float32)
        for s in range(n_permutations):
            key = key_for(seed, "ripley_labelperm", s)
            sims[s] = area * counts_for(
                codes_j[jax.random.permutation(key, n)]) / denom[None]
        out["K_cross_env_lo"] = np.quantile(sims, 0.025, axis=0)
        out["K_cross_env_hi"] = np.quantile(sims, 0.975, axis=0)
        out["n_permutations"] = n_permutations
    return out
