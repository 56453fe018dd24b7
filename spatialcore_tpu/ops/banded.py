"""Banded permutation-null kernel: MXU-friendly global autocorrelation nulls.

Round-1 analysis (docs/performance.md) showed the permutation loop pinned at
XLA's ~150 GB/s random-row-gather ceiling: 7 gathers of [N, G] per draw.
This module changes the access pattern instead of the gather implementation:

1. Relabel cells along a Hilbert space-filling curve (or Cuthill-McKee on the
   graph when no coordinates exist). kNN edges become near-diagonal: for a
   halo H, all but a small fraction of edges satisfy |i' − j'| ≤ H.
2. Per permutation draw, the only random-access step left is ONE row gather
   ``Zp = Z_r[perm]`` (the permuted values have no locality by construction —
   measured in round 1, spatial sorting cannot help *that* gather).
3. The quadratic form Σ_e w_e·Zp[i_e]·Zp[j_e] is evaluated block-by-block:
   each block of B rows sees a VMEM-sized window of W = B + 2H rows of Zp,
   the in-window adjacency is expanded to a dense [B, W] band (built on the
   fly from compare-with-iota — cheaper than reading a stored band), and the
   spatial lag becomes a dense [B, W] @ [W, G] matmul on the MXU. Sparse W
   as dense banded matmul trades ~W/k× redundant FLOPs (nearly free on the
   MXU in bf16) for sequential HBM traffic.
4. The few out-of-band edges are handled exactly through a compacted,
   zero-padded edge list with plain gathers.

Geary's C rides the same kernel: Σ w (a−b)² = Σ (r_i+c_i)·zp_i² − 2·cross,
with row/col weight sums precomputed (permutation-invariant structure).

Replaces the hot loop of the reference's squidpy delegation
(/root/reference/src/spatialcore/spatial/autocorrelation.py:563-583) at
1M-cell scale. Estimator conventions identical to ops/moran.py; permutation
draws use the SAME counter-based keys as ``permutation_test_global`` (purpose
"perm_global"), so for a given (seed, draw) both paths shuffle identically
and differ only in floating-point summation order.

Determinism: block size B and halo H are fixed at plan-build time and baked
into the compiled program; summation order is independent of device count
(gene sharding splits columns only), per CLAUDE.md's bitwise rule.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..core.rng import key_for
from .graph import SpatialGraph

logger = get_logger("ops.banded")


# ---------------------------------------------------------------------------
# Orderings
# ---------------------------------------------------------------------------


def hilbert_order(coords: np.ndarray, bits: int = 16) -> np.ndarray:
    """Cell ordering along a Hilbert curve (vectorized xy2d, 2D only).

    Returns ``order`` such that ``coords[order]`` walks the curve. Ties
    (same grid cell) break by original index (stable argsort) — the
    ordering is a pure function of the coordinates.
    """
    coords = np.asarray(coords, np.float64)
    if coords.ndim != 2 or coords.shape[1] != 2:
        raise ValueError("hilbert_order requires [N, 2] coordinates")
    mins = coords.min(axis=0)
    span = np.maximum(coords.max(axis=0) - mins, 1e-12)
    side = (1 << bits) - 1
    x = np.minimum((coords[:, 0] - mins[0]) / span[0] * (side + 1), side)
    y = np.minimum((coords[:, 1] - mins[1]) / span[1] * (side + 1), side)
    x = x.astype(np.uint64)
    y = y.astype(np.uint64)
    d = np.zeros(coords.shape[0], np.uint64)
    s = np.uint64(1) << np.uint64(bits - 1)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return np.argsort(d, kind="stable").astype(np.int32)


def graph_order(graph: SpatialGraph) -> np.ndarray:
    """Bandwidth-minimizing order from the graph alone (reverse Cuthill-McKee).

    Fallback when no 2D coordinates are available (e.g. precomputed graphs).
    """
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    csr = graph.to_csr()
    sym = csr + csr.T
    return np.asarray(reverse_cuthill_mckee(sym.tocsr(), symmetric_mode=True),
                      np.int32)


# ---------------------------------------------------------------------------
# Plan
# ---------------------------------------------------------------------------


class NullPlan(NamedTuple):
    """Relabeled, band-split graph structure for the banded null kernel.

    All index arrays live in *padded new-order* coordinates: new position p
    maps to padded row p + halo of the gathered ``Zp_pad`` buffer.
    """

    order: jax.Array        # int32 [N] — original index at each new position
    local_idx: jax.Array    # int32 [Npad, k] — window-relative neighbor pos
    w_local: jax.Array      # f32 [Npad, k] — weight (0 where far/invalid/pad)
    far_src: jax.Array      # int32 [F] — padded-coords row of far-edge source
    far_dst: jax.Array      # int32 [F]
    far_w: jax.Array        # f32 [F] (0 = padding)
    rc_sum: jax.Array       # f32 [Npad] — row+col weight sums (Geary terms)
    block: int              # B (static)
    halo: int               # H (static)
    n: int                  # true cell count (static)

    @property
    def n_padded(self) -> int:
        return self.local_idx.shape[0]


_HALO_LADDER = (128, 256, 512, 1024, 2048)


def build_null_plan(
    graph: SpatialGraph,
    coords: Optional[np.ndarray] = None,
    block: int = 512,
    halo: Optional[int] = None,
    max_far_frac: float = 0.02,
) -> NullPlan:
    """Host-side prep: relabel, split edges into band vs far list.

    ``halo=None`` walks a fixed ladder (128…2048) and stops at the first
    halo keeping the far-edge fraction under ``max_far_frac`` — each halo
    value compiles its own kernel, so the ladder is coarse on purpose.
    """
    idx = np.asarray(graph.neighbor_idx)
    w = np.asarray(graph.neighbor_w, np.float32)
    n, k = idx.shape
    if coords is not None and np.asarray(coords).shape[1] == 2:
        order = hilbert_order(np.asarray(coords))
    else:
        order = graph_order(graph)
    rank = np.empty(n, np.int32)
    rank[order] = np.arange(n, dtype=np.int32)

    idx_r = rank[idx[order]]            # [N, k] neighbor new-positions
    w_r = w[order]                      # [N, k]
    rows = np.arange(n, dtype=np.int64)[:, None]
    halos = (halo,) if halo is not None else _HALO_LADDER
    chosen = halos[-1]
    for h in halos:
        width = block + 2 * h
        ws = (rows // block) * block - h
        rel = idx_r.astype(np.int64) - ws
        inwin = (rel >= 0) & (rel < width) & (w_r > 0)
        far_frac = 1.0 - (inwin.sum() / max((w_r > 0).sum(), 1))
        chosen = h
        if far_frac <= max_far_frac:
            break
    h = chosen
    width = block + 2 * h
    ws = (rows // block) * block - h
    rel = idx_r.astype(np.int64) - ws
    valid = w_r > 0
    inwin = (rel >= 0) & (rel < width) & valid
    far = valid & ~inwin
    n_far = int(far.sum())
    logger.info(
        f"null plan: N={n:,} k={k} block={block} halo={h} "
        f"far_edges={n_far:,} ({n_far / max(valid.sum(), 1):.2%})")

    local_idx = np.where(inwin, rel, 0).astype(np.int32)
    w_local = np.where(inwin, w_r, 0.0).astype(np.float32)

    # far list in padded coordinates (+h offsets into Zp_pad)
    fi, fj = np.nonzero(far)            # row-major: deterministic order
    far_src = (fi + h).astype(np.int32)
    far_dst = (idx_r[fi, fj] + h).astype(np.int32)
    far_wv = w_r[fi, fj].astype(np.float32)
    cap = 1 << max(int(np.ceil(np.log2(max(n_far, 1)))), 7)
    pad = cap - n_far
    far_src = np.pad(far_src, (0, pad))
    far_dst = np.pad(far_dst, (0, pad))
    far_wv = np.pad(far_wv, (0, pad))

    # Geary structure terms: r_i = Σ_j w_ij, c_q = Σ_{i→q} w (new coords)
    r = w_r.sum(axis=1)
    c = np.zeros(n, np.float64)
    np.add.at(c, idx_r[valid], w_r[valid])
    rc = (r + c).astype(np.float32)

    n_pad = (-n) % block
    if n_pad:
        local_idx = np.pad(local_idx, ((0, n_pad), (0, 0)))
        w_local = np.pad(w_local, ((0, n_pad), (0, 0)))
        rc = np.pad(rc, (0, n_pad))

    return NullPlan(
        order=jnp.asarray(order),
        local_idx=jnp.asarray(local_idx),
        w_local=jnp.asarray(w_local),
        far_src=jnp.asarray(far_src),
        far_dst=jnp.asarray(far_dst),
        far_w=jnp.asarray(far_wv),
        rc_sum=jnp.asarray(rc),
        block=block,
        halo=h,
        n=n,
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _banded_stat(order, local_idx, w_local, far_src, far_dst, far_w, rc_sum,
                 Z_r, den, S0, perm, *, block: int, halo: int, n: int,
                 stat: str, precision: str):
    """One draw's global statistic [G] via banded dense matmuls.

    ``Zp_pad`` row (p + halo) holds the permuted value of new-position p;
    the halo/tail pads repeat clipped rows but every adjacency column that
    could touch them carries weight 0, so their values never contribute.
    """
    B, H = block, halo
    W = B + 2 * H
    n_padded = local_idx.shape[0]
    nb = n_padded // B
    G = Z_r.shape[1]
    wdt = jnp.bfloat16 if precision == "bf16" else Z_r.dtype

    gidx = jnp.clip(jnp.arange(n_padded + 2 * H, dtype=jnp.int32) - H, 0, n - 1)
    Zp_pad = Z_r[perm[gidx]]                      # ONE random [rows, G] gather
    iota = jnp.arange(W, dtype=jnp.int32)[None, :]

    def blk(b):
        win = jax.lax.dynamic_slice(Zp_pad, (b * B, 0), (W, G))
        li = jax.lax.dynamic_slice(local_idx, (b * B, 0), (B, local_idx.shape[1]))
        lw = jax.lax.dynamic_slice(w_local, (b * B, 0), (B, w_local.shape[1]))
        A = jnp.zeros((B, W), wdt)
        zero = jnp.zeros((), wdt)
        for j in range(li.shape[1]):
            A = A + jnp.where(iota == li[:, j:j + 1],
                              lw[:, j:j + 1].astype(wdt), zero)
        lag = jnp.dot(A, win.astype(wdt), preferred_element_type=jnp.float32)
        zblk = win[H:H + B]
        return jnp.sum(zblk.astype(jnp.float32) * lag, axis=0)  # [G]

    per_block = jax.lax.map(blk, jnp.arange(nb, dtype=jnp.int32))
    cross = jnp.sum(per_block, axis=0)
    s = Zp_pad[far_src].astype(jnp.float32)
    t = Zp_pad[far_dst].astype(jnp.float32)
    cross = cross + jnp.einsum("f,fg,fg->g", far_w, s, t)

    if stat == "moran":
        return (n / S0) * cross / den
    zp2 = jnp.square(Zp_pad[H:H + n_padded].astype(jnp.float32))
    sq = jnp.einsum("i,ig->g", rc_sum, zp2)
    return (n - 1) * (sq - 2.0 * cross) / (2.0 * S0 * den)


@functools.partial(jax.jit, static_argnames=(
    "block", "halo", "n", "stat", "alternative", "n_permutations",
    "precision", "seed"))
def _banded_test(order, local_idx, w_local, far_src, far_dst, far_w, rc_sum,
                 Z, S0, observed, *, block: int, halo: int, n: int,
                 seed: int, n_permutations: int, stat: str,
                 alternative: str, precision: str):
    den = jnp.sum(Z * Z, axis=0)
    den = jnp.where(den > 0, den, 1.0)
    base = key_for(seed, "perm_global", 0)
    G = Z.shape[1]

    def body(carry, step):
        count, s1, s2 = carry
        key = jax.random.fold_in(base, step)
        # compose with the relabeling so each draw assigns values to cells
        # EXACTLY as the legacy path does: new position p gets
        # Z[perm[order[p]]] — draw-for-draw identical null samples
        perm = jax.random.permutation(key, n)[order]
        vals = _banded_stat(order, local_idx, w_local, far_src, far_dst,
                            far_w, rc_sum, Z, den, S0, perm,
                            block=block, halo=halo, n=n, stat=stat,
                            precision=precision)
        if alternative == "greater":
            extreme = vals >= observed
        elif alternative == "less":
            extreme = vals <= observed
        else:
            extreme = jnp.abs(vals) >= jnp.abs(observed)
        return (count + extreme.astype(jnp.int32),
                s1 + vals, s2 + vals * vals), None

    init = (jnp.zeros((G,), jnp.int32), jnp.zeros((G,), jnp.float32),
            jnp.zeros((G,), jnp.float32))
    (count, s1, s2), _ = jax.lax.scan(body, init,
                                      jnp.arange(n_permutations))
    P = n_permutations
    p = (count + 1.0) / (P + 1.0)
    mean = s1 / P
    var = jnp.maximum(s2 / P - mean ** 2, 0.0)
    return p, mean, jnp.sqrt(var)


def banded_permutation_test(
    plan: NullPlan,
    Z: jax.Array,
    S0: float,
    observed: jax.Array,
    seed: int,
    n_permutations: int,
    stat: str = "moran",
    alternative: str = "greater",
    precision: str = "bf16",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for ``permutation_test_global`` using a NullPlan.

    Same (seed, draw)→permutation mapping; values differ from the legacy
    path only by floating-point summation order (and by ~3-digit rounding
    with the default bf16 band — nulls feed Monte-Carlo *counting*, where
    that precision is statistically invisible; pass precision="f32" for
    exact-order-independent validation).
    """
    return _banded_test(
        plan.order, plan.local_idx, plan.w_local, plan.far_src, plan.far_dst,
        plan.far_w, plan.rc_sum, Z, S0, observed,
        block=plan.block, halo=plan.halo, n=plan.n, seed=seed,
        n_permutations=n_permutations, stat=stat, alternative=alternative,
        precision=precision)
