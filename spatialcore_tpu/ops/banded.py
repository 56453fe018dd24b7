"""Banded permutation-null kernel: MXU-friendly global autocorrelation nulls.

Round-1 analysis (docs/performance.md) showed the permutation loop pinned at
XLA's ~150 GB/s random-row-gather ceiling: 7 gathers of [N, G] per draw.
This module changes the access pattern instead of the gather implementation:

1. Relabel cells along a Hilbert space-filling curve (or Cuthill-McKee on the
   graph when no coordinates exist). kNN edges become near-diagonal: with a
   block size B, all but a few percent of edges connect cells within one
   block of each other.
2. Per permutation draw, the only random-access step left is ONE row gather
   ``Zp = Z[perm]`` (the permuted values have no locality by construction —
   measured in round 1, spatial sorting cannot help *that* gather). The
   permutation itself comes from a sort-free Feistel bijection
   (``core.rng.feistel_permutation``) — ``jax.random.permutation``'s sort
   costs ~40 ms at 1M on TPU, dominating everything else.
3. The quadratic form Σ_e w_e·Zp[i_e]·Zp[j_e] is evaluated with dense
   BATCHED matmuls: the in-band adjacency is expanded once per call to a
   block-banded tensor A[nb, B, 3B] (three B-wide slabs: previous / self /
   next block), and the spatial lag of every block is three einsum
   contractions against block-shifted views of Zp — pure MXU work with no
   sequential loop over blocks. Sparse-as-dense trades ~(3B/k)× redundant
   FLOPs (nearly free in bf16) for fully sequential HBM traffic.
4. The few percent of out-of-band edges are handled exactly through a
   compacted, zero-padded edge list with plain gathers.

Geary's C rides the same kernel: Σ w (a−b)² = Σ (r_i+c_i)·zp_i² − 2·cross,
with row/col weight sums precomputed (permutation-invariant structure).

Replaces the hot loop of the reference's squidpy delegation
(/root/reference/src/spatialcore/spatial/autocorrelation.py:563-583) at
1M-cell scale. Estimator conventions identical to ops/moran.py.

Determinism: block size is baked into the plan; contraction order is
independent of device count (gene sharding splits columns only), per
CLAUDE.md's bitwise rule. With ``perm_method="sort"`` the draws use the SAME
counter-based keys as ``permutation_test_global`` (purpose "perm_global"), so
both paths shuffle identically and differ only in floating-point summation
order; the default "feistel" stream is its own seeded, reproducible sequence.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.logging import get_logger
from ..core.rng import feistel_apply, key_for
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


@functools.partial(jax.jit, static_argnames=("bits",))
def _hilbert_rank_device(coords, bits: int = 16):
    """On-device Hilbert ordering (uint32 xy2d; bits=16 fills uint32).

    Mirrors :func:`hilbert_order` (which normalizes in float64 on host);
    float32 quantization may bucket boundary-straddling cells differently,
    but the banded null's draw values are ordering-invariant by
    construction (``perm = raw[order]`` gives cell ``i`` the value
    ``Z[raw[i]]`` whatever the relabeling), so plans built on either path
    agree to float32 accumulation order.
    """
    n = coords.shape[0]
    mins = jnp.min(coords, axis=0)
    span = jnp.maximum(jnp.max(coords, axis=0) - mins, 1e-12)
    side = (1 << bits) - 1
    x = jnp.minimum((coords[:, 0] - mins[0]) / span[0] * (side + 1),
                    side).astype(jnp.uint32)
    y = jnp.minimum((coords[:, 1] - mins[1]) / span[1] * (side + 1),
                    side).astype(jnp.uint32)
    d = jnp.zeros(n, jnp.uint32)
    for level in range(bits - 1, -1, -1):
        s = jnp.uint32(1 << level)
        rx = ((x & s) > 0).astype(jnp.uint32)
        ry = ((y & s) > 0).astype(jnp.uint32)
        d = d + s * s * ((jnp.uint32(3) * rx) ^ ry)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = jnp.where(flip, s - 1 - x, x)
        y_f = jnp.where(flip, s - 1 - y, y)
        x, y = jnp.where(swap, y_f, x_f), jnp.where(swap, x_f, y_f)
    order = jnp.argsort(d, stable=True).astype(jnp.int32)
    rank = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return order, rank


@functools.partial(jax.jit, static_argnames=("block",))
def _plan_relabel(idx, w, order, rank, block: int):
    """Relabel edges into new positions; band split + Geary terms."""
    n, k = idx.shape
    idx_r = rank[idx[order]]                    # [N, k] int32 new positions
    w_r = w[order]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    ws = (rows // block - 1) * block
    rel = idx_r - ws
    valid = w_r > 0
    inwin = (rel >= 0) & (rel < 3 * block) & valid
    far = valid & ~inwin
    local_idx = jnp.where(inwin, rel, 0).astype(jnp.int32)
    w_local = jnp.where(inwin, w_r, 0.0).astype(jnp.float32)
    r = w_r.sum(axis=1)
    c = jnp.zeros(n, jnp.float32).at[idx_r.reshape(-1)].add(
        jnp.where(valid, w_r, 0.0).reshape(-1))
    rc = (r + c).astype(jnp.float32)
    n_pad = (-n) % block
    if n_pad:
        local_idx = jnp.pad(local_idx, ((0, n_pad), (0, 0)))
        w_local = jnp.pad(w_local, ((0, n_pad), (0, 0)))
        rc = jnp.pad(rc, (0, n_pad))
    return idx_r, w_r, far, jnp.sum(far), local_idx, w_local, rc


@functools.partial(jax.jit, static_argnames=("block", "cap"))
def _plan_far(idx_r, w_r, far, block: int, cap: int):
    """Compact the far-edge list to a static power-of-two capacity."""
    n_far = jnp.sum(far)
    fi, fj = jnp.nonzero(far, size=cap, fill_value=0)   # row-major
    live = jnp.arange(cap) < n_far
    far_src = jnp.where(live, fi + block, 0).astype(jnp.int32)
    far_dst = jnp.where(live, idx_r[fi, fj] + block, 0).astype(jnp.int32)
    far_w = jnp.where(live, w_r[fi, fj], 0.0).astype(jnp.float32)
    return far_src, far_dst, far_w


@functools.partial(jax.jit, static_argnames=("nb", "block"))
def _plan_far_runs(far_src, far_w, nb: int, block: int):
    """Run starts of each destination block in the compact far list.

    The compact far list is grouped by destination block by construction
    (row-major ``nonzero`` order; padding at the tail), so block ``n``'s
    edges occupy the contiguous run ``[starts[n], starts[n+1])``. The
    windowed far kernel (:func:`_band_lag_count_pallas_i8` with
    ``far_starts``) DMAs two S-row windows covering that run per grid
    step instead of scatter-adding a dense ``[Npad, G]`` far layer — the
    measured wall of the int8 LISA draw (docs/performance.md).

    Returns ``(starts [nb+1] int32, max_run int32 scalar)``.
    """
    live = far_w > 0
    bn = jnp.where(live, (far_src - block) // block, nb).astype(jnp.int32)
    starts = jnp.searchsorted(bn, jnp.arange(nb + 1, dtype=jnp.int32),
                              ).astype(jnp.int32)
    return starts, jnp.max(starts[1:] - starts[:-1])


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


#: rough per-(B·G) VMEM byte coefficients of the fused windowed kernel
#: (win slabs + obs + counts + lag temps + stat extras); used with the
#: 2·S·G window bytes to gate the "auto" band_impl selection.
_WIN_VMEM_COEF = {"moran": 16, "geary": 24, "lee": 18, "getis": 20}


def _win_fits_vmem(stat: str, G: int, block: int, far_bmax: int,
                   budget: int = 10 * 2 ** 20) -> bool:
    """Estimate whether the fused windowed kernel's working set fits VMEM.

    Conservative static estimate for the ``band_impl="auto"`` selection
    only — an explicit ``band_impl="pallas"`` bypasses it (and fails
    loudly in Mosaic if the tile really is too big). Measured fits:
    G=512, B=256 at 1M cells (config 8) uses ~4 MB.
    """
    S = _round_up(max(int(far_bmax), 1), 128)
    Gp = _round_up(max(int(G), 1), 128)   # kernels pad lanes to 128
    return Gp * (_WIN_VMEM_COEF[stat] * block + 2 * S) <= budget


# ---------------------------------------------------------------------------
# Plan
# ---------------------------------------------------------------------------


class NullPlan(NamedTuple):
    """Relabeled, band-split graph structure for the banded null kernel.

    Index arrays live in *new-order* coordinates. ``local_idx`` is relative
    to each row's 3-block window start (b−1)·B ∈ [0, 3B); far-edge indices
    carry a +B offset into the front-padded ``Zp`` buffer.
    """

    order: jax.Array        # int32 [N] — original index at each new position
    local_idx: jax.Array    # int32 [Npad, k] — window-relative neighbor pos
    w_local: jax.Array      # f32 [Npad, k] — weight (0 where far/invalid/pad)
    far_src: jax.Array      # int32 [F] — padded-coords row of far-edge source
    far_dst: jax.Array      # int32 [F]
    far_w: jax.Array        # f32 [F] (0 = padding)
    rc_sum: jax.Array       # f32 [Npad] — row+col weight sums (Geary terms)
    block: int              # B (static); the band covers ±B positions
    n: int                  # true cell count (static)
    rank: jax.Array = None  # int32 [N] — new position of each original cell
    # Far-edge run structure (the compact list is grouped by destination
    # block): block n's edges are far_*[far_starts[n]:far_starts[n+1]].
    # far_bmax is the max run length (static; sizes the windowed far
    # kernel's DMA). None/0 on hand-built plans → kernels fall back to
    # the dense far scatter.
    far_starts: jax.Array = None  # int32 [nb+1]
    far_bmax: int = 0

    @property
    def n_padded(self) -> int:
        return self.local_idx.shape[0]


def build_null_plan(
    graph: SpatialGraph,
    coords: Optional[np.ndarray] = None,
    block: int = 256,
) -> NullPlan:
    """Prep: relabel cells, split edges into band vs far list.

    The band covers neighbor offsets within ±block positions (window =
    previous/self/next block). Larger blocks lower the far fraction but
    raise the dense-matmul FLOPs and A traffic ∝ B. Measured at 1M cells
    × G=2048 × 100 draws (round 3): B=256 → 23.0k genes·perms/s,
    B=320 → 21.0k, B=384 → 20.1k, B=128 → 20.4k (far edges 6.2% bite),
    B=512 → 17.6k —
    the round-2 default of 512 was tuned when the gather dominated;
    256 is the sweet spot and the default.

    Pass ``coords`` as a DEVICE array to build the whole plan on device
    (one 4-byte readback; no bulk host↔device transfers — the remote
    tunnel makes the host path's ~100MB of hops cost 15–40 s at 1M
    cells). A numpy ``coords`` keeps the original host path, which is
    bitwise-stable against round-1 plans (float64 Hilbert quantization).
    """
    if (coords is not None and isinstance(coords, jax.Array)
            and not isinstance(coords, np.ndarray) and coords.ndim == 2
            and coords.shape[1] == 2):
        n, k = graph.neighbor_idx.shape
        order, rank = _hilbert_rank_device(coords.astype(jnp.float32))
        idx_r, w_r, far, n_far_t, local_idx, w_local, rc = _plan_relabel(
            graph.neighbor_idx, graph.neighbor_w.astype(jnp.float32),
            order, rank, block)
        n_far = int(n_far_t)                    # the ONE readback
        logger.info(
            f"null plan (device): N={n:,} k={k} block={block} "
            f"far_edges={n_far:,} ({n_far / (n * k):.2%})")
        cap = 1 << max(int(np.ceil(np.log2(max(n_far, 1)))), 7)
        far_src, far_dst, far_w = _plan_far(idx_r, w_r, far, block, cap)
        nb = local_idx.shape[0] // block
        far_starts, bmax_t = _plan_far_runs(far_src, far_w, nb, block)
        return NullPlan(order=order, local_idx=local_idx, w_local=w_local,
                        far_src=far_src, far_dst=far_dst, far_w=far_w,
                        rc_sum=rc, block=block, n=n, rank=rank,
                        far_starts=far_starts, far_bmax=int(bmax_t))

    idx = np.asarray(graph.neighbor_idx)
    w = np.asarray(graph.neighbor_w, np.float32)
    n, k = idx.shape
    if coords is not None and np.asarray(coords).shape[1] == 2:
        order = hilbert_order(np.asarray(coords))
    else:
        order = graph_order(graph)
    rank = np.empty(n, np.int32)
    rank[order] = np.arange(n, dtype=np.int32)

    idx_r = rank[idx[order]].astype(np.int64)   # [N, k] neighbor new-positions
    w_r = w[order]                              # [N, k]
    rows = np.arange(n, dtype=np.int64)[:, None]
    ws = (rows // block - 1) * block            # window start (b−1)·B
    rel = idx_r - ws
    valid = w_r > 0
    inwin = (rel >= 0) & (rel < 3 * block) & valid
    far = valid & ~inwin
    n_far = int(far.sum())
    logger.info(
        f"null plan: N={n:,} k={k} block={block} "
        f"far_edges={n_far:,} ({n_far / max(valid.sum(), 1):.2%})")

    local_idx = np.where(inwin, rel, 0).astype(np.int32)
    w_local = np.where(inwin, w_r, 0.0).astype(np.float32)

    # far list in padded coordinates (+block front pad of Zp)
    fi, fj = np.nonzero(far)                    # row-major: deterministic
    far_src = (fi + block).astype(np.int32)
    far_dst = (idx_r[fi, fj] + block).astype(np.int32)
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

    nb = local_idx.shape[0] // block
    bcnt = np.bincount((far_src[:n_far] - block) // block, minlength=nb)
    far_starts = np.concatenate(
        [[0], np.cumsum(bcnt)]).astype(np.int32)

    return NullPlan(
        order=jnp.asarray(order),
        local_idx=jnp.asarray(local_idx),
        w_local=jnp.asarray(w_local),
        far_src=jnp.asarray(far_src),
        far_dst=jnp.asarray(far_dst),
        far_w=jnp.asarray(far_wv),
        rc_sum=jnp.asarray(rc),
        block=block,
        n=n,
        rank=jnp.asarray(rank),
        far_starts=jnp.asarray(far_starts),
        far_bmax=int(bcnt.max()) if n_far else 0,
    )


# ---------------------------------------------------------------------------
# Pallas band contraction
# ---------------------------------------------------------------------------


def _band_cross_kernel(a_ref, z0_ref, z1_ref, z2_ref, out_ref, acc_ref):
    """Per-block band contribution, fused on-chip.

    Grid step i holds block i's band A[B, 3B] and the three B-row slabs of
    Zp it touches in VMEM; the spatial lag is three MXU matmuls and the
    per-gene reduction never leaves the chip (the XLA formulation round-trips
    a [nb, B, G] lag tensor through HBM three times per draw).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    B = z0_ref.shape[1]
    a = a_ref[0]
    z1 = z1_ref[0]
    lag = jnp.dot(a[:, :B], z0_ref[0], preferred_element_type=jnp.float32)
    lag = lag + jnp.dot(a[:, B:2 * B], z1,
                        preferred_element_type=jnp.float32)
    lag = lag + jnp.dot(a[:, 2 * B:], z2_ref[0],
                        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + jnp.sum(
        z1.astype(jnp.float32) * lag, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _band_cross_pallas(A, Zp, interpret: bool) -> jax.Array:
    """cross[g] = Σ_blocks Σ_i zblk·(A@win) via one Pallas pass.

    ``A`` [nb, B, 3B], ``Zp`` [nb+2, B, G] (both bf16 or f32).
    Reads A once and Zp three times (the three shifted slabs are separate
    pipelined inputs); writes only [G].
    """
    nb, B, _ = A.shape
    G = Zp.shape[2]
    out = pl.pallas_call(
        _band_cross_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, 3 * B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), lambda i: (i + 2, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, G), jnp.float32)],
        interpret=interpret,
    )(A, Zp, Zp, Zp)
    return out[0]


def _band_halo_kernel(a_ref, zp_any, out_ref, win_ref, sem_ref, acc_ref,
                      lag_ref):
    """Single-read halo version: a 4-slot VMEM ring holds the three Zp
    slabs each block touches; every grid step DMAs exactly ONE new slab
    (slab i+3) while computing on slabs i, i+1, i+2 — Zp crosses HBM once
    per draw instead of three times, and the lag tensor never exists in
    HBM at all (the XLA einsum path round-trips ~12 GB of lag temps per
    draw at G=1024).

    The grid's leading dimension tiles the GENE axis: each g-tile streams
    [B, Gt] sub-slabs (lane-aligned strided DMA), so VMEM scales with the
    tile width, not G — this is what lifts the G≤2048 VMEM ceiling the
    round-2 kernel had (scoped-vmem OOM at G=2560: win+lag+A ≈ 18.3M).
    Zp still crosses HBM exactly once per draw (g-tiles read disjoint
    columns); only the A band re-reads once per g-tile. Measured round 3:
    G=2560 via 2×1280 tiles runs 14.1k genes·perms/s vs 17.7k at G=2048
    single-tile — the strided sub-slab DMA and per-tile pipeline restart
    cost more than the wider tile's gather amortization saves, so 2048
    stays the default tile (docs/performance.md dead-ends); the tiling
    remains because it removes the hard VMEM ceiling.
    """
    gt = pl.program_id(0)
    i = pl.program_id(1)
    nsteps = pl.num_programs(1)
    Gt = win_ref.shape[2]

    def dma(slab):
        return pltpu.make_async_copy(
            zp_any.at[slab, :, pl.ds(gt * Gt, Gt)],
            win_ref.at[slab % 4],
            sem_ref.at[slab % 4])

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        dma(0).start()
        dma(1).start()
        dma(2).start()
        dma(0).wait()
        dma(1).wait()

    @pl.when(i + 3 < nsteps + 2)
    def _():
        dma(i + 3).start()

    dma(i + 2).wait()

    B = win_ref.shape[1]
    a = a_ref[0]
    z0 = win_ref[i % 4]
    z1 = win_ref[(i + 1) % 4]
    z2 = win_ref[(i + 2) % 4]
    lag_ref[:] = jnp.dot(a[:, :B], z0, preferred_element_type=jnp.float32)
    lag_ref[:] += jnp.dot(a[:, B:2 * B], z1,
                          preferred_element_type=jnp.float32)
    lag_ref[:] += jnp.dot(a[:, 2 * B:], z2,
                          preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + jnp.sum(
        z1.astype(jnp.float32) * lag_ref[:], axis=0, keepdims=True)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _band_halo_kernel_1t(a_ref, zp_any, out_ref, win_ref, sem_ref, acc_ref,
                         lag_ref):
    """Single-g-tile variant with the round-2 one-dimensional grid and
    whole-slab DMAs — byte-identical behavior to the proven production
    kernel; :func:`_band_cross_pallas_halo` dispatches here when the gene
    width fits one tile (the common case, G <= 2048)."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def dma(slab):
        return pltpu.make_async_copy(zp_any.at[slab], win_ref.at[slab % 4],
                                     sem_ref.at[slab % 4])

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        dma(0).start()
        dma(1).start()
        dma(2).start()
        dma(0).wait()
        dma(1).wait()

    @pl.when(i + 3 < nsteps + 2)
    def _():
        dma(i + 3).start()

    dma(i + 2).wait()

    B = win_ref.shape[1]
    a = a_ref[0]
    z0 = win_ref[i % 4]
    z1 = win_ref[(i + 1) % 4]
    z2 = win_ref[(i + 2) % 4]
    lag_ref[:] = jnp.dot(a[:, :B], z0, preferred_element_type=jnp.float32)
    lag_ref[:] += jnp.dot(a[:, B:2 * B], z1,
                          preferred_element_type=jnp.float32)
    lag_ref[:] += jnp.dot(a[:, 2 * B:], z2,
                          preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + jnp.sum(
        z1.astype(jnp.float32) * lag_ref[:], axis=0, keepdims=True)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _band_halo_kernel_rot4(a_ref, zp_any, out_ref, win_ref, sem_ref,
                           acc_ref, lag_ref):
    """Rotation-baked halo variant: ONE K=4B matmul per grid step.

    The 4-slot ring is laid out as one contiguous [4B, G] VMEM window and
    ``A`` is built with each block-row's three weight blocks placed at
    column range (slab %% 4)·B (:func:`_build_band_rot4`) — the fourth
    block is zero, absorbing whatever the prefetch DMA is writing into
    the unused slot (finite bf16 × zero weight = 0). This fuses the three
    [B,B]@[B,G] dots into a single [B,4B]@[4B,G] dot: +33% redundant
    FLOPs for a 4× longer MXU K-dimension per issue.
    """
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    B = lag_ref.shape[0]

    def dma(slab):
        return pltpu.make_async_copy(
            zp_any.at[slab],
            win_ref.at[pl.ds((slab % 4) * B, B)],
            sem_ref.at[slab % 4])

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # zero the window: the unused 4th slot must hold finite values
        # before its first DMA lands (uninitialized VMEM could be NaN,
        # and 0 * NaN would poison the fused dot)
        win_ref[:] = jnp.zeros_like(win_ref)
        dma(0).start()
        dma(1).start()
        dma(2).start()
        dma(0).wait()
        dma(1).wait()

    @pl.when(i + 3 < nsteps + 2)
    def _():
        dma(i + 3).start()

    dma(i + 2).wait()

    a = a_ref[0]                                         # [B, 4B]
    lag_ref[:] = jnp.dot(a, win_ref[:],
                         preferred_element_type=jnp.float32)
    z1 = win_ref[pl.ds(((i + 1) % 4) * B, B)]            # center slab
    acc_ref[:] = acc_ref[:] + jnp.sum(
        z1.astype(jnp.float32) * lag_ref[:], axis=0, keepdims=True)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _build_band_rot4(local_idx, w_local, block: int, dtype):
    """A4[nb, B, 4B]: like :func:`_build_band` but each window slab's
    B-wide weight block sits at column (padded_slab %% 4)·B — the layout
    :func:`_band_halo_kernel_rot4` needs for its single fused dot. The
    column block not covered by the three window slabs stays zero."""
    nb = local_idx.shape[0] // block
    k = local_idx.shape[1]
    li3 = local_idx.reshape(nb, block, k)      # rel positions [0, 3B)
    lw3 = w_local.reshape(nb, block, k)
    i_idx = jnp.arange(nb, dtype=jnp.int32)[:, None, None]
    slab = i_idx + li3 // block                # padded slab per entry
    col4 = (slab % 4) * block + li3 % block    # column in [0, 4B)
    iota = jnp.arange(4 * block, dtype=jnp.int32)[None, None, :]
    A = jnp.zeros((nb, block, 4 * block), dtype)
    zero = jnp.zeros((), dtype)
    for j in range(k):
        A = A + jnp.where(iota == col4[:, :, j:j + 1],
                          lw3[:, :, j:j + 1].astype(dtype), zero)
    return A


def _band_cross_pallas_halo4(A4, Zp, interpret: bool) -> jax.Array:
    """cross[g] via the rotation-baked single-dot halo kernel."""
    nb, B, _ = A4.shape
    G = Zp.shape[2]
    out = pl.pallas_call(
        _band_halo_kernel_rot4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, 4 * B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4 * B, G), Zp.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((B, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(A4, Zp)
    return out[0]


def _halo_tiles(G: int, g_tile: int = 2048) -> Tuple[int, int]:
    """(n_gene_tiles, tile_width) for the halo kernel; ngt*Gt >= G, Gt a
    lane-aligned multiple of 128 and <= g_tile (VMEM budget)."""
    ngt = -(-G // g_tile)
    Gt = 128 * (-(-G // (128 * ngt)))
    return ngt, Gt


def _band_cross_pallas_halo(A, Zp, interpret: bool,
                            g_tile: int = 2048) -> jax.Array:
    """cross[g] via the halo-ring kernel. ``Zp`` [nb+2, B, G] with G a
    multiple of the :func:`_halo_tiles` width (the caller pads)."""
    nb, B, _ = A.shape
    G = Zp.shape[2]
    ngt, Gt = _halo_tiles(G, g_tile)
    if ngt * Gt != G:        # interpret mode runs unpadded; single tile
        ngt, Gt = 1, G
    if ngt == 1:
        # single tile: the round-2 one-dimensional grid with whole-slab
        # DMAs — the proven production path for G <= 2048
        out = pl.pallas_call(
            _band_halo_kernel_1t,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, B, 3 * B), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, G), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((4, B, G), Zp.dtype),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.VMEM((1, G), jnp.float32),
                pltpu.VMEM((B, G), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(A, Zp)
        return out[0]
    out = pl.pallas_call(
        _band_halo_kernel,
        grid=(ngt, nb),
        in_specs=[
            pl.BlockSpec((1, B, 3 * B), lambda gt, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Gt), lambda gt, i: (0, gt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, B, Gt), Zp.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((1, Gt), jnp.float32),
            pltpu.VMEM((B, Gt), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(A, Zp)
    return out[0]


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _build_band(local_idx, w_local, block: int, dtype):
    """Expand [Npad, k] (idx, w) into the dense band tensor A[nb, B, 3B].

    Loop-invariant across draws: built once per call, reused by every
    permutation. Any window column that could alias a pad row carries
    weight 0, so pad values never contribute.
    """
    nb = local_idx.shape[0] // block
    k = local_idx.shape[1]
    li3 = local_idx.reshape(nb, block, k)
    lw3 = w_local.reshape(nb, block, k)
    iota = jnp.arange(3 * block, dtype=jnp.int32)[None, None, :]
    A = jnp.zeros((nb, block, 3 * block), dtype)
    zero = jnp.zeros((), dtype)
    for j in range(k):
        A = A + jnp.where(iota == li3[:, :, j:j + 1],
                          lw3[:, :, j:j + 1].astype(dtype), zero)
    return A


# ---------------------------------------------------------------------------
# int8 null mode — same precision class as bf16 (8 significant bits) at
# half the HBM bytes and double the MXU rate. Measured round 3 (1M cells,
# in-scan): gather 48.2 ms and band 19.9 ms per draw at G=4096 int8 vs
# 34.4 + 18.3 at G=2048 bf16 — per-gene cost drops ~40% because the
# 4096-wide int8 row is the same 4 KB the bf16 gather already paid for.
# ---------------------------------------------------------------------------


def _quantize_z(Z, clip: float = 8.0):
    """Per-gene symmetric int8 quantization of standardized values.

    scale s_g = min(max|z_g|, clip)/127; values beyond ±clip·σ saturate
    (rare spiky genes only — keeps the quantization step ≤ clip/127 ≈
    0.063σ instead of letting one outlier coarsen the whole gene).
    Products z_qi·z_qj are EXACT integers; one s_g² factor converts the
    accumulated cross term back to z units.
    """
    Zf = Z.astype(jnp.float32)
    s = jnp.minimum(jnp.max(jnp.abs(Zf), axis=0), clip) / 127.0
    s = jnp.where(s > 0, s, 1.0)
    Zq = jnp.clip(jnp.round(Zf / s), -127, 127).astype(jnp.int8)
    return Zq, s


def _quantize_z4(Z, clip: float = 8.0):
    """Per-gene symmetric int4 quantization, NIBBLE-PACKED two genes/byte.

    The global null's per-draw row gather is BYTE-bound at ~90 GB/s for
    rows over ~2 KB and issue-bound (~45M rows/s) below — so packing two
    genes per byte serves G=4096 from the same 2 KB row that int8 spent
    on 2048 (measured: benchmarks/probe_global_stages.py, round 4).
    Codes c = clip(round(z/s), -7, 7) with s = min(max|z|, clip)/7;
    gene j (j < G/2) lives in the HIGH nibble of packed column j and
    gene j + G/2 in the LOW nibble (split-half layout: on-chip unpack +
    lane-concat restores natural gene order). Bytes store (c+8) nibbles
    — in-range bit patterns regardless of int8 sign interpretation.

    G must be even (callers pad the gene axis to a 256-multiple so each
    half stays 128-lane aligned). Returns ``(Zpk int8 [N, G//2],
    s f32 [G])``.
    """
    codes, s = _quantize_z4_codes(Z, clip)
    return _pack_codes(codes), s


def _quantize_z4_codes(Z, clip: float = 8.0):
    """int4 codes WITHOUT packing: (codes int8 in [-7, 7], s f32).

    Chunked preps (bench.py, ops/streaming.py) quantize gene chunks
    independently and pack afterwards with :func:`_pack_codes` — the
    split-half pairing must span the FULL tile, not each chunk, or the
    unpacked gene order would interleave chunks.
    """
    Zf = Z.astype(jnp.float32)
    s = jnp.minimum(jnp.max(jnp.abs(Zf), axis=0), clip) / 7.0
    s = jnp.where(s > 0, s, 1.0)
    return jnp.clip(jnp.round(Zf / s), -7, 7).astype(jnp.int8), s


def _pack_codes(codes, lo=None):
    """Pack int4 codes into split-half nibble bytes — the inverse of
    :func:`_unpack_nibbles`.

    One-arg form: codes [N, G] (G even) -> [N, G//2] with gene j in the
    HIGH nibble of packed column j and gene j + G//2 in the LOW nibble.
    Two-arg form: ``_pack_codes(hi, lo)`` packs two same-shape code
    blocks directly (chunked preps pair half-offset chunks without
    concatenating the full-width code matrix). All arithmetic stays in
    int8 — an int32 widen is a 4x [N, G] temp (16 GB at 1M x 4096, a
    measured OOM on the v5e).
    """
    if lo is None:
        G = codes.shape[-1]
        if G % 2:
            raise ValueError(
                f"int4 packing needs an even gene count, got {G}")
        hi, lo = codes[..., :G // 2], codes[..., G // 2:]
    else:
        hi = codes
        if hi.shape != lo.shape:
            raise ValueError(f"hi/lo shape mismatch: {hi.shape} vs "
                             f"{lo.shape}")
    h8 = (hi.astype(jnp.int8) + jnp.int8(8)) << 4   # wraps >127: bit-exact
    return h8 | (lo.astype(jnp.int8) + jnp.int8(8))


def _unpack_nibbles(Zpk):
    """int8 packed [..., Gp2] -> int8 codes [..., 2*Gp2], natural order.

    Arithmetic-shift + mask reads the nibble bit patterns correctly for
    any int8 sign; the -8 offset restores signed codes in [-7, 7].
    """
    hi = ((Zpk >> 4) & jnp.int8(15)) - jnp.int8(8)
    lo = (Zpk & jnp.int8(15)) - jnp.int8(8)
    return jnp.concatenate([hi, lo], axis=-1)


def _build_band_i8(local_idx, w_local, block: int, row_scale=None):
    """Band tensor in int8 with a PER-ROW weight scale.

    sw[n, b] = rowmax/127, A8 = round(w/sw): for the common row-normalized
    kNN case (k equal weights) every entry quantizes to exactly 127 —
    the band weights are then EXACT. int32 accumulation is overflow-safe:
    K=3B=768 terms × 127³ ≈ 1.57e9 < 2³¹.

    ``row_scale`` ([nb, B, 1], optional) overrides the band-local rowmax
    scale — the fully-integer LISA kernel passes the FULL-row max
    (including far edges) so far weights quantize without clipping.
    """
    nb = local_idx.shape[0] // block
    k = local_idx.shape[1]
    li3 = local_idx.reshape(nb, block, k)
    lw3 = w_local.reshape(nb, block, k).astype(jnp.float32)
    if row_scale is None:
        rowmax = jnp.max(lw3, axis=2, keepdims=True)        # [nb, B, 1]
        sw = jnp.where(rowmax > 0, rowmax / 127.0, 1.0)
    else:
        sw = row_scale
    wq = jnp.clip(jnp.round(lw3 / sw), 0, 127).astype(jnp.int8)
    iota = jnp.arange(3 * block, dtype=jnp.int32)[None, None, :]
    A = jnp.zeros((nb, block, 3 * block), jnp.int8)
    zero = jnp.zeros((), jnp.int8)
    for j in range(k):
        A = A + jnp.where(iota == li3[:, :, j:j + 1],
                          wq[:, :, j:j + 1], zero)
    return A, sw


def _band_halo_kernel_i8(a_ref, sw_ref, zp_any, out_ref, win_ref, sem_ref,
                         acc_ref, lag_ref):
    """int8 variant of :func:`_band_halo_kernel_1t`: int8 window slabs
    (half the DMA bytes), int8×int8→int32 MXU dots (exact), and the
    per-row weight scale applied in the f32 reduce."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def dma(slab):
        return pltpu.make_async_copy(zp_any.at[slab], win_ref.at[slab % 4],
                                     sem_ref.at[slab % 4])

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        dma(0).start()
        dma(1).start()
        dma(2).start()
        dma(0).wait()
        dma(1).wait()

    @pl.when(i + 3 < nsteps + 2)
    def _():
        dma(i + 3).start()

    dma(i + 2).wait()

    B = win_ref.shape[1]
    a = a_ref[0]
    z0 = win_ref[i % 4]
    z1 = win_ref[(i + 1) % 4]
    z2 = win_ref[(i + 2) % 4]
    lag_ref[:] = jnp.dot(a[:, :B], z0, preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(a[:, B:2 * B], z1,
                          preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(a[:, 2 * B:], z2,
                          preferred_element_type=jnp.int32)
    sw = sw_ref[0]
    acc_ref[:] = acc_ref[:] + jnp.sum(
        (sw * z1.astype(jnp.float32)) * lag_ref[:].astype(jnp.float32),
        axis=0, keepdims=True)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _band_cross_pallas_i8(A8, sw, Zp8, interpret: bool) -> jax.Array:
    """cross_q[g] (in z_q units², band part only) via the int8 halo kernel.

    Single g-tile: VMEM = 4 int8 slabs + int32 lag + f32 acc ≈ 8.6 MB at
    G=4096 — twice the bf16 kernel's gene width in the same footprint.
    """
    nb, B, _ = A8.shape
    G = Zp8.shape[2]
    out = pl.pallas_call(
        _band_halo_kernel_i8,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, 3 * B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, B, G), jnp.int8),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((B, G), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(A8, sw, Zp8)
    return out[0]


def _win_ring() -> int:
    """Zp slab-ring depth of the global windowed cross kernel.

    Env-tunable (``SPATIALCORE_WIN_RING``) while the sweet spot is being
    measured; the kernel is DMA-bound at the B=256/G=4096 default, so a
    deeper ring trades VMEM for more in-flight slab DMAs.
    """
    import os

    return max(4, int(os.environ.get("SPATIALCORE_WIN_RING", "4")))


def _gwin_fits_vmem(G: int, block: int, far_bmax: int,
                    budget: int = 14 * 2 ** 20) -> bool:
    """VMEM gate for the GLOBAL windowed-far cross kernel.

    Working set: ``ring`` int8 DMA slabs (R·B·G) + one int32 lag scratch
    (4·B·G) + two S-row int8 far windows (2·S·G) + A8/sw/acc (small).
    The measured fit at G=4096, B=256, S=256, R=4 is ≈10.7 MB (v5e VMEM
    ≈16 MB); 14 MB leaves headroom for Mosaic's own temporaries.
    """
    S = _round_up(max(int(far_bmax), 1), 128)
    Gp = _round_up(max(int(G), 1), 128)
    R = _win_ring()
    return Gp * ((R + 4) * block + 2 * S) + block * 3 * block <= budget


def _band_cross_win_kernel_i8(widx_ref, start_ref, cnt_run_ref, a_ref,
                              sw_ref, zp_any, zf0_ref, zf1_ref, row0_ref,
                              row1_ref, q0_ref, q1_ref, out_ref, win_ref,
                              sem_ref, acc_ref, lag_ref):
    """GLOBAL cross with WINDOWED far edges, fused on-chip.

    :func:`_band_halo_kernel_i8` plus the far machinery of
    :func:`_make_fused_win_kernel`: block ``i``'s far run (the compact
    far list is grouped by source block — NullPlan run structure) lives
    in two S-row windows of the pre-gathered far values; the kernel
    rebuilds the one-hot far operator on-chip and applies it as two
    extra int8 MXU dots into the same int32 lag. This removes the draw
    loop's TWO [F, G] f32 far gathers (4.3 GB of materialized casts each
    at G=4096) — the far layer never exists in HBM; the only extra HBM
    traffic is the compact [F] int8 row gather the caller does.

    ``sw_ref`` must carry the FULL-row weight scale (band + far rowmax,
    as :func:`_banded_local_moran_p_i8`) so far weight codes don't clip;
    the f32 reduce applies it once per row to the combined lag.

    The slab ring depth comes from ``win_ref.shape[0]`` (the scratch the
    wrapper allocates): a deeper ring keeps more Zp DMAs in flight —
    the kernel is DMA-bound at the default B=256/G=4096 point.
    """
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    R = win_ref.shape[0]

    def dma(slab):
        return pltpu.make_async_copy(zp_any.at[slab], win_ref.at[slab % R],
                                     sem_ref.at[slab % R])

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for s in range(R - 1):
            dma(s).start()
        dma(0).wait()
        dma(1).wait()

    @pl.when(i + R - 1 < nsteps + 2)
    def _():
        dma(i + R - 1).start()

    dma(i + 2).wait()

    B = win_ref.shape[1]
    S = zf0_ref.shape[1]
    a = a_ref[0]
    z0 = win_ref[i % R]
    z1 = win_ref[(i + 1) % R]
    z2 = win_ref[(i + 2) % R]

    start = start_ref[i]
    count = cnt_run_ref[i]
    base_gc = widx_ref[i] * S

    def wmat(row_ref, q_ref, gc0):
        # one-hot far operator [B, S] masked to this block's run (same
        # int32-then-narrow construction as _make_fused_win_kernel)
        gc = gc0 + jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        live = ((gc >= start) & (gc < start + count)).astype(jnp.int32)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
               == row_ref[0]).astype(jnp.int32)
        return (sel * (live * q_ref[0].astype(jnp.int32))).astype(jnp.int8)

    W0 = wmat(row0_ref, q0_ref, base_gc)
    W1 = wmat(row1_ref, q1_ref, base_gc + S)

    lag_ref[:] = jnp.dot(a[:, :B], z0, preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(a[:, B:2 * B], z1,
                          preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(a[:, 2 * B:], z2,
                          preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(W0, zf0_ref[0], preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(W1, zf1_ref[0], preferred_element_type=jnp.int32)
    sw = sw_ref[0]
    acc_ref[:] = acc_ref[:] + jnp.sum(
        (sw * z1.astype(jnp.float32)) * lag_ref[:].astype(jnp.float32),
        axis=0, keepdims=True)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _band_cross_win_pallas_i8(w_idx, starts, runs, A8, sw, Zp8, Zf, rowp,
                              qp, interpret: bool,
                              ring: int = 4) -> jax.Array:
    """cross_q[g] (z_q·w_q units, band + windowed far) — one fused kernel.

    Same operand layout as :func:`_fused_win_pallas_i8` minus the
    [nb, B, G] obs/count planes (the global statistic reduces to [G]).
    ``ring`` sets the Zp slab-ring depth (DMA pipelining; >=4).
    """
    nb, B, _ = A8.shape
    G = Zp8.shape[2]
    S = rowp.shape[2]
    blk = lambda i, w, s, c: (i, 0, 0)  # noqa: E731
    w0 = lambda i, w, s, c: (w[i], 0, 0)  # noqa: E731
    w1 = lambda i, w, s, c: (w[i] + 1, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, 3 * B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, S, G), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, G), w1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G), lambda i, w, s, c: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ring, B, G), jnp.int8),
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((B, G), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _band_cross_win_kernel_i8,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(w_idx, starts, runs, A8, sw, Zp8, Zf, Zf, rowp, rowp, qp, qp)
    return out[0]


def _band_cross_win_kernel_i4(widx_ref, start_ref, cnt_run_ref, a_ref,
                              sw_ref, zp_any, zf0_ref, zf1_ref, row0_ref,
                              row1_ref, q0_ref, q1_ref, out_ref, win_ref,
                              sem_ref, acc_ref, lag_ref):
    """NIBBLE-PACKED variant of :func:`_band_cross_win_kernel_i8`.

    ``zp_any``/``zf*`` carry two int4 gene codes per byte (split-half
    layout, :func:`_quantize_z4`): the DMA ring and both gathers move
    HALF the bytes of the int8 system — the draw's dominant cost at
    G>=4096 (the row gather is byte-bound past ~2 KB rows). Slabs unpack
    on the VPU right before each MXU dot (arithmetic shift + mask +
    lane-concat; ~int8-cheap) so the unpacked [B, G] codes exist only as
    register/VMEM temporaries.
    """
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    R = win_ref.shape[0]

    def dma(slab):
        return pltpu.make_async_copy(zp_any.at[slab], win_ref.at[slab % R],
                                     sem_ref.at[slab % R])

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for s in range(R - 1):
            dma(s).start()
        dma(0).wait()
        dma(1).wait()

    @pl.when(i + R - 1 < nsteps + 2)
    def _():
        dma(i + R - 1).start()

    dma(i + 2).wait()

    def unpack(pk):
        # int32 domain: Mosaic has no int8 vector shift (arith.shrsi on
        # vXi8 fails to legalize) — widen, shift, narrow
        zz = pk.astype(jnp.int32)
        hi = ((zz >> 4) & 15) - 8
        lo = (zz & 15) - 8
        return jnp.concatenate([hi, lo], axis=-1).astype(jnp.int8)

    B = win_ref.shape[1]
    S = zf0_ref.shape[1]
    a = a_ref[0]
    z0 = unpack(win_ref[i % R])
    z1 = unpack(win_ref[(i + 1) % R])
    z2 = unpack(win_ref[(i + 2) % R])

    start = start_ref[i]
    count = cnt_run_ref[i]
    base_gc = widx_ref[i] * S

    def wmat(row_ref, q_ref, gc0):
        gc = gc0 + jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        live = ((gc >= start) & (gc < start + count)).astype(jnp.int32)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
               == row_ref[0]).astype(jnp.int32)
        return (sel * (live * q_ref[0].astype(jnp.int32))).astype(jnp.int8)

    W0 = wmat(row0_ref, q0_ref, base_gc)
    W1 = wmat(row1_ref, q1_ref, base_gc + S)

    lag_ref[:] = jnp.dot(a[:, :B], z0, preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(a[:, B:2 * B], z1,
                          preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(a[:, 2 * B:], z2,
                          preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(W0, unpack(zf0_ref[0]),
                          preferred_element_type=jnp.int32)
    lag_ref[:] += jnp.dot(W1, unpack(zf1_ref[0]),
                          preferred_element_type=jnp.int32)
    sw = sw_ref[0]
    acc_ref[:] = acc_ref[:] + jnp.sum(
        (sw * z1.astype(jnp.float32)) * lag_ref[:].astype(jnp.float32),
        axis=0, keepdims=True)

    @pl.when(i == nsteps - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _band_cross_win_pallas_i4(w_idx, starts, runs, A8, sw, Zppk, Zfpk,
                              rowp, qp, interpret: bool,
                              ring: int = 4) -> jax.Array:
    """cross_q[g] for the nibble-packed system — one fused kernel.

    ``Zppk`` [nb+2, B, Gp2] and ``Zfpk`` [nw, S, Gp2] hold packed bytes;
    the output is [Gp] = [2*Gp2] f32 in natural gene order.
    """
    nb, B, _ = A8.shape
    Gp2 = Zppk.shape[2]
    G = 2 * Gp2
    S = rowp.shape[2]
    blk = lambda i, w, s, c: (i, 0, 0)  # noqa: E731
    w0 = lambda i, w, s, c: (w[i], 0, 0)  # noqa: E731
    w1 = lambda i, w, s, c: (w[i] + 1, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, 3 * B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, S, Gp2), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Gp2), w1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G), lambda i, w, s, c: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ring, B, Gp2), jnp.int8),
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((B, G), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        _band_cross_win_kernel_i4,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(w_idx, starts, runs, A8, sw, Zppk, Zfpk, Zfpk, rowp, rowp, qp, qp)
    return out[0]


def _band_cross_win_i8_xla(w_idx, starts, runs, A8, sw, Zp8, Zf, rowp,
                           qp) -> jax.Array:
    """XLA twin of :func:`_band_cross_win_pallas_i8` (tests / non-TPU):
    same quantized operator — band codes + per-row full scale + int8 far
    weight codes — evaluated with einsums + a segment add. Equal up to
    f32 summation order (the integer dots are exact in both)."""
    nb, B, _ = A8.shape
    G = Zp8.shape[2]
    S = qp.shape[2]
    n_padded = nb * B
    lag = jnp.zeros((nb, B, G), jnp.int32)
    for s in range(3):
        lag = lag + jnp.einsum(
            "nbw,nwg->nbg", A8[:, :, s * B:(s + 1) * B].astype(jnp.int32),
            Zp8[s:s + nb].astype(jnp.int32))
        lag = jax.lax.optimization_barrier(lag)
    lag = lag.reshape(n_padded, G)
    # far: edge e (compact order) adds q_e·zf_e to row (block(e)·B + rowp_e)
    F = Zf.shape[0] * Zf.shape[1]
    qf = qp.reshape(-1)[:F].astype(jnp.int32)
    rowf = rowp.reshape(-1)[:F]
    # block of each compact-list position: blocks own contiguous runs
    # (starts[n+1] = starts[n] + runs[n]); duplicate starts (zero runs)
    # resolve to the LAST block with that start, which is the owner.
    # Padded tail entries carry weight code 0 — their vals vanish.
    blk_of = (jnp.cumsum(jnp.zeros(F, jnp.int32).at[starts].add(
        jnp.ones(nb, jnp.int32), mode="drop")) - 1).astype(jnp.int32)
    dst = jnp.clip(blk_of, 0, nb - 1) * B + rowf
    vals = Zf.reshape(-1, G)[:F].astype(jnp.int32) * qf[:, None]
    lag = lag.at[dst].add(vals, mode="drop")
    z1 = Zp8.reshape(-1, G)[B:B + n_padded].astype(jnp.float32)
    swf = sw.reshape(n_padded, 1)
    return jnp.einsum("ig,ig->g", swf * z1, lag.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def _band_lag_count_kernel_i8(a_ref, far_ref, obs_ref, cnt_ref, zp_any,
                              out_ref, win_ref, sem_ref):
    """Fused LISA draw step: int8 MXU band lag + far add + |z·lag| vs
    observed comparison + counter update, one row block per grid step.

    The int32 lag never leaves VMEM — the XLA path materializes it (plus
    int32 casts of the band and window) in HBM every draw, which is the
    measured wall of local nulls at 1M cells. Same DMA ring as
    :func:`_band_halo_kernel_i8`; counters alias in-place.
    """
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def dma(slab):
        return pltpu.make_async_copy(zp_any.at[slab], win_ref.at[slab % 4],
                                     sem_ref.at[slab % 4])

    @pl.when(i == 0)
    def _():
        dma(0).start()
        dma(1).start()
        dma(2).start()
        dma(0).wait()
        dma(1).wait()

    @pl.when(i + 3 < nsteps + 2)
    def _():
        dma(i + 3).start()

    dma(i + 2).wait()

    B = win_ref.shape[1]
    a = a_ref[0]
    z0 = win_ref[i % 4]
    z1 = win_ref[(i + 1) % 4]
    z2 = win_ref[(i + 2) % 4]
    lag = jnp.dot(a[:, :B], z0, preferred_element_type=jnp.int32)
    lag = lag + jnp.dot(a[:, B:2 * B], z1, preferred_element_type=jnp.int32)
    lag = lag + jnp.dot(a[:, 2 * B:], z2, preferred_element_type=jnp.int32)
    lag = lag + far_ref[0]
    val = jnp.abs(z1.astype(jnp.int32) * lag)   # exact: <= k*127^3 < 2^31
    # Mosaic has no i8 vector add — widen to i32 for the +1, store narrow
    inc = (val >= obs_ref[0]).astype(jnp.int32)
    out_ref[0] = (cnt_ref[0].astype(jnp.int32) + inc).astype(cnt_ref.dtype)


def _band_lag_count_pallas_i8(A8, far, obs, cnt, Zp8,
                              interpret: bool) -> jax.Array:
    """count += (|z·(band_lag + far)| >= obs) per (cell, gene) — fused.

    ``far``/``obs`` are int32 [nb, B, G]; ``cnt`` int8/int16 [nb, B, G]
    aliases the output buffer. VMEM at B=256, G=1024: 4 int8 slabs (1 MB)
    + far/obs int32 blocks (1 MB each) + 2 count blocks — ~3.5 MB.
    """
    nb, B, _ = A8.shape
    G = Zp8.shape[2]
    blk = lambda i: (i, 0, 0)  # noqa: E731
    return pl.pallas_call(
        _band_lag_count_kernel_i8,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, 3 * B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, B, G), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, B, G), cnt.dtype),
        input_output_aliases={3: 0},
        scratch_shapes=[
            pltpu.VMEM((4, B, G), jnp.int8),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(A8, far, obs, cnt, Zp8)


def _n_win_extras(stat: str, alternative: str) -> int:
    """Extra per-stat VMEM operands of the fused windowed kernel,
    appended after the common (A8, obs, cnt, Zp, Zf×2, rowp×2, qp×2)
    list:

    * moran       —
    * geary       wq     [nb, B, 1] int32 (per-row total quantized weight)
    * lee         zx     [nb, B, G] int8  (fixed x codes, relabeled order)
    *             sw     [nb, B, 1] f32   (per-row weight scale, global L)
    * getis_star  c2     [nb, B, G] f32   (= (tot/m)·(W+1); two-sided only)
    * getis_g     lag_o  [nb, B, G] int32, me_o [nb, B, G] int8,
    *             wrow   [nb, B, 1] f32, tot [1, 1, G] f32, sq [1, 1, G] f32
    """
    if stat == "getis_star":
        return 1 if alternative == "two-sided" else 0
    return {"moran": 0, "geary": 1, "lee": 2, "getis_g": 5}[stat]


def _make_fused_win_kernel(stat: str, alternative: str, m: float):
    """Build the fused windowed-far draw-step kernel for one statistic.

    Shared machinery (identical across the family): the 4-slab DMA ring
    over ``Zp``, three int8 MXU band dots, and the windowed far layer —
    the compact far list is grouped by destination block (NullPlan run
    structure); block ``i``'s run lives in the two S-row windows
    ``w0 = starts[i] // S`` and ``w0+1`` of the pre-gathered far values
    ``Zf`` (S ≥ the max run length, so two windows always cover a run).
    The kernel rebuilds the one-hot far operator on-chip from the
    windowed (row-in-block, weight-code) vectors — masked to the run —
    and applies it as two extra int8 MXU dots. This replaces the dense
    ``[Npad, G]`` int32 far scatter+reread of the draw loop, the single
    largest stage of the measured per-draw budget (11.2 of 32.5 ms at
    G=512 — benchmarks/probe_lisa_stages.py).

    Per-stat tail (all decisions exact where the comparison domain is
    integer — integer adds commute, so those counts are bitwise-equal to
    the scatter/einsum paths):

    * ``moran``      count += |z·lag| ≥ obs                    (int32)
    * ``geary``      count += z²·W + lag(z²) − 2z·lag ≤ obs    (int32;
      lag(z²) via the two-plane split z² = 128a + b, planes derived
      from the int8 windows ON-CHIP — no extra gathers)
    * ``lee``        count += |x·lag| ≥ obs (int32) and a second output
      with the per-block f32 partial Σ_rows sw·x·lag of the global L
    * ``getis_star`` cp = (lag + x) − tm·(W+1), f32 elementwise — same
      expression tree as the XLA path
    * ``getis_g``    leave-one-out centering with the draw's own value,
      f32 elementwise (``m`` = n−1 static)
    """
    n_extra = _n_win_extras(stat, alternative)
    n_out = 2 if stat == "lee" else 1

    def kernel(widx_ref, start_ref, cnt_run_ref, a_ref, obs_ref, cnt_ref,
               zp_any, zf0_ref, zf1_ref, row0_ref, row1_ref, q0_ref, q1_ref,
               *rest):
        extras = rest[:n_extra]
        outs = rest[n_extra:n_extra + n_out]
        win_ref, sem_ref = rest[n_extra + n_out:]
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def dma(slab):
            return pltpu.make_async_copy(zp_any.at[slab],
                                         win_ref.at[slab % 4],
                                         sem_ref.at[slab % 4])

        @pl.when(i == 0)
        def _():
            dma(0).start()
            dma(1).start()
            dma(2).start()
            dma(0).wait()
            dma(1).wait()

        @pl.when(i + 3 < nsteps + 2)
        def _():
            dma(i + 3).start()

        dma(i + 2).wait()

        B = win_ref.shape[1]
        S = zf0_ref.shape[1]
        a = a_ref[0]
        z0 = win_ref[i % 4]
        z1 = win_ref[(i + 1) % 4]
        z2 = win_ref[(i + 2) % 4]

        start = start_ref[i]
        count = cnt_run_ref[i]
        base_gc = widx_ref[i] * S

        def wmat(row_ref, q_ref, gc0):
            # one-hot far operator [B, S] for this window, masked to the
            # run (a window can hold tails/heads of NEIGHBORING blocks'
            # runs — without the mask their rows would alias into this
            # block). Pure int32 arithmetic + final narrowing cast: an
            # i1-masked int8 select would need a (8,128)->(32,128) mask
            # relayout Mosaic cannot form.
            gc = gc0 + jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
            live = ((gc >= start) & (gc < start + count)).astype(jnp.int32)
            sel = (jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
                   == row_ref[0]).astype(jnp.int32)
            return (sel * (live * q_ref[0].astype(jnp.int32))).astype(
                jnp.int8)

        W0 = wmat(row0_ref, q0_ref, base_gc)
        W1 = wmat(row1_ref, q1_ref, base_gc + S)

        def lag_of(plane):
            # band + windowed far lag of one int8 plane of the values
            lag = jnp.dot(a[:, :B], plane(z0),
                          preferred_element_type=jnp.int32)
            lag = lag + jnp.dot(a[:, B:2 * B], plane(z1),
                                preferred_element_type=jnp.int32)
            lag = lag + jnp.dot(a[:, 2 * B:], plane(z2),
                                preferred_element_type=jnp.int32)
            lag = lag + jnp.dot(W0, plane(zf0_ref[0]),
                                preferred_element_type=jnp.int32)
            return lag + jnp.dot(W1, plane(zf1_ref[0]),
                                 preferred_element_type=jnp.int32)

        lag = lag_of(lambda z: z)
        me = z1.astype(jnp.int32)
        if stat == "moran":
            # exact: |z·lag| <= k*127^3 < 2^31
            inc = (jnp.abs(me * lag) >= obs_ref[0]).astype(jnp.int32)
        elif stat == "geary":
            wq_ref, = extras

            def aplane(z):
                zz = z.astype(jnp.int32)
                return ((zz * zz) >> 7).astype(jnp.int8)    # <= 126

            def bplane(z):
                zz = z.astype(jnp.int32)
                return ((zz * zz) & 127).astype(jnp.int8)

            lag_z2 = 128 * lag_of(aplane) + lag_of(bplane)
            gq = (me * me) * wq_ref[0] + lag_z2 - 2 * me * lag
            inc = (gq <= obs_ref[0]).astype(jnp.int32)
        elif stat == "lee":
            zx_ref, sw_ref = extras
            Lq = zx_ref[0].astype(jnp.int32) * lag          # exact int32
            inc = (jnp.abs(Lq) >= obs_ref[0]).astype(jnp.int32)
            outs[1][0] = jnp.sum(sw_ref[0] * Lq.astype(jnp.float32),
                                 axis=0, keepdims=True)
        elif stat == "getis_star":
            # A* = lag + own is exact int32; the centering constant
            # c = (tot/m)·(W+1) is draw-invariant, so one-sided decisions
            # reduce to pure integer comparisons, and two-sided to the
            # sign test (A_d−A_o)·(A_d+A_o−2c) ≥ 0 — the only f32 op is
            # one sub+mul on inputs bitwise-shared with the XLA body
            # (a product's sign is exact), so decisions match it bitwise.
            A = lag + me
            if alternative == "greater":
                ext = A >= obs_ref[0]
            elif alternative == "less":
                ext = A <= obs_ref[0]
            else:
                c2_ref, = extras
                d = (A - obs_ref[0]).astype(jnp.float32)
                s_ = (A + obs_ref[0]).astype(jnp.float32)
                ext = d * (s_ - 2.0 * c2_ref[0]) >= 0.0
            inc = ext.astype(jnp.int32)
        else:                                               # getis_g
            # leave-one-out centering depends on the draw's own value —
            # f32 is unavoidable, but an exact (lag, own) pair tie means
            # the draw statistic EQUALS the observed one, so it counts
            # as extreme under every alternative regardless of how the
            # two programs round cp. Same rule in the XLA body.
            lag_o_ref, me_o_ref, wrow_ref, tot_ref, sq_ref = extras
            mef = me.astype(jnp.float32)
            lagf = lag.astype(jnp.float32)
            xbar_i = (tot_ref[0] - mef) / m
            s2 = jnp.maximum((sq_ref[0] - mef * mef) / m
                             - xbar_i * xbar_i, 0.0)
            s = jnp.sqrt(jnp.where(s2 > 0.0, s2, 1.0))
            cp = (lagf - xbar_i * wrow_ref[0]) / s
            if alternative == "greater":
                ext = cp >= obs_ref[0]
            elif alternative == "less":
                ext = cp <= obs_ref[0]
            else:
                ext = jnp.abs(cp) >= jnp.abs(obs_ref[0])
            tie = ((lag == lag_o_ref[0])
                   & (me == me_o_ref[0].astype(jnp.int32)))
            inc = (ext | tie).astype(jnp.int32)
        # Mosaic has no i8 vector add — widen to i32 for the +1, store
        # narrow
        outs[0][0] = (cnt_ref[0].astype(jnp.int32) + inc).astype(
            cnt_ref.dtype)

    return kernel


def _fused_win_pallas_i8(stat, w_idx, starts, runs, A8, obs, cnt, Zp8,
                         Zf, rowp, qp, extras=(), *,
                         alternative: str = "two-sided", m: float = 0.0,
                         interpret: bool):
    """Fused windowed-far draw step — see :func:`_make_fused_win_kernel`.

    ``w_idx``/``starts``/``runs`` int32 [nb] = (window index
    starts[n]//S, run start, run length) per block — three separate 1-D
    scalar-prefetch arrays (a packed [nb, 3] operand lane-pads to 128
    columns in SMEM and blows its 1 MB budget at 1M cells);
    ``Zf`` int8 [nw, S, G] are the draw's far-target
    values in compact-list order; ``rowp``/``qp`` [nw, 1, S] carry each
    edge's destination row-in-block and weight code (the middle unit dim
    satisfies Mosaic's block-shape divisibility rule). ``cnt`` aliases
    the first output. Unlike :func:`_band_lag_count_pallas_i8` there is
    no [nb, B, G] far operand — the far layer never exists in HBM.

    Returns the updated counts, plus the [nb, 1, G] f32 per-block global
    partial for ``stat="lee"``.
    """
    nb, B, _ = A8.shape
    G = Zp8.shape[2]
    S = rowp.shape[2]
    blk = lambda i, w, s, c: (i, 0, 0)  # noqa: E731
    w0 = lambda i, w, s, c: (w[i], 0, 0)  # noqa: E731
    w1 = lambda i, w, s, c: (w[i] + 1, 0, 0)  # noqa: E731
    one = lambda i, w, s, c: (0, 0, 0)  # noqa: E731
    vec = pl.BlockSpec((1, B, 1), blk, memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, G), one, memory_space=pltpu.VMEM)
    big = pl.BlockSpec((1, B, G), blk, memory_space=pltpu.VMEM)
    extra_specs = {
        "moran": [],
        "geary": [vec],
        "lee": [big, vec],
        "getis_star": [big] if alternative == "two-sided" else [],
        "getis_g": [big, big, vec, row, row],
    }[stat]
    out_shape = [jax.ShapeDtypeStruct((nb, B, G), cnt.dtype)]
    out_specs = [pl.BlockSpec((1, B, G), blk, memory_space=pltpu.VMEM)]
    if stat == "lee":
        out_shape.append(jax.ShapeDtypeStruct((nb, 1, G), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, G), blk,
                                      memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, 3 * B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, S, G), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, G), w1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), w1, memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=out_specs if stat == "lee" else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((4, B, G), jnp.int8),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        _make_fused_win_kernel(stat, alternative, m),
        grid_spec=grid_spec,
        out_shape=out_shape if stat == "lee" else out_shape[0],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(w_idx, starts, runs, A8, obs, cnt, Zp8, Zf, Zf, rowp, rowp, qp, qp,
      *extras)


def _win_far_pack(far_src, far_dst, far_w, far_q, far_starts, rows_idx,
                  B: int, far_bmax: int):
    """Pack the compact far list into the windowed-kernel operands.

    Returns ``(S, nw, rowp, qp, rif, w_idx, starts0, runs)`` — see
    :func:`_fused_win_pallas_i8`. ``rif`` are the ORIGINAL-space rows of
    each far target (fixed relabel composition, same trick as rows_idx):
    per draw the caller gathers ``Zq[perm∘rif]`` — padding gathers row 0
    but carries weight code 0, contributing nothing.
    """
    S = _round_up(max(int(far_bmax), 1), 128)
    F = far_src.shape[0]
    nw = -(-F // S) + 2
    pad = nw * S - F
    rowp = jnp.pad(jnp.where(far_w > 0, (far_src - B) % B, 0)
                   .astype(jnp.int32), (0, pad)).reshape(nw, 1, S)
    qp = jnp.pad(jnp.clip(far_q, 0, 127).astype(jnp.int8),
                 (0, pad)).reshape(nw, 1, S)
    rif = rows_idx[jnp.pad(far_dst, (0, pad))]
    w_idx = (far_starts[:-1] // S).astype(jnp.int32)
    starts0 = far_starts[:-1].astype(jnp.int32)
    runs = (far_starts[1:] - far_starts[:-1]).astype(jnp.int32)
    return S, nw, rowp, qp, rif, w_idx, starts0, runs


def _band_cross_i8_xla(A8, sw, Zp8) -> jax.Array:
    """XLA reference path for the int8 band (tests / non-TPU backends):
    identical integer arithmetic, batched einsums."""
    nb, B, _ = A8.shape
    G = Zp8.shape[2]
    zblk = Zp8[1:nb + 1]
    cross = jnp.zeros((G,), jnp.float32)
    for s in range(3):
        lag = jnp.einsum("nbw,nwg->nbg",
                         A8[:, :, s * B:(s + 1) * B].astype(jnp.int32),
                         Zp8[s:s + nb].astype(jnp.int32))
        cross = cross + jnp.einsum(
            "nbg,nbg->g",
            sw * zblk.astype(jnp.float32), lag.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        cross = jax.lax.optimization_barrier(cross)
    return cross


def _banded_stat_i8(A8, sw, far_src, far_dst, far_w, rc_sum, Zq, sz2, den,
                    S0, rows, *, block: int, n: int, stat: str,
                    use_xla: bool = False, interpret: bool = False):
    """One draw's statistic [G] in the int8 system.

    Band products are exact integers scaled by sw (per band row) and the
    far einsum uses the exact f32 weights; one sz² converts both back to
    z units. ``rows`` is the draw's already-composed padded row-index
    vector ``perm[order[gidx]]`` (the identity placement passes
    ``order[gidx]`` itself), so the SAME operator serves draws and the
    observed configuration and the only gather here is the value rows.
    """
    B = block
    nb = A8.shape[0]
    G = Zq.shape[1]
    Zp = Zq[rows].reshape(nb + 2, B, G)           # int8 row gather
    if use_xla:
        cross_q = _band_cross_i8_xla(A8, sw, Zp)
    else:
        cross_q = _band_cross_pallas_i8(A8, sw, Zp, interpret=interpret)
    flat = Zp.reshape(-1, G)
    # cap the far-edge f32 temps at ~1.5 GB per gather: beyond the
    # measured headline regime (G=4096, F≈2.5% of N·k → 2.4 GB single-
    # shot, fine on a v5e) a high far fraction (graph_order fallback,
    # small blocks) would materialize multi-GB casts next to the
    # resident Zq tile; chunk + barrier caps the peak without changing
    # the gathered row count (the stage is issue-bound per row)
    F = int(far_src.shape[0])
    fbytes = F * G * 4
    n_fc = 1 if fbytes <= (3 << 30) else -(-fbytes // (3 << 29))
    fc = -(-F // n_fc)
    for i in range(n_fc):
        sl = slice(i * fc, min((i + 1) * fc, F))
        fs = flat[far_src[sl]].astype(jnp.float32)
        ft = flat[far_dst[sl]].astype(jnp.float32)
        cross_q = cross_q + jnp.einsum("f,fg,fg->g", far_w[sl], fs, ft,
                                       preferred_element_type=jnp.float32)
        if n_fc > 1:
            cross_q = jax.lax.optimization_barrier(cross_q)
    cross = cross_q * sz2
    if stat == "moran":
        return (n / S0) * cross / den
    zp2 = jnp.square(flat[B:B + nb * B].astype(jnp.float32)) * sz2
    sq = jnp.einsum("i,ig->g", rc_sum, zp2)
    geary = (n - 1) * (sq - 2.0 * cross) / (2.0 * S0 * den)
    if stat == "geary":
        return geary
    # fused "moran_geary": both statistics from the SAME gather + band
    # matmuls — the per-draw row gather is issue-bound (docs/performance.md),
    # so the second statistic costs only the cheap sq reduction
    return jnp.stack([(n / S0) * cross / den, geary])


def _banded_stat_i8_win(A8, sw, win_ops, rc_sum, Zq, sz2, den, S0, rows,
                        rowsf, *, block: int, n: int, stat: str,
                        use_xla: bool = False, interpret: bool = False):
    """One draw's statistic [G] in the int8 system with WINDOWED far edges.

    Replaces :func:`_banded_stat_i8`'s exact-f32 far stage (two [F, G]
    f32 gathers per draw) with one compact [F] int8 gather (``rowsf`` is
    the draw's composed far-target rows) + two on-chip one-hot dots —
    the far weights quantize per row with the FULL-row scale so the
    operator stays fixed across draws (VERDICT r3 item 1).
    """
    S, nw, rowp, qp, w_idx, starts0, runs = win_ops
    B = block
    nb = A8.shape[0]
    G = Zq.shape[1]
    Zp = Zq[rows].reshape(nb + 2, B, G)           # int8 row gather
    Zf = Zq[rowsf].reshape(nw, S, G)              # compact far gather
    if use_xla:
        cross_q = _band_cross_win_i8_xla(w_idx, starts0, runs, A8, sw, Zp,
                                         Zf, rowp, qp)
    else:
        cross_q = _band_cross_win_pallas_i8(w_idx, starts0, runs, A8, sw,
                                            Zp, Zf, rowp, qp,
                                            interpret=interpret,
                                            ring=_win_ring())
    cross = cross_q * sz2
    if stat == "moran":
        return (n / S0) * cross / den
    flat = Zp.reshape(-1, G)
    zp2 = jnp.square(flat[B:B + nb * B].astype(jnp.float32)) * sz2
    sq = jnp.einsum("i,ig->g", rc_sum, zp2)
    geary = (n - 1) * (sq - 2.0 * cross) / (2.0 * S0 * den)
    if stat == "geary":
        return geary
    return jnp.stack([(n / S0) * cross / den, geary])


def _banded_stat_i4_win(A8, sw, win_ops, rc_sum, Zpk, sz2, den, S0, rows,
                        rowsf, *, block: int, n: int, stat: str,
                        use_xla: bool = False, interpret: bool = False):
    """One draw's statistic [G] in the NIBBLE-PACKED int4 system.

    Both gathers move packed bytes (half the int8 system's bytes — the
    byte-bound row gather is the draw's wall at G>=4096); the fused
    kernel unpacks on-chip. Same windowed-far operator structure as
    :func:`_banded_stat_i8_win`.
    """
    S, nw, rowp, qp, w_idx, starts0, runs = win_ops
    B = block
    nb = A8.shape[0]
    Gp2 = Zpk.shape[1]
    Zp = Zpk[rows].reshape(nb + 2, B, Gp2)        # packed row gather
    Zf = Zpk[rowsf].reshape(nw, S, Gp2)           # packed far gather
    if use_xla:
        cross_q = _band_cross_win_i8_xla(
            w_idx, starts0, runs, A8, sw, _unpack_nibbles(Zp),
            _unpack_nibbles(Zf), rowp, qp)
    else:
        cross_q = _band_cross_win_pallas_i4(
            w_idx, starts0, runs, A8, sw, Zp, Zf, rowp, qp,
            interpret=interpret, ring=_win_ring())
    cross = cross_q * sz2
    if stat == "moran":
        return (n / S0) * cross / den
    flat = _unpack_nibbles(Zp.reshape(-1, Gp2))
    zp2 = jnp.square(flat[B:B + nb * B].astype(jnp.float32)) * sz2
    sq = jnp.einsum("i,ig->g", rc_sum, zp2)
    geary = (n - 1) * (sq - 2.0 * cross) / (2.0 * S0 * den)
    if stat == "geary":
        return geary
    return jnp.stack([(n / S0) * cross / den, geary])


def _banded_stat(A, far_src, far_dst, far_w, rc_sum, Ztab, den, S0, rows,
                 *, block: int, n: int, stat: str, band_impl: str = "xla",
                 interpret: bool = False):
    """One draw's global statistic [G] via three batched band matmuls.

    ``Zp`` is laid out as [nb+2, B, G]: one front and one tail pad block of
    clipped rows whose values never reach the output (their band columns are
    all zero-weight). ``Ztab`` may be bf16 (default null mode) or f32.
    ``rows`` is the already-composed padded row-index vector (see
    :func:`_banded_stat_i8`). ``band_impl="pallas"`` fuses the band
    matmuls + reduction on-chip.
    """
    B = block
    nb = A.shape[0]
    G = Ztab.shape[1]
    Zp = Ztab[rows].reshape(nb + 2, B, G)         # ONE random row gather

    zblk = Zp[1:nb + 1]
    if band_impl == "pallas_halo":
        cross = _band_cross_pallas_halo(A, Zp, interpret=interpret)
    elif band_impl == "pallas_halo4":
        cross = _band_cross_pallas_halo4(A, Zp, interpret=interpret)
    elif band_impl == "pallas":
        cross = _band_cross_pallas(A, Zp, interpret=interpret)
    else:
        cross = jnp.zeros((G,), jnp.float32)
        lag_dt = Ztab.dtype  # bf16 lag halves the [nb,B,G] temp traffic;
        # the final contraction still accumulates in f32
        for s in range(3):
            lag_s = jnp.einsum("nbw,nwg->nbg", A[:, :, s * B:(s + 1) * B],
                               Zp[s:s + nb], preferred_element_type=lag_dt)
            cross = cross + jnp.einsum("nbg,nbg->g", zblk, lag_s,
                                       preferred_element_type=jnp.float32)
            cross = jax.lax.optimization_barrier(cross)

    flat = Zp.reshape(-1, G)
    # keep the far gathers in the table dtype (bf16 in the default null
    # mode): f32 copies of two [F, G] gathers cost ~4.3 GB at G=2048 and
    # tipped the full workload over a v5e's HBM; the einsum accumulates
    # in f32 either way (same precision class as the bf16 band matmuls)
    fs = flat[far_src]
    ft = flat[far_dst]
    cross = cross + jnp.einsum("f,fg,fg->g", far_w.astype(flat.dtype),
                               fs, ft,
                               preferred_element_type=jnp.float32)

    if stat == "moran":
        return (n / S0) * cross / den
    zp2 = jnp.square(flat[B:B + nb * B].astype(jnp.float32))
    sq = jnp.einsum("i,ig->g", rc_sum, zp2)
    geary = (n - 1) * (sq - 2.0 * cross) / (2.0 * S0 * den)
    if stat == "geary":
        return geary
    return jnp.stack([(n / S0) * cross / den, geary])


@functools.partial(jax.jit, static_argnames=(
    "block", "n", "stat", "alternative", "n_permutations", "precision",
    "perm_method", "band_impl", "far_mode", "far_bmax", "interpret"))
def _banded_test(order, local_idx, w_local, far_src, far_dst, far_w, rc_sum,
                 Z, S0, observed, seed, den, sz=None,
                 draw0=jnp.uint32(0), far_starts=None, *, block: int, n: int,
                 n_permutations: int, stat: str, alternative: str,
                 precision: str, perm_method: str, band_impl: str = "xla",
                 far_mode: str = "exact", far_bmax: int = 0,
                 interpret: bool = False):
    prepacked = precision == "int4" and Z.dtype == jnp.int8
    if den is None:
        if prepacked:
            # packed bytes: den from the unpacked CODES (consistent with
            # the quantized operator: Σ (c·s)² per gene)
            if sz is None:
                raise ValueError("int4 Z requires its per-gene scale `sz`")
            codes = _unpack_nibbles(Z).astype(jnp.float32)
            den = jnp.sum(codes * codes, axis=0) * sz * sz
        else:
            den = jnp.sum(Z.astype(jnp.float32) ** 2, axis=0)
            if precision == "int8" and Z.dtype == jnp.int8:
                # Z holds quantized CODES: Σ code² is den/s_g² — rescale
                # to z units so the returned null mean/std keep
                # statistic units
                if sz is None:
                    raise ValueError(
                        "int8 Z requires its per-gene scale `sz`")
                den = den * sz * sz
        den = jnp.where(den > 0, den, 1.0)
    G = Z.shape[1] * (2 if prepacked else 1)
    nbb = local_idx.shape[0] // block
    # padded row-relabel indices, fixed across draws: per draw the value
    # rows are Z[perm[rows_idx]] — with the Feistel stream that composes
    # to ONE elementwise bijection evaluation + ONE row gather (no [n]
    # permutation materialization, no int32 reorder gather)
    gidx = jnp.clip(jnp.arange((nbb + 2) * block, dtype=jnp.int32) - block,
                    0, n - 1)
    rows_idx = order[gidx]
    rif = None
    if precision == "int4":
        # NIBBLE-PACKED system: always windowed far (the exact-far path
        # has no packed form); validated by banded_permutation_test
        if prepacked:
            Zpk, s_z = Z, sz
        else:
            Zpk, s_z = _quantize_z4(Z)
        sz2 = s_z * s_z
        n_padded = local_idx.shape[0]
        local_max = jnp.max(w_local.astype(jnp.float32), axis=1)
        far_max = jnp.zeros((n_padded,), jnp.float32).at[
            far_src - block].max(far_w.astype(jnp.float32), mode="drop")
        rowmax = jnp.maximum(local_max, far_max)
        sw_row = jnp.where(rowmax > 0, rowmax / 127.0, 1.0)
        A8, sw = _build_band_i8(local_idx, w_local, block,
                                row_scale=sw_row.reshape(nbb, block, 1))
        far_q = jnp.clip(jnp.round(far_w / sw_row[far_src - block]),
                         0, 127)
        S, nw, rowp, qp, rif, w_idx, starts0, runs = _win_far_pack(
            far_src, far_dst, far_w, far_q, far_starts, rows_idx,
            block, far_bmax)
        win_ops = (S, nw, rowp, qp, w_idx, starts0, runs)

        def stat_fn(rows, rowsf):
            return _banded_stat_i4_win(
                A8, sw, win_ops, rc_sum, Zpk, sz2, den, S0, rows, rowsf,
                block=block, n=n, stat=stat,
                use_xla=(band_impl == "xla"), interpret=interpret)

        observed = stat_fn(rows_idx, rif)
    elif precision == "int8":
        if Z.dtype == jnp.int8:
            if sz is None:
                raise ValueError("int8 Z requires its per-gene scale `sz`")
            Zq, s_z = Z, sz           # pre-quantized table (streaming prep)
        else:
            Zq, s_z = _quantize_z(Z)
        sz2 = s_z * s_z
        if far_mode == "win":
            # full-row weight scale (band + far rowmax) so far codes
            # don't clip — same convention as _banded_local_moran_p_i8
            n_padded = local_idx.shape[0]
            local_max = jnp.max(w_local.astype(jnp.float32), axis=1)
            far_max = jnp.zeros((n_padded,), jnp.float32).at[
                far_src - block].max(far_w.astype(jnp.float32), mode="drop")
            rowmax = jnp.maximum(local_max, far_max)
            sw_row = jnp.where(rowmax > 0, rowmax / 127.0, 1.0)
            A8, sw = _build_band_i8(local_idx, w_local, block,
                                    row_scale=sw_row.reshape(nbb, block, 1))
            far_q = jnp.clip(jnp.round(far_w / sw_row[far_src - block]),
                             0, 127)
            S, nw, rowp, qp, rif, w_idx, starts0, runs = _win_far_pack(
                far_src, far_dst, far_w, far_q, far_starts, rows_idx,
                block, far_bmax)
            win_ops = (S, nw, rowp, qp, w_idx, starts0, runs)

            def stat_fn(rows, rowsf):
                return _banded_stat_i8_win(
                    A8, sw, win_ops, rc_sum, Zq, sz2, den, S0, rows, rowsf,
                    block=block, n=n, stat=stat,
                    use_xla=(band_impl == "xla"), interpret=interpret)
        else:
            A8, sw = _build_band_i8(local_idx, w_local, block)

            def stat_fn(rows, rowsf=None):
                return _banded_stat_i8(
                    A8, sw, far_src, far_dst, far_w, rc_sum, Zq, sz2, den,
                    S0, rows, block=block, n=n, stat=stat,
                    use_xla=(band_impl == "xla"), interpret=interpret)

        # compare draws against the observed value of the SAME quantized
        # operator (identity placement: rows = order[gidx])
        observed = stat_fn(rows_idx, rif)
    else:
        wdt = jnp.bfloat16 if precision == "bf16" else Z.dtype
        if band_impl == "pallas_halo4":
            A = _build_band_rot4(local_idx, w_local, block, wdt)
        else:
            A = _build_band(local_idx, w_local, block, wdt)
        Ztab = Z if Z.dtype == wdt else Z.astype(wdt)

        def stat_fn(rows, rowsf=None):
            return _banded_stat(A, far_src, far_dst, far_w, rc_sum, Ztab,
                                den, S0, rows, block=block, n=n, stat=stat,
                                band_impl=band_impl, interpret=interpret)

    if perm_method == "sort":
        base = key_for(seed, "perm_global", 0)
    else:
        base = key_for(seed, "perm_feistel", 0)

    def body(carry, step):
        count, s1, s2 = carry
        # draw0 is TRACED: chunked callers pass their absolute draw
        # offset so the stream is keyed by global draw index — results
        # are bitwise independent of the chunk split (CLAUDE.md hard
        # rule) and chunks reuse one compiled executable
        key = jax.random.fold_in(base, step + draw0)
        if perm_method == "sort":
            # compose with the relabeling so each draw assigns values to
            # cells EXACTLY as the legacy path does: new position p gets
            # Z[perm[order[p]]]
            perm = jax.random.permutation(key, n)
            rows = perm[rows_idx]
            rowsf = perm[rif] if rif is not None else None
        else:
            rows = feistel_apply(key, rows_idx, n)
            rowsf = feistel_apply(key, rif, n) if rif is not None else None
        vals = stat_fn(rows, rowsf)

        def _extreme(v, o, alt):
            if alt == "greater":
                return v >= o
            if alt == "less":
                return v <= o
            return jnp.abs(v) >= jnp.abs(o)

        if stat == "moran_geary":
            alts = (alternative if isinstance(alternative, tuple)
                    else (alternative, alternative))
            extreme = jnp.stack([_extreme(vals[i], observed[i], alts[i])
                                 for i in range(2)])
        else:
            extreme = _extreme(vals, observed, alternative)
        return (count + extreme.astype(jnp.int32),
                s1 + vals, s2 + vals * vals), None

    out_shape = (2, G) if stat == "moran_geary" else (G,)
    init = (jnp.zeros(out_shape, jnp.int32),
            jnp.zeros(out_shape, jnp.float32),
            jnp.zeros(out_shape, jnp.float32))
    # unroll=1 (round 3): unroll=2 measured NO throughput win (17.57k vs
    # 17.77k at 1M x 2048 x 100 — the loop is bandwidth-bound, matching
    # the docs/performance.md dead-end note) while keeping a second 4.1 GB
    # Zp temp alive; dropping it frees the headroom the streaming driver
    # needs next to a resident gene tile
    (count, s1, s2), _ = jax.lax.scan(body, init,
                                      jnp.arange(n_permutations,
                                                 dtype=jnp.uint32),
                                      unroll=1)
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
    perm_method: str = "feistel",
    band_impl: str = "auto",
    den: Optional[jax.Array] = None,
    sz: Optional[jax.Array] = None,
    draw_offset: int = 0,
    far_mode: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for ``permutation_test_global`` using a NullPlan.

    ``draw_offset`` keys this call's draws at global indices
    ``[draw_offset, draw_offset + n_permutations)`` of the seed's stream:
    chunked callers (bench.py, ops/streaming.py) split a P-draw run into
    chunks that reproduce the unchunked run bitwise (the offset is a
    traced scalar — no recompile per chunk).

    ``perm_method="feistel"`` (default) draws permutations from the sort-free
    Feistel stream — its own seeded, device-independent sequence.
    ``perm_method="sort"`` reuses the legacy draw stream: values then differ
    from ``permutation_test_global`` only by floating-point summation order
    (and by ~3-digit rounding with the default bf16 band — nulls feed
    Monte-Carlo *counting*, where that precision is statistically invisible;
    pass precision="f32" for exact-order validation).

    ``band_impl``: "pallas" fuses the band contraction on-chip, "xla" uses
    batched einsums, "pallas_halo" reads Zp once with manual halo DMA and
    materializes no [nb, B, G] lag temp. "pallas_halo4" is the
    rotation-baked experiment: one K=4B fused dot per grid step instead of
    three K=B dots (+33% redundant FLOPs, single g-tile only — VMEM holds
    the whole [4B, G] window, so G <= 2048 at B=256). "auto" picks "xla" below G=1536
    (they tie at G≤1024) and "pallas_halo" at wider gene tiles on real
    TPUs, where skipping the lag-temp HBM traffic wins ~9% (measured
    17.7k vs 16.3k genes·perms/s at 1M×2048). On non-TPU backends Pallas
    runs in interpret mode — correct but slow, for tests — so "auto"
    stays "xla" there.

    Memory note: at large N·G pass ``Z`` already cast to bfloat16 together
    with a precomputed f32 ``den`` (= Σ z² per gene) so no float32 copy of
    Z needs to stay resident during the scan.

    ``precision="int8"``: the null system quantizes z per gene (s_g =
    min(max|z|, 8)/127, outliers saturate) and band weights per row; the
    band matmuls become exact int8×int8→int32 MXU dots and every gather
    moves half the bytes. 8-bit mantissa bf16 and scaled int8 are the
    same precision class, but int8 lets the gene tile double to 4096 in
    the same VMEM/HBM footprint — measured ~40% cheaper per gene·perm at
    1M cells. Draws are compared against the observed value of the SAME
    quantized operator (the ``observed`` argument is ignored), so the
    Monte-Carlo counting stays internally consistent; mean/std of the
    null are returned in statistic units.
    """
    _check_perm_method(perm_method)
    interpret = jax.default_backend() != "tpu"
    prepacked = precision == "int4" and Z.dtype == jnp.int8
    G = Z.shape[1] * (2 if prepacked else 1)
    if precision not in ("int8", "int4") and far_mode == "win":
        raise ValueError("far_mode='win' requires precision='int8'/'int4' "
                         "(the windowed far operator is int8-quantized)")
    if precision == "int4":
        # nibble-packed: two genes per byte halve BOTH per-draw gathers
        # (the byte-bound wall past ~2 KB rows); windowed far only
        if plan.far_starts is None or plan.far_bmax <= 0:
            raise ValueError(
                "precision='int4' needs a NullPlan with far-run structure "
                "(far_starts/far_bmax); rebuild via build_null_plan")
        if far_mode == "exact":
            raise ValueError("precision='int4' has no exact-far path; use "
                             "far_mode='win' (or 'auto')")
        far_mode = "win"
        if band_impl == "auto":
            band_impl = "xla" if interpret else "pallas_halo"
        # each packed half must stay 128-lane aligned -> 256-multiple G
        pad_g = (-G) % 256
        if prepacked and pad_g:
            raise ValueError(
                f"pre-packed int4 tables must cover a 256-multiple gene "
                f"count, got G={G}")
        if band_impl != "xla" and not interpret:
            Gp = G + pad_g
            S4 = _round_up(max(plan.far_bmax, 1), 128)
            R4 = _win_ring()
            # packed ring + int32 lag + 2 double-buffered packed windows
            # + ~3 unpacked [B, G] value temps
            vmem = Gp * ((R4 * plan.block) // 2 + 4 * plan.block
                         + 2 * S4 + 3 * plan.block)
            if vmem > 14 * 2 ** 20:
                raise ValueError(
                    f"int4 windowed kernel VMEM estimate {vmem/2**20:.1f}M "
                    f"exceeds budget at G={G}, block={plan.block}; tile "
                    f"the gene axis (ops/streaming.py)")
    elif precision == "int8":
        if band_impl == "auto":
            band_impl = "xla" if interpret else "pallas_halo"
        if far_mode == "auto":
            # windowed far: removes the two [F, G] f32 far gathers per
            # draw; needs the plan's run structure + a VMEM fit (the win
            # kernel holds 2 S-row far windows next to the band slabs)
            far_mode = ("win" if plan.far_starts is not None
                        and plan.far_bmax > 0
                        and _gwin_fits_vmem(_round_up(G, 128), plan.block,
                                            plan.far_bmax)
                        else "exact")
        if far_mode == "win":
            pad_g = (-G) % 128    # win kernel lanes (also in xla-twin
            #                       mode: keep the two impls bit-shaped)
        else:
            pad_g = 0 if band_impl == "xla" else (-G) % 128
        if (far_mode != "win" and band_impl != "xla"
                and G + pad_g > 4096):
            raise ValueError(
                f"int8 band kernel holds one gene tile in VMEM (G <= 4096); "
                f"got G={G}. Tile the gene axis (ops/streaming.py) or pass "
                f"band_impl='xla'.")
        if (far_mode == "win" and band_impl != "xla" and not interpret
                and not _gwin_fits_vmem(G + pad_g, plan.block,
                                        plan.far_bmax)):
            raise ValueError(
                f"windowed int8 band kernel VMEM estimate exceeds budget at "
                f"G={G}, block={plan.block}, far_bmax={plan.far_bmax}; tile "
                f"the gene axis (ops/streaming.py) or pass far_mode='exact'.")
        if far_mode == "win" and (plan.far_starts is None
                                  or plan.far_bmax <= 0):
            raise ValueError("far_mode='win' needs a NullPlan with far-run "
                             "structure (far_starts/far_bmax); rebuild the "
                             "plan with ops.banded.build_null_plan")
    elif band_impl == "auto":
        band_impl = ("pallas_halo"
                     if Z.shape[1] >= 1536 and not interpret else "xla")
        pad_g = 0
    if precision not in ("int8", "int4"):
        if band_impl == "pallas_halo" and not interpret:
            ngt, Gt = _halo_tiles(G)
            pad_g = ngt * Gt - G    # equal lane-aligned g-tiles (VMEM cap)
        elif band_impl.startswith("pallas") and not interpret:
            pad_g = (-G) % 128
        else:
            pad_g = 0
    if stat == "moran_geary":
        # fused mode: one gather + one set of band matmuls per draw serves
        # BOTH statistics; ``observed`` must be [2, G] (moran, geary) and
        # ``alternative`` may be a 2-tuple (one per statistic). Outputs are
        # [2, G] stacked the same way. With int8 precision ``observed`` is
        # recomputed under the quantized operator and the argument ignored.
        observed = jnp.asarray(observed)
        if observed.ndim != 2 or observed.shape[0] != 2:
            raise ValueError(
                "stat='moran_geary' needs observed of shape [2, G] "
                "(stacked moran, geary)")
        if isinstance(alternative, (tuple, list)):
            alternative = tuple(alternative)
            if len(alternative) != 2:
                raise ValueError("fused alternative must have 2 entries")
    if pad_g:
        Z = jnp.pad(Z, ((0, 0), (0, pad_g)))
        obs_pad = ((0, 0), (0, pad_g)) if observed.ndim == 2 else (0, pad_g)
        observed = jnp.pad(observed, obs_pad)
        if den is not None:
            den = jnp.pad(den, (0, pad_g), constant_values=1.0)
        if sz is not None:
            sz = jnp.pad(sz, (0, pad_g), constant_values=1.0)
    p, mean, std = _banded_test(
        plan.order, plan.local_idx, plan.w_local, plan.far_src, plan.far_dst,
        plan.far_w, plan.rc_sum, Z, S0, observed, jnp.uint32(seed), den, sz,
        jnp.uint32(draw_offset),
        plan.far_starts if far_mode == "win" else None,
        block=plan.block, n=plan.n,
        n_permutations=n_permutations, stat=stat, alternative=alternative,
        precision=precision, perm_method=perm_method, band_impl=band_impl,
        far_mode=far_mode if precision in ("int8", "int4") else "exact",
        far_bmax=plan.far_bmax if far_mode == "win" else 0,
        interpret=interpret)
    if pad_g:
        p, mean, std = p[..., :G], mean[..., :G], std[..., :G]
    return p, mean, std


# ---------------------------------------------------------------------------
# Banded LOCAL Moran (LISA) — the reference's worst-scaling workload
# ---------------------------------------------------------------------------


#: gene-column chunk width for one-time observed-statistic passes
_OBS_CHUNK = 256


def _chunked_cols(fn, arrs, G, width=None):
    """Evaluate ``fn`` over gene-column chunks of its ``[:, G]`` operands.

    The local kernels' OBSERVED pass runs the full-width XLA einsum body
    once — which materializes several int32/f32 ``[Npad, G]`` temps at
    the same time (value casts, z² planes, per-family lags). Measured at
    1M cells × G=512 the local-Geary observed pass faults with
    RESOURCE_EXHAUSTED where its draw *scan* fits comfortably (the scan
    keeps the lag in VMEM via the fused kernel). Chunking the one-time
    pass caps the peak at one chunk's temps next to the accumulated
    output; the barrier stops XLA from re-batching chunks into the very
    full-width temps this exists to avoid. Outputs concatenate on the
    last (gene) axis; ``fn`` may return one array or a tuple.

    Memory-cap caveat (ADVICE r3): the chunks share no data dependency,
    so the barrier prevents op-level FUSION across chunks but cannot
    force the scheduler to serialize their subgraphs — the cap relies on
    measured scheduler behavior (XLA:TPU schedules the independent
    chunk subgraphs sequentially in practice; the 1M-cell local-Geary
    observed pass that motivated this helper stopped faulting). A
    guaranteed-by-construction cap would need a threaded data
    dependency, which either changes the static slicing to dynamic or
    gets constant-folded away; revisit only if a regression is measured.
    """
    if width is None:
        width = _OBS_CHUNK   # module attr, so tests can patch it
    if G <= width:
        return fn(*arrs)
    single = False
    parts = []
    for s in range(0, G, width):
        res = fn(*(a[:, s:s + width] for a in arrs))
        if not isinstance(res, tuple):
            single, res = True, (res,)
        parts.append(jax.lax.optimization_barrier(res))
    outs = tuple(jnp.concatenate([p[i] for p in parts], axis=-1)
                 for i in range(len(parts[0])))
    return outs[0] if single else outs


def _banded_lag(A, Zp, far_src, far_dst, far_w, *, block: int):
    """Full spatial lag [Npad, G] of the permuted values, banded + far.

    Three batched band matmuls produce the in-band lag; the few percent of
    far edges scatter-add their contributions (duplicate rows accumulate).
    """
    B = block
    nb = A.shape[0]
    G = Zp.shape[2]
    lag = jnp.zeros((nb, B, G), jnp.float32)
    for s in range(3):
        lag = lag + jnp.einsum("nbw,nwg->nbg", A[:, :, s * B:(s + 1) * B],
                               Zp[s:s + nb],
                               preferred_element_type=jnp.float32)
        lag = jax.lax.optimization_barrier(lag)
    flat = lag.reshape(nb * B, G)
    vals = Zp.reshape(-1, G)[far_dst].astype(jnp.float32) * far_w[:, None]
    # far_src carries the +B pad offset; padded entries have far_w == 0
    flat = flat.at[far_src - B].add(vals, mode="drop")
    return flat                                   # [Npad, G]


@functools.partial(jax.jit, static_argnames=(
    "block", "n", "n_permutations", "perm_method", "band_impl",
    "far_bmax", "interpret", "return_counts"))
def _banded_local_moran_p_i8(order, rank, local_idx, w_local, far_src,
                             far_dst, far_w, Z, seed, *, block: int, n: int,
                             n_permutations: int, perm_method: str,
                             band_impl: str = "xla",
                             far_starts=None, far_bmax: int = 0,
                             interpret: bool = False,
                             return_counts: bool = False):
    """LISA permutation p via the int8 null system.

    Quantized-operator convention (same as the global int8 mode): z
    quantizes per gene (:func:`_quantize_z`), band weights per row
    (:func:`_build_band_i8`); each draw's local statistic is
    ``z_q · (sw·(A8 @ z_q) + far)`` with exact int8×int8→int32 band dots,
    and the observed value comes from the SAME operator at the identity
    placement — counting compares like with like, and the per-gene scale
    s_g² (and per-row sw, which multiplies both sides of every row's
    comparison) cancels inside ``|I_perm| ≥ |I_obs|``.

    Why int8 for LOCAL statistics: the [N, G] elementwise traffic (count
    read+write, lag, Ip, observed) dominates local nulls — not the
    gathers (docs/performance.md). This kernel is FULLY INTEGER: far
    weights quantize with the same per-row scale as the band (computed
    over the FULL row incl. far edges so nothing clips), the per-draw
    statistic is the exact int32 ``|z_code · Σ w_code z_code|`` (bounded
    by k·127³ < 2³¹ for k ≤ 1000), the observed side comes from the SAME
    operator, and the counters run int8 for P ≤ 127 (int16 ≤ 32767) —
    no f32 [N, G] array is ever materialized in the draw loop. Per row
    the shared (s_g²·sw) factor multiplies both sides of every
    comparison, so decisions equal those of the quantized-weights
    f32 operator exactly.
    """
    B = block
    n_padded = local_idx.shape[0]
    nb = n_padded // B
    G = Z.shape[1]
    k_total = local_idx.shape[1]
    if k_total > 1000:
        raise ValueError(
            f"int8 LISA null supports k <= 1000 (int32 bound k*127^3), "
            f"got k={k_total}; use precision='bf16'")
    Zq, _ = _quantize_z(Z) if Z.dtype != jnp.int8 else (Z, None)
    # full-row weight scale: a far edge can carry the row's max weight,
    # so the band-local rowmax would clip it at 127
    local_max = jnp.max(w_local.astype(jnp.float32), axis=1)   # [n_padded]
    far_max = jnp.zeros((n_padded,), jnp.float32).at[far_src - B].max(
        far_w.astype(jnp.float32), mode="drop")
    rowmax = jnp.maximum(local_max, far_max)
    sw_row = jnp.where(rowmax > 0, rowmax / 127.0, 1.0)
    A8, _ = _build_band_i8(local_idx, w_local, B,
                           row_scale=sw_row.reshape(nb, B, 1))
    far_q = jnp.clip(jnp.round(far_w / sw_row[far_src - B]), 0,
                     127).astype(jnp.int32)
    gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, n - 1)
    rows_idx = order[gidx0]      # fixed relabel composition (see _banded_test)

    def abs_ip(rows, Zcols):
        Gc = Zcols.shape[1]
        Zp = Zcols[rows].reshape(nb + 2, B, Gc)      # ONE int8 row gather
        lag = jnp.zeros((nb, B, Gc), jnp.int32)
        for s in range(3):
            lag = lag + jnp.einsum(
                "nbw,nwg->nbg", A8[:, :, s * B:(s + 1) * B].astype(jnp.int32),
                Zp[s:s + nb].astype(jnp.int32))
            lag = jax.lax.optimization_barrier(lag)
        lag = lag.reshape(n_padded, Gc)
        # far edges in the same integer domain (padded entries: far_q
        # rounds 0-weight to 0, contributing nothing)
        vals = Zp.reshape(-1, Gc)[far_dst].astype(jnp.int32) * far_q[:, None]
        lag = lag.at[far_src - B].add(vals, mode="drop")
        z1 = Zp.reshape(-1, Gc)[B:B + n_padded].astype(jnp.int32)
        return jnp.abs(z1 * lag)                      # exact int32

    # observed via the SAME quantized operator; chunked — the one-time
    # full-width pass peaks several int32 [Npad, G] temps (_chunked_cols)
    abs_obs = _chunked_cols(lambda zc: abs_ip(rows_idx, zc), (Zq,), G)

    if perm_method == "sort":
        base = key_for(seed, "perm_local", 0)   # legacy local draw stream
    else:
        base = key_for(seed, "perm_feistel_local", 0)
    cdt = (jnp.int8 if n_permutations <= 127
           else jnp.int16 if n_permutations <= 32767 else jnp.int32)

    use_win = (band_impl == "pallas" and far_starts is not None
               and 0 < far_bmax and _round_up(far_bmax, 128) <= 1024)
    if use_win:
        # fused draw step with WINDOWED far edges: no dense [Npad, G]
        # int32 far layer (its zeros+scatter+reread was 11.2 of the
        # 32.5 ms/draw budget at G=512 — probe_lisa_stages.py). Far
        # values gather COMPACTLY ([F] rows) straight from Zq at
        # composed indices; the kernel covers each block's run with two
        # S-row windows. Integer adds commute → p is bitwise-equal to
        # the scatter paths.
        # the windowed kernel needs 128-multiple lane widths (G=100
        # fails Mosaic on hardware; G=128 compiles) — pad the gene axis
        # once outside the scan, slice the counts after. Padded columns
        # are all-zero codes whose comparisons can't affect real genes.
        Gp = _round_up(G, 128)
        if Gp != G:
            Zq = jnp.pad(Zq, ((0, 0), (0, Gp - G)))
            abs_obs = jnp.pad(abs_obs, ((0, 0), (0, Gp - G)))
        obs3 = abs_obs.reshape(nb, B, Gp)
        S, nw, rowp, qp, rif, w_idx, starts0, runs = _win_far_pack(
            far_src, far_dst, far_w, far_q, far_starts, rows_idx, B,
            far_bmax)

        def body(count, step):
            key = jax.random.fold_in(base, step)
            if perm_method == "sort":
                perm = jax.random.permutation(key, n)
                rows, rowsf = perm[rows_idx], perm[rif]
            else:
                rows = feistel_apply(key, rows_idx, n)
                rowsf = feistel_apply(key, rif, n)
            Zp = Zq[rows].reshape(nb + 2, B, Gp)
            Zf = Zq[rowsf].reshape(nw, S, Gp)
            return _fused_win_pallas_i8(
                "moran", w_idx, starts0, runs, A8, obs3, count, Zp, Zf,
                rowp, qp, interpret=interpret), None

        count, _ = jax.lax.scan(body, jnp.zeros((nb, B, Gp), cdt),
                                jnp.arange(n_permutations))
        count = count.reshape(n_padded, Gp)[:, :G]
    elif band_impl == "pallas":
        # fused draw step (_band_lag_count_kernel_i8): the int32 lag (and
        # the int32 casts of band/window the einsum path materializes)
        # never touch HBM — only the gather output, the dense far-edge
        # layer, the observed read and the counter update do. Integer
        # arithmetic is exact in both impls, so p is bitwise-equal to the
        # XLA path (pinned by tests/test_banded.py).
        obs3 = abs_obs.reshape(nb, B, G)

        def body(count, step):
            key = jax.random.fold_in(base, step)
            if perm_method == "sort":
                rows = jax.random.permutation(key, n)[rows_idx]
            else:
                rows = feistel_apply(key, rows_idx, n)
            Zp = Zq[rows].reshape(nb + 2, B, G)
            vals = (Zp.reshape(-1, G)[far_dst].astype(jnp.int32)
                    * far_q[:, None])
            far = jnp.zeros((n_padded, G), jnp.int32).at[far_src - B].add(
                vals, mode="drop").reshape(nb, B, G)
            return _band_lag_count_pallas_i8(A8, far, obs3, count, Zp,
                                             interpret), None

        count, _ = jax.lax.scan(body, jnp.zeros((nb, B, G), cdt),
                                jnp.arange(n_permutations))
        count = count.reshape(n_padded, G)
    else:
        def body(count, step):
            key = jax.random.fold_in(base, step)
            if perm_method == "sort":
                rows = jax.random.permutation(key, n)[rows_idx]
            else:
                rows = feistel_apply(key, rows_idx, n)
            return count + (abs_ip(rows, Zq) >= abs_obs).astype(cdt), None

        count, _ = jax.lax.scan(body, jnp.zeros((n_padded, G), cdt),
                                jnp.arange(n_permutations))
    if return_counts:
        # integer extreme counts in ORIGINAL order: the >HBM streaming
        # post-pass computes p per column chunk from these, so the two
        # f32 [N, G] planes (p + its rank gather) never materialize —
        # the memory that capped the stream tile at 512 next to a
        # device-resident sink (round 5)
        return count[rank]
    p_new = (count.astype(jnp.float32) + 1.0) / (n_permutations + 1.0)
    return p_new[rank]      # original order (new position rank[i] = cell i)


@functools.partial(jax.jit, static_argnames=(
    "block", "n", "n_permutations", "precision", "perm_method"))
def _banded_local_moran_p(order, rank, local_idx, w_local, far_src, far_dst,
                          far_w, Z, abs_obs_new, seed, *, block: int, n: int,
                          n_permutations: int, precision: str,
                          perm_method: str):
    """Permutation p for LISA via banded nulls: per draw ONE random gather
    + band matmuls instead of the 7 row-gathers of the direct path.

    ``abs_obs_new`` is |I_obs| already in relabeled order (padded to
    Npad); only the [Npad, G] p-matrix is produced and mapped back — the
    observed statistics come from the exact direct kernel, keeping the
    resident footprint at ~half of Z-f32-everything. Two-tailed p:
    (#{|I_perm| ≥ |I_obs|} + 1)/(P + 1), same convention as
    ``ops.moran.local_moran``.
    """
    B = block
    n_padded = local_idx.shape[0]
    nb = n_padded // B
    G = Z.shape[1]
    wdt = jnp.bfloat16 if precision == "bf16" else Z.dtype
    A = _build_band(local_idx, w_local, B, wdt)
    Ztab = Z if Z.dtype == wdt else Z.astype(wdt)
    gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, n - 1)
    rows_idx = order[gidx0]

    if perm_method == "sort":
        base = key_for(seed, "perm_local", 0)   # legacy local draw stream
    else:
        base = key_for(seed, "perm_feistel_local", 0)

    def body(count, step):
        key = jax.random.fold_in(base, step)
        if perm_method == "sort":
            rows = jax.random.permutation(key, n)[rows_idx]
        else:
            rows = feistel_apply(key, rows_idx, n)
        Zp = Ztab[rows].reshape(nb + 2, B, G)
        lag_p = _banded_lag(A, Zp, far_src, far_dst, far_w, block=B)
        Ip = Zp.reshape(-1, G)[B:B + n_padded].astype(jnp.float32) * lag_p
        return count + (jnp.abs(Ip) >= abs_obs_new).astype(count.dtype), None

    # int16 counters (exact for P <= 32767): the [N, G] count update is
    # the measured wall of local statistics — halve its bytes
    cdt = jnp.int16 if n_permutations <= 32767 else jnp.int32
    count, _ = jax.lax.scan(body, jnp.zeros((n_padded, G), cdt),
                            jnp.arange(n_permutations))
    p_new = (count + 1.0) / (n_permutations + 1.0)
    return p_new[rank]      # original order (new position rank[i] = cell i)


@functools.partial(jax.jit, static_argnames=(
    "block", "n", "n_permutations", "precision", "compute_cell_pvalues",
    "perm_method"))
def _banded_lees_p(order, rank, local_idx, w_local, far_src, far_dst,
                   far_w, Zx, Zy, seed, *, block: int, n: int,
                   n_permutations: int, precision: str,
                   compute_cell_pvalues: bool, perm_method: str = "sort"):
    """Lee's L permutation nulls through the banded plan.

    Per draw: ONE random row gather of the permuted Y columns + three band
    matmuls, instead of the direct kernel's k barriered gathers
    (``spatial_lag``) — at the reference vignette's k=50 that is 50×
    fewer issue-bound gathered rows per draw. ``perm_method="sort"``
    matches the draw stream of ``ops.lee.lees_l_pairs`` exactly (same
    ``perm_lee`` key base, Y-only permutation); ``"feistel"`` draws from
    its own sort-free stream evaluated at the composed row indices — no
    [n] permutation materialization or per-draw index gather (the ~40 ms
    sort at 1M cells dominates fast local kernels). Observed comparison
    values come from the SAME banded operator at the identity placement.
    Returns ``(p_global [P], p_local [n, P])`` in original cell order
    (``p_local`` is ones when ``compute_cell_pvalues`` is False).
    """
    B = block
    n_padded = local_idx.shape[0]
    nb = n_padded // B
    Pn = Zy.shape[1]
    wdt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    A = _build_band(local_idx, w_local, B, wdt)
    Ytab = Zy.astype(wdt)
    gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, n - 1)
    rows_idx = order[gidx0]
    # X stays FIXED across draws (Lee's null permutes Y only); zero-padded
    # rows contribute nothing to the global sum
    Zx_new = Zx[order].astype(jnp.float32)
    if n_padded > n:
        Zx_new = jnp.pad(Zx_new, ((0, n_padded - n), (0, 0)))

    def lees(rows):
        Yp = Ytab[rows].reshape(nb + 2, B, Pn)
        L_local = Zx_new * _banded_lag(A, Yp, far_src, far_dst, far_w,
                                       block=B)
        return L_local, jnp.sum(L_local, axis=0)

    obs_l, obs_g = lees(rows_idx)
    abs_l, abs_g = jnp.abs(obs_l), jnp.abs(obs_g)
    if perm_method == "sort":
        base = key_for(seed, "perm_lee", 0)
    else:
        base = key_for(seed, "perm_feistel_lee", 0)
    cdt = jnp.int16 if n_permutations <= 32767 else jnp.int32

    def body(carry, step):
        cg, cl = carry
        key = jax.random.fold_in(base, step)
        if perm_method == "sort":
            rows = jax.random.permutation(key, n)[rows_idx]
        else:
            rows = feistel_apply(key, rows_idx, n)
        Lp, Lg = lees(rows)
        cg = cg + (jnp.abs(Lg) >= abs_g).astype(jnp.int32)
        if compute_cell_pvalues:
            cl = cl + (jnp.abs(Lp) >= abs_l).astype(cdt)
        return (cg, cl), None

    cl_shape = (n_padded, Pn) if compute_cell_pvalues else (1, Pn)
    (cg, cl), _ = jax.lax.scan(
        body, (jnp.zeros((Pn,), jnp.int32), jnp.zeros(cl_shape, cdt)),
        jnp.arange(n_permutations))
    p_g = (cg + 1.0) / (n_permutations + 1.0)
    if compute_cell_pvalues:
        p_l = ((cl.astype(jnp.float32) + 1.0) / (n_permutations + 1.0))[rank]
    else:
        p_l = jnp.ones((n, Pn), jnp.float32)
    return p_g, p_l


@functools.partial(jax.jit, static_argnames=(
    "block", "n", "n_permutations", "perm_method",
    "compute_cell_pvalues", "band_impl", "far_bmax", "interpret"))
def _banded_lees_p_i8(order, rank, local_idx, w_local, far_src, far_dst,
                      far_w, Zx, Zy, seed, *, block: int, n: int,
                      n_permutations: int, perm_method: str,
                      compute_cell_pvalues: bool, band_impl: str = "xla",
                      far_starts=None, far_bmax: int = 0,
                      interpret: bool = False):
    """Lee's L nulls in the int8 quantized-operator system.

    Both columns quantize per gene-pair (:func:`_quantize_z`), weights
    per row with the FULL-row scale (far edges included). The per-cell
    draw statistic is the exact int32 ``x_code · Σ w_code y_code``
    (|L_q| ≤ k·127³ < 2³¹ for k ≤ 1000); the shared positive factor
    s_x·s_y·sw_row multiplies both sides of every per-cell comparison,
    so |L_perm| ≥ |L_obs| decisions equal the quantized-weights f32
    operator exactly. The GLOBAL statistic re-applies the per-row weight
    scale in an f32 reduce (rows carry different sw) — the same
    convention as the global int8 Moran kernel — so its comparisons are
    f32-of-integer, deterministic and identical for draw and observed.
    int8 row gathers: the same 4 KB gather row serves 2× the bf16 pairs.
    """
    B = block
    n_padded = local_idx.shape[0]
    nb = n_padded // B
    Pn = Zy.shape[1]
    k_total = local_idx.shape[1]
    if k_total > 1000:
        raise ValueError(
            f"int8 Lee null supports k <= 1000 (int32 bound k*127^3), "
            f"got k={k_total}; use precision='bf16'")
    Zxq, _ = _quantize_z(Zx)
    Zyq, _ = _quantize_z(Zy)
    local_max = jnp.max(w_local.astype(jnp.float32), axis=1)
    far_max = jnp.zeros((n_padded,), jnp.float32).at[far_src - B].max(
        far_w.astype(jnp.float32), mode="drop")
    rowmax = jnp.maximum(local_max, far_max)
    sw_row = jnp.where(rowmax > 0, rowmax / 127.0, 1.0)
    A8, _ = _build_band_i8(local_idx, w_local, B,
                           row_scale=sw_row.reshape(nb, B, 1))
    far_q = jnp.clip(jnp.round(far_w / sw_row[far_src - B]), 0,
                     127).astype(jnp.int32)
    gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, n - 1)
    rows_idx = order[gidx0]
    zx_new = Zxq[order]          # int8 resident; cast per use below
    if n_padded > n:
        zx_new = jnp.pad(zx_new, ((0, n_padded - n), (0, 0)))

    def lees_q(rows, Ycols, xcols):
        Gc = Ycols.shape[1]
        Yp = Ycols[rows].reshape(nb + 2, B, Gc)
        lag = jnp.zeros((nb, B, Gc), jnp.int32)
        for s in range(3):
            lag = lag + jnp.einsum(
                "nbw,nwg->nbg", A8[:, :, s * B:(s + 1) * B].astype(jnp.int32),
                Yp[s:s + nb].astype(jnp.int32))
            lag = jax.lax.optimization_barrier(lag)
        lag = lag.reshape(n_padded, Gc)
        vals = Yp.reshape(-1, Gc)[far_dst].astype(jnp.int32) * far_q[:, None]
        lag = lag.at[far_src - B].add(vals, mode="drop")
        Lq = xcols.astype(jnp.int32) * lag              # exact int32
        Lg = jnp.einsum("np,n->p", Lq.astype(jnp.float32), sw_row,
                        preferred_element_type=jnp.float32)
        return Lq, Lg

    # one-time observed pass, gene-chunked (see _chunked_cols: the
    # full-width pass faults at 1M where the draw scan fits). Per-cell
    # Lq is exact int32, but the global Lg is an f32 REDUCTION over
    # int32 values past 2^24 — XLA picks its reduce tiling per column
    # width, so obs_g evaluated at chunk width vs full width can differ
    # in the last ulp; a draw whose Lg ties obs_g EXACTLY in f32 could
    # then flip the global count between chunk widths (ADVICE r3). The
    # per-cell p is width-invariant; the draw-side Lg runs at full Pn
    # width either way.
    obs_l, obs_g = _chunked_cols(
        lambda yc, xc: lees_q(rows_idx, yc, xc), (Zyq, zx_new), Pn)
    abs_l, abs_g = jnp.abs(obs_l), jnp.abs(obs_g)
    if perm_method == "sort":
        base = key_for(seed, "perm_lee", 0)
    else:
        base = key_for(seed, "perm_feistel_lee", 0)
    cdt = (jnp.int8 if n_permutations <= 127
           else jnp.int16 if n_permutations <= 32767 else jnp.int32)

    use_win = (band_impl == "pallas" and compute_cell_pvalues
               and far_starts is not None and 0 < far_bmax
               and _round_up(far_bmax, 128) <= 1024)
    if use_win:
        # fused windowed draw step (cell p-values only — the global-only
        # case has no [N, G] traffic worth fusing). Per-cell counts are
        # exact int32 → bitwise-equal to the XLA body. The GLOBAL L sums
        # per-block f32 partials emitted by the kernel; the observed Lg
        # uses the same blockwise order, computed in XLA — decisions can
        # differ from the einsum path only at an exact f32 tie between
        # |Lg_perm| and |Lg_obs| (never observed; both are valid draws
        # of the same null).
        # 128-multiple lane padding — see the moran windowed branch.
        # Padded pair columns carry zero codes → zero partials → their
        # cg counts are meaningless and sliced away with cl.
        Gp = _round_up(Pn, 128)
        gpad = ((0, 0), (0, Gp - Pn))
        Zyq_w = jnp.pad(Zyq, gpad) if Gp != Pn else Zyq
        zx3 = jnp.pad(zx_new, gpad).reshape(nb, B, Gp)
        sw3 = sw_row.astype(jnp.float32).reshape(nb, B, 1)
        obs3 = jnp.pad(abs_l, gpad).reshape(nb, B, Gp)
        part_obs = jnp.sum(sw3 * jnp.pad(obs_l, gpad).reshape(nb, B, Gp)
                           .astype(jnp.float32), axis=1, keepdims=True)
        abs_g_win = jnp.abs(jnp.sum(part_obs, axis=(0, 1)))
        S, nw, rowp, qp, rif, w_idx, starts0, runs = _win_far_pack(
            far_src, far_dst, far_w, far_q, far_starts, rows_idx, B,
            far_bmax)

        def body(carry, step):
            cg, cl = carry
            key = jax.random.fold_in(base, step)
            if perm_method == "sort":
                perm = jax.random.permutation(key, n)
                rows, rowsf = perm[rows_idx], perm[rif]
            else:
                rows = feistel_apply(key, rows_idx, n)
                rowsf = feistel_apply(key, rif, n)
            Yp = Zyq_w[rows].reshape(nb + 2, B, Gp)
            Yf = Zyq_w[rowsf].reshape(nw, S, Gp)
            cl, part = _fused_win_pallas_i8(
                "lee", w_idx, starts0, runs, A8, obs3, cl, Yp, Yf,
                rowp, qp, extras=(zx3, sw3), interpret=interpret)
            Lg = jnp.sum(part, axis=(0, 1))
            cg = cg + (jnp.abs(Lg) >= abs_g_win).astype(jnp.int32)
            return (cg, cl), None

        (cg, cl), _ = jax.lax.scan(
            body, (jnp.zeros((Gp,), jnp.int32),
                   jnp.zeros((nb, B, Gp), cdt)),
            jnp.arange(n_permutations))
        cg = cg[:Pn]
        cl = cl.reshape(n_padded, Gp)[:, :Pn]
    else:
        def body(carry, step):
            cg, cl = carry
            key = jax.random.fold_in(base, step)
            if perm_method == "sort":
                rows = jax.random.permutation(key, n)[rows_idx]
            else:
                rows = feistel_apply(key, rows_idx, n)
            Lq, Lg = lees_q(rows, Zyq, zx_new)
            cg = cg + (jnp.abs(Lg) >= abs_g).astype(jnp.int32)
            if compute_cell_pvalues:
                cl = (cl.astype(jnp.int32)
                      + (jnp.abs(Lq) >= abs_l).astype(jnp.int32)
                      ).astype(cdt)
            return (cg, cl), None

        cl_shape = (n_padded, Pn) if compute_cell_pvalues else (1, Pn)
        (cg, cl), _ = jax.lax.scan(
            body, (jnp.zeros((Pn,), jnp.int32), jnp.zeros(cl_shape, cdt)),
            jnp.arange(n_permutations))
    p_g = (cg + 1.0) / (n_permutations + 1.0)
    if compute_cell_pvalues:
        p_l = ((cl.astype(jnp.float32) + 1.0) / (n_permutations + 1.0))[rank]
    else:
        p_l = jnp.ones((n, Pn), jnp.float32)
    return p_g, p_l


@functools.partial(jax.jit, static_argnames=(
    "block", "n", "n_permutations", "precision", "perm_method"))
def _banded_local_geary_p(order, rank, local_idx, w_local, far_src, far_dst,
                          far_w, Z, seed, *, block: int, n: int,
                          n_permutations: int, precision: str,
                          perm_method: str = "sort"):
    """Local Geary total-null permutation p via the banded plan.

    Per draw ONE row gather + two band matmul families, using the
    expansion c_i = z_i²·Σ_j w_ij + Σ_j w_ij z_j² − 2 z_i Σ_j w_ij z_j
    (algebraically equal to the direct kernel's Σ w (z_i − z_j)²; in f32
    it differs only by float rearrangement). ``perm_method="sort"`` uses
    the same ``perm_local_geary`` draw stream as
    ``ops.moran.local_geary(null="total")``; ``"feistel"`` draws from its
    own sort-free stream at composed row indices (no [n] permutation
    materialization per draw). The observed comparison value comes from
    the SAME banded operator at the identity placement. One-sided low
    tail: p = (#{c_perm ≤ c_obs}+1)/(P+1), returned in original cell
    order.
    """
    B = block
    n_padded = local_idx.shape[0]
    nb = n_padded // B
    G = Z.shape[1]
    wdt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    A = _build_band(local_idx, w_local, B, wdt)
    Ztab = Z.astype(wdt)
    gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, n - 1)
    # per-row TOTAL weight (band + far; row-normalized kNN rows are 1,
    # isolated radius rows 0)
    row_w = jnp.sum(w_local.astype(jnp.float32), axis=1)
    row_w = row_w.at[far_src - B].add(far_w.astype(jnp.float32),
                                      mode="drop")[:, None]

    rows_idx = order[gidx0]

    def geary(rows):
        Zp = Ztab[rows].reshape(nb + 2, B, G)
        lag1 = _banded_lag(A, Zp, far_src, far_dst, far_w, block=B)
        Zp2 = (Zp.astype(jnp.float32)
               * Zp.astype(jnp.float32)).astype(wdt)
        lag2 = _banded_lag(A, Zp2, far_src, far_dst, far_w, block=B)
        me = Zp.reshape(-1, G)[B:B + n_padded].astype(jnp.float32)
        return me * me * row_w + lag2 - 2.0 * me * lag1

    c_obs = geary(rows_idx)
    if perm_method == "sort":
        base = key_for(seed, "perm_local_geary", 0)
    else:
        base = key_for(seed, "perm_feistel_local_geary", 0)
    cdt = jnp.int16 if n_permutations <= 32767 else jnp.int32

    def body(count, step):
        key = jax.random.fold_in(base, step)
        if perm_method == "sort":
            rows = jax.random.permutation(key, n)[rows_idx]
        else:
            rows = feistel_apply(key, rows_idx, n)
        return count + (geary(rows) <= c_obs).astype(cdt), None

    count, _ = jax.lax.scan(body, jnp.zeros((n_padded, G), cdt),
                            jnp.arange(n_permutations))
    p = (count.astype(jnp.float32) + 1.0) / (n_permutations + 1.0)
    return c_obs[rank], p[rank]


@functools.partial(jax.jit, static_argnames=(
    "block", "n", "n_permutations", "perm_method", "band_impl", "far_bmax",
    "interpret"))
def _banded_local_geary_p_i8(order, rank, local_idx, w_local, far_src,
                             far_dst, far_w, Z, seed, *, block: int, n: int,
                             n_permutations: int, perm_method: str,
                             band_impl: str = "xla", far_starts=None,
                             far_bmax: int = 0, interpret: bool = False):
    """Local Geary total nulls, fully integer.

    The expansion c_i = z_i²·W_i + Σ w z_j² − 2 z_i Σ w z_j evaluates
    exactly in the quantized domain: z codes via :func:`_quantize_z`,
    weights per row with the full-row scale. The z² lag rides the int8
    MXU through a TWO-PLANE split — z_q² = 128·a + b with a ≤ 126,
    b ≤ 127 both int8 — so lag(z²) = 128·lag(a) + lag(b) is exact.
    Every term shares the positive factor s_g²·sw_row, fixed across
    draws, so c_perm ≤ c_obs decisions are exact int32 comparisons
    (bound: Σ w_q (Δz_q)² ≤ k·127·254² < 2³¹ requires k ≤ 256). Cost per
    draw: ONE int8 row gather + three band matmul families (z, a, b) —
    vs the f32 path's one bf16 gather + two families at HALF the genes
    per tile.
    """
    B = block
    n_padded = local_idx.shape[0]
    nb = n_padded // B
    G = Z.shape[1]
    k_total = local_idx.shape[1]
    if k_total > 256:
        raise ValueError(
            f"int8 local-Geary null supports k <= 256 (int32 bound "
            f"k*127*254^2), got k={k_total}; use precision='f32'")
    Zq, _ = _quantize_z(Z) if Z.dtype != jnp.int8 else (Z, None)
    local_max = jnp.max(w_local.astype(jnp.float32), axis=1)
    far_max = jnp.zeros((n_padded,), jnp.float32).at[far_src - B].max(
        far_w.astype(jnp.float32), mode="drop")
    rowmax = jnp.maximum(local_max, far_max)
    sw_row = jnp.where(rowmax > 0, rowmax / 127.0, 1.0)
    A8, _ = _build_band_i8(local_idx, w_local, B,
                           row_scale=sw_row.reshape(nb, B, 1))
    far_q = jnp.clip(jnp.round(far_w / sw_row[far_src - B]), 0,
                     127).astype(jnp.int32)
    # per-row TOTAL quantized weight (band codes + far codes)
    Wq_row = jnp.sum(A8.astype(jnp.int32), axis=2).reshape(n_padded)
    Wq_row = Wq_row.at[far_src - B].add(far_q, mode="drop")[:, None]
    gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, n - 1)
    rows_idx = order[gidx0]

    def band_lag_i32(W3, Zp_any, Gc):
        lag = jnp.zeros((nb, B, Gc), jnp.int32)
        for s in range(3):
            lag = lag + jnp.einsum(
                "nbw,nwg->nbg", W3[:, :, s * B:(s + 1) * B].astype(jnp.int32),
                Zp_any[s:s + nb].astype(jnp.int32))
            lag = jax.lax.optimization_barrier(lag)
        return lag.reshape(n_padded, Gc)

    def geary_q(rows, Zcols):
        Gc = Zcols.shape[1]
        Zp = Zcols[rows].reshape(nb + 2, B, Gc)         # ONE int8 gather
        zi32 = Zp.astype(jnp.int32)
        z2 = zi32 * zi32                                # ≤ 16129
        a8 = (z2 >> 7).astype(jnp.int8)                 # ≤ 126
        b8 = (z2 & 127).astype(jnp.int8)                # ≤ 127
        lag_z = band_lag_i32(A8, Zp, Gc)
        lag_z2 = 128 * band_lag_i32(A8, a8, Gc) + band_lag_i32(A8, b8, Gc)
        zf = zi32.reshape(-1, Gc)
        z2f = z2.reshape(-1, Gc)
        lag_z = lag_z.at[far_src - B].add(
            zf[far_dst] * far_q[:, None], mode="drop")
        lag_z2 = lag_z2.at[far_src - B].add(
            z2f[far_dst] * far_q[:, None], mode="drop")
        me = zf[B:B + n_padded]
        me2 = z2f[B:B + n_padded]
        return me2 * Wq_row + lag_z2 - 2 * me * lag_z   # exact int32

    # one-time observed pass, gene-chunked: at 1M × G=512 the full-width
    # pass (5+ int32 [Npad, G] temps live at once) faults where the draw
    # scan runs fine — measured 2026-08-19 (_chunked_cols docstring)
    c_obs = _chunked_cols(lambda zc: geary_q(rows_idx, zc), (Zq,), G)
    if perm_method == "sort":
        base = key_for(seed, "perm_local_geary", 0)
    else:
        base = key_for(seed, "perm_feistel_local_geary", 0)
    cdt = (jnp.int8 if n_permutations <= 127
           else jnp.int16 if n_permutations <= 32767 else jnp.int32)

    use_win = (band_impl == "pallas" and far_starts is not None
               and 0 < far_bmax and _round_up(far_bmax, 128) <= 1024)
    if use_win:
        # fused windowed draw step: no dense far layer, no [Npad, G]
        # int32 lag_z/lag_z2 (nor the three int32 einsum-cast temps) in
        # HBM — the z²-plane split happens on-chip from the int8 windows.
        # All-integer → p bitwise-equal to the XLA body.
        # 128-multiple lane padding — see the moran windowed branch
        Gp = _round_up(G, 128)
        Zq_w = jnp.pad(Zq, ((0, 0), (0, Gp - G))) if Gp != G else Zq
        obs3 = jnp.pad(c_obs, ((0, 0), (0, Gp - G))).reshape(nb, B, Gp)
        wq3 = Wq_row.reshape(nb, B, 1)
        S, nw, rowp, qp, rif, w_idx, starts0, runs = _win_far_pack(
            far_src, far_dst, far_w, far_q, far_starts, rows_idx, B,
            far_bmax)

        def body(count, step):
            key = jax.random.fold_in(base, step)
            if perm_method == "sort":
                perm = jax.random.permutation(key, n)
                rows, rowsf = perm[rows_idx], perm[rif]
            else:
                rows = feistel_apply(key, rows_idx, n)
                rowsf = feistel_apply(key, rif, n)
            Zp = Zq_w[rows].reshape(nb + 2, B, Gp)
            Zf = Zq_w[rowsf].reshape(nw, S, Gp)
            return _fused_win_pallas_i8(
                "geary", w_idx, starts0, runs, A8, obs3, count, Zp, Zf,
                rowp, qp, extras=(wq3,), interpret=interpret), None

        count, _ = jax.lax.scan(body, jnp.zeros((nb, B, Gp), cdt),
                                jnp.arange(n_permutations))
        count = count.reshape(n_padded, Gp)[:, :G]
    else:
        def body(count, step):
            key = jax.random.fold_in(base, step)
            if perm_method == "sort":
                rows = jax.random.permutation(key, n)[rows_idx]
            else:
                rows = feistel_apply(key, rows_idx, n)
            inc = (geary_q(rows, Zq) <= c_obs).astype(jnp.int32)
            return (count.astype(jnp.int32) + inc).astype(cdt), None

        count, _ = jax.lax.scan(body, jnp.zeros((n_padded, G), cdt),
                                jnp.arange(n_permutations))
    p = (count.astype(jnp.float32) + 1.0) / (n_permutations + 1.0)
    return c_obs[rank], p[rank]


def banded_local_geary(
    plan: NullPlan,
    Z: jax.Array,
    seed: int,
    n_permutations: int,
    precision: str = "f32",
    perm_method: str = "feistel",
    band_impl: str = "auto",
):
    """Local Geary total-null p-values via the banded plan — see
    :func:`_banded_local_geary_p`. Returns ``(c_obs_operator, p)`` in
    original cell order; callers should take the OBSERVED C from the
    exact direct kernel and use only ``p`` from here (the int8 path's
    first return value is in integer CODE units).
    ``perm_method="sort"`` reproduces the direct kernel's draw stream.
    ``precision="int8"`` runs the fully-integer quantized-operator
    system (two-plane z² split, k <= 256) — see
    :func:`_banded_local_geary_p_i8`; on real TPUs ``band_impl="auto"``
    selects the fused windowed-far Pallas draw step when the plan's far
    structure and the gene tile fit VMEM (bitwise-equal to the XLA
    body)."""
    if precision not in ("bf16", "f32", "int8"):
        raise ValueError(
            f"banded_local_geary supports precision 'bf16', 'f32' or "
            f"'int8', got {precision!r}")
    _check_perm_method(perm_method)
    if precision == "int8":
        interpret = jax.default_backend() != "tpu"
        if band_impl == "auto":
            shd = getattr(Z, "sharding", None)
            multi_dev = shd is not None and len(shd.device_set) > 1
            win_ready = (plan.far_starts is not None
                         and 0 < plan.far_bmax <= 1024)
            band_impl = ("pallas" if not interpret and not multi_dev
                         and win_ready
                         and _win_fits_vmem("geary", Z.shape[1],
                                            plan.block, plan.far_bmax)
                         else "xla")
        return _banded_local_geary_p_i8(
            plan.order, plan.rank, plan.local_idx, plan.w_local,
            plan.far_src, plan.far_dst, plan.far_w, Z, jnp.uint32(seed),
            block=plan.block, n=plan.n, n_permutations=n_permutations,
            perm_method=perm_method, band_impl=band_impl,
            far_starts=plan.far_starts, far_bmax=plan.far_bmax,
            interpret=interpret)
    return _banded_local_geary_p(
        plan.order, plan.rank, plan.local_idx, plan.w_local, plan.far_src,
        plan.far_dst, plan.far_w, Z, jnp.uint32(seed), block=plan.block,
        n=plan.n, n_permutations=n_permutations, precision=precision,
        perm_method=perm_method)


@functools.partial(jax.jit, static_argnames=(
    "block", "n", "n_permutations", "star", "alternative", "precision",
    "perm_method"))
def _banded_getis_p(order, rank, local_idx, w_local, far_src, far_dst,
                    far_w, X, seed, *, block: int, n: int,
                    n_permutations: int, star: bool, alternative: str,
                    precision: str, perm_method: str = "sort"):
    """Getis-Ord Gi/Gi* permutation p via the banded plan.

    Under the column-shuffle null every per-gene column statistic (mean,
    variance, totals) is permutation-invariant, and the per-cell scale
    s·denom_i > 0 is shared by draw and observed z — so the extremeness
    test |z_p| ≥ |z_obs| reduces to |lag*_p − x̄·W_i| ≥ |lag*_obs − x̄·W_i|
    (one-sided analogues drop the abs). Only the BINARY-weight lag varies
    per draw: one row gather + band matmuls on the plan's geometry with
    binarized weights (``ops.getis.getis_ord`` uses binary adjacency, not
    the row-normalized weights the plan stores). Gi (non-star) replaces
    x̄, s with their leave-one-out forms — still elementwise functions of
    the gathered own-value. ``perm_method="sort"`` uses the same
    ``perm_getis`` draw stream as the direct kernel; ``"feistel"`` draws
    from its own sort-free stream at composed row indices. Returns p_sim
    in original cell order.
    """
    B = block
    n_padded = local_idx.shape[0]
    nb = n_padded // B
    G = X.shape[1]
    wdt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    # binarize: the plan carries row-normalized weights; Getis adjacency
    # is 0/1 (ops/getis.py _binary_lag)
    wb = (w_local > 0).astype(jnp.float32)
    fb = (far_w > 0).astype(jnp.float32)
    A = _build_band(local_idx, wb, B, wdt)
    Xf = X.astype(jnp.float32)
    Xtab = Xf.astype(wdt)
    gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, n - 1)
    rows_idx = order[gidx0]
    W_row = (jnp.sum(wb, axis=1).at[far_src - B].add(fb, mode="drop"))[:, None]
    tot = jnp.sum(Xf, axis=0, keepdims=True)                  # [1, G]
    sq = jnp.sum(Xf * Xf, axis=0, keepdims=True)              # [1, G]
    m = jnp.float32(n if star else n - 1)

    def center(rows):
        Xp = Xtab[rows].reshape(nb + 2, B, G)
        lag = _banded_lag(A, Xp, far_src, far_dst, fb, block=B)
        me = Xp.reshape(-1, G)[B:B + n_padded].astype(jnp.float32)
        if star:
            # global x̄, s and denom_i are draw-invariant and positive —
            # they cancel between draw and observed, so the centered lag
            # alone decides extremeness
            return (lag + me) - (tot / m) * (W_row + 1.0)
        # Gi: the leave-one-out x̄_(i), s_(i) DEPEND on the shuffled own
        # value, so the scale does not cancel — divide like the direct
        # kernel (ops/getis.py stat()); only denom_i cancels
        xbar_i = (tot - me) / m
        s2 = jnp.maximum((sq - me * me) / m - xbar_i * xbar_i, 0.0)
        s = jnp.sqrt(jnp.where(s2 > 0, s2, 1.0))
        return (lag - xbar_i * W_row) / s

    obs_c = center(rows_idx)
    if perm_method == "sort":
        base = key_for(seed, "perm_getis", 0)
    else:
        base = key_for(seed, "perm_feistel_getis", 0)
    cdt = jnp.int16 if n_permutations <= 32767 else jnp.int32

    def body(count, step):
        key = jax.random.fold_in(base, step)
        if perm_method == "sort":
            rows = jax.random.permutation(key, n)[rows_idx]
        else:
            rows = feistel_apply(key, rows_idx, n)
        cp = center(rows)
        if alternative == "greater":
            extreme = cp >= obs_c
        elif alternative == "less":
            extreme = cp <= obs_c
        else:
            extreme = jnp.abs(cp) >= jnp.abs(obs_c)
        return count + extreme.astype(cdt), None

    count, _ = jax.lax.scan(body, jnp.zeros((n_padded, G), cdt),
                            jnp.arange(n_permutations))
    p = (count.astype(jnp.float32) + 1.0) / (n_permutations + 1.0)
    return p[rank]


def _quantize_x(X):
    """Per-gene int8 quantization of RAW (non-standardized) values:
    s_g = max|x_g|/127 with no outlier saturation (unlike
    :func:`_quantize_z`'s min(max|z|, 8) clip) — Getis operates on raw
    expression, whose dynamic range after normalization is bounded
    (log1p ~[0, 10]), so the full range keeps all 8 bits useful. The
    clip below only guards the int8 cast against rounding to ±128."""
    Xf = X.astype(jnp.float32)
    s = jnp.max(jnp.abs(Xf), axis=0) / 127.0
    s = jnp.where(s > 0, s, 1.0)
    Xq = jnp.clip(jnp.round(Xf / s), -127, 127).astype(jnp.int8)
    return Xq, s


def _check_perm_method(perm_method: str) -> None:
    """Every kernel branches ``perm_method == "sort" ... else feistel`` —
    validate up front so a typo fails loudly instead of silently drawing
    from the feistel stream (the precision argument gets the same
    treatment in each public entry point)."""
    if perm_method not in ("feistel", "sort"):
        raise ValueError("perm_method must be 'feistel' or 'sort', "
                         f"got {perm_method!r}")


@functools.partial(jax.jit, static_argnames=(
    "block", "n", "n_permutations", "star", "alternative", "perm_method",
    "band_impl", "far_bmax", "interpret"))
def _banded_getis_p_i8(order, rank, local_idx, w_local, far_src, far_dst,
                       far_w, X, seed, *, block: int, n: int,
                       n_permutations: int, star: bool, alternative: str,
                       perm_method: str, band_impl: str = "xla",
                       far_starts=None, far_bmax: int = 0,
                       interpret: bool = False):
    """Getis-Ord Gi/Gi* permutation p_sim, int8 quantized operator.

    Getis adjacency is BINARY (0/1 — exact in int8), so the only
    quantization is per-gene on X (:func:`_quantize_x`); the per-draw
    binary lag is an exact int32 count-weighted sum of codes
    (≤ (k+1)·127 ≪ 2³¹, no k bound needed). Column statistics (tot, sq)
    are draw-invariant f32-of-integer sums computed ONCE and shared by
    draw and observed sides, so the centered comparison is deterministic
    and consistent — the same quantized-operator convention as the int8
    Moran/LISA kernels. The int8 gather row serves 2× the f32 genes.
    """
    B = block
    n_padded = local_idx.shape[0]
    nb = n_padded // B
    G = X.shape[1]
    Xq, _ = _quantize_x(X)
    wb = (w_local > 0)
    A8 = _build_band(local_idx, wb, B, jnp.int8)        # exact 0/1 codes
    fb = (far_w > 0).astype(jnp.int32)
    gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, n - 1)
    rows_idx = order[gidx0]
    W_row = (jnp.sum(wb.astype(jnp.float32), axis=1)
             .at[far_src - B].add(fb.astype(jnp.float32),
                                  mode="drop"))[:, None]
    def _col_moments(Xcols):
        Xf = Xcols.astype(jnp.float32)
        return (jnp.sum(Xf, axis=0, keepdims=True),
                jnp.sum(Xf * Xf, axis=0, keepdims=True))

    # [1, G] code-unit column sums, gene-chunked: the full-width f32
    # cast of Xq alone is 4 bytes/cell/gene (see _chunked_cols)
    tot, sq = _chunked_cols(_col_moments, (Xq,), G)
    m = jnp.float32(n if star else n - 1)

    def lag_me_q(rows, Xcols):
        Gc = Xcols.shape[1]
        Xp = Xcols[rows].reshape(nb + 2, B, Gc)         # ONE int8 gather
        lag = jnp.zeros((nb, B, Gc), jnp.int32)
        for s in range(3):
            lag = lag + jnp.einsum(
                "nbw,nwg->nbg", A8[:, :, s * B:(s + 1) * B].astype(jnp.int32),
                Xp[s:s + nb].astype(jnp.int32))
            lag = jax.lax.optimization_barrier(lag)
        lag = lag.reshape(n_padded, Gc)
        xf = Xp.reshape(-1, Gc).astype(jnp.int32)
        lag = lag.at[far_src - B].add(xf[far_dst] * fb[:, None], mode="drop")
        return lag, xf[B:B + n_padded]

    def cp_of(lag, me):
        # Gi leave-one-out centering (f32 — depends on the draw's own
        # value; same expression tree in the fused kernel)
        mef = me.astype(jnp.float32)
        lagf = lag.astype(jnp.float32)
        xbar_i = (tot - mef) / m
        s2 = jnp.maximum((sq - mef * mef) / m - xbar_i * xbar_i, 0.0)
        s = jnp.sqrt(jnp.where(s2 > 0, s2, 1.0))
        return (lagf - xbar_i * W_row) / s

    # one-time observed pass, gene-chunked (see _chunked_cols)
    lag_o, me_o = _chunked_cols(
        lambda xc: lag_me_q(rows_idx, xc), (Xq,), G)
    if star:
        # Gi*'s centering constant c = (tot/m)·(W+1) is draw-invariant:
        # one-sided decisions reduce to EXACT integer comparisons of
        # A* = lag + own; two-sided to the sign test
        # (A_d−A_o)·(A_d+A_o−2c) ≥ 0 whose only f32 inputs (c, and the
        # exactly-representable small ints d, s) are shared bitwise
        # between the XLA and Pallas impls — draw decisions are
        # therefore bitwise-equal across band_impl even at exact ties
        # (common: integer code sums collide constantly).
        A_o = lag_o + me_o
        c2 = (tot / m) * (W_row + 1.0)                  # [n_padded, G]
    else:
        cp_o = cp_of(lag_o, me_o)
    if perm_method == "sort":
        base = key_for(seed, "perm_getis", 0)
    else:
        base = key_for(seed, "perm_feistel_getis", 0)
    cdt = (jnp.int8 if n_permutations <= 127
           else jnp.int16 if n_permutations <= 32767 else jnp.int32)

    def decide(lag_d, me_d):
        if star:
            A_d = lag_d + me_d
            if alternative == "greater":
                return A_d >= A_o
            if alternative == "less":
                return A_d <= A_o
            d = (A_d - A_o).astype(jnp.float32)
            s_ = (A_d + A_o).astype(jnp.float32)
            return d * (s_ - 2.0 * c2) >= 0.0
        cp_d = cp_of(lag_d, me_d)
        if alternative == "greater":
            ext = cp_d >= cp_o
        elif alternative == "less":
            ext = cp_d <= cp_o
        else:
            ext = jnp.abs(cp_d) >= jnp.abs(cp_o)
        # an exact (lag, own) pair tie means the draw statistic EQUALS
        # the observed in exact arithmetic — extreme under every
        # alternative, independent of each impl's f32 rounding
        return ext | ((lag_d == lag_o) & (me_d == me_o))

    use_win = (band_impl == "pallas" and far_starts is not None
               and 0 < far_bmax and _round_up(far_bmax, 128) <= 1024)
    if use_win:
        # fused windowed draw step: no dense far layer; the int32 binary
        # lag and the comparison never touch HBM. Decisions are
        # bitwise-equal to the XLA body: exact-integer for Gi* (see
        # above), and for Gi the pair-tie short-circuit covers every
        # exact tie (a remaining flip would need DIFFERENT integer pairs
        # landing on f32-equal cp values while the impls round
        # differently — distinct pairs are separated by ~1/s ≫ ulp).
        # 128-multiple lane padding — see the moran windowed branch
        Gp = _round_up(G, 128)
        gpad = ((0, 0), (0, Gp - G))
        Xq_w = jnp.pad(Xq, gpad) if Gp != G else Xq
        wrow3 = W_row.reshape(nb, B, 1)
        if star:
            obs3 = jnp.pad(A_o, gpad).reshape(nb, B, Gp)
            extras = ((jnp.pad(c2, gpad).reshape(nb, B, Gp),)
                      if alternative == "two-sided" else ())
        else:
            obs3 = jnp.pad(cp_o, gpad).reshape(nb, B, Gp)
            extras = (jnp.pad(lag_o, gpad).reshape(nb, B, Gp),
                      jnp.pad(me_o.astype(jnp.int8),
                              gpad).reshape(nb, B, Gp), wrow3,
                      jnp.pad(tot, gpad).reshape(1, 1, Gp),
                      jnp.pad(sq, gpad).reshape(1, 1, Gp))
        S, nw, rowp, qp, rif, w_idx, starts0, runs = _win_far_pack(
            far_src, far_dst, far_w, fb, far_starts, rows_idx, B,
            far_bmax)

        def body(count, step):
            key = jax.random.fold_in(base, step)
            if perm_method == "sort":
                perm = jax.random.permutation(key, n)
                rows, rowsf = perm[rows_idx], perm[rif]
            else:
                rows = feistel_apply(key, rows_idx, n)
                rowsf = feistel_apply(key, rif, n)
            Xp = Xq_w[rows].reshape(nb + 2, B, Gp)
            Xf = Xq_w[rowsf].reshape(nw, S, Gp)
            return _fused_win_pallas_i8(
                "getis_star" if star else "getis_g", w_idx, starts0,
                runs, A8, obs3, count, Xp, Xf, rowp, qp, extras=extras,
                alternative=alternative,
                m=float(n if star else n - 1), interpret=interpret
            ), None

        count, _ = jax.lax.scan(body, jnp.zeros((nb, B, Gp), cdt),
                                jnp.arange(n_permutations))
        count = count.reshape(n_padded, Gp)[:, :G]
    else:
        def body(count, step):
            key = jax.random.fold_in(base, step)
            if perm_method == "sort":
                rows = jax.random.permutation(key, n)[rows_idx]
            else:
                rows = feistel_apply(key, rows_idx, n)
            extreme = decide(*lag_me_q(rows, Xq))
            return (count.astype(jnp.int32)
                    + extreme.astype(jnp.int32)).astype(cdt), None

        count, _ = jax.lax.scan(body, jnp.zeros((n_padded, G), cdt),
                                jnp.arange(n_permutations))
    p = (count.astype(jnp.float32) + 1.0) / (n_permutations + 1.0)
    return p[rank]


def banded_getis(
    plan: NullPlan,
    X: jax.Array,
    seed: int,
    n_permutations: int,
    star: bool = True,
    alternative: str = "two-sided",
    precision: str = "f32",
    perm_method: str = "feistel",
    band_impl: str = "auto",
):
    """Getis-Ord permutation p_sim via the banded plan — see
    :func:`_banded_getis_p`. Observed G/z/analytic p should come from the
    exact direct kernel (``ops.getis.getis_ord`` with P=0).
    ``perm_method="sort"`` reproduces the direct kernel's draw stream.
    ``precision="int8"`` quantizes X per gene against the exact binary
    adjacency — see :func:`_banded_getis_p_i8`; on real TPUs
    ``band_impl="auto"`` selects the fused windowed-far Pallas draw step
    when the plan's far structure and the gene tile fit VMEM."""
    if precision not in ("bf16", "f32", "int8"):
        raise ValueError(
            f"banded_getis supports precision 'bf16', 'f32' or 'int8', "
            f"got {precision!r}")
    if alternative not in ("two-sided", "greater", "less"):
        raise ValueError(f"invalid alternative {alternative!r}")
    _check_perm_method(perm_method)
    if precision == "int8":
        interpret = jax.default_backend() != "tpu"
        if band_impl == "auto":
            shd = getattr(X, "sharding", None)
            multi_dev = shd is not None and len(shd.device_set) > 1
            win_ready = (plan.far_starts is not None
                         and 0 < plan.far_bmax <= 1024)
            band_impl = ("pallas" if not interpret and not multi_dev
                         and win_ready
                         and _win_fits_vmem("getis", X.shape[1],
                                            plan.block, plan.far_bmax)
                         else "xla")
        return _banded_getis_p_i8(
            plan.order, plan.rank, plan.local_idx, plan.w_local,
            plan.far_src, plan.far_dst, plan.far_w, X, jnp.uint32(seed),
            block=plan.block, n=plan.n, n_permutations=n_permutations,
            star=star, alternative=alternative, perm_method=perm_method,
            band_impl=band_impl, far_starts=plan.far_starts,
            far_bmax=plan.far_bmax, interpret=interpret)
    return _banded_getis_p(
        plan.order, plan.rank, plan.local_idx, plan.w_local, plan.far_src,
        plan.far_dst, plan.far_w, X, jnp.uint32(seed), block=plan.block,
        n=plan.n, n_permutations=n_permutations, star=star,
        alternative=alternative, precision=precision,
        perm_method=perm_method)


def banded_lees_l(
    plan: NullPlan,
    Zx: jax.Array,
    Zy: jax.Array,
    seed: int,
    n_permutations: int,
    precision: str = "bf16",
    compute_cell_pvalues: bool = False,
    perm_method: str = "feistel",
    band_impl: str = "auto",
):
    """Lee's L permutation p-values (global + optional per-cell) via the
    banded plan — see :func:`_banded_lees_p`. Observed L values should
    come from the exact direct kernel (``ops.lee.lees_l_pairs`` with
    ``n_permutations=0``); this only evaluates the null.
    ``perm_method="sort"`` reproduces the direct kernel's draw stream.
    ``precision="int8"`` runs the quantized-operator system (exact int8
    MXU band dots, int32 per-cell comparisons, k <= 1000) — see
    :func:`_banded_lees_p_i8`; with ``compute_cell_pvalues`` on real
    TPUs, ``band_impl="auto"`` selects the fused windowed-far Pallas
    draw step when the plan's far structure and the pair tile fit VMEM
    (per-cell p bitwise-equal; the global p can differ from the XLA
    einsum only at an exact f32 tie)."""
    if precision not in ("bf16", "f32", "int8"):
        raise ValueError(
            f"banded_lees_l supports precision 'bf16', 'f32' or 'int8', "
            f"got {precision!r}")
    _check_perm_method(perm_method)
    if precision == "int8":
        interpret = jax.default_backend() != "tpu"
        if band_impl == "auto":
            shd = getattr(Zy, "sharding", None)
            multi_dev = shd is not None and len(shd.device_set) > 1
            win_ready = (plan.far_starts is not None
                         and 0 < plan.far_bmax <= 1024)
            band_impl = ("pallas" if not interpret and not multi_dev
                         and win_ready and compute_cell_pvalues
                         and _win_fits_vmem("lee", Zy.shape[1],
                                            plan.block, plan.far_bmax)
                         else "xla")
        return _banded_lees_p_i8(
            plan.order, plan.rank, plan.local_idx, plan.w_local,
            plan.far_src, plan.far_dst, plan.far_w, Zx, Zy,
            jnp.uint32(seed), block=plan.block, n=plan.n,
            n_permutations=n_permutations, perm_method=perm_method,
            compute_cell_pvalues=compute_cell_pvalues,
            band_impl=band_impl, far_starts=plan.far_starts,
            far_bmax=plan.far_bmax, interpret=interpret)
    return _banded_lees_p(
        plan.order, plan.rank, plan.local_idx, plan.w_local, plan.far_src,
        plan.far_dst, plan.far_w, Zx, Zy, jnp.uint32(seed),
        block=plan.block, n=plan.n, n_permutations=n_permutations,
        precision=precision, compute_cell_pvalues=compute_cell_pvalues,
        perm_method=perm_method)


def banded_local_moran_pvalues(
    plan: NullPlan,
    Z: jax.Array,
    seed: int,
    n_permutations: int,
    perm_method: str = "feistel",
    band_impl: str = "auto",
    return_counts: bool = False,
) -> jax.Array:
    """LISA null p-values ONLY, int8 quantized-operator system.

    The p-only entry the streaming keys-mode driver uses
    (ops.streaming.streaming_local_null): unlike
    :func:`banded_local_moran` it never materializes the observed
    I/z/lag planes — at 1M cells x 512-gene tiles those are 3 x 2 GB
    of f32 that the caller may not even keep, and their transient
    residency is what OOMed the G=2048 streamed run next to the
    device-resident output sink. Observed statistics should come from
    a fused post-pass that emits compact dtypes directly.

    ``Z`` may be pre-quantized int8 codes (from
    :func:`_quantize_z`) — the per-gene scale cancels inside the
    comparison, so codes alone determine the decisions. With
    ``return_counts`` the integer extreme counts come back instead of
    f32 p (int8 for P <= 127, int16 <= 32767): half (quarter) the
    output bytes, and the caller computes ``p = (c+1)/(P+1)`` per
    column chunk — the >HBM streaming recipe for tiles wider than 512.
    """
    _check_perm_method(perm_method)
    interpret = jax.default_backend() != "tpu"
    if band_impl == "auto":
        # fused Pallas draw step on real TPUs (the int32 lag stays in
        # VMEM, so one gene tile must fit: the windowed kernel's
        # working set is estimated against plan.far_bmax, the dense
        # fallback keeps the G <= 4096 ceiling of the global int8
        # kernel); XLA einsums elsewhere, at wider G, AND on
        # multi-device inputs — a pallas_call does not partition
        # (the gene-sharded wrapper pins "xla" explicitly; this
        # guard covers direct ops-level calls under a mesh)
        shd = getattr(Z, "sharding", None)
        multi_dev = shd is not None and len(shd.device_set) > 1
        win_ready = (plan.far_starts is not None
                     and 0 < plan.far_bmax <= 1024)
        # only the WINDOWED fused kernel auto-selects (same rule as the
        # geary/getis/lee gates): the dense-far fused kernel faulted the
        # device at the reference-vignette shape (366,938 cells, k=50,
        # far_bmax=2510 — measured 2026-08-19; the xla einsum body ran
        # the same 128-gene x 99-draw null in 14.3 s), so high-k plans
        # whose far runs exceed the window cap take the einsum path.
        # band_impl="pallas" still forces the dense kernel explicitly.
        band_impl = ("pallas" if not interpret and not multi_dev
                     and win_ready
                     and _win_fits_vmem("moran", Z.shape[1], plan.block,
                                        plan.far_bmax)
                     else "xla")
    return _banded_local_moran_p_i8(
        plan.order, plan.rank, plan.local_idx, plan.w_local,
        plan.far_src, plan.far_dst, plan.far_w, Z, jnp.uint32(seed),
        block=plan.block, n=plan.n, n_permutations=n_permutations,
        perm_method=perm_method, band_impl=band_impl,
        far_starts=plan.far_starts, far_bmax=plan.far_bmax,
        interpret=interpret, return_counts=return_counts)


def banded_local_moran(
    plan: NullPlan,
    graph: SpatialGraph,
    Z: jax.Array,
    seed: int,
    n_permutations: int,
    precision: str = "bf16",
    perm_method: str = "feistel",
    band_impl: str = "auto",
):
    """Drop-in accelerated ``ops.moran.local_moran`` using a NullPlan.

    Observed I/z/lag come from the exact direct kernel (one lag pass over
    ``graph``); only the permutation nulls run through the banded
    machinery. Returns ``LocalMoranResult`` in the ORIGINAL cell order.
    With ``precision="f32"`` and ``perm_method="sort"`` the draws match
    the direct kernel (float summation order differs in the lag).

    ``precision="int8"`` runs the whole null system in the per-gene
    quantized operator (draws AND the observed comparison value — the
    same convention as the global int8 mode): exact int8 MXU band dots,
    int8 row gathers, fully-integer int32 comparisons with int8 counters
    for P <= 127 (int16 up to 32767). The returned ``local_I/z/lag`` stay
    exact f32; only ``p_value`` uses the quantized operator.
    """
    from .moran import LocalMoranResult, local_moran

    _check_perm_method(perm_method)
    obs = local_moran(graph, Z, seed, 0)
    if n_permutations == 0:
        return obs
    if precision == "int8":
        p = banded_local_moran_pvalues(
            plan, Z, seed, n_permutations, perm_method=perm_method,
            band_impl=band_impl)
        return LocalMoranResult(obs.local_I, obs.z, obs.lag, p)
    n_padded = plan.local_idx.shape[0]
    abs_obs_new = jnp.abs(obs.local_I)[plan.order]
    if n_padded > plan.n:
        # padded rows never win a comparison (inf observed)
        abs_obs_new = jnp.pad(abs_obs_new, ((0, n_padded - plan.n), (0, 0)),
                              constant_values=jnp.inf)
    p = _banded_local_moran_p(
        plan.order, plan.rank, plan.local_idx, plan.w_local, plan.far_src,
        plan.far_dst, plan.far_w, Z, abs_obs_new, jnp.uint32(seed),
        block=plan.block, n=plan.n, n_permutations=n_permutations,
        precision=precision, perm_method=perm_method)
    return LocalMoranResult(obs.local_I, obs.z, obs.lag, p)
