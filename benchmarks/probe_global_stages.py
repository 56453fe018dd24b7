"""Stage bisection for the GLOBAL int8 banded permutation null.

The production draw loop (`ops.banded._banded_stat_i8`, band_impl=
"pallas_halo") does, per draw:

  1. Feistel rows + ONE int8 row gather  Zp = Zq[rows]     (issue/byte-bound)
  2. band cross: Pallas halo kernel (int8 dots, f32 reduce)
  3. far edges: TWO [F, G] f32 gathers from Zp + einsum     <- suspected wall
                (at G=4096, F=262k each gather materializes 4.3 GB f32)

Variants attribute the per-draw cost (round-4 pre-work for the windowed
far port, VERDICT item 1):

  gather    stage 1 only + tiny reduce
  band      stages 1+2 (far dropped)
  full      production body (exact f32 far)
  wingather stage 1 + the COMPACT far gather the windowed kernel would
            do instead (Zq[perm∘rif], [nw*S] int8 rows) + tiny reduce —
            upper-bounds the windowed far data cost without the kernel

Env: PROBE_CELLS (1M), PROBE_GENES (4096), PROBE_PERMS (25), PROBE_K (6),
PROBE_VARIANTS (csv).
"""

import functools
import os
import time

import jax
import jax.numpy as jnp

from spatialcore_tpu.core.rng import feistel_apply, key_for
from spatialcore_tpu.ops.banded import (
    _band_cross_pallas_i8, _band_cross_win_pallas_i4,
    _band_cross_win_pallas_i8, _build_band_i8, _quantize_z, _quantize_z4,
    _win_far_pack, build_null_plan)
from spatialcore_tpu.ops.graph import build_graph

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 4096))
P = int(os.environ.get("PROBE_PERMS", 25))
K = int(os.environ.get("PROBE_K", 6))
BLOCK = int(os.environ.get("PROBE_BLOCK", 256))
RING = int(os.environ.get("SPATIALCORE_WIN_RING", 4))
VARIANTS = os.environ.get("PROBE_VARIANTS",
                          "gather,band,full,wingather").split(",")

coords = jax.random.uniform(jax.random.key(0), (N, 2), jnp.float32, 0, 6000)
t0 = time.time()
_ = float(coords[0, 0])
print(f"readback warmup {time.time()-t0:.1f}s", flush=True)
graph = build_graph(coords, n_neighbors=K)
jax.block_until_ready(graph.neighbor_w)
plan = build_null_plan(graph, coords, block=BLOCK)
jax.block_until_ready(plan.local_idx)
print(f"plan: Npad={plan.n_padded:,} B={plan.block} ring={RING} "
      f"F(cap)={plan.far_src.shape[0]:,} bmax={plan.far_bmax}", flush=True)

B = plan.block
n_padded = plan.n_padded
nb = n_padded // B


@functools.partial(jax.jit, static_argnames=("g",))
def make_zq(key, g):
    Z = jax.random.normal(key, (N, g), jnp.float32)
    Zq, s = _quantize_z(Z)
    den = jnp.sum(Z * Z, axis=0)
    return Zq, s * s, jnp.where(den > 0, den, 1.0)


# prep in <=1024-gene chunks (the f32 intermediates OOM at full width —
# same recipe as bench.py / ops/streaming.py)
parts = [jax.block_until_ready(make_zq(jax.random.key(1 + i), 1024))
         for i in range(G // 1024)]
Zq = jnp.concatenate([p[0] for p in parts], axis=1)
sz2 = jnp.concatenate([p[1] for p in parts])
den = jnp.concatenate([p[2] for p in parts])
del parts
Zq = jax.block_until_ready(Zq)


@functools.partial(jax.jit, static_argnames=("g",))
def make_z4(key, g):
    Z = jax.random.normal(key, (N, g), jnp.float32)
    Zpk, s = _quantize_z4(Z)
    return Zpk


# nibble-packed table for the int4 variants: each 1024-chunk packs
# gene pairs (j, j+512) — the probe only times data movement + kernel,
# so the pair layout across chunks is irrelevant
Zpk = jax.block_until_ready(jnp.concatenate(
    [make_z4(jax.random.key(7 + i), 1024) for i in range(G // 1024)],
    axis=1))
A8, sw = jax.block_until_ready(jax.jit(
    functools.partial(_build_band_i8, block=B))(plan.local_idx,
                                                plan.w_local))
gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, N - 1)
rows_idx = plan.order[gidx0]
base = key_for(0, "perm_feistel", 0)

# windowed-far pack (far_q with full-row scale, as the LISA i8 path)
local_max = jnp.max(plan.w_local.astype(jnp.float32), axis=1)
far_max = jnp.zeros((n_padded,), jnp.float32).at[plan.far_src - B].max(
    plan.far_w.astype(jnp.float32), mode="drop")
rowmax = jnp.maximum(local_max, far_max)
sw_row = jnp.where(rowmax > 0, rowmax / 127.0, 1.0)
far_q = jnp.clip(jnp.round(plan.far_w / sw_row[plan.far_src - B]), 0, 127)
S, nw, rowp, qp, rif, w_idx, starts0, runs = _win_far_pack(
    plan.far_src, plan.far_dst, plan.far_w, far_q, plan.far_starts,
    rows_idx, B, plan.far_bmax)
print(f"win pack: S={S} nw={nw} rif={rif.shape[0]:,}", flush=True)
# win-mode band: full-row scale (matches _banded_test far_mode="win")
A8w, sww = jax.block_until_ready(jax.jit(functools.partial(
    _build_band_i8, block=B))(plan.local_idx, plan.w_local,
                              row_scale=sw_row.reshape(nb, B, 1)))
S0 = float(jnp.sum(graph.neighbor_w))


def make(variant):
    @jax.jit
    def scan(Zq, A8, sw, far_src, far_dst, far_w, rows_idx, rif, sz2, den,
             A8w, sww, rowp, qp, w_idx, starts0, runs, Zpk):
        def body(acc, step):
            key = jax.random.fold_in(base, step)
            if variant in ("gather4", "win4"):
                rows = feistel_apply(key, rows_idx, N)
                Zp = Zpk[rows].reshape(nb + 2, B, G // 2)
                if variant == "gather4":
                    return acc + jnp.sum(Zp.astype(jnp.int32)) % 3, None
                rowsf = feistel_apply(key, rif, N)
                Zf = Zpk[rowsf].reshape(nw, S, G // 2)
                cross = _band_cross_win_pallas_i4(
                    w_idx, starts0, runs, A8w, sww, Zp, Zf, rowp, qp,
                    interpret=False, ring=RING)
                stat = (N / S0) * cross * sz2 / den
                return acc + jnp.sum(stat).astype(jnp.int32) % 3, None
            if variant == "scatter":
                # inverse formulation: Zp[f(i)] = Z[i] evaluates the draw
                # at permutation f^-1 — an equally valid seeded bijection
                # stream. Writes are random, reads sequential: probes
                # whether the scatter side beats the 88 GB/s gather wall.
                dst = feistel_apply(key, jnp.arange(N, dtype=jnp.int32), N)
                Zp = jnp.zeros(((nb + 2) * B, G), jnp.int8
                               ).at[dst + B].set(Zq, mode="drop")
                return acc + jnp.sum(Zp.astype(jnp.int32)) % 3, None
            rows = feistel_apply(key, rows_idx, N)
            Zp = Zq[rows].reshape(nb + 2, B, G)
            if variant == "gather":
                return acc + jnp.sum(Zp.astype(jnp.int32)) % 3, None
            if variant == "wingather":
                rowsf = feistel_apply(key, rif, N)
                Zf = Zq[rowsf].reshape(nw, S, G)
                return acc + (jnp.sum(Zp.astype(jnp.int32))
                              + jnp.sum(Zf.astype(jnp.int32))) % 3, None
            if variant == "win":
                rowsf = feistel_apply(key, rif, N)
                Zf = Zq[rowsf].reshape(nw, S, G)
                cross = _band_cross_win_pallas_i8(
                    w_idx, starts0, runs, A8w, sww, Zp, Zf, rowp, qp,
                    interpret=False, ring=RING)
                stat = (N / S0) * cross * sz2 / den
                return acc + jnp.sum(stat).astype(jnp.int32) % 3, None
            cross = _band_cross_pallas_i8(A8, sw, Zp, interpret=False)
            if variant == "full":
                flat = Zp.reshape(-1, G)
                F = int(far_src.shape[0])
                fbytes = F * G * 4
                n_fc = 1 if fbytes <= (3 << 30) else -(-fbytes // (3 << 29))
                fc = -(-F // n_fc)
                for i in range(n_fc):
                    sl = slice(i * fc, min((i + 1) * fc, F))
                    fs = flat[far_src[sl]].astype(jnp.float32)
                    ft = flat[far_dst[sl]].astype(jnp.float32)
                    cross = cross + jnp.einsum(
                        "f,fg,fg->g", far_w[sl], fs, ft,
                        preferred_element_type=jnp.float32)
                    if n_fc > 1:
                        cross = jax.lax.optimization_barrier(cross)
            stat = (N / S0) * cross * sz2 / den
            return acc + jnp.sum(stat).astype(jnp.int32) % 3, None

        out, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(P))
        return out

    return scan


for variant in VARIANTS:
    scan = make(variant)
    args = (Zq, A8, sw, plan.far_src, plan.far_dst, plan.far_w, rows_idx,
            rif, sz2, den, A8w, sww, rowp, qp, w_idx, starts0, runs, Zpk)
    print(f"compiling {variant}...", flush=True)
    t0 = time.time()
    c = jax.block_until_ready(scan(*args))
    t_cold = time.time() - t0
    t0 = time.time()
    c = jax.block_until_ready(scan(*args))
    dt = time.time() - t0
    print(f"{variant:>9}: {dt*1e3/P:7.1f} ms/draw  "
          f"({N and G*P/dt:,.0f} genes*perms/s)  cold={t_cold:.1f}s",
          flush=True)
