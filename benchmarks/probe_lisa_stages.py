"""Stage bisection for the int8 LISA permutation null (banded, fused).

The production draw loop (`ops.banded._banded_local_moran_p_i8`,
band_impl="pallas") does, per draw:

  1. Feistel rows + ONE int8 row gather  Zp = Zq[rows]      (issue-bound)
  2. far-edge vals: gather Zp[far_dst] (compact F rows), * far_q
  3. dense far scatter: zeros[Npad, G] int32 .at[far_src].add(vals)
  4. fused Pallas kernel: band dots + far add + |z*lag| >= obs + count

This times variants that drop stages to attribute the per-draw cost
(all big arrays are passed as jit ARGUMENTS — a closed-over Zq ships as
a compile-request constant and the remote compile service rejects the
body with HTTP 413):

  gather     only stage 1 + tiny reduce
  nofar      far dense = zeros passed in (drops 2+3)
  novals     scatter dropped, vals still computed + reduced    (drops 3)
  full       production body (pallas fused kernel)
  xla        production body with band_impl="xla" (einsum + dense lag)

Env: PROBE_CELLS (1M), PROBE_GENES (512), PROBE_PERMS (25), PROBE_K (6).
"""

import functools
import os
import time

import jax
import jax.numpy as jnp

from spatialcore_tpu.core.rng import feistel_apply, key_for
from spatialcore_tpu.ops.banded import (
    _band_lag_count_pallas_i8, _build_band_i8, _quantize_z, build_null_plan)
from spatialcore_tpu.ops.graph import build_graph

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 512))
P = int(os.environ.get("PROBE_PERMS", 25))
K = int(os.environ.get("PROBE_K", 6))

coords = jax.random.uniform(jax.random.key(0), (N, 2), jnp.float32, 0, 6000)
t0 = time.time()
_ = float(coords[0, 0])
print(f"readback warmup {time.time()-t0:.1f}s", flush=True)
graph = build_graph(coords, n_neighbors=K)
jax.block_until_ready(graph.neighbor_w)
plan = build_null_plan(graph, coords)
jax.block_until_ready(plan.local_idx)
print(f"plan: Npad={plan.n_padded:,} B={plan.block} "
      f"F(cap)={plan.far_src.shape[0]:,}", flush=True)

B = plan.block
n_padded = plan.n_padded
nb = n_padded // B


@functools.partial(jax.jit, static_argnames=("g",))
def make_zq(key, g):
    Z = jax.random.normal(key, (N, g), jnp.float32)
    Zq, _ = _quantize_z(Z)
    return Zq


Zq = jax.block_until_ready(make_zq(jax.random.key(1), G))


@jax.jit
def prep(w_local, far_src, far_w, local_idx):
    local_max = jnp.max(w_local.astype(jnp.float32), axis=1)
    far_max = jnp.zeros((n_padded,), jnp.float32).at[far_src - B].max(
        far_w.astype(jnp.float32), mode="drop")
    rowmax = jnp.maximum(local_max, far_max)
    sw_row = jnp.where(rowmax > 0, rowmax / 127.0, 1.0)
    A8, _ = _build_band_i8(local_idx, w_local, B,
                           row_scale=sw_row.reshape(nb, B, 1))
    far_q = jnp.clip(jnp.round(far_w / sw_row[far_src - B]), 0,
                     127).astype(jnp.int32)
    return A8, far_q


A8, far_q = jax.block_until_ready(
    prep(plan.w_local, plan.far_src, plan.far_w, plan.local_idx))
gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, N - 1)
rows_idx = plan.order[gidx0]
base = key_for(0, "perm_feistel_local", 0)


def abs_ip(Zq, A8, far_q, far_src, far_dst, rows):
    Zp = Zq[rows].reshape(nb + 2, B, G)
    lag = jnp.zeros((nb, B, G), jnp.int32)
    for s in range(3):
        lag = lag + jnp.einsum(
            "nbw,nwg->nbg", A8[:, :, s * B:(s + 1) * B].astype(jnp.int32),
            Zp[s:s + nb].astype(jnp.int32))
        lag = jax.lax.optimization_barrier(lag)
    lag = lag.reshape(n_padded, G)
    vals = Zp.reshape(-1, G)[far_dst].astype(jnp.int32) * far_q[:, None]
    lag = lag.at[far_src - B].add(vals, mode="drop")
    z1 = Zp.reshape(-1, G)[B:B + n_padded].astype(jnp.int32)
    return jnp.abs(z1 * lag)


obs3 = jax.block_until_ready(jax.jit(
    lambda *a: abs_ip(*a, rows_idx).reshape(nb, B, G))(
        Zq, A8, far_q, plan.far_src, plan.far_dst))
zeros_far = jnp.zeros((nb, B, G), jnp.int32)
print("obs3 ready", flush=True)


def make(variant):
    @functools.partial(jax.jit, static_argnames=())
    def scan(Zq, A8, far_q, far_src, far_dst, obs3, zeros_far, rows_idx):
        def body(count, step):
            key = jax.random.fold_in(base, step)
            rows = feistel_apply(key, rows_idx, N)
            Zp = Zq[rows].reshape(nb + 2, B, G)
            if variant == "gather":
                return count.at[0, 0].add(
                    (jnp.sum(Zp.astype(jnp.int32)) % 2).astype(jnp.int8)), None
            if variant in ("full", "novals", "xla"):
                vals = (Zp.reshape(-1, G)[far_dst].astype(jnp.int32)
                        * far_q[:, None])
            if variant in ("full", "xla"):
                far = jnp.zeros((n_padded, G), jnp.int32).at[far_src - B].add(
                    vals, mode="drop").reshape(nb, B, G)
            elif variant in ("nofar", "novals"):
                far = zeros_far
            if variant == "xla":
                lag = jnp.zeros((nb, B, G), jnp.int32)
                for s in range(3):
                    lag = lag + jnp.einsum(
                        "nbw,nwg->nbg",
                        A8[:, :, s * B:(s + 1) * B].astype(jnp.int32),
                        Zp[s:s + nb].astype(jnp.int32))
                    lag = jax.lax.optimization_barrier(lag)
                lag = lag + far
                z1 = Zp[1:nb + 1].astype(jnp.int32)
                cnt = (jnp.abs(z1 * lag) >= obs3).astype(jnp.int8)
                return (count + cnt.reshape(n_padded, G)
                        .astype(count.dtype)), None
            out = _band_lag_count_pallas_i8(A8, far, obs3, count.reshape(
                nb, B, G), Zp, False).reshape(n_padded, G)
            if variant == "novals":
                return out.at[0, 0].add(
                    (jnp.sum(vals) % 2).astype(jnp.int8)), None
            return out, None

        c0 = jnp.zeros((n_padded, G), jnp.int8)
        count, _ = jax.lax.scan(body, c0, jnp.arange(P))
        return count

    return scan


for variant in ("gather", "nofar", "novals", "full", "xla"):
    scan = make(variant)
    args = (Zq, A8, far_q, plan.far_src, plan.far_dst, obs3, zeros_far,
            rows_idx)
    print(f"compiling {variant}...", flush=True)
    t0 = time.time()
    c = jax.block_until_ready(scan(*args))
    t_cold = time.time() - t0
    t0 = time.time()
    c = jax.block_until_ready(scan(*args))
    dt = time.time() - t0
    print(f"{variant:>8}: {dt*1e3/P:7.1f} ms/draw  "
          f"({N*G*P/dt/1e3:,.0f} genes*perms/s)  cold={t_cold:.1f}s",
          flush=True)
