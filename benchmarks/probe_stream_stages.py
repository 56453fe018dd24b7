"""Stage probe for the config-8 streamed LISA path at P=1000.

Splits the 1M x 2048 x 1000 end-to-end time (140.1 s = 14.6k g*p/s,
round 5) into per-tile stages at the production tile width:

  1. tile prep: on-device generate + standardize (f32)
  2. null kernel: banded_local_moran_pvalues (windowed int8, P draws)
  3. lean post-pass: obs planes + discrete BH + quadrant, compact dtypes
  4. full lean tile via _stream_local_lean (the production path)

Env: PS_CELLS (1M), PS_GENES (512 = one tile), PS_PERMS (1000).
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialcore_tpu.ops.banded import (banded_local_moran_pvalues,
                                        build_null_plan)
from spatialcore_tpu.ops.graph import build_graph
from spatialcore_tpu.ops.moran import standardize

N = int(os.environ.get("PS_CELLS", 1_000_000))
G = int(os.environ.get("PS_GENES", 512))
P = int(os.environ.get("PS_PERMS", 1000))

kc, kx = jax.random.split(jax.random.key(0))
coords = jax.random.uniform(kc, (N, 2), jnp.float32, 0, 6000)
_ = float(coords[0, 0])
graph = build_graph(coords, n_neighbors=6)
plan = build_null_plan(graph, coords, block=256)
jax.block_until_ready(plan.w_local)
print(f"[probe] N={N:,} G={G} P={P} far_bmax={plan.far_bmax}", flush=True)


@functools.partial(jax.jit, static_argnums=(1,))
def _tile(start, width):
    X = jax.random.normal(jax.random.fold_in(kx, start), (N, width),
                          jnp.float32)
    return standardize(X)[0]


def timed(label, fn, warm=True):
    if warm:
        jax.block_until_ready(fn())
    t0 = time.time()
    out = jax.block_until_ready(fn())
    dt = time.time() - t0
    print(f"  {label:<44s} {dt:7.2f} s", flush=True)
    return out, dt


Z, t_prep = timed("prep (gen + standardize f32)", lambda: _tile(0, G))

_, t_kern = timed(f"kernel: banded_local_moran_pvalues P={P}",
                  lambda: banded_local_moran_pvalues(plan, Z, 0, P))

# the lean post-pass alone (what _stream_local_lean's `post` jit does)
from spatialcore_tpu.ops.fdr import apply_fdr
from spatialcore_tpu.ops.moran import classify_quadrants, local_moran

c = 128
starts_c = jnp.arange(0, G, c)
p_raw = banded_local_moran_pvalues(plan, Z, 0, P)
jax.block_until_ready(p_raw)


@jax.jit
def post(Zf, pr):
    def one(s):
        Zc = jax.lax.dynamic_slice_in_dim(Zf, s, c, axis=1)
        pc = jax.lax.dynamic_slice_in_dim(pr, s, c, axis=1)
        obs = local_moran(graph, Zc, 0, 0)
        p_adj = apply_fdr(pc, "fdr_bh", axis=0, n_levels=P + 1)
        quad = classify_quadrants(obs.z, obs.lag, p_adj, 0.05)
        return {"p_adj": p_adj.astype(jnp.float16),
                "quadrant": quad.astype(jnp.int8)}
    outs = jax.lax.map(one, starts_c)
    return {k: jnp.swapaxes(v, 0, 1).reshape(v.shape[1], -1)
            for k, v in outs.items()}


_, t_post = timed("lean post-pass (p_adj + quadrant, chunked)",
                  lambda: post(Z, p_raw))

tot = t_prep + t_kern + t_post
print(f"[probe] tile total {tot:.2f} s -> per-2048-gene-4-tile est "
      f"{4 * tot:.1f} s = {2048 * P / (4 * tot):,.0f} g*p/s", flush=True)
print(f"[probe] kernel alone: {G * P / t_kern:,.0f} g*p/s; "
      f"prep+post overhead {100 * (t_prep + t_post) / tot:.0f}%",
      flush=True)
