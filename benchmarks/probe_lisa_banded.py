"""LISA-at-scale probe: direct vs banded bf16 vs banded int8 nulls.

Local statistics are wall-ed by the [N, G] elementwise traffic per draw
(count update + lag/Ip temps + the observed comparison), not by the
gathers (docs/performance.md "banded LOCAL Moran" note) — the round-2
banded bf16 path only TIED the direct kernel at 100-gene batches
(2.5k genes*perms/s at 1M x 128). The int8 system attacks exactly that
traffic: int8 gathers (quarter the bytes of f32), exact int8x int8->int32
MXU band dots, int16 counters, and comparisons in the quantized-operator
domain (ops/banded.py `_banded_local_moran_p_i8`).

One VARIANT per run (the remote compile service times out multi-variant
programs back-to-back; PROBE_VARIANT=direct|banded|int8), warm scan
timed after one compile+execute warm-up.

Env: PROBE_CELLS (1M), PROBE_GENES (512), PROBE_PERMS (20), PROBE_VARIANT.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 512))
P = int(os.environ.get("PROBE_PERMS", 20))
VARIANT = os.environ.get("PROBE_VARIANT", "int8")

from spatialcore_tpu.ops.graph import build_graph  # noqa: E402
from spatialcore_tpu.ops.moran import standardize  # noqa: E402

kc, kx = jax.random.split(jax.random.key(0))
coords = jax.random.uniform(kc, (N, 2), jnp.float32, 0.0, 6000.0)
jax.block_until_ready(coords)
t0 = time.time()
_ = float(coords[0, 0])                      # eat first-readback stall
print(f"readback warmup {time.time()-t0:.1f}s", flush=True)

graph = build_graph(coords, n_neighbors=6)
jax.block_until_ready(graph.neighbor_w)
print("graph built", flush=True)


@jax.jit
def _prep(key):
    X = jax.random.normal(key, (N, G), jnp.float32)
    Z, _ = standardize(X)
    return Z


Z = jax.block_until_ready(_prep(kx))
print("Z ready", flush=True)


def timed(fn, what):
    print(f"compiling {what}...", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(fn())         # compile + warm execute
    print(f"  compile+warm {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(fn())
    dt = time.time() - t0
    print(f"{what:>8}: {dt:7.2f}s for {G}x{P} -> "
          f"{G*P/dt:,.0f} genes*perms/s ({dt*1e3/P:.1f} ms/draw)",
          flush=True)
    return out


if VARIANT == "direct":
    from spatialcore_tpu.ops.moran import local_moran

    p = timed(lambda: local_moran(graph, Z, 0, P).p_value, "direct")
elif VARIANT in ("banded", "int8", "pallas"):
    from spatialcore_tpu.ops.banded import (
        _banded_local_moran_p, _banded_local_moran_p_i8, build_null_plan)

    t0 = time.time()
    plan = build_null_plan(graph, coords, block=256)
    jax.block_until_ready(plan.w_local)
    print(f"plan built {time.time()-t0:.1f}s", flush=True)
    if VARIANT in ("int8", "pallas"):
        impl = "pallas" if VARIANT == "pallas" else "xla"
        # pass the PRE-QUANTIZED table: keeping the f32 Z resident next to
        # the int32 observed/far arrays is what OOMs G=1024
        from spatialcore_tpu.ops.banded import _quantize_z

        Zq = jax.block_until_ready(jax.jit(lambda z: _quantize_z(z)[0])(Z))
        del Z
        p = timed(lambda: _banded_local_moran_p_i8(
            plan.order, plan.rank, plan.local_idx, plan.w_local,
            plan.far_src, plan.far_dst, plan.far_w, Zq, jnp.uint32(0),
            block=plan.block, n=plan.n, n_permutations=P,
            perm_method="feistel", band_impl=impl), VARIANT)
    else:
        n_padded = plan.local_idx.shape[0]
        abs_obs = jnp.abs(Z * jnp.zeros_like(Z))   # placeholder-free path:
        # use the real observed |I| so comparisons exercise realistic
        # branch ratios (vals below)
        from spatialcore_tpu.ops.graph import spatial_lag

        obs = jax.jit(lambda z: jnp.abs(z * spatial_lag(graph, z)))(Z)
        abs_obs = obs[plan.order]
        if n_padded > plan.n:
            abs_obs = jnp.pad(abs_obs, ((0, n_padded - plan.n), (0, 0)),
                              constant_values=jnp.inf)
        p = timed(lambda: _banded_local_moran_p(
            plan.order, plan.rank, plan.local_idx, plan.w_local,
            plan.far_src, plan.far_dst, plan.far_w, Z, abs_obs,
            jnp.uint32(0), block=plan.block, n=plan.n, n_permutations=P,
            precision="bf16", perm_method="feistel"), "banded")
else:
    sys.exit(f"unknown PROBE_VARIANT={VARIANT}")

import numpy as np  # noqa: E402

pv = np.asarray(p[:4, :4])
print("p sample:\n", pv, flush=True)
