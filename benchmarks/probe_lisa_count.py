"""Counter-dtype probe for the LISA permutation scan (direct kernel).

STATUS (round 3): UNMEASURED — the direct-path scan program (sort
permutation + k barriered lag gathers + [N, G] count update) takes
>6 min PER VARIANT in the remote compile service at 500k cells, so the
three-variant comparison never completed inside a TPU-healthy window.
The int16/bf16 counter idea (halve the count read+write traffic, exact
for P <= 32767 / <= 256) remains a candidate; measure when a local
compiler or a stable backend exists. Note the compile cost itself is a
finding: a user's first 500k-cell LISA call pays the same multi-minute
remote compile.

The local-Moran draw loop's [N, G] count update (read + write per draw)
plus the [N, G] Ip comparison is the documented bottleneck at scale.
This times the production direct-path body (ops.moran.local_moran
"total" null: one permuted gather + k barriered lag gathers) with int32
vs int16 vs bf16 counters (bf16 is exact for counts <= 256, i.e. any
<=200-draw chunk).

Env: PROBE_CELLS, PROBE_GENES, PROBE_PERMS.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialcore_tpu.core.rng import key_for
from spatialcore_tpu.ops.graph import build_graph, spatial_lag

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 256))
P = int(os.environ.get("PROBE_PERMS", 20))

kc = jax.random.key(0)
coords = jax.random.uniform(kc, (N, 2), jnp.float32, 0.0, 6000.0)
import sys, time as _t
_t0 = _t.time()
_ = float(coords[0, 0])                      # eat first-readback stall
print(f"readback warmup {_t.time()-_t0:.1f}s", flush=True)
graph = build_graph(coords, n_neighbors=6)
jax.block_until_ready(graph.neighbor_w)
print("graph built", flush=True)

Z = jax.random.normal(jax.random.key(1), (N, G), jnp.float32)
# jit: eager spatial_lag dispatches every gather separately over the
# remote tunnel (~seconds each when degraded)
abs_obs = jax.jit(lambda z: jnp.abs(z * spatial_lag(graph, z)))(Z)
jax.block_until_ready(abs_obs)
print("abs_obs ready", flush=True)
base = key_for(0, "perm_local", 0)


def run(count_dtype):
    @jax.jit
    def scan():
        def body(count, p):
            key = jax.random.fold_in(base, p)
            perm = jax.random.permutation(key, N)
            Zp = Z[perm]
            Ip = Zp * spatial_lag(graph, Zp)
            extreme = jnp.abs(Ip) >= abs_obs
            return count + extreme.astype(count_dtype), None

        c0 = jnp.zeros((N, G), count_dtype)
        count, _ = jax.lax.scan(body, c0, jnp.arange(P))
        return count.astype(jnp.int32)

    print(f"compiling {count_dtype.__name__}...", flush=True)
    c = jax.block_until_ready(scan())          # compile + warm
    t0 = time.time()
    c = jax.block_until_ready(scan())
    dt = time.time() - t0
    print(f"{count_dtype.__name__:>9}: {dt*1e3/P:7.1f} ms/draw "
          f"({N*G*P/dt/1e9:.1f} G cell-gene-draws/s)", flush=True)
    return np.asarray(c[:8, 0])


r32 = run(jnp.int32)
r16 = run(jnp.int16)
rbf = run(jnp.bfloat16)
assert np.array_equal(r32, r16), (r32, r16)
assert np.array_equal(r32, rbf), (r32, rbf)
if P <= 127:  # int8 counters are exact only for <=127 draws per chunk
    r8 = run(jnp.int8)
    assert np.array_equal(r32, r8), (r32, r8)
print("counts identical across dtypes", flush=True)
