"""Measure fused moran_geary vs separate moran + geary banded nulls.

The per-draw random row gather is issue-bound (docs/performance.md), so a
fused pass that serves both statistics from one gather should approach 2x
the combined throughput of two separate passes.

Prep follows the bench.py recipe: data generated on-device in <=1024-gene
f32 chunks, stored pre-quantized int8 (the resident table is N*G bytes, not
4*N*G — an 8 GB f32 Z trips the degraded-backend size threshold).

Env: PROBE_CELLS, PROBE_GENES, PROBE_PERMS, PROBE_PRECISION.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialcore_tpu.ops.banded import (
    _quantize_z, banded_permutation_test, build_null_plan)
from spatialcore_tpu.ops.graph import build_graph
from spatialcore_tpu.ops.moran import standardize

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 2048))
P = int(os.environ.get("PROBE_PERMS", 100))
PREC = os.environ.get("PROBE_PRECISION", "int8")

print(f"N={N:,} G={G} P={P} precision={PREC}", flush=True)

key = jax.random.PRNGKey(0)
kc, kx = jax.random.split(key)
coords = jax.random.uniform(kc, (N, 2), jnp.float32, 0.0, 6000.0)
graph = build_graph(coords, n_neighbors=6)
plan = build_null_plan(graph, coords)
S0 = float(N)


assert PREC == "int8", "probe measures the int8 null system"


@functools.partial(jax.jit, static_argnames=("g",))
def prep_chunk(k, g):
    # no f32 observed pass here: with precision='int8' the kernel
    # recomputes observed under the quantized operator and IGNORES the
    # argument — computing moran+geary observed on a [1M, 1024] f32 chunk
    # is what OOMed the first version of this probe (24 GB of slot temps)
    X = jax.random.normal(k, (N, g), jnp.float32)
    Z, _ = standardize(X)
    den = jnp.sum(Z * Z, axis=0)
    den = jnp.where(den > 0, den, 1.0)
    Zq, s_z = _quantize_z(Z)
    return Zq, s_z, den


parts = [prep_chunk(jax.random.fold_in(kx, i), min(512, G - s))
         for i, s in enumerate(range(0, G, 512))]
Z = jnp.concatenate([p[0] for p in parts], axis=1)
sz = jnp.concatenate([p[1] for p in parts])
den = jnp.concatenate([p[2] for p in parts])
obs_m = jnp.zeros((G,), jnp.float32)    # ignored by the int8 kernel
obs_g = jnp.zeros((G,), jnp.float32)
del parts
jax.block_until_ready(Z)
float(np.asarray(den[0]))   # eat any first-readback tunnel stall

kw = dict(seed=11, n_permutations=P, precision=PREC, den=den, sz=sz)


def run(stat, obs, alt):
    t0 = time.time()
    p, m, s = banded_permutation_test(
        plan, Z, S0, obs, stat=stat, alternative=alt, **kw)
    jax.block_until_ready(p)
    return time.time() - t0, p


for trial in range(2):
    tag = "cold" if trial == 0 else "warm"
    tm, pm = run("moran", obs_m, "greater")
    tg, pg = run("geary", obs_g, "less")
    tf, pf = run("moran_geary", jnp.stack([obs_m, obs_g]),
                 ("greater", "less"))
    both = G * P * 2
    print(f"[{tag}] moran {tm:.2f}s  geary {tg:.2f}s  fused {tf:.2f}s  "
          f"separate {(tm + tg):.2f}s -> speedup {(tm + tg) / tf:.2f}x  "
          f"fused rate {both / tf / 1e3:.1f}k stat·g·p/s", flush=True)
assert np.array_equal(np.asarray(pf[0]), np.asarray(pm))
assert np.array_equal(np.asarray(pf[1]), np.asarray(pg))
print("fused == separate p-values: OK", flush=True)
