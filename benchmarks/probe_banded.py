"""Probe: banded vs legacy global-Moran permutation throughput at scale.

Generates data ON-DEVICE (host->device tunnel uploads are slow; CLAUDE.md),
builds the graph + null plan, and times P draws through both paths.

Env: PROBE_CELLS, PROBE_GENES, PROBE_PERMS, PROBE_K, PROBE_LEGACY=0/1,
     PROBE_HALO, PROBE_BLOCK, PROBE_PREC (bf16|f32).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialcore_tpu.ops.banded import banded_permutation_test, build_null_plan
from spatialcore_tpu.ops.graph import build_graph
from spatialcore_tpu.ops.moran import (
    moran_observed, permutation_test_global, standardize)


def main():
    n = int(os.environ.get("PROBE_CELLS", 1_000_000))
    g = int(os.environ.get("PROBE_GENES", 512))
    p = int(os.environ.get("PROBE_PERMS", 20))
    k = int(os.environ.get("PROBE_K", 6))
    prec = os.environ.get("PROBE_PREC", "bf16")
    pm = os.environ.get("PROBE_PERM", "feistel")
    block = int(os.environ.get("PROBE_BLOCK", 512))
    impl = os.environ.get("PROBE_IMPL", "auto")

    dev = jax.devices()[0]
    print(f"device={dev.platform}:{dev.device_kind} N={n:,} G={g} P={p} "
          f"k={k} prec={prec}", flush=True)

    kc, kx = jax.random.split(jax.random.key(0))
    coords = jax.random.uniform(kc, (n, 2), jnp.float32, 0.0, 6000.0)
    X = jax.random.normal(kx, (n, g), jnp.float32)
    jax.block_until_ready(coords)

    t0 = time.time()
    graph = build_graph(np.asarray(coords), n_neighbors=k)
    jax.block_until_ready(graph.neighbor_w)
    print(f"graph build: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    plan = build_null_plan(graph, np.asarray(coords), block=block)
    print(f"plan build: {time.time()-t0:.1f}s", flush=True)

    Z, _ = standardize(X)
    S0 = float(n)
    obs = jax.block_until_ready(moran_observed(graph, Z, S0))

    def timed(name, fn):
        t0 = time.time()
        r = jax.block_until_ready(fn(0))
        print(f"{name} compile+run: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        jax.block_until_ready(fn(1))
        dt = time.time() - t0
        print(f"{name}: {dt:.2f}s -> {g*p/dt:,.0f} genes*perms/s", flush=True)
        return r

    pb = timed("banded", lambda s: banded_permutation_test(
        plan, Z, S0, obs, seed=s, n_permutations=p, precision=prec,
        perm_method=pm, band_impl=impl)[0])

    if os.environ.get("PROBE_LEGACY", "1") == "1":
        pl_ = timed("legacy", lambda s: permutation_test_global(
            graph, Z, S0, obs, seed=s, n_permutations=p)[0])
        diff = np.abs(np.asarray(pb) - np.asarray(pl_))
        print(f"p-value max |banded-legacy| = {diff.max():.4f}", flush=True)


if __name__ == "__main__":
    main()
