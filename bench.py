"""Headline benchmark: global Moran's I permutation throughput at 1M cells.

BASELINE.md north star: Moran's I, 5,000 genes x 1,000 permutations on 1M
Xenium-like cells in <60 s on a v5e-8  =>  83,333 genes*perms/sec for the
8-chip slice, i.e. ~10,417 genes*perms/sec per chip. This script runs on
whatever single device is available and reports

    {"metric": "moran_genes_perms_per_sec_1M_cells", "value": ...,
     "unit": "genes*perms/sec", "vs_baseline": value / PER_CHIP_TARGET}

so vs_baseline >= 1.0 means the per-chip share of the north-star target is
met. Graph-build time is reported on stderr (tracked metric #2).

Env overrides: BENCH_CELLS, BENCH_GENES, BENCH_PERMS, BENCH_K.
"""

import json
import os
import sys
import time

import numpy as np

PER_CHIP_TARGET = 83333.0 / 8.0  # genes*perms/sec


def main():
    n_cells = int(os.environ.get("BENCH_CELLS", 1_000_000))
    n_genes = int(os.environ.get("BENCH_GENES", 512))
    n_perms = int(os.environ.get("BENCH_PERMS", 100))
    k = int(os.environ.get("BENCH_K", 6))

    import jax
    import jax.numpy as jnp

    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.moran import (
        moran_observed, permutation_test_global, standardize)

    dev = jax.devices()[0]
    print(f"[bench] device={dev.platform}:{dev.device_kind} "
          f"N={n_cells:,} G={n_genes} P={n_perms} k={k}", file=sys.stderr)

    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 6000.0, size=(n_cells, 2)).astype(np.float32)
    X = rng.standard_normal((n_cells, n_genes), dtype=np.float32)

    t0 = time.time()
    graph = build_graph(coords, n_neighbors=k)
    jax.block_until_ready(graph.neighbor_w)
    t_graph = time.time() - t0
    print(f"[bench] graph build: {t_graph*1e3:.0f} ms "
          f"({t_graph*1e3*1e6/n_cells:.0f} ms per 1M cells)", file=sys.stderr)

    Z, _ = standardize(jnp.asarray(X))
    S0 = float(n_cells)

    @jax.jit
    def observed(Z):
        return moran_observed(graph, Z, S0)

    I_obs = observed(Z)
    jax.block_until_ready(I_obs)

    null_dtype = os.environ.get("BENCH_NULL_DTYPE", "float32")

    def run(seed):
        p, m, s = permutation_test_global(
            graph, Z, S0, I_obs, seed=seed, n_permutations=n_perms,
            alternative="greater", null_dtype=null_dtype)
        jax.block_until_ready(p)
        return p

    run(0)  # compile
    # the timed run uses a different seed: some backends cache identical
    # executions, which would make a repeat of the warm-up measure nothing
    t0 = time.time()
    run(1)
    elapsed = time.time() - t0

    rate = n_genes * n_perms / elapsed
    print(f"[bench] {n_genes}x{n_perms} perms in {elapsed:.2f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "moran_genes_perms_per_sec_1M_cells",
        "value": round(rate, 1),
        "unit": "genes*perms/sec",
        "vs_baseline": round(rate / PER_CHIP_TARGET, 3),
    }))


if __name__ == "__main__":
    main()
