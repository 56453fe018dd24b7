"""Headline benchmark: global Moran's I permutation throughput at 1M cells.

BASELINE.md north star: Moran's I, 5,000 genes x 1,000 permutations on 1M
Xenium-like cells in <60 s on a v5e-8  =>  83,333 genes*perms/sec for the
8-chip slice, i.e. ~10,417 genes*perms/sec per chip. This script runs on
whatever single device is available and reports

    {"metric": "moran_genes_perms_per_sec_1M_cells", "value": ...,
     "unit": "genes*perms/sec", "vs_baseline": value / PER_CHIP_TARGET}

so vs_baseline >= 1.0 means the per-chip share of the north-star target is
met. Graph-build time is reported on stderr (tracked metric #2).

The null path is the banded kernel (ops/banded.py): Hilbert-relabeled
edges evaluated as block-banded dense bf16 matmuls, one random row gather
per draw, Feistel permutations. G defaults to 2048 — the widest gene tile
that fits a single v5e's HBM (prep runs in 1024-gene chunks; the hot loop
auto-selects the halo Pallas band kernel at this width). The per-draw
gather is a fixed cost, so throughput rises with the gene width; the
gene-batched 5k-gene workload runs at this same tile width
(benchmarks/run_configs.py config 4 is the sustained end-to-end number).

Data is generated ON-DEVICE (host->device uploads ride a slow tunnel).

Env overrides: BENCH_CELLS, BENCH_GENES, BENCH_PERMS, BENCH_K,
BENCH_METHOD=banded|legacy, BENCH_IMPL=xla|pallas|pallas_halo.
"""

import functools
import json
import os
import sys
import time


PER_CHIP_TARGET = 83333.0 / 8.0  # genes*perms/sec


def main():
    n_cells = int(os.environ.get("BENCH_CELLS", 1_000_000))
    n_genes = int(os.environ.get("BENCH_GENES", 2048))
    n_perms = int(os.environ.get("BENCH_PERMS", 100))
    k = int(os.environ.get("BENCH_K", 6))
    method = os.environ.get("BENCH_METHOD", "banded")

    import jax
    import jax.numpy as jnp

    from spatialcore_tpu.ops.banded import (
        banded_permutation_test, build_null_plan)
    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.moran import (
        moran_observed, permutation_test_global, standardize)

    dev = jax.devices()[0]
    print(f"[bench] device={dev.platform}:{dev.device_kind} "
          f"N={n_cells:,} G={n_genes} P={n_perms} k={k} method={method}",
          file=sys.stderr)

    kc, kx = jax.random.split(jax.random.key(0))
    coords_j = jax.random.uniform(kc, (n_cells, 2), jnp.float32, 0.0, 6000.0)
    jax.block_until_ready(coords_j)
    # the FIRST device->host readback of a process can stall ~5 min when
    # the remote tunnel is degraded (measured: 316 s for 4 bytes, then
    # instant; docs/performance.md). Eat it here, outside any timed region.
    t0 = time.time()
    _ = float(coords_j[0, 0])
    print(f"[bench] first-readback warmup: {time.time()-t0:.1f}s",
          file=sys.stderr)

    # pass the DEVICE array: the grid build then runs with no bulk
    # host<->device transfers (the tunnel makes an 8MB hop cost seconds,
    # occasionally minutes when the backend has a transient stall)
    t0 = time.time()
    graph = build_graph(coords_j, n_neighbors=k)
    jax.block_until_ready(graph.neighbor_w)
    t_graph = time.time() - t0
    print(f"[bench] graph build: {t_graph*1e3:.0f} ms "
          f"({t_graph*1e3*1e6/n_cells:.0f} ms per 1M cells)", file=sys.stderr)

    S0 = float(n_cells)

    # prep in gene chunks: a single f32 [N, G] standardize needs two
    # 4·N·G-byte intermediates, which OOMs a 16 GB v5e at G=2048 even
    # though the bf16 HOT LOOP fits (docs/performance.md)
    g_chunk = min(n_genes, 1024)

    @functools.partial(jax.jit, static_argnames=("g",))
    def prep_chunk(key, g):
        X = jax.random.normal(key, (n_cells, g), jnp.float32)
        Z, _ = standardize(X)
        den = jnp.sum(Z * Z, axis=0)
        den = jnp.where(den > 0, den, 1.0)
        I_obs = moran_observed(graph, Z, S0)
        Zb = Z.astype(jnp.bfloat16)
        return (Zb if method == "banded" else Z), den, I_obs

    parts = []
    for ci, start in enumerate(range(0, n_genes, g_chunk)):
        g = min(g_chunk, n_genes - start)
        parts.append(jax.block_until_ready(
            prep_chunk(jax.random.fold_in(kx, ci), g)))
    if len(parts) == 1:
        Ztab, den, I_obs = parts[0]
    else:
        Ztab = jnp.concatenate([p[0] for p in parts], axis=1)
        den = jnp.concatenate([p[1] for p in parts])
        I_obs = jnp.concatenate([p[2] for p in parts])
        del parts
        jax.block_until_ready(Ztab)

    if method == "banded":
        t0 = time.time()
        plan = build_null_plan(graph, coords_j, block=512)  # device path
        print(f"[bench] null plan build: {time.time()-t0:.1f}s",
              file=sys.stderr)

        impl = os.environ.get("BENCH_IMPL", "auto")

        def run(seed):
            p, _, _ = banded_permutation_test(
                plan, Ztab, S0, I_obs, seed=seed, n_permutations=n_perms,
                den=den, band_impl=impl)
            jax.block_until_ready(p)
            return p
    else:
        def run(seed):
            p, _, _ = permutation_test_global(
                graph, Ztab, S0, I_obs, seed=seed, n_permutations=n_perms,
                alternative="greater")
            jax.block_until_ready(p)
            return p

    run(0)  # compile
    # the timed run uses a different seed: some backends cache identical
    # executions, which would make a repeat of the warm-up measure nothing
    t0 = time.time()
    run(1)
    elapsed = time.time() - t0

    rate = n_genes * n_perms / elapsed
    print(f"[bench] {n_genes}x{n_perms} perms in {elapsed:.2f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "moran_genes_perms_per_sec_1M_cells",
        "value": round(rate, 1),
        "unit": "genes*perms/sec",
        "vs_baseline": round(rate / PER_CHIP_TARGET, 3),
    }))


if __name__ == "__main__":
    main()
