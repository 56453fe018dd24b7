"""Probe: DMA-pipelined row gather in Pallas vs XLA's gather op.

The Moran permutation loop is capped by XLA's random row-gather throughput
(flat ~150 GB/s; see docs/performance.md). This probe measures whether a
Pallas kernel issuing per-row HBM→VMEM DMAs with a deep in-flight pipeline
beats that — the decision input for the round-2 kernel strategy.

Notes discovered while building it (also in CLAUDE.md):
- the axon runtime CACHES identical executions — benchmarks must vary
  inputs per repetition or they measure nothing;
- Mosaic rejects sub-(8,128) slices of tiled HBM memrefs and sub-1024
  1D slices, so the row width must be a multiple of 1024 f32 for flat
  1D row DMAs (hence G=1024 here).

Run on TPU:  python benchmarks/probe_pallas_gather.py [depth] [tile]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, G, REPS = 524_288, 1024, 5  # N divisible by tile


def make_gather_sum(n, g, depth, tile):
    def kernel(idx_ref, z_hbm, out_ref, scratch, sems):
        def get_dma(slot, i):
            # z_hbm arrives reshaped [N*8, 128]: one logical row of
            # G=1024 f32 is exactly one aligned (8,128) tile, the only
            # slice granularity Mosaic allows on tiled HBM memrefs.
            return pltpu.make_async_copy(
                z_hbm.at[pl.ds(idx_ref[i] * 8, 8), :], scratch.at[slot],
                sems.at[slot])

        # lookahead depth-1: the DMA started in iteration i writes slot
        # (i-1) % depth, never the slot being read — no same-slot
        # read/write overlap for the compiler or DMA engine to misorder.
        for s in range(depth - 1):      # warm-up: fill the pipeline
            @pl.when(s < tile)
            def _(s=s):
                get_dma(s % depth, s).start()

        def body(i, acc):
            slot = jax.lax.rem(i, depth)
            nxt = i + depth - 1

            @pl.when(nxt < tile)
            def _():
                get_dma(jax.lax.rem(nxt, depth), nxt).start()

            get_dma(slot, i).wait()
            return acc + scratch[slot]

        acc = jax.lax.fori_loop(0, tile, body,
                                jnp.zeros((8, 128), jnp.float32))
        out_ref[0] = acc

    n_tiles = n // tile

    def run_once(Z_in, idx):
        Z_flat = Z_in.reshape(n * 8, 128)
        partial = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((depth, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, Z_flat)
        return partial.sum(axis=0).reshape(-1)

    @jax.jit
    def run_reps(Z_in, key):
        def body(c, r):
            idx = jax.random.randint(jax.random.fold_in(key, r), (n,), 0, n,
                                     jnp.int32)
            return c + run_once(Z_in, idx), None

        c, _ = jax.lax.scan(body, jnp.zeros((g,), jnp.float32),
                            jnp.arange(REPS))
        return c

    return run_once, run_reps


def main(depth=8, tile=2048):
    Z = jax.random.normal(jax.random.key(1), (N, G), jnp.float32)
    key = jax.random.key(7)
    jax.block_until_ready(Z)

    @jax.jit
    def xla_reps(Z, key):
        def body(c, r):
            idx = jax.random.randint(jax.random.fold_in(key, r), (N,), 0, N,
                                     jnp.int32)
            return c + jnp.sum(Z[idx], axis=0), None

        c, _ = jax.lax.scan(body, jnp.zeros((G,), jnp.float32),
                            jnp.arange(REPS))
        return c

    r = xla_reps(Z, key)
    jax.block_until_ready(r)
    t0 = time.time()
    r = xla_reps(Z, jax.random.key(8))
    jax.block_until_ready(r)
    el = (time.time() - t0) / REPS
    print(f"XLA gather+sum: {el*1e3:.0f} ms/rep -> {N/el/1e6:.0f}M rows/s, "
          f"{N*G*4/el/1e9:.0f} GB/s")

    run_once, run_reps = make_gather_sum(N, G, depth, tile)
    # correctness vs XLA on one fixed index set
    idx0 = jax.random.randint(jax.random.key(9), (N,), 0, N, jnp.int32)
    got = jax.jit(run_once)(Z, idx0)
    want = jnp.sum(Z[idx0], axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3,
                               atol=0.05)
    print("pallas == xla on fixed indices")

    p = run_reps(Z, key)
    jax.block_until_ready(p)
    t0 = time.time()
    p = run_reps(Z, jax.random.key(8))
    jax.block_until_ready(p)
    el = (time.time() - t0) / REPS
    print(f"Pallas DMA gather+sum (depth={depth}, tile={tile}): "
          f"{el*1e3:.0f} ms/rep -> {N/el/1e6:.0f}M rows/s, "
          f"{N*G*4/el/1e9:.0f} GB/s")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
