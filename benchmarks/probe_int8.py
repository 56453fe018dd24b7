"""Feasibility probes for int8 null mode.

1. Does Mosaic lower jnp.dot(int8, int8, preferred=int32) to the MXU
   (correct + fast)?
2. In-scan random row-gather rate on an int8 [N, G] table (2 KB rows).
3. In-scan int8 halo band kernel (int8 window DMA ring + int8 dots +
   per-row-scaled f32 reduce).

Env: PROBE_CELLS, PROBE_GENES, PROBE_BLOCK, PROBE_PERMS, PROBE_ONLY.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatialcore_tpu.core.rng import feistel_permutation, key_for

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 2048))
B = int(os.environ.get("PROBE_BLOCK", 256))
P = int(os.environ.get("PROBE_PERMS", 20))
NPAD = ((N + B - 1) // B) * B
NB = NPAD // B
NSLAB = NB + 8
ONLY = [s for s in os.environ.get("PROBE_ONLY", "").split(",") if s]

print(f"N={N:,} G={G} B={B} nb={NB} P={P}", flush=True)


# ---- 1. int8 MXU dot correctness -----------------------------------------

def _dot_kernel(a_ref, b_ref, out_ref):
    out_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                         preferred_element_type=jnp.int32)


def check_int8_dot():
    rng = np.random.default_rng(0)
    a = rng.integers(-127, 128, (256, 256), dtype=np.int8)
    b = rng.integers(-127, 128, (256, 512), dtype=np.int8)
    got = pl.pallas_call(
        _dot_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 512), jnp.int32),
    )(jnp.asarray(a), jnp.asarray(b))
    want = a.astype(np.int64) @ b.astype(np.int64)
    ok = np.array_equal(np.asarray(got, np.int64), want)
    print(f"int8 MXU dot exact: {ok}", flush=True)
    return ok


# ---- scan harness ---------------------------------------------------------

base = key_for(0, "perm_feistel", 0)
gidx = jnp.clip(jnp.arange((NB + 2) * B, dtype=jnp.int32) - B, 0, N - 1)


def run_scan(name, body, *arrs, gb_per_draw=0.0):
    if ONLY and name not in ONLY:
        return

    @jax.jit
    def test(seed, *arrs):
        def f(acc, step):
            return acc + body(step, seed, *arrs), None

        acc, _ = jax.lax.scan(f, jnp.zeros((G,), jnp.float32),
                              jnp.arange(P))
        return acc

    r = test(jnp.uint32(0), *arrs)
    _ = float(r[0])
    t0 = time.time()
    r = test(jnp.uint32(1), *arrs)
    _ = float(r[0])
    dt = (time.time() - t0) / P
    msg = f"{name:16s} {dt*1e3:7.1f} ms/draw"
    if gb_per_draw:
        msg += f"   ({gb_per_draw/dt:,.0f} GB/s moved)"
    print(msg, flush=True)


# ---- 3. int8 halo band kernel --------------------------------------------

def make_int8_kernel(ring=4):
    def kernel(off_ref, a_ref, sw_ref, zp_any, out_ref, win_ref, sem_ref,
               acc_ref, lag_ref):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        off = off_ref[0]

        def dma(slab):
            return pltpu.make_async_copy(
                zp_any.at[(slab + off) % NSLAB], win_ref.at[slab % ring],
                sem_ref.at[slab % ring])

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            dma(0).start()
            dma(1).start()
            dma(2).start()
            dma(0).wait()
            dma(1).wait()

        @pl.when(i + 3 < nsteps + 2)
        def _():
            dma(i + 3).start()

        dma(i + 2).wait()

        a = a_ref[0]
        z0 = win_ref[i % ring]
        z1 = win_ref[(i + 1) % ring]
        z2 = win_ref[(i + 2) % ring]
        lag_ref[:] = jnp.dot(a[:, :B], z0,
                             preferred_element_type=jnp.int32)
        lag_ref[:] += jnp.dot(a[:, B:2 * B], z1,
                              preferred_element_type=jnp.int32)
        lag_ref[:] += jnp.dot(a[:, 2 * B:], z2,
                              preferred_element_type=jnp.int32)
        sw = sw_ref[0]
        acc_ref[:] = acc_ref[:] + jnp.sum(
            (sw * z1.astype(jnp.float32)) * lag_ref[:].astype(jnp.float32),
            axis=0, keepdims=True)

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


def int8_band_call(off, A8, SW, Zp8, ring=4):
    return pl.pallas_call(
        make_int8_kernel(ring),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, 3 * B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ring, B, G), jnp.int8),
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((B, G), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(off, A8, SW, Zp8)


def main():
    if not ONLY or "dot" in ONLY:
        check_int8_dot()

    rng_k = jax.random.key(9)

    @functools.partial(jax.jit, static_argnames=("shape", "dt"))
    def geni(key, shape, dt=jnp.int8):
        return jax.random.randint(key, shape, -127, 128, jnp.int32).astype(dt)

    Zt8 = geni(jax.random.key(3), (N, G))
    jax.block_until_ready(Zt8)
    _ = float(Zt8[0, 0])

    def v_gather8(step, seed, Zt8):
        key = jax.random.fold_in(base, step + seed)
        perm = feistel_permutation(key, N)
        Zp = Zt8[perm[gidx]].reshape(NB + 2, B, G)
        return Zp[0, 0].astype(jnp.float32)

    run_scan("gather_int8", v_gather8, Zt8,
             gb_per_draw=2 * (NB + 2) * B * G / 1e9)

    A8 = geni(jax.random.key(1), (NB, B, 3 * B))
    SW = jnp.abs(jax.random.normal(jax.random.key(2), (NB, B, 1),
                                   jnp.float32))
    Zp8 = geni(jax.random.key(4), (NSLAB, B, G))
    jax.block_until_ready((A8, SW, Zp8))

    def v_band8(step, seed, A8, SW, Zp8):
        off = ((step + seed) % NSLAB).astype(jnp.int32).reshape(1)
        return int8_band_call(off, A8, SW, Zp8)[0]

    run_scan("band_int8", v_band8, A8, SW, Zp8,
             gb_per_draw=(NB * B * (3 * B + G) + 2 * B * G) / 1e9)


if __name__ == "__main__":
    main()
