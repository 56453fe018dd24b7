"""In-scan (hoisting-proof, single-sync) bisect of the halo band pipeline.

The isolated-call numbers in probe_halo_stages.py are poisoned by the
~34 ms tunnel RTT per readback; these variants run P draws inside one
scan with step-dependent inputs (nothing loop-invariant) and sync once.

Variants:
  gather_rand   Zp = Ztab[perm[gidx]]          (the production gather)
  gather_seq    Zp = rolled copy of Ztab        (same bytes, sequential)
  ring_dma      halo DMA ring only, step-offset source, no dots
  super_dma     one [S*B, G] DMA per S steps (S=8)
  ring_full     DMA ring + production dots + reduce (fixed band A)
  super_full    super-slab DMA + dots + deferred reduce

Env: PROBE_CELLS, PROBE_GENES, PROBE_BLOCK, PROBE_PERMS, PROBE_S.
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
P = int(os.environ.get("PROBE_PERMS", 25))
S = int(os.environ.get("PROBE_S", 8))
NPAD = ((N + B - 1) // B) * B
NB = NPAD // B
NSLAB = ((NB + 2 + S - 1) // S) * S + S   # head-room for offset reads

print(f"N={N:,} G={G} B={B} nb={NB} P={P}", flush=True)


@functools.partial(jax.jit, static_argnames=("shape",))
def _gen(key, shape):
    return jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)


A = _gen(jax.random.key(1), (NB, B, 3 * B))
Zp0 = _gen(jax.random.key(2), (NSLAB, B, G))   # resident slab pool
Zb = _gen(jax.random.key(3), (N, G))
jax.block_until_ready((A, Zp0, Zb))
_ = float(Zb[0, 0])    # eat the first-readback stall

base = key_for(0, "perm_feistel", 0)
gidx = jnp.clip(jnp.arange((NB + 2) * B, dtype=jnp.int32) - B, 0, N - 1)


def make_ring_kernel(use_dot, ring):
    """Production-style 1-slab ring; source slab offset by a per-draw
    scalar (SMEM) so nothing is loop-invariant across scan steps."""
    def kernel(off_ref, a_ref, zp_any, out_ref, win_ref, sem_ref, acc_ref,
               lag_ref):
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
        if use_dot:
            lag_ref[:] = jnp.dot(a[:, :B], z0,
                                 preferred_element_type=jnp.float32)
            lag_ref[:] += jnp.dot(a[:, B:2 * B], z1,
                                  preferred_element_type=jnp.float32)
            lag_ref[:] += jnp.dot(a[:, 2 * B:], z2,
                                  preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] + jnp.sum(
                z1.astype(jnp.float32) * lag_ref[:], axis=0, keepdims=True)
        else:
            acc_ref[:] = acc_ref[:] + z1[:1].astype(jnp.float32)

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


def ring_call(off, A, Zp, use_dot, ring=4):
    return pl.pallas_call(
        make_ring_kernel(use_dot, ring),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, 3 * B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ring, B, G), Zp.dtype),
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.VMEM((1, G), jnp.float32),
            pltpu.VMEM((B, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(off, A, Zp)


def make_super_kernel(use_dot, S, Rs):
    """Super-slab ring (one [S*B, G] DMA per S steps), deferred reduce."""
    def kernel(off_ref, a_ref, zp_any, out_ref, win_ref, sem_ref, lag_ref):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        nsuper = (nsteps + 2 + S - 1) // S
        off = off_ref[0]   # super-slab offset (multiple of S slabs)

        def dma(j):
            return pltpu.make_async_copy(
                zp_any.at[pl.ds(((j + off) % (NSLAB // S)) * S, S)],
                win_ref.at[pl.ds((j % Rs) * S, S)],
                sem_ref.at[j % Rs])

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            for j in range(Rs):
                dma(j).start()
            dma(0).wait()
            dma(1).wait()

        @pl.when((i % S == 0) & (i > 0))
        def _():
            j = i // S

            @pl.when(j + Rs - 1 < nsuper)
            def _():
                dma(j + Rs - 1).start()

            @pl.when(j + 1 < nsuper)
            def _():
                dma(j + 1).wait()

        a = a_ref[0]

        def slot(s):
            return ((s // S) % Rs) * S + s % S

        zc = win_ref[slot(i + 1)]
        if use_dot:
            lag_ref[:] = jnp.dot(a[:, :B], win_ref[slot(i)],
                                 preferred_element_type=jnp.float32)
            lag_ref[:] += jnp.dot(a[:, B:2 * B], win_ref[slot(i + 1)],
                                  preferred_element_type=jnp.float32)
            lag_ref[:] += jnp.dot(a[:, 2 * B:], win_ref[slot(i + 2)],
                                  preferred_element_type=jnp.float32)
            out_ref[:] = out_ref[:] + zc.astype(jnp.float32) * lag_ref[:]
        else:
            out_ref[:1] = out_ref[:1] + zc[:1].astype(jnp.float32)

    return kernel


def super_call(off, A, Zp, use_dot, S=8, Rs=3):
    out = pl.pallas_call(
        make_super_kernel(use_dot, S, Rs),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, 3 * B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, G), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S * Rs, B, G), Zp.dtype),
            pltpu.SemaphoreType.DMA((Rs,)),
            pltpu.VMEM((B, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(off, A, Zp)
    return jnp.sum(out, axis=0)


ONLY = [s for s in os.environ.get("PROBE_ONLY", "").split(",") if s]


def run_scan(name, body, gb_per_draw):
    if ONLY and name not in ONLY:
        return

    @jax.jit
    def test(A, Zsrc, Ztab, seed):
        def f(acc, step):
            return acc + body(A, Zsrc, Ztab, step, seed), None

        acc, _ = jax.lax.scan(f, jnp.zeros((G,), jnp.float32),
                              jnp.arange(P))
        return acc

    t0 = time.time()
    r = test(A, Zp0, Zb, jnp.uint32(0))
    _ = float(r[0])
    print(f"  [{name} compile+run {time.time()-t0:.1f}s]", flush=True)
    t0 = time.time()
    r = test(A, Zp0, Zb, jnp.uint32(1))
    _ = float(r[0])
    dt = (time.time() - t0) / P
    print(f"{name:14s} {dt*1e3:7.1f} ms/draw   "
          f"({gb_per_draw/dt:,.0f} GB/s moved)", flush=True)


def v_gather_rand(A, Zsrc, Ztab, step, seed):
    key = jax.random.fold_in(base, step + seed)
    perm = feistel_permutation(key, N)
    Zp = Ztab[perm[gidx]].reshape(NB + 2, B, G)
    return Zp[0, 0].astype(jnp.float32)


def v_gather_seq(A, Zsrc, Ztab, step, seed):
    rolled = jnp.roll(Ztab, (step + seed).astype(jnp.int32), axis=0)
    return rolled[0].astype(jnp.float32)


def v_ring_dma(A, Zsrc, Ztab, step, seed):
    off = ((step + seed) % NSLAB).astype(jnp.int32).reshape(1)
    return ring_call(off, A, Zsrc, False)[0]


def v_ring_full(A, Zsrc, Ztab, step, seed):
    off = ((step + seed) % NSLAB).astype(jnp.int32).reshape(1)
    return ring_call(off, A, Zsrc, True)[0]


def v_super_dma(A, Zsrc, Ztab, step, seed):
    off = ((step + seed) % (NSLAB // S)).astype(jnp.int32).reshape(1)
    return super_call(off, A, Zsrc, False, S=S)


def v_super_full(A, Zsrc, Ztab, step, seed):
    off = ((step + seed) % (NSLAB // S)).astype(jnp.int32).reshape(1)
    return super_call(off, A, Zsrc, True, S=S)


gb = (NB + 2) * B * G * 2 / 1e9
run_scan("gather_rand", v_gather_rand, 2 * gb)
run_scan("gather_seq", v_gather_seq, 2 * gb)
run_scan("ring_dma", v_ring_dma, gb)
run_scan("super_dma", v_super_dma, gb)
run_scan("ring_full", v_ring_full, gb + NB * B * 3 * B * 2 / 1e9)
run_scan("super_full", v_super_full, gb + NB * B * 3 * B * 2 / 1e9)
