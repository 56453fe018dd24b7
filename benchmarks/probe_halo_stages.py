"""Bisect the halo band kernel's per-grid-step cost at production shape.

The burst draw at B=256, G=2048 spends ~45 ms in the band stage =
~11.5 us per grid step (nb=3907). Is that DMA wait, dot issue, or fixed
per-step overhead? Three kernel variants on a FIXED Zp (no gather):

  full       production _band_halo_kernel_1t (DMA ring + 3 dots + reduce)
  dma_only   DMA ring + trivial reduce (no dots)
  dot_only   no DMA at all; dots on whatever sits in the window scratch

Plus the gather stage alone for the per-draw budget.

Env: PROBE_CELLS, PROBE_GENES, PROBE_BLOCK, PROBE_REPS.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 2048))
B = int(os.environ.get("PROBE_BLOCK", 256))
REPS = int(os.environ.get("PROBE_REPS", 5))
INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"
NPAD = ((N + B - 1) // B) * B
NB = NPAD // B

print(f"N={N:,} G={G} B={B} nb={NB}", flush=True)

@functools.partial(jax.jit, static_argnames=("shape",))
def _gen(key, shape):
    # fused f32->bf16 cast: only the bf16 buffer materializes
    return jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)


NSLAB = ((NB + 2 + 7) // 8) * 8     # super-slab copies may read past NB+2
A = _gen(jax.random.key(1), (NB, B, 3 * B))
Zp = _gen(jax.random.key(2), (NSLAB, B, G))
Zb = _gen(jax.random.key(3), (N, G))
jax.block_until_ready((A, Zp, Zb))


def make_kernel(use_dma, use_dot, wn, ring):
    """wn = window slabs per step (3 = production, 2 = symmetrized
    lower-window candidate); ring = DMA ring depth (4 = production,
    more = deeper prefetch to hide the ~9 us per-slab DMA latency)."""
    def kernel(a_ref, zp_any, out_ref, win_ref, sem_ref, acc_ref, lag_ref):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def dma(slab):
            return pltpu.make_async_copy(
                zp_any.at[slab], win_ref.at[slab % ring],
                sem_ref.at[slab % ring])

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            if not use_dma:
                win_ref[:] = jnp.zeros_like(win_ref)
            if use_dma:
                for s in range(ring - 1):
                    dma(s).start()
                for s in range(wn - 1):
                    dma(s).wait()

        if use_dma:
            @pl.when(i + ring - 1 < nsteps + wn - 1)
            def _():
                dma(i + ring - 1).start()

            dma(i + wn - 1).wait()

        a = a_ref[0]
        zc = win_ref[(i + wn - 2) % ring]   # center slab (row's own values)
        if use_dot:
            lag_ref[:] = jnp.dot(a[:, :B], win_ref[i % ring],
                                 preferred_element_type=jnp.float32)
            for s in range(1, wn):
                lag_ref[:] += jnp.dot(a[:, s * B:(s + 1) * B],
                                      win_ref[(i + s) % ring],
                                      preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] + jnp.sum(
                zc.astype(jnp.float32) * lag_ref[:], axis=0, keepdims=True)
        else:
            # touch one lane so nothing is dead-code-eliminated
            acc_ref[:] = acc_ref[:] + zc[:1].astype(jnp.float32)

        @pl.when(i == nsteps - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


def run(A, Zp, use_dma, use_dot, wn=3, ring=4):
    return pl.pallas_call(
        make_kernel(use_dma, use_dot, wn, ring),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, B, wn * B), lambda i: (i, 0, 0),
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
        interpret=INTERPRET,
    )(A[:, :, :wn * B], Zp)


def make_kernel2(use_dma, use_dot, wn, S, Rs):
    """Super-slab ring: Rs super-slots of S slabs each; ONE DMA copies S
    contiguous slabs ([S*B, G], S MB) every S steps — testing whether the
    ~8.3 us/step DMA cost is per-copy overhead (this wins) or an engine
    bandwidth cap (this ties). The reduction is DEFERRED: out_ref is a
    [B, G] f32 accumulator (acc += zc * lag per step, no per-step sublane
    reduce); the caller reduces once outside."""
    R = S * Rs

    def kernel(a_ref, zp_any, out_ref, win_ref, sem_ref, lag_ref):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)
        nsuper = (nsteps + wn - 1 + S - 1) // S

        def dma(j):
            return pltpu.make_async_copy(
                zp_any.at[pl.ds(j * S, S)],
                win_ref.at[pl.ds((j % Rs) * S, S)],
                sem_ref.at[j % Rs])

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            if not use_dma:
                win_ref[:] = jnp.zeros_like(win_ref)
            if use_dma:
                for j in range(Rs):
                    dma(j).start()
                dma(0).wait()
                dma(1).wait()

        if use_dma:
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

        zc = win_ref[slot(i + wn - 2)]
        if use_dot:
            lag_ref[:] = jnp.dot(a[:, :B], win_ref[slot(i)],
                                 preferred_element_type=jnp.float32)
            for s in range(1, wn):
                lag_ref[:] += jnp.dot(a[:, s * B:(s + 1) * B],
                                      win_ref[slot(i + s)],
                                      preferred_element_type=jnp.float32)
            out_ref[:] = out_ref[:] + zc.astype(jnp.float32) * lag_ref[:]
        else:
            out_ref[:1] = out_ref[:1] + zc[:1].astype(jnp.float32)

    return kernel


def run2(A, Zp, use_dma, use_dot, wn=3, S=4, Rs=3):
    R = S * Rs
    out = pl.pallas_call(
        make_kernel2(use_dma, use_dot, wn, S, Rs),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, B, wn * B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, G), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, B, G), Zp.dtype),
            pltpu.SemaphoreType.DMA((Rs,)),
            pltpu.VMEM((B, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(A[:, :, :wn * B], Zp)
    return jnp.sum(out, axis=0)


_ = float(Zb[0, 0])   # eat the first-readback stall outside timed regions


ONLY = [s for s in os.environ.get("PROBE_ONLY", "").split(",") if s]


def timeit(name, fn, *args):
    if ONLY and name not in ONLY:
        return None
    fn_j = jax.jit(fn)
    r = fn_j(*args)
    _ = float(jnp.ravel(r)[0])          # force full execution, not enqueue
    t0 = time.time()
    for _i in range(REPS):
        r = fn_j(*args)
        _ = float(jnp.ravel(r)[0])
    dt = (time.time() - t0) / REPS
    per_step = dt / NB * 1e6
    print(f"{name:12s} {dt*1e3:8.1f} ms   ({per_step:5.1f} us/step)",
          flush=True)
    return r


timeit("full", lambda a, z: run(a, z, True, True), A, Zp)
timeit("dma_only", lambda a, z: run(a, z, True, False), A, Zp)
timeit("dot_only", lambda a, z: run(a, z, False, True), A, Zp)
timeit("dma_ring8", lambda a, z: run(a, z, True, False, 3, 8), A, Zp)
timeit("full_ring8", lambda a, z: run(a, z, True, True, 3, 8), A, Zp)
timeit("dot_sym2", lambda a, z: run(a, z, False, True, 2, 4), A, Zp)
timeit("full_sym2_r8", lambda a, z: run(a, z, True, True, 2, 8), A, Zp)
timeit("hbm_read", lambda z: jnp.sum(z, axis=(0, 1)), Zp)
timeit("dma2_s4", lambda a, z: run2(a, z, True, False, 3, 4, 4), A, Zp)
timeit("dma2_s8", lambda a, z: run2(a, z, True, False, 3, 8, 3), A, Zp)
timeit("dot2_defer", lambda a, z: run2(a, z, False, True, 3, 4, 4), A, Zp)
timeit("full2_s4", lambda a, z: run2(a, z, True, True, 3, 4, 4), A, Zp)
timeit("full2_s8", lambda a, z: run2(a, z, True, True, 3, 8, 3), A, Zp)
timeit("full2_sym2_s4", lambda a, z: run2(a, z, True, True, 2, 4, 4), A, Zp)
timeit("full2_sym2_s8", lambda a, z: run2(a, z, True, True, 2, 8, 3), A, Zp)

gidx = jnp.clip(jnp.arange((NB + 2) * B, dtype=jnp.int32) - B, 0, N - 1)
perm = jax.random.permutation(jax.random.key(4), N)


def gather(Zb, perm):
    return Zb[perm[gidx]].reshape(NB + 2, B, G)[0, 0, 0]


timeit("gather", gather, Zb, perm)


if os.environ.get("PROBE_CHECK", "0") == "1":
    import numpy as np
    A3 = np.asarray(A, np.float32)
    Zp3 = np.asarray(Zp[:NB + 2], np.float32)
    # oracle: cross[g] = sum_n sum_b zc[n,b,g] * (A[n] @ window[n])[b,g]
    oracle = np.zeros(G, np.float64)
    for n in range(NB):
        win = Zp3[n:n + 3].reshape(3 * B, G)
        lag = A3[n] @ win
        oracle += (Zp3[n + 1] * lag).sum(axis=0)
    got_full = np.asarray(run(A, Zp, True, True))
    got2 = np.asarray(run2(A, Zp, True, True, 3, 4, 4))
    got2b = np.asarray(run2(A, Zp, True, True, 3, 8, 3))
    for name, got in [("run_full", got_full), ("run2_s4", got2),
                      ("run2_s8", got2b)]:
        err = np.max(np.abs(got - oracle) / (np.abs(oracle) + 1.0))
        print(f"{name}: max rel err {err:.2e}", flush=True)
        assert err < 2e-2, name   # bf16 inputs
    print("CHECK OK", flush=True)
