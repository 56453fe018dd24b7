"""MXU throughput vs M for [M, K] @ [K, N] bf16 dots inside a Pallas kernel.

The halo band kernel's dots ([256, 256] @ [256, 2048] + f32 accumulate)
measure ~75 TFLOPS effective (~38% of a v5e's 197 bf16 peak). Is M=256
the limiter? If [512/1024, 256] dots run proportionally faster, a
multi-row band kernel (R block-rows per grid step, (R+2)-slab window)
beats the +(R+2)/3 redundant-FLOP tax. All operands live in VMEM
scratch; the grid just re-issues the same dot T times.

Env: PROBE_M (csv), PROBE_K (csv), PROBE_N, PROBE_STEPS.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("PROBE_N", 2048))
T = int(os.environ.get("PROBE_STEPS", 2000))
MS = [int(v) for v in os.environ.get("PROBE_M", "128,256,512,1024").split(",")]
KS = [int(v) for v in os.environ.get("PROBE_K", "256,768").split(",")]


def make_kernel(M, K):
    def kernel(a_ref, z_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lag = jnp.dot(a_ref[:], z_ref[:], preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] + jnp.sum(lag, axis=0, keepdims=True)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("M", "K"))
def run(A, Z, M, K):
    return pl.pallas_call(
        make_kernel(M, K),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(A, Z)


_ = float(jnp.zeros(()))  # eat the first-readback stall

for K in KS:
    for M in MS:
        A = (jax.random.normal(jax.random.key(1), (M, K), jnp.float32)
             .astype(jnp.bfloat16))
        Z = (jax.random.normal(jax.random.key(2), (K, N), jnp.float32)
             .astype(jnp.bfloat16))
        r = run(A, Z, M, K)
        _ = float(r[0, 0])
        t0 = time.time()
        r = run(A, Z, M, K)
        _ = float(r[0, 0])
        dt = time.time() - t0
        fl = 2.0 * M * K * N * T
        print(f"M={M:5d} K={K:4d} N={N}  {dt/T*1e6:6.2f} us/step  "
              f"{fl/dt/1e12:6.1f} TFLOPS", flush=True)
