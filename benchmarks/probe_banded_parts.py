"""Piecewise timing of the banded v2 null kernel's stages on the real device."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialcore_tpu.core.rng import feistel_permutation, key_for

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 512))
B = int(os.environ.get("PROBE_BLOCK", 512))
K = 6
REPS = int(os.environ.get("PROBE_REPS", 10))
NPAD = ((N + B - 1) // B) * B
NB = NPAD // B

Z = jax.random.normal(jax.random.key(0), (N, G), jnp.float32)
Zb = Z.astype(jnp.bfloat16)
li = jax.random.randint(jax.random.key(1), (NPAD, K), 0, 3 * B, jnp.int32)
lw = jnp.full((NPAD, K), 1.0 / K, jnp.float32)
F = 1 << 18
far_src = jax.random.randint(jax.random.key(2), (F,), 0, N, jnp.int32)
far_dst = jax.random.randint(jax.random.key(3), (F,), 0, N, jnp.int32)
far_w = jnp.full((F,), 1.0 / K, jnp.float32)
base = key_for(0, "perm_feistel", 0)


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    r = jax.block_until_ready(fn_j(*args))
    t0 = time.time()
    for _ in range(REPS):
        r = jax.block_until_ready(fn_j(*args))
    dt = (time.time() - t0) / REPS
    print(f"{name:32s} {dt*1e3:8.1f} ms", flush=True)
    return r


perm = timeit("feistel perm", lambda s: feistel_permutation(
    jax.random.fold_in(base, s), N), 3)
perm_s = timeit("sort perm", lambda s: jax.random.permutation(
    jax.random.fold_in(base, s), N), 3)

gidx = jnp.clip(jnp.arange((NB + 2) * B, dtype=jnp.int32) - B, 0, N - 1)


def gather_pad(Ztab, perm):
    return Ztab[perm[gidx]].reshape(NB + 2, B, G)


Zp = timeit("Zp gather bf16", gather_pad, Zb, perm)
timeit("Zp gather f32", gather_pad, Z, perm)


def build_band(li, lw):
    li3 = li.reshape(NB, B, K)
    lw3 = lw.reshape(NB, B, K)
    iota = jnp.arange(3 * B, dtype=jnp.int32)[None, None, :]
    A = jnp.zeros((NB, B, 3 * B), jnp.bfloat16)
    z = jnp.zeros((), jnp.bfloat16)
    for j in range(K):
        A = A + jnp.where(iota == li3[:, :, j:j + 1],
                          lw3[:, :, j:j + 1].astype(jnp.bfloat16), z)
    return A


A = timeit("band build (per call)", build_band, li, lw)


def three_einsums(A, Zp):
    zblk = Zp[1:NB + 1]
    cross = jnp.zeros((G,), jnp.float32)
    for s in range(3):
        lag = jnp.einsum("nbw,nwg->nbg", A[:, :, s * B:(s + 1) * B],
                         Zp[s:s + NB], preferred_element_type=jnp.float32)
        cross = cross + jnp.einsum("nbg,nbg->g", zblk.astype(jnp.float32),
                                   lag)
        cross = jax.lax.optimization_barrier(cross)
    return cross


timeit("3x band einsum + reduce", three_einsums, A, Zp)


def one_einsum(A, Zp):
    """Single fused contraction per shift with direct [G] output."""
    zblk = Zp[1:NB + 1]
    cross = jnp.zeros((G,), jnp.float32)
    for s in range(3):
        # lag then reduce, but expressed as one einsum: nbw,nwg,nbg->g
        cross = cross + jnp.einsum(
            "nbw,nwg,nbg->g", A[:, :, s * B:(s + 1) * B], Zp[s:s + NB],
            zblk.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        cross = jax.lax.optimization_barrier(cross)
    return cross


timeit("3x fused triple einsum", one_einsum, A, Zp)


def far_part(Zp):
    flat = Zp.reshape(-1, G)
    s = flat[far_src].astype(jnp.float32)
    t = flat[far_dst].astype(jnp.float32)
    return jnp.einsum("f,fg,fg->g", far_w, s, t)


timeit("far edges (2x256k rows)", far_part, Zp)


def full_draw(A, Ztab, step):
    key = jax.random.fold_in(base, step)
    perm = feistel_permutation(key, N)
    Zp = Ztab[perm[gidx]].reshape(NB + 2, B, G)
    zblk = Zp[1:NB + 1]
    cross = jnp.zeros((G,), jnp.float32)
    for s in range(3):
        lag = jnp.einsum("nbw,nwg->nbg", A[:, :, s * B:(s + 1) * B],
                         Zp[s:s + NB], preferred_element_type=jnp.float32)
        cross = cross + jnp.einsum("nbg,nbg->g", zblk.astype(jnp.float32),
                                   lag)
        cross = jax.lax.optimization_barrier(cross)
    flat = Zp.reshape(-1, G)
    fs = flat[far_src].astype(jnp.float32)
    ft = flat[far_dst].astype(jnp.float32)
    return cross + jnp.einsum("f,fg,fg->g", far_w, fs, ft)


timeit("FULL draw (assembled)", full_draw, A, Zb, 7)
