"""Piecewise timing of the banded null kernel's stages on the real device."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialcore_tpu.core.rng import key_for

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 512))
B = int(os.environ.get("PROBE_BLOCK", 512))
H = int(os.environ.get("PROBE_HALO", 128))
K = 6
REPS = int(os.environ.get("PROBE_REPS", 10))
W = B + 2 * H
NPAD = ((N + B - 1) // B) * B
NB = NPAD // B

kc = jax.random.key(0)
Z = jax.random.normal(kc, (N, G), jnp.float32)
order = jnp.arange(N, dtype=jnp.int32)
li = jax.random.randint(jax.random.key(1), (NPAD, K), 0, W, jnp.int32)
lw = jnp.full((NPAD, K), 1.0 / K, jnp.float32)
F = 1 << 19
far_src = jax.random.randint(jax.random.key(2), (F,), 0, N, jnp.int32)
far_dst = jax.random.randint(jax.random.key(3), (F,), 0, N, jnp.int32)
far_w = jnp.full((F,), 1.0 / K, jnp.float32)


def timeit(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(REPS):
        r = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / REPS
    print(f"{name:28s} {dt*1e3:8.1f} ms", flush=True)
    return r


base = key_for(0, "perm_global", 0)


@jax.jit
def gen_perm(step):
    return jax.random.permutation(jax.random.fold_in(base, step), N)[order]


perm = timeit("perm gen", gen_perm, 3)

gidx = jnp.clip(jnp.arange(NPAD + 2 * H, dtype=jnp.int32) - H, 0, N - 1)


@jax.jit
def gather_pad(perm):
    return Z[perm[gidx]]


Zp_pad = timeit("Zp_pad gather", gather_pad, perm)

iota = jnp.arange(W, dtype=jnp.int32)[None, :]


@jax.jit
def blocks_only(Zp_pad):
    def blk(b):
        win = jax.lax.dynamic_slice(Zp_pad, (b * B, 0), (W, G))
        l = jax.lax.dynamic_slice(li, (b * B, 0), (B, K))
        w = jax.lax.dynamic_slice(lw, (b * B, 0), (B, K))
        A = jnp.zeros((B, W), jnp.bfloat16)
        z = jnp.zeros((), jnp.bfloat16)
        for j in range(K):
            A = A + jnp.where(iota == l[:, j:j + 1],
                              w[:, j:j + 1].astype(jnp.bfloat16), z)
        lag = jnp.dot(A, win.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return jnp.sum(win[H:H + B] * lag, axis=0)

    return jax.lax.map(blk, jnp.arange(NB, dtype=jnp.int32)).sum(0)


timeit("block loop (lax.map)", blocks_only, Zp_pad)


@jax.jit
def blocks_nobuild(Zp_pad):
    """Same loop but with a constant A — isolates the A-construction cost."""
    A = jnp.full((B, W), 0.1, jnp.bfloat16)

    def blk(b):
        win = jax.lax.dynamic_slice(Zp_pad, (b * B, 0), (W, G))
        lag = jnp.dot(A, win.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return jnp.sum(win[H:H + B] * lag, axis=0)

    return jax.lax.map(blk, jnp.arange(NB, dtype=jnp.int32)).sum(0)


timeit("block loop constant-A", blocks_nobuild, Zp_pad)


@jax.jit
def far_part(Zp_pad):
    s = Zp_pad[far_src]
    t = Zp_pad[far_dst]
    return jnp.einsum("f,fg,fg->g", far_w, s, t)


timeit("far edges (2x512k rows)", far_part, Zp_pad)


@jax.jit
def batched_mm(Zp_pad):
    """Alternative: materialize all windows + one batched matmul."""
    starts = jnp.arange(NB, dtype=jnp.int32) * B
    win_idx = starts[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    wins = Zp_pad[win_idx.reshape(-1)].reshape(NB, W, G)
    A = jnp.zeros((NB, B, W), jnp.bfloat16)
    li3 = li.reshape(NB, B, K)
    lw3 = lw.reshape(NB, B, K)
    z = jnp.zeros((), jnp.bfloat16)
    for j in range(K):
        A = A + jnp.where(iota[None] == li3[:, :, j:j + 1],
                          lw3[:, :, j:j + 1].astype(jnp.bfloat16), z)
    lag = jnp.einsum("nbw,nwg->nbg", A, wins.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    zblk = wins[:, H:H + B].astype(jnp.float32)
    return (zblk * lag).sum((0, 1))


if os.environ.get("PROBE_BATCHED", "1") == "1":
    timeit("batched windows+einsum", batched_mm, Zp_pad)
