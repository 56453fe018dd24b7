"""Bisect the banded draw cost INSIDE a scan (amortizes dispatch latency).

Variants toggle stages off to attribute per-draw time:
  full        gather + 3 band einsums + far edges
  no_far      gather + band einsums
  no_band     gather + far only
  gather_only gather, trivial reduce
  band_only   fixed Zp (no gather), band einsums
  perm_only   feistel permutation + tiny reduce
"""

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
P = int(os.environ.get("PROBE_PERMS", 50))
NPAD = ((N + B - 1) // B) * B
NB = NPAD // B

Zb = (jax.random.normal(jax.random.key(0), (N, G), jnp.float32)
      .astype(jnp.bfloat16))
li = jax.random.randint(jax.random.key(1), (NPAD, K), 0, 3 * B, jnp.int32)
lw = jnp.full((NPAD, K), 1.0 / K, jnp.float32)
F = 1 << 18
far_src = jax.random.randint(jax.random.key(2), (F,), 0, N, jnp.int32)
far_dst = jax.random.randint(jax.random.key(3), (F,), 0, N, jnp.int32)
far_w = jnp.full((F,), 1.0 / K, jnp.float32)
base = key_for(0, "perm_feistel", 0)
gidx = jnp.clip(jnp.arange((NB + 2) * B, dtype=jnp.int32) - B, 0, N - 1)


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


def run_variant(name, use_gather, use_band, use_far, seed0):
    @jax.jit
    def test(Ztab, li, lw, seed):
        A = build_band(li, lw) if use_band else None
        Zp_fixed = Ztab[gidx].reshape(NB + 2, B, G)

        def body(acc, step):
            key = jax.random.fold_in(key_for(seed, "perm_feistel", 0), step)
            perm = feistel_permutation(key, N)
            if use_gather:
                Zp = Ztab[perm[gidx]].reshape(NB + 2, B, G)
            else:
                Zp = Zp_fixed
            cross = jnp.zeros((G,), jnp.float32)
            if use_band:
                zblk = Zp[1:NB + 1]
                for s in range(3):
                    lag = jnp.einsum(
                        "nbw,nwg->nbg", A[:, :, s * B:(s + 1) * B],
                        Zp[s:s + NB], preferred_element_type=jnp.bfloat16)
                    cross = cross + jnp.einsum(
                        "nbg,nbg->g", zblk, lag,
                        preferred_element_type=jnp.float32)
                    cross = jax.lax.optimization_barrier(cross)
            if use_far:
                flat = Zp.reshape(-1, G)
                fs = flat[far_src].astype(jnp.float32)
                ft = flat[far_dst].astype(jnp.float32)
                cross = cross + jnp.einsum("f,fg,fg->g", far_w, fs, ft)
            if not use_band and not use_far:
                cross = cross + Zp[0, 0].astype(jnp.float32) + perm[0]
            return acc + cross, None

        acc, _ = jax.lax.scan(body, jnp.zeros((G,), jnp.float32),
                              jnp.arange(P))
        return acc

    r = jax.block_until_ready(test(Zb, li, lw, jnp.uint32(seed0)))
    t0 = time.time()
    r = jax.block_until_ready(test(Zb, li, lw, jnp.uint32(seed0 + 1)))
    dt = time.time() - t0
    print(f"{name:14s} {dt/P*1e3:7.1f} ms/draw  ({G*P/dt:,.0f} g*p/s)",
          flush=True)


run_variant("perm_only", False, False, False, 10)
run_variant("gather_only", True, False, False, 20)
run_variant("band_only", False, True, False, 30)
run_variant("no_far", True, True, False, 40)
run_variant("no_band", True, False, True, 50)
run_variant("full", True, True, True, 60)


def run_extra(name, body_fn, seed0):
    @jax.jit
    def test(Ztab32, li, lw, seed):
        A = build_band(li, lw)

        def body(acc, step):
            key = jax.random.fold_in(key_for(seed, "perm_feistel", 0), step)
            perm = feistel_permutation(key, N)
            return acc + body_fn(A, Ztab32, perm), None

        acc, _ = jax.lax.scan(body, jnp.zeros((G,), jnp.float32),
                              jnp.arange(P))
        return acc

    Z32 = Zb.astype(jnp.float32)
    r = jax.block_until_ready(test(Z32, li, lw, jnp.uint32(seed0)))
    t0 = time.time()
    r = jax.block_until_ready(test(Z32, li, lw, jnp.uint32(seed0 + 1)))
    dt = time.time() - t0
    print(f"{name:22s} {dt/P*1e3:7.1f} ms/draw  ({G*P/dt:,.0f} g*p/s)",
          flush=True)


def gather_f32_cast(A, Z32, perm):
    Zp = Z32[perm[gidx]].astype(jnp.bfloat16).reshape(NB + 2, B, G)
    return Zp[0, 0].astype(jnp.float32) * 0


def full_f32gather_fused(A, Z32, perm):
    Zp = Z32[perm[gidx]].astype(jnp.bfloat16).reshape(NB + 2, B, G)
    zblk = Zp[1:NB + 1]
    cross = jnp.zeros((G,), jnp.float32)
    for s in range(3):
        cross = cross + jnp.einsum(
            "nbw,nwg,nbg->g", A[:, :, s * B:(s + 1) * B], Zp[s:s + NB],
            zblk, preferred_element_type=jnp.float32)
        cross = jax.lax.optimization_barrier(cross)
    flat = Zp.reshape(-1, G)
    fs = flat[far_src].astype(jnp.float32)
    ft = flat[far_dst].astype(jnp.float32)
    return cross + jnp.einsum("f,fg,fg->g", far_w, fs, ft)


def full_bf16_fused(A, Z32, perm):
    Zp = Zb[perm[gidx]].reshape(NB + 2, B, G)
    zblk = Zp[1:NB + 1]
    cross = jnp.zeros((G,), jnp.float32)
    for s in range(3):
        cross = cross + jnp.einsum(
            "nbw,nwg,nbg->g", A[:, :, s * B:(s + 1) * B], Zp[s:s + NB],
            zblk, preferred_element_type=jnp.float32)
        cross = jax.lax.optimization_barrier(cross)
    flat = Zp.reshape(-1, G)
    fs = flat[far_src].astype(jnp.float32)
    ft = flat[far_dst].astype(jnp.float32)
    return cross + jnp.einsum("f,fg,fg->g", far_w, fs, ft)


def scatter_form(A, Z32, perm):
    # Zp[perm] = Z  (random writes, sequential reads)
    Zp_core = jnp.zeros((N, G), jnp.bfloat16).at[perm].set(Zb)
    return Zp_core[0].astype(jnp.float32) * 0


run_extra("gather_f32_cast", gather_f32_cast, 70)
run_extra("full_f32gather_fused", full_f32gather_fused, 80)
run_extra("full_bf16_fused", full_bf16_fused, 90)
run_extra("scatter_form", scatter_form, 95)
