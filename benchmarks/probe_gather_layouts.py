"""Probe alternative layouts for the permuted-row load `Zp = Z[perm]`.

The banded null kernel's dominant cost is one random row gather of
[N, G] per draw, measured at ~45M rows/s regardless of row width
(docs/performance.md).  This probe measures, on the live device:

  a. row gather, Z [N, G], take(axis=0)         — the current path
  b. row gather with SORTED indices             — locality vs issue rate
  c. minor-axis gather, Z_T [G, N], take(axis=1) — lane-wise addressing
  d. one_hot block matmul                        — MXU as a permuter
     (block-diagonal approximation only, for a rate ceiling)
  e. dynamic_slice loop via lax.map              — descriptor-rate floor

All variants are timed inside a 10-draw lax.scan so tunnel latency is
amortized; each draw folds a fresh key so nothing is cached.

Usage: python benchmarks/probe_gather_layouts.py [N] [G]
"""

import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=2):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps, out


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    draws = 10
    dt = jnp.bfloat16

    key = jax.random.key(0)
    Z = jax.random.normal(key, (N, G), jnp.float32).astype(dt)
    Zt = Z.T.copy()  # materialize [G, N]
    jax.block_until_ready((Z, Zt))

    # position weights make every reduction permutation-DEPENDENT —
    # without them XLA rewrites sum(Z[perm]) == sum(Z) and deletes the
    # gather entirely (measured: "21 TB/s")
    posw = jnp.cos(jnp.arange(N, dtype=jnp.float32) * 1e-3)

    def scan_draws(body):
        @jax.jit
        def run(Zin, base):
            def step(acc, s):
                k = jax.random.fold_in(base, s)
                perm = jax.random.permutation(k, N)
                return acc + body(Zin, perm), None
            acc0 = jnp.zeros((G,), jnp.float32)
            acc, _ = jax.lax.scan(step, acc0, jnp.arange(draws))
            return acc
        return run

    def report(name, t, rows_per_draw):
        per = t / draws
        print(f"{name:28s} {per*1e3:8.1f} ms/draw "
              f"{rows_per_draw/per/1e6:8.1f} M rows/s "
              f"{rows_per_draw*G*2/per/1e9:7.1f} GB/s")

    # a. row gather (current path)
    body_a = lambda Zin, p: jnp.einsum(
        "n,ng->g", posw, Zin[p].astype(jnp.float32))
    t, _ = timeit(scan_draws(body_a), Z, jax.random.key(1))
    report("a. row gather", t, N)

    # b. sorted-index gather: measures whether index LOCALITY matters
    #    (row count identical; values differ from (a) but work is the same)
    def body_b(Zin, p):
        sp = jnp.sort(p)
        return jnp.einsum("n,ng->g", posw, Zin[sp].astype(jnp.float32))
    t, _ = timeit(scan_draws(body_b), Z, jax.random.key(1))
    report("b. sorted-idx gather (+sort)", t, N)

    # c. minor-axis gather from [G, N]
    body_c = lambda Zin, p: jnp.einsum(
        "gn,n->g", jnp.take(Zin, p, axis=1).astype(jnp.float32), posw)
    t, _ = timeit(scan_draws(body_c), Zt, jax.random.key(1))
    report("c. minor-axis gather [G,N]", t, N)

    # e. descriptor floor: lax.map of 512-row dynamic slices at random
    #    block starts (contiguous 512-row reads, random order)
    nb = N // 512
    wblk = posw[:512]

    def body_e(Zin, p):
        starts = p[:nb] % (N - 512)
        def one(s):
            return jnp.einsum(
                "n,ng->g", wblk,
                jax.lax.dynamic_slice_in_dim(Zin, s, 512, 0)
                .astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, starts), axis=0)
    t, _ = timeit(scan_draws(body_e), Z, jax.random.key(1))
    report("e. 512-row random slices", t, N)


if __name__ == "__main__":
    main()
