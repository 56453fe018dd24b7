"""Profile the Ripley envelope loop stage by stage.

History: the round-2 rewrite moved binning on-device and pre-gathers the
bucket tables once per pass ([nb, C, 2] coordinate rows instead of
per-candidate ``coords[cand]`` gathers). The old host-binning path cost
~7 s/pass at 500k cells (row-rate-bound gathers + host round-trips);
this probe measures the stages of the new path:

  1. on-device uniform draw (CSR simulation input)
  2. ``_bin_points``   — sort-based bucket-table build on device
  3. ``_pair_counts``  — windowed pair counting (n_types=1 and 3)
  4. a full ``_counts_pass`` per draw (what ripley_k's envelope loop runs)
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from spatialcore_tpu.ops.ripley import (_bin_points, _counts_pass,
                                            _pair_counts, make_grid_spec)

    n = 500_000
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 8000, (n, 2)).astype(np.float32)
    radii = np.array([20.0, 40.0, 80.0], np.float32)
    r_max = 80.0
    mins, maxs = coords.min(axis=0), coords.max(axis=0)

    def stamp(label, t0):
        t = time.time()
        print(f"  {label:<38s} {t - t0:7.3f} s")
        return t

    spec = make_grid_spec(coords, r_max, bbox=(mins, maxs),
                          capacity_slack=2.0)
    print(f"grid: {spec.nbx}x{spec.nby} buckets, C={spec.capacity}, "
          f"window={spec.window}")
    mins_j = jnp.asarray(spec.mins)
    span_j = jnp.asarray(spec.span)
    radii_sq = jnp.asarray(radii ** 2)
    codes0 = jnp.zeros(n, jnp.int32)
    span_full = jnp.asarray((maxs - mins).astype(np.float32))
    mins_full = jnp.asarray(mins)

    for it in range(3):
        print(f"CSR pass {it}:")
        t0 = time.time()
        key = jax.random.key(it)
        sim = mins_full + jax.random.uniform(key, (n, 2)) * span_full
        jax.block_until_ready(sim)
        t0 = stamp("device uniform draw", t0)
        table, bx, by, mc = _bin_points(sim, mins_j, span_j,
                                        spec.nbx, spec.nby, spec.capacity)
        jax.block_until_ready(table)
        t0 = stamp("_bin_points (device sort+scatter)", t0)
        c, _ = _pair_counts(sim, table, bx, by, radii_sq, codes0,
                            nbx=spec.nbx, nby=spec.nby, window=spec.window,
                            n_radii=len(radii), n_types=1)
        jax.block_until_ready(c)
        t0 = stamp("_pair_counts kernel (n_types=1)", t0)
        c, _, _ = _counts_pass(sim, spec, radii_sq, codes0, 1,
                               mins_j, span_j)
        jax.block_until_ready(c)
        t0 = stamp("full _counts_pass (fused)", t0)

    # cross-type pass: fixed coords + table, permuted labels only
    codes = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    coords_j = jnp.asarray(coords)
    table, bx, by, _ = _bin_points(coords_j, mins_j, span_j,
                                   spec.nbx, spec.nby, spec.capacity)
    jax.block_until_ready(table)
    for it in range(3):
        print(f"cross pass {it}:")
        t0 = time.time()
        key = jax.random.key(100 + it)
        cj = codes[jax.random.permutation(key, n)]
        jax.block_until_ready(cj)
        t0 = stamp("device label permutation", t0)
        _, ct = _pair_counts(coords_j, table, bx, by, radii_sq, cj,
                             nbx=spec.nbx, nby=spec.nby, window=spec.window,
                             n_radii=3, n_types=3)
        jax.block_until_ready(ct)
        t0 = stamp("_pair_counts kernel (n_types=3)", t0)


if __name__ == "__main__":
    main()
