"""f64 CPU validation mode: 1e-6+ agreement with dense-matrix oracles.

SURVEY.md §7 hard part 1: the ecosystem-agreement bar (squidpy/esda
conventions at 1e-6) needs float64, which requires ``jax_enable_x64``
before JAX initializes — so this runs in a fresh subprocess.
"""

import os
import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent("""
    import os
    os.environ["JAX_ENABLE_X64"] = "1"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax
    # jax may be pre-imported by site hooks; the config path works either way
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platform_name", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from spatialcore_tpu.ops.graph import build_graph, spatial_lag
    from spatialcore_tpu.ops.moran import (
        geary_observed, moran_observed, standardize)

    rng = np.random.default_rng(0)
    n, g = 600, 8
    coords = rng.uniform(0, 100, (n, 2))
    # spatially-structured doubles
    X = (np.sin(coords[:, :1] / 12.0) + 0.3 * rng.standard_normal((n, g)))
    X = X.astype(np.float64)

    graph = build_graph(coords.astype(np.float32), n_neighbors=8)
    W = graph.to_csr().toarray().astype(np.float64)
    S0 = W.sum()

    Z, _ = standardize(jnp.asarray(X))
    assert Z.dtype == jnp.float64, Z.dtype
    I = np.asarray(moran_observed(graph, Z, S0))
    C = np.asarray(geary_observed(graph, Z, S0))

    # dense float64 oracle, esda/squidpy conventions
    Zo = (X - X.mean(0)) / X.std(0)
    I_ref = np.array([n / S0 * (Zo[:, i] @ W @ Zo[:, i]) / (Zo[:, i] @ Zo[:, i])
                      for i in range(g)])
    num = np.array([sum(W[a, b] * (Zo[a, i] - Zo[b, i]) ** 2
                        for a in range(n) for b in np.nonzero(W[a])[0])
                    for i in range(g)])
    C_ref = (n - 1) * num / (2 * S0 * (Zo ** 2).sum(0))

    np.testing.assert_allclose(I, I_ref, rtol=1e-9)
    np.testing.assert_allclose(C, C_ref, rtol=1e-9)

    lag = np.asarray(spatial_lag(graph, Z))
    np.testing.assert_allclose(lag, W @ Zo, rtol=1e-9)
    print("F64_VALIDATION_OK")
""")


def test_float64_agreement_subprocess():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # plain single-device CPU
    res = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "F64_VALIDATION_OK" in res.stdout


PERM_SCRIPT = textwrap.dedent("""
    import os
    os.environ["JAX_ENABLE_X64"] = "1"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platform_name", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.moran import (
        correlogram_kernel, moran_observed, permutation_test_global,
        standardize)

    rng = np.random.default_rng(1)
    n, g = 400, 6
    coords = rng.uniform(0, 100, (n, 2))
    X = (np.sin(coords[:, :1] / 12.0)
         + 0.3 * rng.standard_normal((n, g))).astype(np.float64)

    graph = build_graph(coords.astype(np.float32), n_neighbors=6)
    S0 = float(n)
    Z, _ = standardize(jnp.asarray(X))
    assert Z.dtype == jnp.float64
    obs = moran_observed(graph, Z, S0)

    # permutation kernel must run (not TypeError) with f64 carries
    p, m, s = permutation_test_global(graph, Z, S0, obs, seed=0,
                                      n_permutations=20)
    assert np.isfinite(np.asarray(p)).all()
    assert p.dtype == jnp.float64

    # correlogram kernel under x64 with f64 Z (crashed pre-fix)
    idx = np.asarray(graph.neighbor_idx)
    dist = rng.uniform(0, 30, idx.shape)
    edges = np.array([0.0, 10.0, 20.0, 30.0])
    valid = jnp.ones(idx.shape, bool)
    out = correlogram_kernel(jnp.asarray(idx), jnp.asarray(dist), valid,
                             Z, jnp.asarray(edges), seed=0,
                             n_permutations=10)
    print("F64_PERM_OK")
""")


def test_float64_permutation_kernels_subprocess():
    """x64 + float64 X through the permutation/correlogram kernels: the
    scan/fori carries were hard-coded f32 and crashed with TypeError."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    res = subprocess.run([sys.executable, "-c", PERM_SCRIPT], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "F64_PERM_OK" in res.stdout
