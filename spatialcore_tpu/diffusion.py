"""Graph diffusion: expression smoothing and diffusion-map embeddings.

The reference advertises a ``spatialcore.diffusion`` module that does not
exist ("Coming soon", /root/reference/src/spatialcore/__init__.py:58-68).
This is a real implementation built on the fixed-degree spatial graph:
every operation is a sequence of ``spatial_lag`` matvecs, so it scales to
millions of cells without ever forming an N×N matrix — the diffusion-map
eigenvectors come from orthogonal (subspace) iteration with tall-skinny QR.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .core.logging import get_logger
from .core.metadata import update_metadata
from .core.rng import key_for
from .ops.graph import spatial_lag

logger = get_logger("diffusion")


def _get_graph(adata, n_neighbors, spatial_key):
    from .spatial.autocorrelation import _load_stored_graph, build_spatial_weights

    g = _load_stored_graph(adata)
    if g is not None:
        return g
    return build_spatial_weights(adata, n_neighbors=n_neighbors,
                                 spatial_key=spatial_key)


def smooth_expression(
    adata,
    n_steps: int = 3,
    alpha: float = 0.5,
    genes=None,
    layer: Optional[str] = None,
    n_neighbors: int = 6,
    spatial_key: str = "spatial",
    key_added: str = "diffused",
    copy: bool = False,
):
    """Graph-diffusion smoothing: X ← (1−α)·X + α·W·X, ``n_steps`` times.

    Writes the smoothed matrix to ``layers[key_added]`` (or
    ``obsm[key_added]`` when a gene subset is given). The standard denoising
    pass for sparse spatial panels before autocorrelation scoring.
    """
    start = time.time()
    if copy:
        adata = adata.copy()
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    graph = _get_graph(adata, n_neighbors, spatial_key)

    X = adata.layers[layer] if layer else adata.X
    if genes is not None:
        idx = adata.var_names.get_indexer(list(genes))
        if (idx < 0).any():
            raise ValueError("Some genes not found in var_names")
        X = X[:, idx]
    if sp.issparse(X):
        X = np.asarray(X.todense())
    Xj = jnp.asarray(np.asarray(X, np.float32))

    @jax.jit
    def run(Xj):
        def body(_, Y):
            return (1.0 - alpha) * Y + alpha * spatial_lag(graph, Y)

        return jax.lax.fori_loop(0, n_steps, body, Xj)

    out = np.asarray(run(Xj))
    if genes is not None:
        adata.obsm[key_added] = out
        adata.uns[f"{key_added}_genes"] = list(genes)
        where = {"obsm": key_added}
    else:
        adata.layers[key_added] = out
        where = {"layers": key_added}
    logger.info(f"smooth_expression: {n_steps} steps, alpha={alpha} "
                f"({time.time() - start:.1f}s)")
    update_metadata(adata, "smooth_expression",
                    parameters={"n_steps": n_steps, "alpha": alpha,
                                "n_neighbors": n_neighbors}, outputs=where)
    return adata


def diffusion_map(
    adata,
    n_components: int = 10,
    n_iter: int = 60,
    n_neighbors: int = 15,
    spatial_key: str = "spatial",
    seed: int = 0,
    key_added: str = "X_diffmap",
    copy: bool = False,
):
    """Diffusion-map embedding of the spatial graph (matvec-only).

    Top eigenvectors of the row-stochastic transition operator W via
    orthogonal iteration: Q ← QR(W·Q) repeated — every step is k gathers
    and a [N, m] QR, so no N×N matrix ever exists. The trivial constant
    eigenvector is dropped; ``obsm[key_added]`` gets eigenvectors scaled by
    their eigenvalues, ``uns`` the eigenvalue spectrum.
    """
    start = time.time()
    if copy:
        adata = adata.copy()
    graph = _get_graph(adata, n_neighbors, spatial_key)
    n = adata.n_obs
    m = n_components

    @jax.jit
    def run(key):
        def deflate(Y):
            # remove the trivial stationary mode (global constant) so the
            # dominant subspace consists of informative components only
            return Y - jnp.mean(Y, axis=0, keepdims=True)

        Q = deflate(jax.random.normal(key, (n, m), jnp.float32))
        Q, _ = jnp.linalg.qr(Q)

        def body(_, Q):
            Y = deflate(spatial_lag(graph, Q))
            Q, _ = jnp.linalg.qr(Y)
            return Q

        Q = jax.lax.fori_loop(0, n_iter, body, Q)
        Y = deflate(spatial_lag(graph, Q))
        return Q, Q.T @ Y                    # subspace basis + projected op

    Q, B = run(key_for(seed, "diffmap"))
    Q = np.asarray(Q)
    # Rayleigh-Ritz on the (small, possibly nonsymmetric) projected operator
    # resolves near-degenerate eigenspaces — e.g. one λ≈1 mode per connected
    # component — that plain orthogonal iteration leaves mixed.
    w, V = np.linalg.eig(np.asarray(B))
    order = np.argsort(-np.abs(w.real))
    evals = w.real[order]
    vecs = Q @ V.real[:, order]
    vecs /= np.maximum(np.linalg.norm(vecs, axis=0, keepdims=True), 1e-12)
    emb = vecs * evals[None, :]
    adata.obsm[key_added] = emb.astype(np.float32)
    adata.uns[f"{key_added}_evals"] = evals.tolist()
    logger.info(f"diffusion_map: {n_components} components, "
                f"λ₁={evals[0]:.4f} ({time.time() - start:.1f}s)")
    update_metadata(adata, "diffusion_map",
                    parameters={"n_components": n_components,
                                "n_iter": n_iter,
                                "n_neighbors": n_neighbors, "seed": seed},
                    outputs={"obsm": key_added})
    return adata


__all__ = ["smooth_expression", "diffusion_map"]
