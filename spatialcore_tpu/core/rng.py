"""Seeded, device-independent randomness utilities.

The reference derives permutations from ``np.random.default_rng(seed)``
(/root/reference/src/spatialcore/spatial/autocorrelation.py:839), which is
reproducible only serially. Here every random stream is a counter-based JAX
threefry key derived from ``(seed, *stream_ids)`` so results are bitwise
identical regardless of device count, sharding, or evaluation order
(SURVEY.md §7 design decision 2).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


def key_for(seed: int, *stream: Union[int, str]) -> jax.Array:
    """Derive a PRNG key from a base seed and a hierarchical stream path.

    String components are hashed stably (FNV-1a, not Python's randomized
    ``hash``) so e.g. ``key_for(0, "moran", gene_idx, perm_idx)`` is stable
    across processes.
    """
    key = jax.random.key(seed)
    for part in stream:
        if isinstance(part, str):
            part = _fnv1a(part)
        if isinstance(part, (int, np.integer)):
            part = np.uint32(int(part) & 0xFFFFFFFF)
        else:  # traced value inside jit/vmap
            part = jnp.asarray(part).astype(jnp.uint32)
        key = jax.random.fold_in(key, part)
    return key


def _fnv1a(s: str) -> int:
    h = 0x811C9DC5
    for ch in s.encode():
        h = ((h ^ ch) * 0x01000193) & 0xFFFFFFFF
    return h


def np_rng(seed: int, *stream: Union[int, str]) -> np.random.Generator:
    """Host-side numpy Generator seeded from the same hierarchical path.

    For cheap host decisions (subsampling, plot sampling) that must be
    reproducible but never touch the device.
    """
    parts = [seed] + [_fnv1a(p) if isinstance(p, str) else int(p)
                      for p in stream]
    return np.random.default_rng(parts)


def permutation_keys(seed: int, n_permutations: int, stream: str = "perm") -> jax.Array:
    """A stacked array of ``n_permutations`` independent keys."""
    base = key_for(seed, stream)
    return jax.random.split(base, n_permutations)


def batch_permutations(
    seed: int,
    n: int,
    n_permutations: int,
    stream: str = "perm",
) -> jax.Array:
    """Generate ``[n_permutations, n]`` int32 permutation index rows.

    Each row p is an independent uniform permutation of ``arange(n)`` keyed by
    ``(seed, stream, p)`` — placement-independent and bitwise reproducible.
    """
    keys = permutation_keys(seed, n_permutations, stream)
    perm_one = lambda k: jax.random.permutation(k, n).astype(jnp.int32)
    return jax.vmap(perm_one)(keys)
