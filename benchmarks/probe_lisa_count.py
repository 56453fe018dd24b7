"""Counter-dtype probe for the LISA permutation scan at 1M cells.

The local-Moran draw loop's [N, G] count update (read + write per draw)
is the documented bottleneck at scale. This times the banded LISA body
with int32 vs int16 vs bf16 counters (bf16 is exact for counts <= 256,
i.e. any <=200-draw chunk).

Env: PROBE_CELLS, PROBE_GENES, PROBE_PERMS.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialcore_tpu.core.rng import feistel_permutation, key_for
from spatialcore_tpu.ops.banded import _banded_lag, _build_band, \
    build_null_plan
from spatialcore_tpu.ops.graph import build_graph

N = int(os.environ.get("PROBE_CELLS", 1_000_000))
G = int(os.environ.get("PROBE_GENES", 256))
P = int(os.environ.get("PROBE_PERMS", 20))

kc = jax.random.key(0)
coords = jax.random.uniform(kc, (N, 2), jnp.float32, 0.0, 6000.0)
_ = float(coords[0, 0])                      # eat first-readback stall
graph = build_graph(coords, n_neighbors=6)
plan = build_null_plan(graph, coords, block=256)
B = plan.block
n_padded = plan.local_idx.shape[0]
nb = n_padded // B

Z = jax.random.normal(jax.random.key(1), (N, G), jnp.float32)
abs_obs = jnp.abs(Z * 0.01) + 0.05           # stand-in threshold [N, G]
abs_obs_new = jnp.pad(abs_obs[plan.order], ((0, n_padded - N), (0, 0)),
                      constant_values=jnp.inf)


def run(count_dtype):
    A = _build_band(plan.local_idx, plan.w_local, B, jnp.bfloat16)
    Ztab = Z.astype(jnp.bfloat16)
    gidx0 = jnp.clip(jnp.arange((nb + 2) * B, dtype=jnp.int32) - B, 0, N - 1)
    base = key_for(0, "perm_feistel_local", 0)

    @jax.jit
    def scan():
        def body(count, step):
            key = jax.random.fold_in(base, step)
            perm = feistel_permutation(key, N)[plan.order]
            Zp = Ztab[perm[gidx0]].reshape(nb + 2, B, G)
            lag_p = _banded_lag(A, Zp, plan.far_src, plan.far_dst,
                                plan.far_w, block=B)
            Ip = Zp.reshape(-1, G)[B:B + n_padded].astype(jnp.float32) * lag_p
            return count + (jnp.abs(Ip) >= abs_obs_new).astype(count_dtype), None

        c0 = jnp.zeros((n_padded, G), count_dtype)
        count, _ = jax.lax.scan(body, c0, jnp.arange(P))
        return count.astype(jnp.int32)

    c = jax.block_until_ready(scan())          # compile + warm
    t0 = time.time()
    c = jax.block_until_ready(scan())
    dt = time.time() - t0
    print(f"{count_dtype.__name__:>9}: {dt*1e3/P:7.1f} ms/draw "
          f"({N*G*P/dt/1e9:.1f} G cell-gene-draws/s)", flush=True)
    return np.asarray(c[:8, 0])


r32 = run(jnp.int32)
r16 = run(jnp.int16)
rbf = run(jnp.bfloat16)
assert np.array_equal(r32, r16), (r32, r16)
assert np.array_equal(r32, rbf), (r32, rbf)
print("counts identical across dtypes")
