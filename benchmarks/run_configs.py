"""Run the BASELINE.md benchmark configs and print one JSON line each.

Configs (BASELINE.json .configs, sizes scaled by --scale):
  1. Visium-like ~4k spots: kNN-6 graph + Moran's I, 100 perms
  2. 100k-cell MERFISH-like: radius graph + bivariate Lee's L + Geary's C
  3. 500k-cell CosMx-like: Ripley's K/L + cross-type K with envelopes
  4. 1M-cell Xenium-like: Moran's I, 5k genes × 1k perms (gene-batched)
  5. full niche/domain pipeline (profiles → niches → domains → distances)
  6. streaming >HBM gene axis: 1M cells × 18,432 genes (ops/streaming.py)
  7. annotation throughput: LR train + device-resident scoring
  8. LISA throughput: 1M-cell local Moran permutation nulls (int8 banded)
  9. reference demo parity: the CosMx vignette workload (366,938 cells,
     k=50, 99 perms, 4 public calls) on a device-resident X

Usage: python benchmarks/run_configs.py [--configs 1,2,3,4,5] [--scale 1.0]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _emit(config, metric, value, unit, **extra):
    print(json.dumps({"config": config, "metric": metric,
                      "value": round(value, 3), "unit": unit, **extra}))
    sys.stdout.flush()


def _retry_compile(fn, what, tries=3, wait=30.0):
    """Run a warm-up/compile closure, retrying transient remote-compile
    faults. The axon backend's compile service intermittently fails with
    RESOURCE_EXHAUSTED or INTERNAL (remote_compile body closed) for NEW
    shapes while cached executables keep working — the same program
    compiles fine seconds later (CLAUDE.md environment quirks)."""
    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — backend error classes vary
            msg = str(e)
            transient = ("RESOURCE_EXHAUSTED" in msg or "INTERNAL" in msg
                         or "UNAVAILABLE" in msg)
            if not transient or attempt == tries - 1:
                raise
            print(f"[{what}] transient backend fault "
                  f"({msg[:80]}...); retry {attempt + 1}/{tries - 1} "
                  f"in {wait:.0f}s", file=sys.stderr)
            time.sleep(wait)


def _synthetic(n, g, seed=0, extent=6000.0, structured=True):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, extent, (n, 2)).astype(np.float32)
    X = rng.standard_normal((n, g), dtype=np.float32)
    if structured:
        X[:, 0] += np.sin(coords[:, 0] / (extent / 20)).astype(np.float32) * 2
    return coords, X


def config1(scale):
    import jax.numpy as jnp

    import spatialcore_tpu as sct

    n = int(4000 * scale)
    coords, X = _synthetic(n, 64, extent=800.0)
    adata = sct.SpatialData(X=X)
    adata.obsm["spatial"] = coords

    def run_once(use_graph):
        t0 = time.time()
        sct.spatial.morans_i(adata, n_neighbors=6, n_permutations=100,
                             seed=0, use_existing_graph=use_graph)
        return time.time() - t0

    cold = run_once(False)    # pays every remote compile
    warm = run_once(True)     # cached executables + stored graph
    _emit(1, "visium_moran_total_s", cold, "s", n_cells=n, n_genes=64,
          n_perms=100, warm_s=round(warm, 2))


def config2(scale):
    import spatialcore_tpu as sct

    n = int(100_000 * scale)
    coords, X = _synthetic(n, 32, extent=4000.0)
    adata = sct.SpatialData(X=np.abs(X))
    adata.obsm["spatial"] = coords
    t0 = time.time()
    sct.spatial.build_spatial_weights(adata, radius=25.0, k_max=64)
    t_graph = time.time() - t0

    def run_once():
        t0 = time.time()
        sct.spatial.gearys_c(adata, genes=list(adata.var_names[:8]),
                             n_permutations=99, use_existing_graph=True)
        sct.spatial.lees_l(adata, gene_pairs=("0", "1"), n_permutations=99,
                           use_existing_graph=True)
        return time.time() - t0

    cold = run_once()    # pays every remote compile
    warm = run_once()    # cached executables
    _emit(2, "merfish_radius_geary_lee_s", cold + t_graph, "s", n_cells=n,
          graph_s=round(t_graph, 2), stats_s=round(cold, 2),
          stats_warm_s=round(warm, 2))


def config3(scale):
    """Ripley's K/L + cross-type K with envelopes at 500k cells. Two
    passes: the cold pass pays every remote compile (the round-2 122.5 s
    was almost entirely compile — the 19-draw envelope scan is seconds of
    device work), the warm pass re-runs the same cached executables —
    the split every other heavy config already reports (VERDICT r4
    item 5)."""
    import spatialcore_tpu as sct

    n = int(500_000 * scale)
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 8000, (n, 2)).astype(np.float32)
    adata = sct.SpatialData(X=rng.standard_normal((n, 4), dtype=np.float32))
    adata.obsm["spatial"] = coords
    adata.obs["cell_type"] = rng.choice(["A", "B", "C"], n)
    radii = [20.0, 40.0, 80.0]

    def run_once():
        stage = {}
        t0 = time.time()
        _retry_compile(lambda: sct.spatial.ripleys_k(
            adata, radii=radii, n_simulations=19, seed=0), "config3 K")
        stage["k"] = time.time() - t0
        t0 = time.time()
        _retry_compile(lambda: sct.spatial.cross_type_ripleys_k(
            adata, "cell_type", radii=radii, n_permutations=19, seed=0),
            "config3 cross")
        stage["cross"] = time.time() - t0
        return stage

    cold = run_once()
    warm = run_once()
    _emit(3, "cosmx_ripley_total_s", sum(cold.values()), "s", n_cells=n,
          k_s=round(cold["k"], 2), cross_s=round(cold["cross"], 2),
          warm_total_s=round(sum(warm.values()), 2),
          k_warm_s=round(warm["k"], 2),
          cross_warm_s=round(warm["cross"], 2))


def config4(scale):
    import jax
    import jax.numpy as jnp

    from spatialcore_tpu.ops.banded import (
        banded_permutation_test, build_null_plan)
    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.moran import moran_observed, standardize

    import os

    n = int(1_000_000 * scale)
    n_genes_total = int(os.environ.get("BENCH4_GENES", int(5000 * scale) or 8))
    n_perms = int(os.environ.get("BENCH4_PERMS", int(1000 * scale) or 8))
    prec = os.environ.get("BENCH4_PREC", "int8")
    gene_batch = min(4096 if prec == "int8" else 2048,
                     max(n_genes_total, 8))
    if n_genes_total >= 1024:
        # tile-quantize to 1024 multiples (bench.py's philosophy): every
        # padded column is a real computed gene, widths stay lane-aligned,
        # and the prep/banded executables reuse already-cached shapes —
        # odd tails like 904 compile fresh every run and are where the
        # flaky remote-compile service bites (CLAUDE.md quirks)
        n_genes_total = -(-n_genes_total // 1024) * 1024
    kc = jax.random.key(0)
    coords_j = jax.random.uniform(kc, (n, 2), jnp.float32, 0.0, 6000.0)
    # device arrays end-to-end: the host path downloads [1M,2] coords +
    # [1M,k] graph arrays over the tunnel (minutes when degraded) and
    # builds the Hilbert order on host (~15-40 s vs ~1.6 s on device)
    graph = build_graph(coords_j, n_neighbors=6)
    jax.block_until_ready(graph.neighbor_w)
    plan = build_null_plan(graph, coords_j, block=min(256, max(n // 16, 16)))
    S0 = float(n)

    import functools

    # gene-chunked prep: the f32 standardize intermediates at 2048 genes
    # would OOM a single v5e (docs/performance.md); the bf16 hot loop fits
    @functools.partial(jax.jit, static_argnames=("g",))
    def _prep_chunk(key, g):
        X = jax.random.normal(key, (n, g), jnp.float32)
        Z, _ = standardize(X)
        den = jnp.sum(Z * Z, axis=0)
        den = jnp.where(den > 0, den, 1.0)
        obs = moran_observed(graph, Z, S0)
        if prec == "int8":
            from spatialcore_tpu.ops.banded import _quantize_z

            Zq, s_z = _quantize_z(Z)
            return Zq, den, obs, s_z
        return (Z.astype(jnp.bfloat16), den, obs,
                jnp.ones((g,), jnp.float32))

    def prep(key, width):
        step = min(1024, width)
        parts = [jax.block_until_ready(
            _prep_chunk(jax.random.fold_in(key, i), min(step, width - s)))
            for i, s in enumerate(range(0, width, step))]
        if len(parts) == 1:
            return parts[0]
        return tuple(jnp.concatenate([p[j] for p in parts],
                                     axis=1 if j == 0 else 0)
                     for j in range(4))

    chunk = int(os.environ.get("BENCH4_CHUNK", 200))
    widths = sorted({min(gene_batch, n_genes_total - s)
                     for s in range(0, n_genes_total, gene_batch)})
    pcs = sorted({min(chunk, n_perms - s) for s in range(0, n_perms, chunk)})
    # warm every (width, chunk) executable OUTSIDE the clock (remote
    # Pallas compiles run ~1 min each; bench.py AOT-compiles instead)
    t0 = time.time()

    def _warm(w):
        Zb, den, obs, szv = prep(jax.random.key(77), w)
        for pc in pcs:
            p, _, _ = banded_permutation_test(
                plan, Zb, S0, obs, seed=9_999, n_permutations=pc, den=den,
                precision=prec, sz=szv if prec == "int8" else None)
            jax.block_until_ready(p)

    for w in widths:
        _retry_compile(lambda: _warm(w), f"config4 warm w={w}")
    print(f"[config4] warm-up ({len(widths)}x{len(pcs)} executables): "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    total = 0.0
    done = 0
    batch_i = 0
    Zb = den = obs = szv = None
    for start in range(0, n_genes_total, gene_batch):
        g = min(gene_batch, n_genes_total - start)
        del Zb, den, obs, szv  # free the previous batch BEFORE re-prepping
        Zb = den = obs = szv = None
        # prep at the batch's TRUE width: a 904-gene tail computed at the
        # full tile would waste band FLOPs (the gather is fixed cost)
        Zb, den, obs, szv = jax.block_until_ready(
            prep(jax.random.fold_in(jax.random.key(1), batch_i), g))
        # chunk the draws: single device executions much longer than ~60 s
        # trip the remote tunnel's RPC deadline ("TPU device error").
        # Extreme counts accumulate ON DEVICE across chunks — one readback
        # per batch instead of one per chunk (the round-2 sustained-vs-
        # burst gap; bench.py's sustained mode goes further with AOT
        # compiles and a single end-of-run block)
        count_dev = jnp.zeros((g,), jnp.float32)
        t0 = time.time()
        for start_p in range(0, n_perms, chunk):
            pc = min(chunk, n_perms - start_p)
            # global-draw-index keying: bitwise chunk-split-independent
            p, _, _ = banded_permutation_test(
                plan, Zb, S0, obs, seed=1,
                n_permutations=pc, den=den, precision=prec,
                sz=szv if prec == "int8" else None, draw_offset=start_p)
            count_dev = count_dev + jnp.round(p * (pc + 1.0) - 1.0)
        count = np.asarray(count_dev)             # the batch's one readback
        total += time.time() - t0
        done += g
        batch_i += 1
    rate = done * n_perms / total
    _emit(4, "xenium_moran_genes_perms_per_s", rate, "genes*perms/s",
          n_cells=n, n_genes=done, n_perms=n_perms, precision=prec,
          total_s=round(total, 1))


def config5(scale):
    import spatialcore_tpu as sct

    n = int(150_000 * scale)
    rng = np.random.default_rng(0)
    blob = rng.normal([2000, 2000], 150, (n // 10, 2))
    rest = rng.uniform(0, 8000, (n - n // 10, 2))
    coords = np.vstack([blob, rest]).astype(np.float32)
    adata = sct.SpatialData(X=np.abs(
        rng.standard_normal((n, 8), dtype=np.float32)))
    adata.obsm["spatial"] = coords
    types = rng.choice(["T", "B", "Mac", "Fib", "Endo"], n).astype(object)
    types[:n // 10] = "B"
    adata.obs["cell_type"] = types

    def run_once():
        t0 = time.time()
        sct.spatial.compute_neighborhood_profile(adata, "cell_type", k=50)
        sct.spatial.identify_niches(adata, n_niches=10, random_state=0)
        t_niche = time.time() - t0
        t0 = time.time()
        sct.spatial.make_spatial_domains(
            adata, "cell_type == 'B'", platform="xenium",
            min_target_cells_domain=20)
        sct.spatial.calculate_domain_distances(
            adata, "spatial_domain", "spatial_domain")
        return t_niche, time.time() - t0

    t_niche, t_dom = run_once()      # pays every remote compile
    w_niche, w_dom = run_once()      # cached executables
    n_domains = adata.uns["spatial_domain_params"]["n_domains"]
    _emit(5, "niche_domain_pipeline_s", t_niche + t_dom, "s", n_cells=n,
          niche_s=round(t_niche, 2), domain_s=round(t_dom, 2),
          warm_total_s=round(w_niche + w_dom, 2),
          niche_warm_s=round(w_niche, 2), domain_warm_s=round(w_dom, 2),
          n_domains=n_domains)


def config6(scale):
    """Streaming >HBM gene axis: 1M cells x 18,432 genes (72 GB f32 — 4.5x
    a v5e's HBM) via ops/streaming.py gene tiles. SURVEY §5 long-context
    row; round-3 VERDICT item 5. Draws default to 100 (BENCH6_PERMS) so
    the full run stays ~2-3 min on one chip; the per-draw cost is
    identical at P=1000."""
    import os

    import jax
    import jax.numpy as jnp

    from spatialcore_tpu.ops.banded import build_null_plan
    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.streaming import streaming_moran_null

    n = int(1_000_000 * scale)
    n_genes = int(os.environ.get("BENCH6_GENES", int(18_432 * scale) or 16))
    n_perms = int(os.environ.get("BENCH6_PERMS", 100))
    kc = jax.random.key(0)
    coords_j = jax.random.uniform(kc, (n, 2), jnp.float32, 0.0, 6000.0)
    graph = build_graph(coords_j, n_neighbors=6)
    jax.block_until_ready(graph.neighbor_w)
    plan = build_null_plan(graph, coords_j, block=min(256, max(n // 16, 16)))

    def gen_tile(start, width, ci):
        # on-device generation (host uploads ride the slow tunnel); a real
        # workload would slice a backed h5ad here
        return jax.random.normal(jax.random.fold_in(kc, 7_000 + start),
                                 (n, width), jnp.float32)

    t0 = time.time()
    # int4 default (round 4): nibble-packed tiles serve G=4096 from 2 KB
    # rows — the issue-bound gather regime where int8 paid the same
    # gather for 2048 genes (the int4 win kernel's VMEM caps tiles at
    # 4096, same as int8; the win is bytes/gene, not width)
    prec = os.environ.get("BENCH6_PREC", "int4")
    tile_cap = 4096 if prec in ("int8", "int4") else 2048
    tile = min(tile_cap, max(n_genes, 16))
    chunk = min(200, n_perms)
    # warm the (tile, chunk) executable outside the clock: one real tile's
    # worth of draws. Remote Pallas compiles run ~1 min; the round-2 bf16
    # number implicitly rode config 4's warm jit cache in the same process,
    # so an explicit warm-up keeps the metric comparable when config 6
    # runs alone.
    t0 = time.time()
    _retry_compile(
        lambda: streaming_moran_null(
            graph, plan, gen_tile, n_genes=tile, S0=float(n), seed=99,
            n_permutations=chunk, tile=tile, chunk=chunk, precision=prec),
        "config6 warm")
    print(f"[config6] warm-up (compile + 1 tile x {chunk} draws): "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    # degraded-phase ladder (same philosophy as bench.py): during the
    # backend's size-dependent RESOURCE_EXHAUSTED phases, ~8-12 GB
    # working sets fault at EXECUTION while smaller ones run fine
    # (CLAUDE.md quirks) — retry once, then halve the tile width and
    # record the fallback in the JSON rather than emitting nothing
    fallback = None
    # deepest rung tile//4 observed necessary 2026-08-21: a phase where
    # even the 2048-wide int4 stream (≈5 GB working set) faulted
    for attempt_tile in (tile, tile, tile // 2, tile // 4):
        try:
            t0 = time.time()
            I, p, m, s = streaming_moran_null(
                graph, plan, gen_tile, n_genes=n_genes, S0=float(n), seed=0,
                n_permutations=n_perms, tile=attempt_tile, chunk=chunk,
                precision=prec)
            dt = time.time() - t0
            break
        except Exception as e:  # noqa: BLE001 — backend error classes vary
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            print(f"[config6] RESOURCE_EXHAUSTED at tile={attempt_tile}; "
                  "degraded-phase ladder engaged", file=sys.stderr)
            fallback = attempt_tile
            time.sleep(60.0)
    else:
        raise RuntimeError("config6: all ladder tiles RESOURCE_EXHAUSTED")
    rate = n_genes * n_perms / dt
    extra = {}
    if fallback is not None and attempt_tile != tile:
        extra["fallback_from_tile"] = tile
    _emit(6, "streaming_18k_genes_perms_per_s", rate, "genes*perms/s",
          n_cells=n, n_genes=n_genes, n_perms=n_perms,
          precision=prec, total_s=round(dt, 1), tile=attempt_tile, **extra)


def config7(scale):
    """Annotation throughput: train the CellTypist-replacement LR model
    and score device-resident expression (annotation/model.py). Train
    data uploads once (host synthetic, the realistic ingest path);
    inference X generates ON DEVICE so the cells/s number measures the
    MXU scoring path, not the tunnel."""
    import os

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from spatialcore_tpu.annotation.training import train_cell_type_model
    from spatialcore_tpu.core.container import SpatialData

    n_train = int(os.environ.get("BENCH7_TRAIN", int(100_000 * scale) or 64))
    n_infer = int(os.environ.get("BENCH7_INFER", int(500_000 * scale) or 64))
    g = int(os.environ.get("BENCH7_GENES", 512))
    c = int(os.environ.get("BENCH7_TYPES", 25))
    epochs = int(os.environ.get("BENCH7_EPOCHS", 20))

    rng = np.random.default_rng(0)
    centroids = rng.normal(0.0, 1.0, (c, g)).astype(np.float32)
    y = rng.integers(0, c, n_train)
    X = (centroids[y] + rng.normal(0, 1.2, (n_train, g))).astype(np.float32)
    X = np.log1p(np.abs(X))          # log1p-normalized-like positive data
    adata = SpatialData(X=X, var=pd.DataFrame(
        index=[f"G{i}" for i in range(g)]))
    adata.obs["cell_type"] = pd.Categorical([f"T{t}" for t in y])

    t0 = time.time()
    model = _retry_compile(
        lambda: train_cell_type_model(adata, epochs=epochs, seed=0),
        "config7 train")
    t_train = time.time() - t0

    # accuracy sanity on held-out synthetic draws from the same mixture
    yh = rng.integers(0, c, 20_000)
    Xh = np.log1p(np.abs(centroids[yh]
                         + rng.normal(0, 1.2, (20_000, g)))).astype(
        np.float32)
    labels, _ = model.predict(Xh)
    acc = (labels == np.array([f"T{t}" for t in yh], object)).mean()

    # inference: device-resident X (no tunnel), public decision path
    kd = jax.random.key(3)
    Xd = jnp.log1p(jnp.abs(jax.random.normal(kd, (n_infer, g))))
    jax.block_until_ready(Xd)
    _retry_compile(lambda: model.decision_scores(Xd[:4096]),
                   "config7 score warm")
    t0 = time.time()
    scores = model.decision_scores(Xd)
    t_score = time.time() - t0
    rate = n_infer / t_score

    # device-resident variant: scores stay on device (what a LOCAL chip
    # sees — decision_scores copies each [batch, C] block back to host,
    # which on the remote tunnel is bandwidth-bound at ~14 MB/s and
    # dominates the measured time)
    from spatialcore_tpu.annotation.model import _score_batch

    W = jnp.asarray(model.W)
    b = jnp.asarray(model.b)
    mu = jnp.asarray(model.scaler_mean)
    sd = jnp.asarray(model.scaler_std)
    bs = 65536
    t0 = time.time()
    parts = [_score_batch(Xd[s:s + bs], W, b, mu, sd)
             for s in range(0, n_infer, bs)]
    for p in parts:
        jax.block_until_ready(p)
    t_dev = time.time() - t0
    rate_dev = n_infer / t_dev

    _emit(7, "annotation_train_s_plus_score_cells_per_s", rate, "cells/s",
          n_train=n_train, n_genes=g, n_types=c, epochs=epochs,
          train_s=round(t_train, 1), holdout_acc=round(float(acc), 4),
          n_infer=n_infer, score_s=round(t_score, 2),
          device_resident_cells_per_s=round(rate_dev, 1),
          device_score_s=round(t_dev, 3))


def config8(scale):
    """LISA (local Moran) permutation throughput at 1M cells — the
    reference's worst-scaling workload (its per-cell p-values are a
    nested Python loop over cells x genes,
    /root/reference/src/spatialcore/spatial/autocorrelation.py:888-896).

    Runs the int8 banded null (ops/banded.py `_banded_local_moran_p_i8`):
    one int8 row gather + exact integer MXU band dots + int16 counters
    per draw. The [N, G] p-matrix stays device-resident (reading 2 GB
    back over the remote tunnel measures the tunnel, not the kernel);
    one scalar readback validates the result. BENCH8_GENES / BENCH8_PERMS
    / BENCH8_VARIANT=int8|pallas|xla8|bf16|direct|stream override (int8 =
    the production fused-Pallas windowed-far path; pallas = dense-far
    fused kernel; xla8 = int8 einsum+scatter; stream = the full
    north-star-scale route: ops/streaming.py streaming_local_null in
    512-gene tiles with a compact device-resident sink — the VERDICT r4
    item-2 measurement, default G=2048). BENCH8_STAT=moran|geary|getis|
    lee picks the statistic (non-moran only for int8/xla8/stream: the
    fused windowed family vs its einsum body)."""
    import functools
    import os

    import jax
    import jax.numpy as jnp

    from spatialcore_tpu.ops.banded import build_null_plan
    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.moran import standardize

    n = int(1_000_000 * scale) or 512
    variant = os.environ.get("BENCH8_VARIANT", "int8")
    g = int(os.environ.get("BENCH8_GENES",
                           2048 if variant == "stream" else 512))
    perms = int(os.environ.get("BENCH8_PERMS", 100))
    stat = os.environ.get("BENCH8_STAT", "moran")

    kc, kx = jax.random.split(jax.random.key(0))
    coords = jax.random.uniform(kc, (n, 2), jnp.float32, 0.0, 6000.0)
    jax.block_until_ready(coords)
    t0 = time.time()
    graph = build_graph(coords, n_neighbors=6)
    jax.block_until_ready(graph.neighbor_w)
    t_graph = time.time() - t0

    if variant == "stream":
        # VERDICT r4 item 2: the local family at north-star scale —
        # G genes streamed through the windowed int8 kernels in 512-wide
        # tiles, outputs compact + device-resident (I bf16, p_adj bf16,
        # quadrant int8 ≈ 5 bytes/cell/gene; the six f32 planes the
        # reference's convention implies would be 48 GB at G=2048).
        # Tile prep (generate + standardize) runs INSIDE the timed
        # region: this is the sustained end-to-end rate.
        from spatialcore_tpu.ops.streaming import (
            device_local_sink, streaming_local_null)

        t0 = time.time()
        plan = build_null_plan(graph, coords, block=256)
        jax.block_until_ready(plan.w_local)
        t_plan = time.time() - t0

        @functools.partial(jax.jit, static_argnums=(1,))
        def _tile(start, width):
            X = jax.random.normal(jax.random.fold_in(kx, start),
                                  (n, width), jnp.float32)
            return standardize(X)[0]

        def get_tile(start, width):
            if stat == "lee":       # pair columns: (x, y) per pair
                return _tile(start, width), _tile(start + 7919, width)
            return _tile(start, width)

        keys = {"moran": ("I", "p_adj", "quadrant"),
                "geary": ("C", "p_adj"),
                "getis": ("G", "p_adj"),
                "lee": ("L", "p_adj")}[stat]
        # BENCH8_KEYS trims the device-resident sink: at G=2048 the
        # 5 B/cell/gene moran sink is 10.2 GB and the tile loop peaks
        # ~4.5 GB next to it — marginal on a 16 GB v5e (measured
        # RESOURCE_EXHAUSTED even outside degraded phases). The
        # decision planes alone (p_adj f16 + quadrant int8 = 3 B) fit
        # with ~5 GB headroom; observed I is recomputable from X.
        if os.environ.get("BENCH8_KEYS"):
            keys = tuple(os.environ["BENCH8_KEYS"].split(","))
        # BENCH8_TILE widens the stream's gene tile (the windowed int8
        # kernels are gather-bound: rows below ~2 KB are issue-bound, so
        # a 1024-wide int8 tile serves 2x the genes per gather).
        # BENCH8_OBS=bf16 (moran only) enables the wide-tile memory
        # recipe — int8 codes + integer counts + bf16 obs, no f32
        # [N, tile] plane ever resident (tile=1024 OOMs without it,
        # measured round 5)
        tile_w = int(os.environ.get("BENCH8_TILE", 512))
        obs_dtype = os.environ.get("BENCH8_OBS", "f32")

        def run_stream():
            sink, finalize = device_local_sink(g, keys=keys)
            # keys= selects the lean fused post-pass: only these planes
            # are computed, emitted compact straight from the jit —
            # without it each tile transiently held ~20 GB of f32
            # planes and G=2048 RESOURCE_EXHAUSTED'd next to the sink
            streaming_local_null(
                graph, plan, get_tile, g, sink, stat=stat, seed=0,
                n_permutations=perms, tile=tile_w, precision="int8",
                keys=keys, obs_dtype=obs_dtype)
            return finalize()

        outs = _retry_compile(
            lambda: jax.block_until_ready(
                tuple(run_stream().values())), "config8 stream warm")
        del outs
        t0 = time.time()
        outs = run_stream()
        jax.block_until_ready(tuple(outs.values()))
        dt = time.time() - t0
        pa = outs["p_adj"]
        pmin = float(pa.min())
        assert 0.0 < pmin <= 1.0
        name = ("lisa" if stat == "moran" else f"local_{stat}")
        _emit(8, f"{name}_stream_genes_perms_per_s_1M_cells",
              g * perms / dt, "genes*perms/s", n_cells=n, n_genes=g,
              n_perms=perms, variant=variant, stat=stat, tile=tile_w,
              obs_dtype=obs_dtype, warm_s=round(dt, 2),
              graph_s=round(t_graph, 1), plan_s=round(t_plan, 1),
              p_min=round(pmin, 5))
        return

    Z = _retry_compile(
        lambda: jax.block_until_ready(jax.jit(
            lambda k: standardize(jax.random.normal(
                k, (n, g), jnp.float32))[0])(kx)), "config8 prep")

    if variant == "direct":
        from spatialcore_tpu.ops.moran import local_moran

        def run():
            return local_moran(graph, Z, 0, perms).p_value
    else:
        from spatialcore_tpu.ops.banded import (
            _banded_local_moran_p, _banded_local_moran_p_i8)

        t0 = time.time()
        plan = build_null_plan(graph, coords, block=256)
        jax.block_until_ready(plan.w_local)
        t_plan = time.time() - t0
        if variant in ("int8", "pallas", "xla8"):
            # "int8" = the production path (fused Pallas step, windowed
            # far via plan.far_starts); "pallas" kept for comparing the
            # dense-far kernel
            impl = "xla" if variant == "xla8" else "pallas"
            win = variant == "int8"
            wkw = dict(band_impl=impl,
                       far_starts=plan.far_starts if win else None,
                       far_bmax=plan.far_bmax if win else 0)
            pargs = (plan.order, plan.rank, plan.local_idx, plan.w_local,
                     plan.far_src, plan.far_dst, plan.far_w)
            ckw = dict(block=plan.block, n=plan.n, n_permutations=perms,
                       perm_method="feistel")
            if stat == "geary":
                from spatialcore_tpu.ops.banded import (
                    _banded_local_geary_p_i8)

                def run():
                    return _banded_local_geary_p_i8(
                        *pargs, Z, jnp.uint32(0), **ckw, **wkw)[1]
            elif stat == "getis":
                from spatialcore_tpu.ops.banded import _banded_getis_p_i8

                def run():
                    return _banded_getis_p_i8(
                        *pargs, Z, jnp.uint32(0), star=True,
                        alternative="two-sided", **ckw, **wkw)
            elif stat == "lee":
                from spatialcore_tpu.ops.banded import _banded_lees_p_i8

                def run():
                    return _banded_lees_p_i8(
                        *pargs, Z, Z, jnp.uint32(0),
                        compute_cell_pvalues=True, **ckw, **wkw)[1]
            else:
                def run():
                    return _banded_local_moran_p_i8(
                        *pargs, Z, jnp.uint32(0), **ckw, **wkw)
        else:
            from spatialcore_tpu.ops.graph import spatial_lag

            obs = jax.jit(lambda z: jnp.abs(z * spatial_lag(graph, z)))(Z)
            abs_obs = obs[plan.order]
            n_padded = plan.local_idx.shape[0]
            if n_padded > plan.n:
                abs_obs = jnp.pad(
                    abs_obs, ((0, n_padded - plan.n), (0, 0)),
                    constant_values=jnp.inf)

            def run():
                return _banded_local_moran_p(
                    plan.order, plan.rank, plan.local_idx, plan.w_local,
                    plan.far_src, plan.far_dst, plan.far_w, Z, abs_obs,
                    jnp.uint32(0), block=plan.block, n=plan.n,
                    n_permutations=perms, precision="bf16",
                    perm_method="feistel")

    p = _retry_compile(lambda: jax.block_until_ready(run()),
                       "config8 warm")
    t0 = time.time()
    p = jax.block_until_ready(run())
    dt = time.time() - t0
    pmin = float(p.min())          # scalar readback validates the result
    assert 0.0 < pmin <= 1.0
    name = ("lisa" if stat == "moran" else f"local_{stat}")
    _emit(8, f"{name}_genes_perms_per_s_1M_cells", g * perms / dt,
          "genes*perms/s", n_cells=n, n_genes=g, n_perms=perms,
          variant=variant, stat=stat, warm_s=round(dt, 2),
          graph_s=round(t_graph, 1), p_min=round(pmin, 5))


def config9(scale):
    """The reference's own documented demo workload at its published scale:
    CosMx colon, 366,938 cells, k=50 neighbors, 99 permutations
    (/root/reference/docs/spatial/spatial_stats.md: Data admonition +
    every code block passes n_neighbors=50, n_permutations=99). Runs the
    exact four public calls the reference's vignette runs — global
    Moran's I over the full 960-gene CosMx-like panel, local Moran's I on
    a 100-gene HVG batch (the docs' ``batch_size=100`` demo), global
    Lee's L on 10 pairs, local Lee's L on one pair with cell p-values —
    through the PUBLIC AnnData-style API. X is generated and kept
    device-resident (jax array in ``adata.X``): zero host->device upload
    rides the tunnel. BENCH9_CELLS / BENCH9_GENES / BENCH9_PERMS override.
    """
    import os

    import jax
    import jax.numpy as jnp

    import spatialcore_tpu as sct

    n = int(os.environ.get("BENCH9_CELLS", int(366_938 * scale) or 1024))
    g = int(os.environ.get("BENCH9_GENES", 960))
    perms = int(os.environ.get("BENCH9_PERMS", 99))
    k = 50

    kc, kx = jax.random.split(jax.random.key(0))
    coords = jax.random.uniform(kc, (n, 2), jnp.float32, 0.0, 8000.0)

    @jax.jit
    def make_x(key, c):
        X = jax.random.normal(key, (n, g), jnp.float32)
        # first 8 genes carry smooth spatial structure (so Moran/LISA
        # have real signal); the rest are iid noise
        field = jnp.sin(c[:, :1] / 400.0) + jnp.cos(c[:, 1:2] / 300.0)
        return X.at[:, :8].add(field * 2.0)

    X = jax.block_until_ready(make_x(kx, coords))
    adata = sct.SpatialData(X=X)
    adata.obsm["spatial"] = np.asarray(coords)

    t0 = time.time()
    sct.spatial.build_spatial_weights(adata, n_neighbors=k)
    t_graph = time.time() - t0

    hvg = list(adata.var_names[:100])
    pairs = [(str(i), str(i + 1)) for i in range(0, 20, 2)]

    def run_stats():
        stage = {}
        t0 = time.time()
        # one gene batch = one executable (the default 512 would split
        # 960 into two differently-shaped compiles)
        _retry_compile(lambda: sct.spatial.morans_i(
            adata, n_neighbors=k, n_permutations=perms, seed=0,
            use_existing_graph=True, gene_batch_size=g,
            null_method="banded_int8"), "config9 global moran")
        stage["moran"] = time.time() - t0
        t0 = time.time()
        _retry_compile(lambda: sct.spatial.local_morans_i(
            adata, genes=hvg, n_neighbors=k, n_permutations=perms, seed=0,
            batch_size=100, use_existing_graph=True,
            null_method="banded_int8"), "config9 lisa")
        stage["lisa"] = time.time() - t0
        t0 = time.time()
        # banded_int8 like the moran/lisa calls above (auto would run the
        # f32 banded null: same draws at ~4x the warm time — the int8
        # decision agreement is pinned by tests/test_banded.py)
        _retry_compile(lambda: sct.spatial.lees_l(
            adata, gene_pairs=pairs, n_neighbors=k, n_permutations=perms,
            seed=0, use_existing_graph=True,
            null_method="banded_int8"), "config9 lees_l")
        stage["lees"] = time.time() - t0
        t0 = time.time()
        _retry_compile(lambda: sct.spatial.lees_l_local(
            adata, gene_pairs=("0", "1"), n_neighbors=k,
            n_permutations=perms, seed=0, compute_cell_pvalues=True,
            use_existing_graph=True,
            null_method="banded_int8"), "config9 lees_l_local")
        stage["lees_local"] = time.time() - t0
        return stage

    cold = run_stats()     # first pass pays every compile
    warm = run_stats()     # second pass = cached executables only
    total = t_graph + sum(cold.values())
    # (extreme+1)/(P+1) bottoms out at exactly 1/(P+1) = 0.01 for 99 draws
    sig = int((adata.uns["morans_i"]["p_value"] <= 0.01).sum())
    _emit(9, "reference_demo_workload_total_s", total, "s", n_cells=n,
          n_genes=g, n_perms=perms, k=k, graph_s=round(t_graph, 1),
          warm_total_s=round(sum(warm.values()), 1),
          **{f"{s}_s": round(v, 1) for s, v in cold.items()},
          **{f"{s}_warm_s": round(v, 1) for s, v in warm.items()},
          n_significant=sig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()
    # eat the first-readback tunnel stall (up to ~5 min when the remote
    # backend is degraded; docs/performance.md) outside any timed config
    import jax.numpy as jnp
    t0 = time.time()
    _ = float(jnp.zeros(1)[0])
    print(f"[configs] first-readback warmup: {time.time()-t0:.1f}s",
          file=sys.stderr)
    fns = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
           6: config6, 7: config7, 8: config8, 9: config9}
    for c in [int(x) for x in args.configs.split(",")]:
        t0 = time.time()
        try:
            fns[c](args.scale)
        except Exception as e:  # keep going; report the failure as data
            _emit(c, "error", time.time() - t0, "s", error=str(e)[:200])


if __name__ == "__main__":
    main()
