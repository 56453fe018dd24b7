"""Headline benchmark: SUSTAINED global-Moran permutation throughput at 1M cells.

BASELINE.md north star: Moran's I, 5,000 genes x 1,000 permutations on 1M
Xenium-like cells in <60 s on a v5e-8  =>  83,333 genes*perms/sec for the
8-chip slice, i.e. ~10,417 genes*perms/sec per chip. This script runs the
FULL north-star workload end-to-end (gene-batched, prep included in the
timed region) on whatever device(s) are available and reports

    {"metric": "moran_sustained_genes_perms_per_sec_1M_cells", "value": ...,
     "unit": "genes*perms/sec", "vs_baseline": value / target}

where target = PER_CHIP_TARGET x n_devices, so vs_baseline >= 1.0 means the
per-chip (or per-slice, under BENCH_MESH) share of the north star is met.
Graph-build / null-plan times are reported on stderr (tracked metric #2).

The null path is the banded kernel (ops/banded.py): Hilbert-relabeled edges
evaluated as block-banded dense MXU matmuls, one random row gather per
draw, Feistel permutations. Default precision is int4 (BENCH_PREC):
standardized values quantize per gene and nibble-pack two gene codes per
byte (split-half layout), so the per-draw row gather — BYTE-bound at
~90 GB/s past ~2 KB rows (docs/performance.md round 4) — serves 2x the
genes of int8 in the same bytes. Band products are EXACT int8xint8->int32
MXU dots on on-chip-unpacked codes; draws compare against the observed
value of the same quantized operator, so the null is exactly calibrated
for that operator. Measured calibration at 250k cells x 2,048 null genes
x P=499 (tools/measure_calibration.py): uniform p-values, zero false FDR
discoveries; decision flips vs f32 at alpha=.05 are 2.0% for int4 — the
same order as f32's own seed-to-seed Monte-Carlo flip rate (1.27%) — and
0.15% for int8. Measured round 4 sustained: 61.6k genes*perms/s int4
(2x4096-tile schedule, 8192 genes x 1000 draws in 133 s) vs ~50k int8,
25.3k bf16 — all real computed work, no dummy columns.
The round-2 sustained-vs-burst gap (15.2k vs 17.8k) came from per-chunk
host readbacks and a tail-width recompile inside the timed region; round
3 removes both:

  * extreme-counts accumulate ON DEVICE across draw chunks — the whole
    workload is enqueued asynchronously and the host blocks exactly once,
    at the end (zero mid-flight readbacks);
  * every (width, chunk) executable is AOT-compiled via .lower().compile()
    before the clock starts, so no compile or warm-up execution pollutes
    the timed region;
  * draw chunks stay <=200 so no single device execution approaches the
    remote tunnel's ~60 s RPC deadline.

Data is generated ON-DEVICE (host->device uploads ride a slow tunnel) and
the first device->host readback of the process (which can stall minutes on
a degraded tunnel) is eaten before any timed region.

Env overrides: BENCH_CELLS, BENCH_GENES (default 8192 int4/int8 / 6144
otherwise), BENCH_PERMS
(default 1000), BENCH_K, BENCH_CHUNK (default 200), BENCH_PREC=int4|int8
|bf16|f32 (default int4), BENCH_TILE (default 4096 int4/int8 / 2048
otherwise),
BENCH_MODE=sustained|burst, BENCH_IMPL=auto|xla|pallas|pallas_halo,
BENCH_MESH=CxG (e.g. 1x8: run gene-sharded over a cells x genes mesh —
requires C*G visible devices).
"""

import functools
import json
import os
import sys
import time


PER_CHIP_TARGET = 83333.0 / 8.0  # genes*perms/sec


def main():
    n_cells = int(os.environ.get("BENCH_CELLS", 1_000_000))
    n_perms = int(os.environ.get("BENCH_PERMS", 1000))
    k = int(os.environ.get("BENCH_K", 6))
    mode = os.environ.get("BENCH_MODE", "sustained")
    prec = os.environ.get("BENCH_PREC", "int4")
    tile = int(os.environ.get(
        "BENCH_TILE", 4096 if prec in ("int8", "int4") else 2048))
    chunk = int(os.environ.get("BENCH_CHUNK", 200))
    impl = os.environ.get("BENCH_IMPL", "auto")
    mesh_spec = os.environ.get("BENCH_MESH", "")
    if mode == "burst":
        n_genes = int(os.environ.get("BENCH_GENES", 2048))
        n_perms = int(os.environ.get("BENCH_PERMS", 100))
    else:
        # tile-quantized gene count >= the 5,000-gene north star: 2x 4096
        # tiles under int8 (a 2048-wide tail measured 34.3k vs 37.2k for
        # pure 4096 tiles — the issue-bound row gather is fixed cost per
        # draw regardless of width), 3x 2048 under bf16. Tile-
        # quantized on purpose: a 1024-wide tail batch runs at 13.2k
        # genes*perms/s vs 17.8k at 2048 (the per-draw row gather is a
        # fixed cost amortized over the gene width), and on a real slice
        # the per-chip gene share is set by the mesh, not by a tail
        # artifact. Measured round 3: prep fully hides behind the async
        # scan queue (308.9 s total vs 308.1 s scans-only at 5120 genes),
        # so tail width was the entire remaining sustained-vs-burst gap.
        n_genes = int(os.environ.get(
            "BENCH_GENES", 8192 if prec in ("int8", "int4") else 6144))
    chunk = min(chunk, n_perms)

    # Backend-init watchdog: when the axon tunnel is down, jax.devices()
    # hangs INDEFINITELY (CLAUDE.md environment lore) — a silent driver
    # hang is worse than a loud failure, so bound the first device probe.
    import threading

    init_timeout = float(os.environ.get("BENCH_INIT_TIMEOUT", 900))
    _init_done = threading.Event()

    def _watchdog():
        if not _init_done.wait(init_timeout):
            print(f"[bench] FATAL: backend init exceeded {init_timeout:.0f}s"
                  " — TPU tunnel down? (jax.devices() hang)", file=sys.stderr)
            sys.stderr.flush()
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    from spatialcore_tpu.core.logging import setup_logging
    from spatialcore_tpu.ops.banded import build_null_plan
    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.moran import moran_observed, standardize

    # package INFO logs default to stdout; the driver parses stdout as ONE
    # JSON line, so route them to stderr with the other [bench] diagnostics
    setup_logging(stream=sys.stderr)

    mesh = None
    n_dev = 1
    if mesh_spec:
        import numpy as np
        from jax.sharding import Mesh

        c, g = (int(v) for v in mesh_spec.lower().split("x"))
        n_dev = c * g
        devs = jax.devices()[:n_dev]
        if len(devs) < n_dev:
            raise SystemExit(f"BENCH_MESH={mesh_spec} needs {n_dev} devices, "
                             f"have {len(jax.devices())}")
        mesh = Mesh(np.array(devs).reshape(c, g), ("cells", "genes"))

    dev = jax.devices()[0]
    _init_done.set()
    print(f"[bench] device={dev.platform}:{dev.device_kind} x{n_dev} "
          f"N={n_cells:,} G={n_genes} P={n_perms} k={k} mode={mode}"
          f"{' mesh=' + mesh_spec if mesh_spec else ''}", file=sys.stderr)
    # persistent-cache forensics (VERDICT r4 item 4): the cache key hashes
    # the backend's platform_version, so a changed tunnel target or server
    # build silently invalidates every entry — print both, and count new
    # entry files at exit so "wrote N entries" distinguishes key misses
    # from an absent cache dir in the driver artifact
    cache_dir = jax.config.jax_compilation_cache_dir
    try:
        plat_ver = dev.client.platform_version
    except Exception:  # noqa: BLE001
        plat_ver = "?"
    n_cache_before = (len(os.listdir(cache_dir))
                      if cache_dir and os.path.isdir(cache_dir) else 0)
    print(f"[bench] compile cache: dir={cache_dir} entries={n_cache_before} "
          f"platform_version={plat_ver!r}", file=sys.stderr)

    kc, kx = jax.random.split(jax.random.key(0))
    coords_j = jax.random.uniform(kc, (n_cells, 2), jnp.float32, 0.0, 6000.0)
    jax.block_until_ready(coords_j)
    # the FIRST device->host readback of a process can stall ~5 min when
    # the remote tunnel is degraded (measured: 316 s for 4 bytes, then
    # instant; docs/performance.md). Eat it here, outside any timed region.
    t0 = time.time()
    _ = float(coords_j[0, 0])
    print(f"[bench] first-readback warmup: {time.time()-t0:.1f}s",
          file=sys.stderr)

    # pass the DEVICE array: the grid build then runs with no bulk
    # host<->device transfers (the tunnel makes an 8MB hop cost seconds,
    # occasionally minutes when the backend has a transient stall)
    t0 = time.time()
    graph = build_graph(coords_j, n_neighbors=k)
    jax.block_until_ready(graph.neighbor_w)
    t_graph = time.time() - t0
    # 5-run spread: re-run the build (warm executables, fresh coordinate
    # draws so the search really runs) to split tunnel/compile variance
    # from the search itself (VERDICT r4 item 6)
    graph_warm = []
    for i in range(4):
        ci = jax.random.uniform(jax.random.fold_in(kc, i + 1),
                                (n_cells, 2), jnp.float32, 0.0, 6000.0)
        t1 = time.time()
        gw = build_graph(ci, n_neighbors=k)
        jax.block_until_ready(gw.neighbor_w)
        graph_warm.append(round((time.time() - t1) * 1e3, 1))
        del gw, ci
    print(f"[bench] graph build: {t_graph*1e3:.0f} ms cold-process, "
          f"warm spread {graph_warm} ms", file=sys.stderr)

    S0 = float(n_cells)

    t0 = time.time()
    block = int(os.environ.get("BENCH_BLOCK", 256))
    plan = build_null_plan(graph, coords_j, block=block)
    t_plan_cold = time.time() - t0
    # split compile-vs-execute (VERDICT r4 item 4): the first build pays
    # any remote compiles the persistent cache missed; the second runs
    # the same cached executables only — the spread IS the compile cost
    t0 = time.time()
    plan2 = build_null_plan(graph, coords_j, block=block)
    t_plan_warm = time.time() - t0
    del plan2
    print(f"[bench] null plan build: {t_plan_cold:.1f}s cold-process, "
          f"{t_plan_warm:.1f}s warm (execute-only; spread = compile cost) "
          f"(block={block})", file=sys.stderr)

    # batch schedule: full tiles + tail rounded up to tile or tile/2 so at
    # most two executable widths exist (a 904-wide tail would recompile the
    # hot kernel inside the timed region — remote TPU compiles take
    # minutes); ONE shared implementation with the streaming driver
    from spatialcore_tpu.ops.streaming import tile_widths

    @functools.partial(jax.jit, static_argnames=("g",))
    def prep_chunk(key, g):
        X = jax.random.normal(key, (n_cells, g), jnp.float32)
        Z, _ = standardize(X)
        den = jnp.sum(Z * Z, axis=0)
        den = jnp.where(den > 0, den, 1.0)
        I_obs = moran_observed(graph, Z, S0)
        if prec == "int8":
            from spatialcore_tpu.ops.banded import _quantize_z
            Zq, s_z = _quantize_z(Z)
            return Zq, den, I_obs, s_z
        if prec == "int4":
            # UNPACKED codes per chunk; prep_width packs across the full
            # tile (split-half pairing spans the tile, not the chunk)
            from spatialcore_tpu.ops.banded import _quantize_z4_codes
            codes, s_z = _quantize_z4_codes(Z)
            return codes, den, I_obs, s_z
        return Z.astype(jnp.bfloat16), den, I_obs, jnp.ones((g,), jnp.float32)

    @jax.jit
    def to_counts(acc, p, pc):
        return acc + jnp.round(p * (pc + 1.0) - 1.0)

    def prep_width(key, w):
        """Prep a w-wide gene batch in <=1024-gene chunks (a single f32
        standardize at 2048 genes OOMs — the documented round-2 lesson).
        int4 packs the concatenated codes over the full tile."""
        gp = min(1024, w)
        parts = [prep_chunk(jax.random.fold_in(key, i),
                            min(gp, w - s))
                 for i, s in enumerate(range(0, w, gp))]
        if prec == "int4":
            # pack HALF-OFFSET chunk pairs (global split-half layout:
            # packed column j pairs gene j with gene j + w/2) without
            # ever concatenating the full-width code matrix
            from spatialcore_tpu.ops.banded import _pack_codes

            assert len(parts) % 2 == 0 and w % (2 * gp) == 0, \
                "int4 tiles must hold an even chunk count"
            h = len(parts) // 2
            pk = jax.jit(_pack_codes)
            packed = [pk(parts[i][0], parts[i + h][0]) for i in range(h)]
            Zb = packed[0] if h == 1 else jnp.concatenate(packed, axis=1)
            return (Zb,
                    jnp.concatenate([p[1] for p in parts]),
                    jnp.concatenate([p[2] for p in parts]),
                    jnp.concatenate([p[3] for p in parts]))
        if len(parts) == 1:
            return parts[0]
        return (jnp.concatenate([p[0] for p in parts], axis=1),
                jnp.concatenate([p[1] for p in parts]),
                jnp.concatenate([p[2] for p in parts]),
                jnp.concatenate([p[3] for p in parts]))

    def compile_with_retry(build, what,
                           waits=(45.0, 90.0, 180.0, 420.0)):
        # the remote compile service intermittently fails NEW shapes
        # with RESOURCE_EXHAUSTED / INTERNAL while cached executables
        # keep working (CLAUDE.md environment quirks) — ride it out
        # rather than record a failed driver run; waits escalate
        # because degradation phases can outlive a fixed short wait
        for attempt in range(len(waits) + 1):
            try:
                return build()
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                transient = ("RESOURCE_EXHAUSTED" in msg
                             or "INTERNAL" in msg
                             or "UNAVAILABLE" in msg)
                if not transient or attempt == len(waits):
                    raise
                print(f"[bench] transient backend fault compiling "
                      f"{what}; retry {attempt + 1}/{len(waits)} in "
                      f"{waits[attempt]:.0f}s", file=sys.stderr)
                time.sleep(waits[attempt])

    shard_batch = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from spatialcore_tpu.ops.banded import (
            NullPlan, banded_permutation_test)

        rep = NamedSharding(mesh, P())
        gs2 = NamedSharding(mesh, P(None, "genes"))
        gs1 = NamedSharding(mesh, P("genes"))
        # place the plan ONCE (replicated); Z/den/obs shard per batch
        plan = NullPlan(*(jax.device_put(f, rep) if isinstance(f, jax.Array)
                          else f for f in plan))

        def shard_batch(batch):
            # reshard ONCE per gene batch — resharding the 4 GB tile per
            # draw chunk would pay the transfer chunk-count times inside
            # the timed region
            Zb, den, obs, szv = batch
            return (jax.device_put(Zb, gs2), jax.device_put(den, gs1),
                    jax.device_put(obs, gs1), jax.device_put(szv, gs1))

        def run_chunk(Zb, den, obs, szv, seed, pc, off=0):
            with mesh:
                return banded_permutation_test(
                    plan, Zb, S0, obs, seed=seed, n_permutations=pc,
                    den=den, band_impl=impl, precision=prec,
                    sz=szv if prec in ("int8", "int4") else None,
                    draw_offset=off)[0]

        warmed = set()

        def build_run_chunk(widths):
            # mesh mode: warm-up executions instead of AOT (sharding-aware
            # lowering; hardware meshes compile once per (width, pc)) —
            # warm EVERY (width, pc) incl. the tail chunk so nothing
            # compiles inside the timed region
            pcs = sorted({chunk, n_perms % chunk or chunk})
            for w in sorted(set(widths)):
                if all((w, pc) in warmed for pc in pcs):
                    continue
                Zb, den, obs, szv = shard_batch(
                    prep_width(jax.random.key(99), w))
                for pc in pcs:
                    jax.block_until_ready(run_chunk(Zb, den, obs, szv,
                                                    10_000, pc))
                    warmed.add((w, pc))
                jax.block_until_ready(
                    to_counts(jnp.zeros((w,), jnp.float32),
                              jnp.zeros((w,), jnp.float32), float(chunk)))
                del Zb, den, obs, szv
            return run_chunk
    else:
        from spatialcore_tpu.ops.banded import _banded_test, _gwin_fits_vmem

        interp = jax.default_backend() != "tpu"
        compiled = {}

        def band_impl_for(w):
            if impl != "auto":
                return impl
            on_tpu = jax.default_backend() == "tpu"
            if prec in ("int8", "int4"):
                return "pallas_halo" if on_tpu else "xla"
            return "pallas_halo" if w >= 1536 and on_tpu else "xla"

        def far_mode_for(w):
            # windowed far (round 4): one compact int8 far gather + two
            # on-chip one-hot dots instead of two [F, w] f32 gathers per
            # draw (measured 80.6 vs 82.9 ms/draw at G=4096 —
            # benchmarks/probe_global_stages.py)
            fm = os.environ.get("BENCH_FAR", "auto")
            if fm != "auto":
                return fm
            if prec == "int4":
                return "win"    # the packed system has no exact-far path
            return ("win" if prec == "int8" and plan.far_starts is not None
                    and plan.far_bmax > 0
                    and _gwin_fits_vmem(w, plan.block, plan.far_bmax)
                    else "exact")

        def build_run_chunk(widths):
            # AOT-compile every (width, chunk-size) executable OUTSIDE the
            # clock: .lower().compile() builds the program without
            # executing it; the compiled cache persists across degraded-
            # backend width fallbacks
            pcs = sorted({chunk, n_perms % chunk or chunk})
            t0 = time.time()
            fresh = 0
            for w in sorted(set(widths)):
                if all((w, pc) in compiled for pc in pcs):
                    continue
                Zb, den, obs, szv = compile_with_retry(
                    lambda w=w: jax.block_until_ready(prep_width(
                        jax.random.key(99), w)), f"prep w={w}")
                for pc in pcs:
                    if (w, pc) in compiled:
                        continue

                    def build(w=w, pc=pc, Zb=Zb, den=den, obs=obs, szv=szv):
                        fm = far_mode_for(w)
                        lowered = _banded_test.lower(
                            plan.order, plan.local_idx, plan.w_local,
                            plan.far_src, plan.far_dst, plan.far_w,
                            plan.rc_sum, Zb, S0, obs, jnp.uint32(0), den,
                            szv, jnp.uint32(0),
                            plan.far_starts if fm == "win" else None,
                            block=plan.block, n=plan.n, n_permutations=pc,
                            stat="moran", alternative="greater",
                            precision=prec, perm_method="feistel",
                            band_impl=band_impl_for(w), far_mode=fm,
                            far_bmax=plan.far_bmax if fm == "win" else 0,
                            interpret=interp)
                        return lowered.compile()

                    compiled[(w, pc)] = compile_with_retry(
                        build, f"scan w={w} pc={pc}")
                    fresh += 1
                # warm to_counts too — its first call must not compile
                # inside the timed region (every compile is a remote
                # round trip)
                compile_with_retry(
                    lambda w=w: jax.block_until_ready(
                        to_counts(jnp.zeros((w,), jnp.float32),
                                  jnp.zeros((w,), jnp.float32),
                                  float(chunk))),
                    f"to_counts w={w}")
                del Zb, den, obs, szv
            print(f"[bench] AOT compile ({fresh} fresh executables): "
                  f"{time.time()-t0:.1f}s", file=sys.stderr)

            def run_chunk(Zb, den, obs, szv, seed, pc, off=0):
                # int4 tables are nibble-packed: table width is w/2
                w = Zb.shape[1] * (2 if prec == "int4" else 1)
                args = [plan.order, plan.local_idx, plan.w_local,
                        plan.far_src, plan.far_dst, plan.far_w, plan.rc_sum,
                        Zb, S0, obs, jnp.uint32(seed), den, szv,
                        jnp.uint32(off)]
                # the lowered signature always carries the far_starts slot
                # (None is an empty pytree but still a positional arg)
                args.append(plan.far_starts
                            if far_mode_for(w) == "win" else None)
                return compiled[(w, pc)](*args)[0]

            return run_chunk

    # ---- timed region: the whole workload enqueues asynchronously -------
    def timed_run(widths, run_chunk):
        counts = []
        t_start = time.time()
        for bi, w in enumerate(widths):
            Zb, den, obs, szv = prep_width(jax.random.fold_in(kx, bi), w)
            if mesh is not None:
                Zb, den, obs, szv = shard_batch((Zb, den, obs, szv))
            acc = jnp.zeros((w,), jnp.float32)
            for ci in range(0, n_perms, chunk):
                pc = min(chunk, n_perms - ci)
                # one seed for the whole run; draws keyed by the GLOBAL
                # draw index ci — every gene batch sees the same
                # permutation for draw d, exactly like one unbatched call
                # (streaming.py semantics); chunk split changes nothing
                # bitwise
                p = run_chunk(Zb, den, obs, szv, 0, pc, ci)
                acc = to_counts(acc, p, float(pc))
            counts.append(acc)
            del Zb, den, obs, szv   # refcount drop: frees right after the
            #                    last enqueued consumer runs, before the
            #                    next batch's prep executes (in-order queue)
        for c in counts:
            jax.block_until_ready(c)
        return time.time() - t_start

    # the remote backend can fault a DISPATCH transiently too (observed:
    # RESOURCE_EXHAUSTED mid-run on a degraded tunnel while the same
    # executables ran clean minutes later) — every executable is already
    # compiled/cached above, so a retry costs only the run itself, and the
    # workload is deterministic (seed 0), so a rerun computes the same
    # thing. Waits escalate to ~25 min on the first (full-width) ladder
    # step: a 2026-08-18 degradation phase outlived two 75 s waits.
    # DEGRADED-BACKEND FALLBACK: a second 2026-08-18 phase faulted ~12 GB
    # working sets at EXECUTION of cached executables for 2+ hours while
    # <=4 GB workloads ran at full speed — so after exhausting the retries
    # at one width, halve the gene count and try again (the rate metric is
    # per-genes*perms, so a narrower honest measurement beats a failed
    # run; the JSON records the fallback).
    # int4's split-half packing needs width % 2048 == 0 (prep_width), so
    # its degraded-backend ladder bottoms out at 2048 genes
    min_genes = 2048 if prec == "int4" else 1024
    ladder = [n_genes]
    while ladder[-1] > min_genes:
        ladder.append(max(min_genes, ladder[-1] // 2))
    elapsed = None
    done_genes = None
    for li, genes_try in enumerate(ladder):
        widths = tile_widths(genes_try, min(tile, genes_try))
        run_chunk = build_run_chunk(widths)
        waits = ([75.0, 180.0, 420.0, 900.0] if li == 0
                 else [75.0, 180.0])
        try:
            for attempt in range(len(waits) + 1):
                try:
                    elapsed = timed_run(widths, run_chunk)
                    break
                except Exception as e:  # noqa: BLE001
                    msg = str(e)
                    transient = ("RESOURCE_EXHAUSTED" in msg
                                 or "INTERNAL" in msg
                                 or "UNAVAILABLE" in msg)
                    if not transient or attempt == len(waits):
                        raise
                    print(f"[bench] transient backend fault in timed "
                          f"region; retry {attempt + 1}/{len(waits)} in "
                          f"{waits[attempt]:.0f}s", file=sys.stderr)
                    time.sleep(waits[attempt])
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            transient = ("RESOURCE_EXHAUSTED" in msg or "INTERNAL" in msg
                         or "UNAVAILABLE" in msg)
            if not transient or li == len(ladder) - 1:
                raise
            print(f"[bench] DEGRADED BACKEND: {genes_try}-gene working set "
                  f"keeps faulting; falling back to {ladder[li + 1]} genes",
                  file=sys.stderr)
            continue
        done_genes = sum(widths)
        break

    n_cache_after = (len(os.listdir(cache_dir))
                     if cache_dir and os.path.isdir(cache_dir) else 0)
    print(f"[bench] compile cache: wrote {n_cache_after - n_cache_before} "
          f"new entries ({n_cache_after} total; >0 fresh writes = that "
          f"many cache MISSES this run)", file=sys.stderr)
    rate = done_genes * n_perms / elapsed
    target = PER_CHIP_TARGET * n_dev
    print(f"[bench] {done_genes}x{n_perms} perms end-to-end in "
          f"{elapsed:.2f}s ({rate:,.0f} genes*perms/s)", file=sys.stderr)
    metric = ("moran_sustained_genes_perms_per_sec_1M_cells"
              if mode == "sustained" else "moran_genes_perms_per_sec_1M_cells")
    out = {
        "metric": metric,
        "value": round(rate, 1),
        "unit": "genes*perms/sec",
        "vs_baseline": round(rate / target, 3),
        "precision": prec,
        "graph_build_ms_cold": round(t_graph * 1e3, 1),
        "graph_build_ms_warm": graph_warm,
        "null_plan_s_cold": round(t_plan_cold, 1),
        "null_plan_s_warm": round(t_plan_warm, 1),
    }
    if done_genes < n_genes:
        out["degraded_fallback_from_genes"] = n_genes
        out["genes_run"] = done_genes
    print(json.dumps(out))


if __name__ == "__main__":
    main()
