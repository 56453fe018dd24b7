"""Raster domain geometry vs a CERTIFIED continuous-morphology oracle.

Round-3 VERDICT item 4 (SURVEY §7 hard part 4). The exact continuous set is

    E = erode(dilate(targets, r1), r2)
      = { p : max_{|q-p| <= r2} d(q) <= r1 },   d(q) = min_t |q - t|

(the reference's Buffer-Union-Shrink, r_functions.R:34-124). No GEOS is
needed for a rigorous oracle: d is 1-Lipschitz, so sampling the r2-disk on
a grid of spacing delta bounds the true max within delta/sqrt(2) — every
query cell is then CERTIFIED inside, CERTIFIED outside, or lies within a
provable (delta/sqrt(2))-band of the decision boundary (excluded). The
raster pipeline must agree with the oracle on every certified cell whose
margin exceeds the pixel quantization, and its disagreement rate must
vanish as the pixel size h halves — the convergence curve documented in
docs/domains.md ("Fidelity: exact-oracle convergence").
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from spatialcore_tpu.spatial import make_spatial_domains

from conftest import make_adata

R1, R2 = 120.0, 90.0            # cell_dist, cell_dist - shrink_margin
DELTA = 3.0                     # oracle sample spacing
SLACK = DELTA / np.sqrt(2.0)    # Lipschitz certification slack


def _world(seed=0, n_query=2000):
    rng = np.random.default_rng(seed)
    t1 = rng.normal([800, 800], 60, (30, 2))
    t2 = rng.normal([2300, 1500], 50, (20, 2))
    targets = np.vstack([t1, t2]).astype(np.float64)
    queries = rng.uniform(200, 3000, (n_query, 2)).astype(np.float64)
    return targets, np.vstack([targets, queries])


def _oracle_margins(points, targets):
    """r1 - max_{r2-disk} d with certified error <= SLACK.

    margin > SLACK  => certainly inside E;  margin < -SLACK => certainly
    outside (the sampled max is a lower bound, so negative sampled margin
    is already a proof of outside; the symmetric band keeps it simple).
    """
    ax = np.arange(-R2, R2 + DELTA / 2, DELTA)
    gx, gy = np.meshgrid(ax, ax)
    keep = gx ** 2 + gy ** 2 <= R2 ** 2
    offs = np.stack([gx[keep], gy[keep]], axis=1)          # [S, 2]
    tree = cKDTree(targets)
    margins = np.empty(len(points))
    for s in range(0, len(points), 256):
        probe = points[s:s + 256, None, :] + offs[None, :, :]
        d, _ = tree.query(probe.reshape(-1, 2))
        margins[s:s + 256] = R1 - d.reshape(-1, len(offs)).max(axis=1)
    return margins


def _raster_inside(coords, n_targets, pixels_per_dist):
    adata = make_adata(n_obs=len(coords), n_vars=3, with_spatial=False)
    adata.obsm["spatial"] = coords.astype(np.float32)
    adata.obs["is_target"] = ([True] * n_targets
                              + [False] * (len(coords) - n_targets))
    adata = make_spatial_domains(
        adata, "is_target", platform="xenium", cell_dist_um=R1,
        shrink_margin_um=R1 - R2, min_target_cells_domain=3,
        pixels_per_dist=pixels_per_dist, grid_max_dim=8192,
        store_boundaries=False)
    return adata.obs["spatial_domain"].notna().to_numpy()


@pytest.mark.parametrize("seed", [0])
def test_raster_converges_to_certified_oracle(seed):
    targets, coords = _world(seed)
    margins = _oracle_margins(coords, targets)
    want = margins > 0

    rates = {}
    for ppd in (4, 8, 16):
        got = _raster_inside(coords, len(targets), ppd)
        h = R1 / ppd
        # compare only cells certified beyond both the oracle slack and
        # the raster's own quantization band (~2 pixels)
        certified = np.abs(margins) > max(SLACK, 2.0 * h)
        rates[ppd] = float((got[certified] != want[certified]).mean())

    # certified-cell disagreement must be zero once the certification band
    # covers pixel quantization, at EVERY resolution
    assert rates[4] == 0.0, rates
    assert rates[8] == 0.0, rates
    assert rates[16] == 0.0, rates

    # near-boundary behaviour: every mismatch at the finest resolution
    # lies within a 2-pixel band of the true decision boundary
    got = _raster_inside(coords, len(targets), 16)
    h = R1 / 16
    mism = got != want
    ok_band = np.abs(margins)[mism] <= max(2.0 * h, SLACK) + 1e-9
    assert ok_band.all(), (
        f"{(~ok_band).sum()} mismatches beyond the 2h boundary band; "
        f"worst margin {np.abs(margins)[mism].max():.1f} vs h={h:.1f}")

    # convergence: the unrestricted disagreement rate shrinks as h halves
    full = {ppd: float((_raster_inside(coords, len(targets), ppd)
                        != want).mean()) for ppd in (4, 16)}
    assert full[16] <= full[4] + 1e-9, full
    assert full[16] < 0.01, full
