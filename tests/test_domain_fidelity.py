"""Raster Buffer-Union-Shrink fidelity vs the exact analytic definition.

SURVEY.md §7 hard part 4: domain fidelity without GEOS, with grid
resolution as the knob. The exact set is computable without any geometry
library: dilate(targets, r1) = { x : min_t |x−t| ≤ r1 }, and
erode(D, r2) membership of p ⇔ every point of the r2-disk around p lies
in D (checked on a dense disk sampling). Cell assignment agreement
between the raster pipeline and this oracle must be ≥97% at the default
resolution, with disagreements confined to a thin boundary band.
"""

import numpy as np

from spatialcore_tpu.spatial import make_spatial_domains

from conftest import make_adata


def _exact_membership(points, targets, r1, r2, n_ring=24, n_rad=6):
    """p ∈ erode(dilate(targets, r1), r2), dense-disk approximation."""
    # sample offsets covering the closed r2-disk
    offs = [np.zeros(2)]
    for frac in np.linspace(1.0 / n_rad, 1.0, n_rad):
        for a in np.linspace(0, 2 * np.pi, n_ring, endpoint=False):
            offs.append(r2 * frac * np.array([np.cos(a), np.sin(a)]))
    offs = np.asarray(offs)                       # [S, 2]
    probe = points[:, None, :] + offs[None, :, :]  # [P, S, 2]
    d = np.sqrt(((probe[:, :, None, :] - targets[None, None, :, :]) ** 2
                 ).sum(-1)).min(axis=2)            # [P, S] min dist to targets
    return (d <= r1).all(axis=1)


def test_raster_domains_match_exact_morphology():
    rng = np.random.default_rng(0)
    t1 = rng.normal([800, 800], 40, (25, 2))
    t2 = rng.normal([2200, 1500], 40, (20, 2))
    targets = np.vstack([t1, t2]).astype(np.float32)
    queries = rng.uniform(200, 2800, (2500, 2)).astype(np.float32)
    coords = np.vstack([targets, queries]).astype(np.float32)
    n = len(coords)

    cell_dist, shrink_margin = 120.0, 30.0
    r1, r2 = cell_dist, cell_dist - shrink_margin

    adata = make_adata(n_obs=n, n_vars=3, with_spatial=False)
    adata.obsm["spatial"] = coords
    adata.obs["is_target"] = [True] * len(targets) + [False] * len(queries)
    adata = make_spatial_domains(
        adata, "is_target", platform="xenium", cell_dist_um=cell_dist,
        shrink_margin_um=shrink_margin, min_target_cells_domain=5,
        pixels_per_dist=12)
    got = adata.obs["spatial_domain"].notna().to_numpy()

    want = _exact_membership(coords.astype(np.float64),
                             targets.astype(np.float64), r1, r2)
    agree = (got == want).mean()
    assert agree >= 0.97, agree

    # disagreements must hug the region boundary: every mismatched cell is
    # within one pixel-ish band of the exact boundary (its disk test is
    # marginal), proxied by distance-to-nearest-target near r1 ± band
    mism = np.nonzero(got != want)[0]
    if mism.size:
        d = np.sqrt(((coords[mism][:, None, :] - targets[None, :, :]) ** 2
                     ).sum(-1)).min(axis=1)
        pixel = adata.uns["spatial_domain_params"]["pixel_size"]
        band = 3 * pixel
        # inside the eroded region the critical contour is at distance
        # where the disk test flips; all mismatches near some contour
        near_any = ((np.abs(d - r1) < band + r2)
                    & (d < r1 + band))
        assert near_any.mean() > 0.95

    # the two blobs must be separate domains
    names = adata.obs["spatial_domain"].dropna().unique()
    assert len(names) == 2
