"""Patchwork ground segmentation, TPU-native.

Re-design of the reference's header-only PatchWork
(include/patchwork.h:38-504): the serial per-patch loop (~420 patches x 3
plane-fit iterations, each an Eigen JacobiSVD) becomes one batched program:

  1. per-point Concentric-Zone-Model binning (pc2czm, patchwork.h:431-459)
     -> a flat patch id per point;
  2. a single sort by (patch, z) builds padded [P, K] per-patch tensors
     (the z-sort doubles as the reference's global z-sort, patchwork.h:295);
  3. seed selection (extract_initial_seeds_, patchwork.h:235-268) and the
     3-iteration plane fit (extract_piecewiseground, patchwork.h:463-504)
     run batched over all patches with masked closed-form 3x3 eigen solves;
  4. patch accept/reject rules (uprightness / elevation / flatness,
     patchwork.h:339-384) produce a per-patch verdict, scattered back to a
     per-point ground mask.

Semantics preserved from the reference, including its filtering quirks:
  * points with r outside (min_range, max_range] never reach either output
    (dropped, patchwork.h:436);
  * points with z < -1.8 * sensor_height are erased up front
    (patchwork.h:302-310);
  * patches with <= num_min_pts points are skipped entirely - their points
    reach neither ground nor nonground (patchwork.h:331);
  * the elevation/flatness recovery only applies to the first
    `num_rings_of_interest` concentric rings with thresholds indexed
    `ring_idx + 2 * zone` (patchwork.h:351-353).

Deliberate divergence: plane normals are canonicalized to n_z >= 0 (the
reference inherits Eigen's arbitrary SVD column sign; see ops/plane.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PatchworkConfig
from ..ops import plane as plane_ops


class PatchworkResult(NamedTuple):
    ground: jnp.ndarray      # [N] bool - accepted ground points
    nonground: jnp.ndarray   # [N] bool - rejected / non-ground points
    dropped: jnp.ndarray     # [N] bool - never reached either output
    patch_overflow: jnp.ndarray  # scalar int32 - points beyond K cap
    # diagnostics (per patch)
    patch_normal: jnp.ndarray    # [P,3]
    patch_mean_z: jnp.ndarray    # [P]


def _patch_tables(cfg: PatchworkConfig):
    """Static per-patch lookup tables: concentric ring index and
    elevation/flatness threshold slot (or -1 when not applicable)."""
    conc, thr_slot = [], []
    concentric = 0
    for zone, (ns, nr) in enumerate(zip(cfg.num_sectors_each_zone,
                                        cfg.num_rings_each_zone)):
        for ring in range(nr):
            slot = ring + 2 * zone
            use = concentric < cfg.num_rings_of_interest
            for _ in range(ns):
                conc.append(concentric)
                thr_slot.append(slot if use and slot < len(cfg.elevation_thr)
                                else -1)
            concentric += 1
    return (jnp.asarray(conc, jnp.int32), jnp.asarray(thr_slot, jnp.int32))


def _patch_id(xyz: jnp.ndarray, valid: jnp.ndarray, cfg: PatchworkConfig):
    """Flat patch id per point; P (=cfg.num_patches) for out-of-range or
    invalid points. Mirrors pc2czm (patchwork.h:431-459)."""
    x, y = xyz[..., 0], xyz[..., 1]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x)
    theta = jnp.where(y < 0, theta + 2.0 * jnp.pi, theta)

    P = cfg.num_patches
    pid = jnp.full(r.shape, P, jnp.int32)
    base = 0
    mrs = cfg.min_ranges + (cfg.max_range,)
    for zone in range(cfg.num_zones):
        ns, nr = cfg.num_sectors_each_zone[zone], cfg.num_rings_each_zone[zone]
        ring_size, sector_size = cfg.ring_sizes[zone], cfg.sector_sizes[zone]
        in_zone = (r > mrs[zone]) & (r <= mrs[zone + 1]) if zone < 3 else \
            (r > mrs[zone]) & (r <= cfg.max_range)
        ring = jnp.minimum((r - mrs[zone]) / ring_size, nr - 1).astype(jnp.int32)
        sect = jnp.minimum(theta / sector_size, ns - 1).astype(jnp.int32)
        ring = jnp.clip(ring, 0, nr - 1)
        sect = jnp.clip(sect, 0, ns - 1)
        pid = jnp.where(in_zone, base + ring * ns + sect, pid)
        base += ns * nr
    # reference erases points below -1.8 * sensor_height before binning
    too_low = xyz[..., 2] < -1.8 * cfg.sensor_height
    pid = jnp.where(valid & ~too_low, pid, P)
    return pid


def estimate_ground(xyz: jnp.ndarray, valid: jnp.ndarray,
                    cfg: PatchworkConfig) -> PatchworkResult:
    """Batched Patchwork. xyz [N,3] f32, valid [N] bool."""
    N = xyz.shape[0]
    P, K = cfg.num_patches, cfg.max_pts_per_patch

    pid = _patch_id(xyz, valid, cfg)
    binned = pid < P

    # ---- sort by (patch, z) with ONE fused-key sort (two chained argsorts
    # double the TPU sort cost): key = pid * 2^14 + z quantized to ~5 mm.
    # Ties within a 5 mm z-slice order arbitrarily, which only permutes
    # equal-height seeds (no effect on the plane fits).
    z = xyz[..., 2]
    qz = jnp.clip(((z + 40.0) * (16383.0 / 80.0)), 0, 16383).astype(
        jnp.int32)
    key = jnp.where(binned, pid * 16384 + qz, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)

    counts = jax.ops.segment_sum(binned.astype(jnp.int32), pid,
                                 num_segments=P + 1)[:P]
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])

    # padded gather [P, K] of global point indices
    k_ar = jnp.arange(K, dtype=jnp.int32)
    gather_idx = offsets[:, None] + k_ar[None, :]
    in_patch = k_ar[None, :] < counts[:, None]
    gather_idx = jnp.clip(gather_idx, 0, N - 1)
    pt_idx = order[gather_idx]                      # [P, K]
    # gather coordinates separately: a vector gather xyz[pt_idx] pads the
    # size-3 slice dim to 128 lanes on TPU (~0.5 GB of temp waste)
    pts = jnp.stack([xyz[:, 0][pt_idx], xyz[:, 1][pt_idx],
                     xyz[:, 2][pt_idx]], axis=-1)   # [P, K, 3]
    patch_overflow = jnp.sum(jnp.maximum(counts - K, 0))

    # ---- seeds (extract_initial_seeds_, patchwork.h:235-268)
    zz = pts[..., 2]
    zone0 = _zone0_mask(cfg)                        # [P]
    margin = cfg.adaptive_seed_selection_margin * cfg.sensor_height
    skip = in_patch & zone0[:, None] & (zz < margin)
    # reference skips a z-sorted *prefix*; emulate: a point is skipped only if
    # every point before it (lower z) in the patch is below the margin too.
    not_skip = ~skip & in_patch
    first_ok = jnp.cumsum(not_skip.astype(jnp.int32), axis=1)
    seed_candidate = in_patch & (first_ok > 0)      # after first non-skipped
    cand_rank = jnp.cumsum(seed_candidate.astype(jnp.int32), axis=1)
    lpr_sel = seed_candidate & (cand_rank <= cfg.num_lpr)
    lpr_cnt = jnp.maximum(jnp.sum(lpr_sel, axis=1), 1)
    lpr_height = jnp.sum(jnp.where(lpr_sel, zz, 0.0), axis=1) / lpr_cnt
    seeds = in_patch & (zz < (lpr_height[:, None] + cfg.th_seeds))

    # ---- iterative plane fit (extract_piecewiseground, patchwork.h:463-504)
    ground_mask = seeds
    normal = jnp.zeros((P, 3), xyz.dtype)
    mean = jnp.zeros((P, 3), xyz.dtype)
    evals = jnp.zeros((P, 3), xyz.dtype)
    for _ in range(cfg.num_iter):
        normal, mean, evals, _ = plane_ops.fit_plane(pts, ground_mask)
        # th_dist_d = th_dist - d, d = -n . mean  (patchwork.h:229-231)
        dist = jnp.einsum('pkc,pc->pk', pts, normal)
        th = cfg.th_dist + jnp.einsum('pc,pc->p', normal, mean)
        ground_mask = in_patch & (dist < th[:, None])

    # ---- patch verdicts (patchwork.h:339-384)
    conc_idx, thr_slot = _patch_tables(cfg)
    uprightness = jnp.abs(normal[:, 2])
    elevation = mean[:, 2]
    surface_var = evals[:, 0] / jnp.maximum(
        evals[:, 0] + evals[:, 1] + evals[:, 2], 1e-12)

    elev_thr = jnp.asarray(cfg.elevation_thr, xyz.dtype)
    flat_thr = jnp.asarray(cfg.flatness_thr, xyz.dtype)
    slot = jnp.clip(thr_slot, 0, len(cfg.elevation_thr) - 1)
    has_slot = thr_slot >= 0
    too_high = has_slot & (elevation > elev_thr[slot])
    flat_enough = has_slot & (surface_var < flat_thr[slot])

    upright = uprightness >= cfg.uprightness_thr
    # accept ground points of a patch iff upright and (not in rings of
    # interest | elevation ok | flatness recovery)
    accept = upright & (~too_high | flat_enough)
    processed = counts > cfg.num_min_pts             # patchwork.h:331

    patch_ground = accept[:, None] & ground_mask & processed[:, None]
    patch_nonground = in_patch & ~patch_ground & processed[:, None]

    # ---- scatter patch verdicts back to point space
    ground = jnp.zeros((N,), bool)
    nonground = jnp.zeros((N,), bool)
    flat_pt = pt_idx.reshape(-1)
    ground = ground.at[flat_pt].max(patch_ground.reshape(-1))
    nonground = nonground.at[flat_pt].max(patch_nonground.reshape(-1))
    # overflow points (beyond K) were never scattered: route them to
    # nonground rather than dropping them silently.
    seen = jnp.zeros((N,), bool).at[flat_pt].max(in_patch.reshape(-1))
    overflow_pts = binned & ~seen & valid
    nonground = nonground | overflow_pts
    ground = ground & valid
    nonground = nonground & valid & ~ground
    dropped = valid & ~ground & ~nonground
    return PatchworkResult(ground=ground, nonground=nonground,
                           dropped=dropped,
                           patch_overflow=patch_overflow.astype(jnp.int32),
                           patch_normal=normal, patch_mean_z=elevation)


def _zone0_mask(cfg: PatchworkConfig) -> jnp.ndarray:
    n0 = cfg.num_sectors_each_zone[0] * cfg.num_rings_each_zone[0]
    m = jnp.zeros((cfg.num_patches,), bool)
    return m.at[:n0].set(True)
