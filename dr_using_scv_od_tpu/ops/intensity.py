"""Intensity calibration by local surface orientation.

The reference ships (but disables) a curvature-based intensity calibration:
divide each return's intensity by the cosine between the local surface
normal and the viewing ray, clamped at 0.3, saturating at max_intensity
(intensityCalibrationByCurvature, src/ssc.cpp:98-153 - called commented-out
at :234-235). Here the per-point PCL kd-tree normal estimation becomes a
per-curved-voxel normal from the batched covariance eigensolve, so the
whole calibration is one scatter + gather pass; it stays optional exactly
as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GridConfig
from ..ops import plane as plane_ops


def calibrate_by_orientation(xyz: jnp.ndarray, intensity: jnp.ndarray,
                             point_voxel: jnp.ndarray, valid: jnp.ndarray,
                             grid: GridConfig, max_intensity: float = 255.0,
                             min_cos: float = 0.3,
                             min_pts: int = 4) -> jnp.ndarray:
    """Returns calibrated intensity [N]; points in voxels with < min_pts
    keep their raw (clamped) intensity."""
    g = grid.bin_num
    ok = valid & (point_voxel >= 0)
    seg = jnp.where(ok, point_voxel, g)

    def ssum(v):
        return jax.ops.segment_sum(jnp.where(ok, v, 0.0), seg,
                                   num_segments=g + 1)[:g]

    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    n = ssum(jnp.ones_like(x))
    sn = jnp.maximum(n, 1.0)
    mx, my, mz = ssum(x) / sn, ssum(y) / sn, ssum(z) / sn
    cov = jnp.stack([
        jnp.stack([ssum(x * x) / sn - mx * mx, ssum(x * y) / sn - mx * my,
                   ssum(x * z) / sn - mx * mz], -1),
        jnp.stack([ssum(x * y) / sn - mx * my, ssum(y * y) / sn - my * my,
                   ssum(y * z) / sn - my * mz], -1),
        jnp.stack([ssum(x * z) / sn - mx * mz, ssum(y * z) / sn - my * mz,
                   ssum(z * z) / sn - mz * mz], -1),
    ], axis=-2)
    _, evecs = plane_ops.eigh3x3(cov)
    normal = evecs[..., :, 0]                       # [G, 3]

    pv = jnp.clip(point_voxel, 0, g - 1)
    nx = normal[:, 0][pv]
    ny = normal[:, 1][pv]
    nz = normal[:, 2][pv]
    ray = xyz / jnp.maximum(
        jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-6)
    cos = jnp.abs(nx * ray[:, 0] + ny * ray[:, 1] + nz * ray[:, 2])
    cos = jnp.maximum(cos, min_cos)

    inten = jnp.minimum(intensity, max_intensity)
    has_normal = ok & (n[pv] >= min_pts)
    calibrated = jnp.minimum(inten / cos, max_intensity)
    return jnp.where(has_normal, calibrated, inten)
