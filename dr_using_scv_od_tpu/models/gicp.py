"""Voxelized GICP registration (scan-to-scan and scan-to-map).

NEW capability: the reference never estimates motion - it consumes
ground-truth KITTI poses (src/ssc.cpp:913-995) and its `gicp.cpp` tool
contains no ICP at all (SURVEY.md section 2.2). This module supplies the
odometry the north star requires, designed TPU-first in the spirit of VGICP
(Koide et al.) rather than as a PCL port:

  * the target scan/map becomes per-voxel Gaussians on a bounded Cartesian
    grid - means/covariances via scalar segment-sums (one pass, no kd-tree);
  * covariances are regularised to plane-like ellipsoids via the batched
    closed-form 3x3 eigendecomposition (ops/plane.py), eigenvalues scaled
    to (eps, 1, 1) as in GICP's plane-to-plane model;
  * correspondence is O(1): a source point looks up the voxel it lands in
    (plus nothing else - VGICP's single-voxel variant);
  * each Gauss-Newton iteration is two MXU matmuls: H = J^T W J summed over
    points via einsum, solved as a 6x6 system, update via exp_se3.

All loops are `lax.while_loop`s with static caps; every tensor is fixed
shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GicpConfig
from ..ops import geometry, plane as plane_ops


class VoxelMap(NamedTuple):
    """Running Gaussian statistics per Cartesian voxel (sums, so maps merge
    by addition - the basis for incremental scan-to-map odometry and the
    distributed keyframe-block map)."""
    n: jnp.ndarray      # [G]
    sum_x: jnp.ndarray  # [G,3]
    sum_xx: jnp.ndarray  # [G,6]  (xx,yy,zz,xy,xz,yz)
    n_oob: jnp.ndarray  # scalar int32 - valid points outside the grid
    #                     bounds (cfg.xy_extent / z_min / z_max); counted,
    #                     never silently dropped

    def merge(self, other: "VoxelMap") -> "VoxelMap":
        return VoxelMap(self.n + other.n, self.sum_x + other.sum_x,
                        self.sum_xx + other.sum_xx,
                        self.n_oob + other.n_oob)


class GicpTarget(NamedTuple):
    """Finalized per-voxel Gaussians with precomputed GICP weights."""
    mean: jnp.ndarray    # [G,3]
    weight: jnp.ndarray  # [G,6] packed symmetric W = (C_reg + eps I)^-1
    valid: jnp.ndarray   # [G] bool


class GicpResult(NamedTuple):
    T: jnp.ndarray          # [4,4] target_T_source
    n_iters: jnp.ndarray    # int32
    final_error: jnp.ndarray  # mean Mahalanobis cost (weighted)
    n_corr: jnp.ndarray     # int32 correspondences at convergence
    rmse: jnp.ndarray       # Euclidean RMS residual of inliers (metres)
    n_oob: jnp.ndarray      # int32 valid source points outside the grid
    #                         bounds at the final iterate


def _grid_dims(cfg: GicpConfig):
    nxy = int(2 * cfg.xy_extent / cfg.voxel_size)
    nz = int((cfg.z_max - cfg.z_min) / cfg.voxel_size)
    return nxy, nz


def voxel_index(xyz: jnp.ndarray, valid: jnp.ndarray, cfg: GicpConfig):
    """Flat Cartesian voxel id; -1 for out-of-bound/invalid."""
    nxy, nz = _grid_dims(cfg)
    ix = jnp.floor((xyz[:, 0] + cfg.xy_extent)
                   / cfg.voxel_size).astype(jnp.int32)
    iy = jnp.floor((xyz[:, 1] + cfg.xy_extent)
                   / cfg.voxel_size).astype(jnp.int32)
    iz = jnp.floor((xyz[:, 2] - cfg.z_min)
                   / cfg.voxel_size).astype(jnp.int32)
    ok = (valid & (ix >= 0) & (ix < nxy) & (iy >= 0) & (iy < nxy)
          & (iz >= 0) & (iz < nz))
    flat = (ix * nxy + iy) * nz + iz
    return jnp.where(ok, flat, -1), ok


def build_voxel_map(xyz: jnp.ndarray, valid: jnp.ndarray,
                    cfg: GicpConfig) -> VoxelMap:
    """Accumulate Gaussian sums per voxel (scalar segment-sums only - a
    vector scatter would trigger TPU gather/scatter lane padding)."""
    nxy, nz = _grid_dims(cfg)
    g = nxy * nxy * nz
    flat, ok = voxel_index(xyz, valid, cfg)
    seg = jnp.where(ok, flat, g)

    def ssum(v):
        return jax.ops.segment_sum(jnp.where(ok, v, 0.0), seg,
                                   num_segments=g + 1)[:g]

    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    n = ssum(jnp.ones_like(x))
    sum_x = jnp.stack([ssum(x), ssum(y), ssum(z)], axis=-1)
    sum_xx = jnp.stack([ssum(x * x), ssum(y * y), ssum(z * z),
                        ssum(x * y), ssum(x * z), ssum(y * z)], axis=-1)
    n_oob = jnp.sum(valid & ~ok).astype(jnp.int32)
    return VoxelMap(n=n, sum_x=sum_x, sum_xx=sum_xx, n_oob=n_oob)


def finalize_target(vm: VoxelMap, cfg: GicpConfig) -> GicpTarget:
    """Means + regularized inverse covariances per occupied voxel."""
    n = jnp.maximum(vm.n, 1.0)
    mean = vm.sum_x / n[:, None]
    xx = vm.sum_xx / n[:, None]
    cxx = xx[:, 0] - mean[:, 0] ** 2
    cyy = xx[:, 1] - mean[:, 1] ** 2
    czz = xx[:, 2] - mean[:, 2] ** 2
    cxy = xx[:, 3] - mean[:, 0] * mean[:, 1]
    cxz = xx[:, 4] - mean[:, 0] * mean[:, 2]
    cyz = xx[:, 5] - mean[:, 1] * mean[:, 2]
    cov = jnp.stack([
        jnp.stack([cxx, cxy, cxz], -1),
        jnp.stack([cxy, cyy, cyz], -1),
        jnp.stack([cxz, cyz, czz], -1),
    ], axis=-2)
    evals, evecs = plane_ops.eigh3x3(cov)
    # GICP plane-to-plane regularisation: eigenvalues -> (eps, 1, 1)
    scale = jnp.maximum(evals[:, 2:3], 1e-9)
    reg = jnp.stack([jnp.full_like(scale[:, 0], cfg.plane_eps),
                     jnp.ones_like(scale[:, 0]),
                     jnp.ones_like(scale[:, 0])], axis=-1) * scale
    C = jnp.einsum('gik,gk,gjk->gij', evecs, reg, evecs)
    # W = (C + eps I)^-1, closed-form symmetric 3x3 inverse
    C = C + 1e-3 * jnp.eye(3)
    W = _inv3x3_sym(C)
    w_packed = jnp.stack([W[:, 0, 0], W[:, 1, 1], W[:, 2, 2],
                          W[:, 0, 1], W[:, 0, 2], W[:, 1, 2]], axis=-1)
    # degenerate covariances (collinear voxel points) can NaN the
    # closed-form eigendecomposition; drop those voxels' weight to zero
    # rather than poisoning the normal equations
    w_packed = jnp.where(jnp.all(jnp.isfinite(w_packed), axis=-1,
                                 keepdims=True), w_packed, 0.0)
    valid = vm.n >= cfg.min_pts_per_voxel
    return GicpTarget(mean=mean, weight=w_packed, valid=valid)


def _inv3x3_sym(C: jnp.ndarray) -> jnp.ndarray:
    a, b, c = C[..., 0, 0], C[..., 0, 1], C[..., 0, 2]
    d, e, f = C[..., 1, 1], C[..., 1, 2], C[..., 2, 2]
    A = d * f - e * e
    B = c * e - b * f
    Cc = b * e - c * d
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    det = a * A + b * B + c * Cc
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack([
        jnp.stack([A, B, Cc], -1),
        jnp.stack([B, D, E], -1),
        jnp.stack([Cc, E, F], -1),
    ], axis=-2) / det[..., None, None]
    return inv


def _unpack_w(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([
        jnp.stack([w[..., 0], w[..., 3], w[..., 4]], -1),
        jnp.stack([w[..., 3], w[..., 1], w[..., 5]], -1),
        jnp.stack([w[..., 4], w[..., 5], w[..., 2]], -1),
    ], axis=-2)


def register(source_xyz: jnp.ndarray, source_valid: jnp.ndarray,
             target: GicpTarget, cfg: GicpConfig,
             T_init: jnp.ndarray | None = None) -> GicpResult:
    """Gauss-Newton alignment of a source scan to a voxelized target.

    Returns T with target_point ~= T @ source_point.
    """
    if T_init is None:
        T_init = jnp.eye(4, dtype=source_xyz.dtype)
    nxy, nz = _grid_dims(cfg)
    G = nxy * nxy * nz

    def gather_target(flat, ok):
        f = jnp.clip(flat, 0, G - 1)
        ok = ok & target.valid[f]
        mean = jnp.stack([target.mean[:, 0][f], target.mean[:, 1][f],
                          target.mean[:, 2][f]], axis=-1)
        w = jnp.stack([target.weight[:, k][f] for k in range(6)], axis=-1)
        return mean, w, ok

    def step(state):
        T, it, _, _, _, delta = state
        p = geometry.transform_points(T, source_xyz)
        flat, ok = voxel_index(p, source_valid, cfg)
        mean, w_packed, ok = gather_target(flat, ok)
        r = mean - p
        ok = ok & (jnp.sum(r * r, -1) < cfg.max_corr_dist ** 2)
        W = _unpack_w(w_packed) * ok[:, None, None]

        # J = [-I | [p]x]  (r(xi) ~= r0 - delta + [p]x omega)
        Px = geometry.hat(p)
        J = jnp.concatenate([
            -jnp.broadcast_to(jnp.eye(3, dtype=p.dtype),
                              (p.shape[0], 3, 3)), Px], axis=-1)  # [N,3,6]
        WJ = jnp.einsum('nij,njk->nik', W, J)
        H = jnp.einsum('nji,njk->ik', J, WJ)
        g = jnp.einsum('nji,nj->i', WJ, r)
        H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
        dxi = -jnp.linalg.solve(H, g)
        # a singular solve yields inf/nan - zero the step instead of letting
        # it poison the pose (the fallback path in callers handles recovery)
        dxi = jnp.where(jnp.isfinite(dxi), dxi, 0.0)
        # trust region: cap the step so a degenerate Hessian (correspondence
        # collapse) cannot fling the iterate to infinity; skip the update
        # entirely below 6 correspondences (6-DoF problem underdetermined)
        tn = jnp.linalg.norm(dxi[:3])
        rn = jnp.linalg.norm(dxi[3:])
        scale = jnp.minimum(1.0, jnp.minimum(
            cfg.max_step_t / jnp.maximum(tn, 1e-12),
            cfg.max_step_r / jnp.maximum(rn, 1e-12)))
        dxi = dxi * scale * (jnp.sum(ok) >= 6)
        n_ok = jnp.maximum(jnp.sum(ok), 1)
        err = jnp.einsum('ni,nij,nj->', r, W, r) / n_ok
        rmse = jnp.sqrt(jnp.sum(jnp.sum(r * r, -1) * ok) / n_ok)
        T_new = geometry.exp_se3(dxi) @ T
        return (T_new, it + 1, err, jnp.sum(ok).astype(jnp.int32),
                rmse, jnp.linalg.norm(dxi))

    def cond(state):
        _, it, _, _, _, delta = state
        return (it < cfg.max_iters) & (delta > cfg.tolerance)

    init = (T_init, jnp.zeros((), jnp.int32), jnp.inf,
            jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf),
            jnp.asarray(jnp.inf))
    T, it, err, ncorr, rmse, _ = jax.lax.while_loop(cond, step, init)
    T = geometry.orthonormalize_se3(T)
    # out-of-bounds accounting at the final iterate (valid source points
    # the grid could not see - surfaced, not silently dropped)
    _, ok_final = voxel_index(geometry.transform_points(T, source_xyz),
                              source_valid, cfg)
    n_oob = jnp.sum(source_valid & ~ok_final).astype(jnp.int32)
    return GicpResult(T=T, n_iters=it, final_error=err, n_corr=ncorr,
                      rmse=rmse, n_oob=n_oob)


def pool_voxel_map(vm: VoxelMap, cfg: GicpConfig,
                   factor: int) -> VoxelMap:
    """Downsample a voxel map by `factor` per axis. Gaussian SUMS are
    additive, so a coarse voxel is just the sum of its factor^3 fine
    children - one reshape-sum, no re-binning of points."""
    nxy, nz = _grid_dims(cfg)
    assert nxy % factor == 0 and nz % factor == 0, \
        f"grid ({nxy},{nz}) not divisible by pyramid factor {factor}"
    cx, cz = nxy // factor, nz // factor

    def pool(a):
        a = a.reshape((cx, factor, cx, factor, cz, factor)
                      + a.shape[1:])
        return a.sum(axis=(1, 3, 5)).reshape((cx * cx * cz,) + a.shape[6:])

    return VoxelMap(n=pool(vm.n), sum_x=pool(vm.sum_x),
                    sum_xx=pool(vm.sum_xx), n_oob=vm.n_oob)


def _coarse_cfg(cfg: GicpConfig, factor: int) -> GicpConfig:
    import dataclasses
    return dataclasses.replace(
        cfg, voxel_size=cfg.voxel_size * factor,
        max_corr_dist=cfg.max_corr_dist * factor,
        max_iters=max(cfg.max_iters // 2, 8))


def register_pyramid(source_xyz: jnp.ndarray, source_valid: jnp.ndarray,
                     vm: VoxelMap, cfg: GicpConfig,
                     T_init: jnp.ndarray | None = None) -> GicpResult:
    """Coarse-to-fine registration: solve first against a factor-pooled
    voxel map (correspondence radius scaled up with it), then refine at
    full resolution from the coarse pose. Robust to inter-scan motion
    several times `max_corr_dist` - e.g. skip-sampled KITTI windows
    (~2-7 m/frame, the regime the reference sidesteps by reading GT
    poses, src/ssc.cpp:913-995)."""
    if cfg.coarse_factor > 1:
        ccfg = _coarse_cfg(cfg, cfg.coarse_factor)
        vmc = pool_voxel_map(vm, cfg, cfg.coarse_factor)
        res_c = register(source_xyz, source_valid,
                         finalize_target(vmc, ccfg), ccfg, T_init)
        T_init = res_c.T
    tgt = finalize_target(vm, cfg)
    return register(source_xyz, source_valid, tgt, cfg, T_init)


def register_global(source_xyz: jnp.ndarray, source_valid: jnp.ndarray,
                    vm: VoxelMap, cfg: GicpConfig,
                    n_yaw: int = 16) -> GicpResult:
    """Globally initialized registration: sweep `n_yaw` yaw hypotheses
    through the cheap coarse pyramid level, keep the basin with the most
    correspondences, refine at full resolution. For cold starts with no
    motion prior (sequence start, kidnapped re-localization) where the
    attraction basin of a single GICP solve is narrower than the unknown
    rotation."""
    factor = max(cfg.coarse_factor, 2)
    ccfg = _coarse_cfg(cfg, factor)
    vmc = pool_voxel_map(vm, cfg, factor)
    tgt_c = finalize_target(vmc, ccfg)

    def try_yaw(yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        Ti = jnp.array([[c, -s, 0, 0], [s, c, 0, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1]], source_xyz.dtype)
        res = register(source_xyz, source_valid, tgt_c, ccfg, Ti)
        # rank by correspondence count, tie-broken by residual
        score = res.n_corr.astype(jnp.float32) - res.rmse
        return score, res.T

    yaws = jnp.arange(n_yaw, dtype=source_xyz.dtype) * (2 * jnp.pi / n_yaw)
    scores, Ts = jax.lax.map(try_yaw, yaws)
    best = jnp.argmax(scores)
    tgt = finalize_target(vm, cfg)
    return register(source_xyz, source_valid, tgt, cfg, T_init=Ts[best])


def scan_to_scan(source_xyz: jnp.ndarray, source_valid: jnp.ndarray,
                 target_xyz: jnp.ndarray, target_valid: jnp.ndarray,
                 cfg: GicpConfig,
                 T_init: jnp.ndarray | None = None) -> GicpResult:
    vm = build_voxel_map(target_xyz, target_valid, cfg)
    return register_pyramid(source_xyz, source_valid, vm, cfg, T_init)
