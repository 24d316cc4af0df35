"""Frame and window pipeline drivers.

Analog of `SSC::segDF` (src/ssc.cpp:1428-1548): per-frame
process -> segment -> recognize, then pairwise tracking over the window.
Here the per-frame stage is one jittable function (`process_frame`) mapped
over the frame axis (vmap/shard_map; the reference loops serially,
src/ssc.cpp:1435-1445), and tracking is a `lax.scan` over consecutive pairs
(models/tracking.py) because its cluster mutations are a Markov recurrence.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..types import FrameState, PointCloud, VoxelGrid
from . import patchwork, recognition, segmentation


class FrameOutput(NamedTuple):
    state: FrameState
    features: recognition.Features
    n_clusters: jnp.ndarray
    overflow_points: jnp.ndarray
    patch_overflow: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cfg",))
def process_frame(xyz: jnp.ndarray, intensity: jnp.ndarray,
                  valid: jnp.ndarray, pose: jnp.ndarray,
                  cfg: PipelineConfig) -> FrameOutput:
    """Full single-frame pipeline: ground removal -> curved-voxel build ->
    clustering -> refinement -> recognition.

    Mirrors the per-frame body of segDF (src/ssc.cpp:1435-1445) minus
    tracking.
    """
    pw = patchwork.estimate_ground(xyz, valid, cfg.patchwork)

    seg, point_voxel, grid = segmentation.segment_frame(
        xyz, intensity, pw.nonground, pw.ground, pw.dropped, cfg)

    table, feats = recognition.recognize(
        seg.clusters, xyz, seg.point_cluster, point_voxel, cfg)

    state = FrameState(
        points=PointCloud(xyz=xyz, intensity=intensity, valid=valid),
        grid=grid,
        label_grid=seg.label_grid,
        clusters=table,
        point_voxel=point_voxel,
        point_cluster=seg.point_cluster,
        pose=pose,
        point_route=seg.point_route,
    )
    return FrameOutput(state=state, features=feats,
                       n_clusters=seg.n_clusters,
                       overflow_points=seg.overflow_points,
                       patch_overflow=pw.patch_overflow)


def process_window(xyz: jnp.ndarray, intensity: jnp.ndarray,
                   valid: jnp.ndarray, poses: jnp.ndarray,
                   cfg: PipelineConfig) -> FrameOutput:
    """vmap the frame pipeline over a [F, ...] window (data-parallel axis;
    sharded variant in parallel/sharded_pipeline.py)."""
    fn = functools.partial(process_frame, cfg=cfg)
    return jax.vmap(fn)(xyz, intensity, valid, poses)
