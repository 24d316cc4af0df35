"""Tensor parallelism: splitting ONE scan's work across chips.

The reference has no TP analog (single process, SURVEY.md 2.4); here the
natural tensor axis is the per-scan point dimension feeding the dense
curved-voxel grid: each chip scatters its point shard into a private
partial grid and a `psum` over the tp axis produces the replicated voxel
statistics - the same pattern as vocabulary-parallel embedding gradients.
Used when a single scan's point count exceeds one chip's comfortable
tiling, or to overlap grid construction with dp work on small meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import GridConfig
from ..ops import quantize
from ..types import VoxelGrid


def _tp_stats_block(xyz, intensity, valid, grid_cfg: GridConfig, axis: str):
    _, flat, in_fov = quantize.quantize(xyz, valid, grid_cfg)
    g = grid_cfg.bin_num
    seg = jnp.where(in_fov, flat, g)
    ones = in_fov.astype(jnp.float32)
    count = jax.ops.segment_sum(ones, seg, num_segments=g + 1)[:g]
    s1 = jax.ops.segment_sum(jnp.where(in_fov, intensity, 0.0), seg,
                             num_segments=g + 1)[:g]
    s2 = jax.ops.segment_sum(jnp.where(in_fov, intensity ** 2, 0.0), seg,
                             num_segments=g + 1)[:g]
    # combine partial sums across the point shards
    count = jax.lax.psum(count, axis)
    s1 = jax.lax.psum(s1, axis)
    s2 = jax.lax.psum(s2, axis)
    safe = jnp.maximum(count, 1.0)
    mean = s1 / safe
    var = jnp.maximum(s2 / safe - mean ** 2, 0.0)
    return count.astype(jnp.int32), mean, var


def tp_voxel_stats(xyz: jnp.ndarray, intensity: jnp.ndarray,
                   valid: jnp.ndarray, grid_cfg: GridConfig,
                   mesh: Mesh, axis: str = "tp") -> VoxelGrid:
    """Voxel statistics for one scan with points sharded over `axis`;
    the result grid is replicated."""
    fn = jax.shard_map(
        functools.partial(_tp_stats_block, grid_cfg=grid_cfg, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    count, mean, var = jax.jit(fn)(xyz, intensity, valid)
    return VoxelGrid(count=count, intensity_mean=mean, intensity_var=var)
