"""Masked segment reductions keyed by cluster id.

The reference iterates `std::vector<int> occupy_pts` per cluster for bounding
boxes, centroids and counts (src/ssc.cpp:421-435, 437-445); here every
per-cluster quantity is one segment reduction over the padded point batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _seg_ids(ids: jnp.ndarray, valid: jnp.ndarray, num: int) -> jnp.ndarray:
    """Route invalid entries to an overflow bucket `num`."""
    return jnp.where(valid & (ids >= 0), ids, num)


def segment_sum(x: jnp.ndarray, ids: jnp.ndarray, valid: jnp.ndarray,
                num: int) -> jnp.ndarray:
    seg = _seg_ids(ids, valid, num)
    zero = jnp.zeros_like(x)
    return jax.ops.segment_sum(jnp.where(valid[..., None] if x.ndim > 1
                                         else valid, x, zero),
                               seg, num_segments=num + 1)[:num]


def segment_count(ids: jnp.ndarray, valid: jnp.ndarray, num: int
                  ) -> jnp.ndarray:
    seg = _seg_ids(ids, valid, num)
    return jax.ops.segment_sum(valid.astype(jnp.int32), seg,
                               num_segments=num + 1)[:num]


def segment_min(x: jnp.ndarray, ids: jnp.ndarray, valid: jnp.ndarray,
                num: int, fill: float = jnp.inf) -> jnp.ndarray:
    seg = _seg_ids(ids, valid, num)
    mask = valid[..., None] if x.ndim > 1 else valid
    xm = jnp.where(mask, x, fill)
    return jax.ops.segment_min(xm, seg, num_segments=num + 1)[:num]


def segment_max(x: jnp.ndarray, ids: jnp.ndarray, valid: jnp.ndarray,
                num: int, fill: float = -jnp.inf) -> jnp.ndarray:
    seg = _seg_ids(ids, valid, num)
    mask = valid[..., None] if x.ndim > 1 else valid
    xm = jnp.where(mask, x, fill)
    return jax.ops.segment_max(xm, seg, num_segments=num + 1)[:num]


def segment_mean(x: jnp.ndarray, ids: jnp.ndarray, valid: jnp.ndarray,
                 num: int) -> jnp.ndarray:
    s = segment_sum(x, ids, valid, num)
    n = segment_count(ids, valid, num).astype(x.dtype)
    n = jnp.maximum(n, 1)
    return s / (n[..., None] if x.ndim > 1 else n)
