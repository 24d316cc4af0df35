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


def grid_label_counts(labels: jnp.ndarray, num: int,
                      weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Histogram of labels in [0, num) over a LARGE flat array (e.g. the
    [G]~1.3M voxel grid); entries outside [0, num) are ignored. With
    `weights` (same shape, f32) the histogram is weight-summed instead of
    counted (returned as f32; counts return int32).

    A segment-sum scatter at this size serializes on TPU (~15 ms at
    G=1.3M); here the histogram is an OUTER-PRODUCT MATMUL: with
    label = hi*L + lo,  count[hi, lo] = sum_g 1{hi_g=hi} * w_g * 1{lo_g=lo}
    = (onehot_hi [H, G]) @ (w-scaled onehot_lo [G, L]) - one MXU matmul
    (~1 ms), exact in f32 accumulation up to 2^24 per bin for counts.
    """
    L = 32
    H = -(-num // L)
    hi = labels // L
    lo = labels % L          # Python-sign mod: negative labels -> hi < 0
    a = (hi[None, :] == jnp.arange(H, dtype=labels.dtype)[:, None])
    b = (lo[:, None] == jnp.arange(L, dtype=labels.dtype)[None, :])
    if weights is None:
        counts = jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        return counts.reshape(H * L)[:num].astype(jnp.int32)
    # two EXACT bf16 matmuls via radix-256 weight split (f32 'highest'
    # matmuls with a 16-row LHS run ~6x slower on the MXU): integer
    # weights < 2^16 split into hi/lo digits < 256, each bf16-exact,
    # accumulated in f32
    w = weights
    w_hi = jnp.floor(w / 256.0)
    w_lo = w - 256.0 * w_hi
    bf = b.astype(jnp.bfloat16)
    ab = a.astype(jnp.bfloat16)
    s_lo = jnp.matmul(ab, bf * w_lo[:, None].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    s_hi = jnp.matmul(ab, bf * w_hi[:, None].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    return (256.0 * s_hi + s_lo).reshape(H * L)[:num]


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
