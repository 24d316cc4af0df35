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
                      weights: jnp.ndarray | None = None,
                      weight_bound: int = 65536) -> jnp.ndarray:
    """Histogram of labels in [0, num) over a LARGE flat array (e.g. the
    [G]~1.3M voxel grid); entries outside [0, num) are ignored. With
    `weights` (same shape, f32) the histogram is weight-summed instead of
    counted (returned as f32; counts return int32).

    A segment-sum scatter at this size serializes on TPU (~15 ms at
    G=1.3M); here the histogram is an OUTER-PRODUCT MATMUL: with
    label = hi*L + lo,  count[hi, lo] = sum_g 1{hi_g=hi} * w_g * 1{lo_g=lo}
    = (onehot_hi [H, G]) @ (w-scaled onehot_lo [G, L]) - one MXU matmul
    (~1 ms), exact in f32 accumulation up to 2^24 per bin for counts.

    `weight_bound`: exclusive upper bound on integer weight values; the
    radix-256 split uses exactly ceil(log256(weight_bound)) digit matmuls,
    so exactness holds for any weights < weight_bound (callers with
    per-voxel point counts should pass cfg.shapes.max_points + 1).
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
    # EXACT bf16 matmuls via a radix-256 weight split (f32 'highest'
    # matmuls with a 16-row LHS run ~6x slower on the MXU): integer
    # weights split into base-256 digits < 256, each bf16-exact,
    # accumulated in f32. Digit count follows `weight_bound` so weights
    # up to the declared bound lose nothing.
    n_digits = max(1, -(-max(weight_bound - 1, 1).bit_length() // 8))
    ab = a.astype(jnp.bfloat16)
    bf = b.astype(jnp.bfloat16)
    w = weights
    total = jnp.zeros((H, L), jnp.float32)
    scale = 1.0
    for _ in range(n_digits):
        w_next = jnp.floor(w / 256.0)
        digit = w - 256.0 * w_next
        total = total + scale * jnp.matmul(
            ab, bf * digit[:, None].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        w = w_next
        scale *= 256.0
    return total.reshape(H * L)[:num]


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
