"""Artifact-level evaluation: PR/RR from saved PCD maps via nearest-
neighbour matching.

Twin of the reference's offline chain (tool/analysis.py:158-194 +
src/evaluate.cpp kd-radius matching), for evaluating maps produced by
external tools or earlier runs. The kd-tree 1-NN becomes a tiled
brute-force distance min - distance matrices are matmul-shaped, which is
exactly what the MXU wants (||a-b||^2 = |a|^2 + |b|^2 - 2 a.b).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .metrics import DYNAMIC_CLASSES, is_dynamic_label


def nn_distances(query: jnp.ndarray, ref: jnp.ndarray,
                 chunk: int = 4096) -> jnp.ndarray:
    """For each query point, squared distance to the nearest ref point.
    query [N,3], ref [M,3] -> [N] f32. Tiled so the [chunk, M] distance
    block streams through the MXU."""
    ref = jnp.asarray(ref, jnp.float32)
    ref_sq = jnp.sum(ref * ref, axis=1)

    @jax.jit
    def one_chunk(q):
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)
        d = q_sq + ref_sq[None, :] - 2.0 * (q @ ref.T)
        return jnp.min(d, axis=1)

    n = query.shape[0]
    out = np.empty((n,), np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        q = jnp.zeros((chunk, 3), jnp.float32).at[:e - s].set(query[s:e])
        out[s:e] = np.asarray(one_chunk(q))[:e - s]
    return jnp.asarray(np.maximum(out, 0.0))


def evaluate_maps(gt_xyz: np.ndarray, gt_labels: np.ndarray,
                  est_xyz: np.ndarray, voxel: float = 0.2):
    """PR/RR/F1 in the style of analysis.py's naive preservation: a gt
    point is 'preserved' if the estimated static map has a point within
    voxel*sqrt(3)/2 (tool/analysis.py:133)."""
    thr = voxel * np.sqrt(3.0) / 2.0
    d = np.asarray(nn_distances(jnp.asarray(gt_xyz),
                                jnp.asarray(est_xyz)))
    preserved = d < thr ** 2
    dyn = np.asarray(is_dynamic_label(jnp.asarray(gt_labels)))
    n_sta = int((~dyn).sum())
    n_dyn = int(dyn.sum())
    pr = 100.0 * (preserved & ~dyn).sum() / max(n_sta, 1)
    rr = 100.0 * (~preserved & dyn).sum() / max(n_dyn, 1)
    f1 = 2 * (pr / 100) * (rr / 100) / max(pr / 100 + rr / 100, 1e-12)
    per_class = {}
    sem = gt_labels.astype(np.uint32) & 0xFFFF
    for c in DYNAMIC_CLASSES:
        m = sem == c
        if m.sum():
            per_class[c] = 100.0 * (~preserved & m).sum() / m.sum()
    return {"pr": pr, "rr": rr, "f1": f1, "n_static": n_sta,
            "n_dynamic": n_dyn, "per_class": per_class}


def evaluate_cli(args) -> int:
    from ..utils import io_kitti
    gt = io_kitti.read_pcd_xyzi(args.gt)
    est = io_kitti.read_pcd_xyzi(args.est)
    res = evaluate_maps(gt[:, :3], gt[:, 3].astype(np.uint32), est[:, :3],
                        voxel=args.voxel)
    print(f"PR={res['pr']:.2f}  RR={res['rr']:.2f}  F1={res['f1']:.4f}  "
          f"(static {res['n_static']}, dynamic {res['n_dynamic']})")
    for c, rr in sorted(res["per_class"].items()):
        print(f"  class {c}: RR={rr:.2f}%")
    return 0
