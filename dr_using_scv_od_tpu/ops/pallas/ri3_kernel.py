"""Pallas TPU kernel: intensity-gated cluster fusion ("RI3").

VMEM-tiled companion of cc_kernel.py for refineClusterByIntensity
(src/ssc.cpp:571-635). Labels propagate between voxels v, n when EITHER
  * the reference's intensity predicate holds in EITHER direction - the
    predicate is asymmetric (variance checked on the neighbour, radius on
    the centre, src/ssc.cpp:588-595) but the reference's fusion is an
    undirected union, so v pulls lab(n) when edge (v->n) qualifies AND
    when the reverse-centred edge (n->v) qualifies (cov(v), radius(n));
    see models/segmentation.refine_by_intensity for the same rule, or
  * v and n belong to the same pre-RI3 cluster (so a merged label spreads
    across entire clusters - the kernel equivalent of the reference's
    whole-cluster fusion, without any segment scatter).

Run to fixpoint, this computes the transitive closure of qualifying-edge
merges with deterministic min-label winners (the reference's sequential
3-pass merge is order-dependent; SURVEY.md 7.3 sanctions the deterministic
reformulation). The far-range neighbourhood shrink (radius 1 beyond
far_range_frac * range_num, src/ssc.cpp:397-399) applies per destination
voxel.

Kernel structure (one local iteration):
  * Chebyshev-1 hops are UNCONDITIONAL: two occupied voxels at cheb <= 1
    are 26-connected, hence in the same pre-RI3 CC cluster (the input is
    a CC fixpoint), so the same-cluster rule always fires there. They run
    as three separable 3-tap axis mins (~6 rolls for all 26 offsets).
  * Chebyshev-2 shell (98 offsets) carries only the intensity gate; the
    per-voxel (qual, mean) pair rides ONE packed int32 plane
    (occ<<22 | qual<<21 | round(mean * _AV_SCALE=8192)) so each offset
    needs two shifted tensors (labels + enc), not four.
  * Same-cluster RUN-SCANS (segmented log-depth min along sector / range
    / azimuth runs of constant pre-RI3 label) spread a merged label
    across a whole wall per iteration instead of one voxel per hop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cc_kernel import _roll, _round_up

_AV_SCALE = 8192.0  # max fixed-point precision that fits 21 bits (255*8192 < 2^21)
_AV_BITS = 21          # mean occupies bits [0, 21); qual bit 21; occ bit 22
_AV_MASK = (1 << _AV_BITS) - 1


def _ri3_tile_kernel(lab_hbm, orig_hbm, enc_hbm,
                     lab_out, changed_out,
                     lab_s, orig_s, enc_s, sem,
                     *, R: int, S_pad: int, AB: int, H: int,
                     local_iters: int, inf: int, pad_r: int,
                     far_range_bin: int, av_diff_q: int):
    i = pl.program_id(0)
    tile_rows = (AB + 2 * H) * R
    row0 = i * AB * R

    for hbm, s in ((lab_hbm, lab_s), (orig_hbm, orig_s), (enc_hbm, enc_s)):
        cp = pltpu.make_async_copy(hbm.at[pl.ds(row0, tile_rows), :], s, sem)
        cp.start()
        cp.wait()

    lab0 = lab_s[:]
    orig = orig_s[:]
    enc = enc_s[:]
    occ = orig != inf              # orig labels are inf on empty voxels
    av_q = enc & _AV_MASK

    rows_a = tile_rows // R
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, S_pad), 0)
    r_iota = row_iota % R
    a_iota = row_iota // R
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, S_pad), 1)

    def axis_min3(v, axis, stride, coord, length):
        """Min over {-1, 0, +1} steps along one axis. NO occupancy mask on
        the input: empty cells hold inf from the label init, and the
        separable composition needs intermediate (conduit) minima at empty
        positions to assemble the full 3x3x3 box min."""
        lo = _roll(v, stride, axis) if axis == 0 else _roll(v, 1, 1)
        hi = _roll(v, -stride, axis) if axis == 0 else _roll(v, -1, 1)
        lo = jnp.where(coord < 1, inf, lo)
        hi = jnp.where(coord >= length - 1, inf, hi)
        return jnp.minimum(v, jnp.minimum(lo, hi))

    def same_run_scan(v, axis, stride, coord, length):
        """Segmented min-scan along runs of CONSTANT pre-RI3 label."""
        n_steps = max(1, (length - 1).bit_length())
        out = v
        for sgn in (1, -1):
            o_sh = _roll(orig, sgn * stride, axis)
            pred_oob = coord < 1 if sgn == 1 else coord >= length - 1
            edge_ok = occ & (o_sh == orig) & ~pred_oob
            f = (~edge_ok).astype(jnp.int32)
            vv = jnp.where(occ, v, inf)
            for k in range(n_steps):
                step = 1 << k
                s = sgn * stride * step
                v_sh = _roll(vv, s, axis)
                f_sh = _roll(f, s, axis)
                oob = coord < step if sgn == 1 else coord >= length - step
                v_sh = jnp.where(oob, inf, v_sh)
                f_sh = jnp.where(oob, 1, f_sh)
                vv = jnp.where(f > 0, vv, jnp.minimum(vv, v_sh))
                f = f | f_sh
            out = jnp.minimum(out, vv)
        return out

    def one_iter(lab):
        # --- cheb-1: unconditional separable 27-neighbourhood min
        m = axis_min3(lab, 1, 1, lane, S_pad)
        m = axis_min3(m, 0, 1, r_iota, R)
        m = axis_min3(m, 0, R, a_iota, rows_a)
        tot = jnp.minimum(jnp.where(occ, lab, inf), m)

        # --- cheb-2 shell: intensity-gated (98 offsets)
        for ds in range(-pad_r, pad_r + 1):
            if ds > 0:
                lane_bad = lane >= S_pad - ds
            elif ds < 0:
                lane_bad = lane < -ds
            else:
                lane_bad = lane < 0  # all-false
            for da in range(-pad_r, pad_r + 1):
                for dr in range(-pad_r, pad_r + 1):
                    if max(abs(da), abs(dr), abs(ds)) != pad_r:
                        continue  # cheb-1 handled separably above
                    off = da * R + dr

                    def sh2(x):
                        y = _roll(x, -ds, 1) if ds else x
                        return _roll(y, -off, 0) if off else y

                    nb_lab = sh2(lab)
                    nb_enc = sh2(enc)
                    nb_occ = nb_enc >= (1 << 22)
                    nb_qual = (nb_enc & (1 << 21)) != 0
                    close = jnp.abs(av_q - (nb_enc & _AV_MASK)) <= av_diff_q
                    qual_v = (enc & (1 << 21)) != 0
                    # pull: edge centred at v (neighbour variance, r(v))
                    ok = nb_qual & (r_iota <= far_range_bin)
                    # push (reverse-centred): centre variance, radius at
                    # the neighbour's range index
                    ok = ok | (qual_v & (r_iota <= far_range_bin - dr))
                    ok = ok & nb_occ & close
                    if dr >= 1:
                        ok = ok & (r_iota < R - dr)
                    elif dr <= -1:
                        ok = ok & (r_iota >= -dr)
                    # azimuth wrap guard (see fused_seg.py: scratch-edge
                    # slabs are real on multi-tile grids)
                    if da >= 1:
                        ok = ok & (a_iota < rows_a - da)
                    elif da <= -1:
                        ok = ok & (a_iota >= -da)
                    ok = ok & ~lane_bad
                    tot = jnp.minimum(tot, jnp.where(ok, nb_lab, inf))

        # --- spread merged labels along same-cluster runs (log depth)
        tot = same_run_scan(tot, 1, 1, lane, S_pad)
        tot = same_run_scan(tot, 0, 1, r_iota, R)
        tot = same_run_scan(tot, 0, R, a_iota, rows_a)
        return jnp.where(occ, tot, lab)

    lab = jax.lax.fori_loop(0, local_iters, lambda k, l: one_iter(l), lab0)

    lo = H * R
    hi = lo + AB * R
    interior = lab[lo:hi]
    lab_out[:] = interior
    changed_out[i] = jnp.sum((interior != lab0[lo:hi]).astype(jnp.int32))


def refine_by_intensity_pallas(root_grid: jnp.ndarray, count: jnp.ndarray,
                               intensity_mean: jnp.ndarray,
                               intensity_var: jnp.ndarray,
                               shape3, search_c: int, intensity_cov: float,
                               intensity_diff: float, far_range_frac: float,
                               max_outer: int = 16,
                               ab: int = 20,
                               interpret: bool = False) -> jnp.ndarray:
    """[G] root labels -> fused [G] root labels (empty cells keep their
    own-id self-loops, same contract as ops.clustering).

    `root_grid` must be a connected-components FIXPOINT (occupied cheb-1
    neighbours share a label) - segment_frame feeds the CC kernel's
    output; the cheb-1 shell above relies on it.
    """
    A, R, S = shape3
    G = A * R * S
    S_pad = _round_up(S, 128)
    local_iters = 1
    H = search_c * local_iters
    AB = min(A, ab)
    n_tiles = -(-A // AB)
    A_pad = n_tiles * AB + 2 * H
    inf = jnp.iinfo(jnp.int32).max // 2
    far_bin = int(R * far_range_frac)

    occ = (count > 0).reshape(A, R, S)
    qual3 = (occ & (intensity_var.reshape(A, R, S) <= intensity_cov))

    def pad_rows(x3, fill):
        out = jnp.full((A_pad, R, S_pad), fill, x3.dtype)
        return out.at[H:H + A, :, :S].set(x3).reshape(A_pad * R, S_pad)

    # labels in padded id space (monotone remap as in cc_kernel)
    lab3 = root_grid.reshape(A, R, S)
    a_l = lab3 // (R * S)
    r_l = (lab3 // S) % R
    s_l = lab3 % S
    lab_pad3 = ((a_l + H) * R + r_l) * S_pad + s_l
    lab_rows = pad_rows(jnp.where(occ, lab_pad3, inf), inf)
    orig_rows = lab_rows  # pre-RI3 labels (inf marks empty)
    # packed per-voxel plane: occ<<22 | qual<<21 | round(mean * 8192)
    av_q3 = jnp.clip(jnp.round(intensity_mean.reshape(A, R, S) * _AV_SCALE),
                     0, _AV_MASK).astype(jnp.int32)
    enc3 = jnp.where(occ, (1 << 22) + qual3.astype(jnp.int32) * (1 << 21)
                     + av_q3, 0)
    enc_rows = pad_rows(enc3, 0)
    av_diff_q = int(round(intensity_diff * _AV_SCALE))

    kernel = functools.partial(
        _ri3_tile_kernel, R=R, S_pad=S_pad, AB=AB, H=H,
        local_iters=local_iters, inf=inf, pad_r=search_c,
        far_range_bin=far_bin, av_diff_q=av_diff_q)
    tile_rows = (AB + 2 * H) * R

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[
            pl.BlockSpec((AB * R, S_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * AB * R, S_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_rows, S_pad), jnp.int32),
            pltpu.VMEM((tile_rows, S_pad), jnp.int32),
            pltpu.VMEM((tile_rows, S_pad), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def body(state):
        lab, _, it = state
        new_interior, changed = call(lab, orig_rows, enc_rows)
        new = lab.at[H * R:(H + n_tiles * AB) * R].set(new_interior)
        return new, jnp.sum(changed), it + 1

    lab, _, _ = jax.lax.while_loop(
        lambda s: (s[1] > 0) & (s[2] < max_outer), body,
        (lab_rows, jnp.ones((), jnp.int32), jnp.zeros((), jnp.int32)))

    lab3p = lab.reshape(A_pad, R, S_pad)[H:H + A, :, :S]
    t = lab3p // S_pad
    s = lab3p % S_pad
    a = t // R - H
    r = t % R
    orig_id = (a * R + r) * S + s
    own = jnp.arange(G, dtype=jnp.int32)
    return jnp.where(occ.reshape(-1), orig_id.reshape(-1), own)
