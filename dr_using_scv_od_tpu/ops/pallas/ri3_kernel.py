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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cc_kernel import _roll, _round_up


def _ri3_tile_kernel(lab_hbm, orig_hbm, av_hbm, qual_hbm,
                     lab_out, changed_out,
                     lab_s, orig_s, av_s, qual_s, sem,
                     *, R: int, S_pad: int, AB: int, H: int,
                     local_iters: int, inf: int, pad_r: int,
                     far_range_bin: int, av_diff: float):
    i = pl.program_id(0)
    tile_rows = (AB + 2 * H) * R
    row0 = i * AB * R

    for hbm, s in ((lab_hbm, lab_s), (orig_hbm, orig_s),
                   (av_hbm, av_s), (qual_hbm, qual_s)):
        cp = pltpu.make_async_copy(hbm.at[pl.ds(row0, tile_rows), :], s, sem)
        cp.start()
        cp.wait()

    lab0 = lab_s[:]
    orig = orig_s[:]
    av = av_s[:]
    qual = qual_s[:]               # int32: occupied & variance-ok
    # (kept int32 - Mosaic cannot rotate non-32-bit data)
    occ = orig != inf              # orig labels are inf on empty voxels

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, S_pad), 0) % R
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, S_pad), 1)
    wide = r_iota <= far_range_bin  # radius 2 allowed here

    def one_iter(lab):
        tot = lab
        for ds in range(-pad_r, pad_r + 1):
            # neighbour value at lane l comes from lane l+ds
            if ds > 0:
                lane_bad = lane >= S_pad - ds
            elif ds < 0:
                lane_bad = lane < -ds
            else:
                lane_bad = lane < 0  # all-false
            for da in range(-pad_r, pad_r + 1):
                for dr in range(-pad_r, pad_r + 1):
                    if da == 0 and dr == 0 and ds == 0:
                        continue
                    cheb = max(abs(da), abs(dr), abs(ds))
                    off = da * R + dr

                    def sh2(x):
                        y = _roll(x, -ds, 1) if ds else x
                        return _roll(y, -off, 0) if off else y

                    nb_lab = sh2(lab)
                    nb_orig = sh2(orig)
                    nb_av = sh2(av)
                    nb_qual = sh2(qual) != 0
                    close = jnp.abs(av - nb_av) <= av_diff
                    # pull: edge centred at v (neighbour variance, r(v))
                    ok_pull = nb_qual & close
                    # push (reverse-centred edge): centre variance, radius
                    # at the neighbour's range index r_iota + dr
                    ok_push = (nb_orig != inf) & (qual != 0) & close
                    if cheb == 2:
                        ok_pull = ok_pull & wide
                        ok_push = ok_push & (r_iota <= far_range_bin - dr)
                    ok = ok_pull | ok_push | (nb_orig == orig)
                    if dr >= 1:
                        ok = ok & (r_iota < R - dr)
                    elif dr <= -1:
                        ok = ok & (r_iota >= -dr)
                    ok = ok & ~lane_bad
                    tot = jnp.minimum(tot, jnp.where(ok, nb_lab, inf))
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
                               interpret: bool = False) -> jnp.ndarray:
    """[G] root labels -> fused [G] root labels (empty cells keep their
    own-id self-loops, same contract as ops.clustering)."""
    A, R, S = shape3
    G = A * R * S
    S_pad = _round_up(S, 128)
    local_iters = 2
    H = search_c * local_iters
    AB = min(A, 10)
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
    av_rows = pad_rows(intensity_mean.reshape(A, R, S), jnp.inf)
    qual_rows = pad_rows(qual3.astype(jnp.int32), 0)

    kernel = functools.partial(
        _ri3_tile_kernel, R=R, S_pad=S_pad, AB=AB, H=H,
        local_iters=local_iters, inf=inf, pad_r=search_c,
        far_range_bin=far_bin, av_diff=intensity_diff)
    tile_rows = (AB + 2 * H) * R

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
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
            pltpu.VMEM((tile_rows, S_pad), jnp.float32),
            pltpu.VMEM((tile_rows, S_pad), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def body(state):
        lab, _, it = state
        new_interior, changed = call(lab, orig_rows, av_rows, qual_rows)
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
