"""Pallas TPU kernel: FUSED curved-voxel clustering + intensity refine.

Replaces the round-3 two-kernel sequence (cc_kernel.py then ri3_kernel.py,
each with its own outer `while_loop` of full-grid launches over the same
tiles) with ONE kernel computing the same fixpoint directly.

Semantics: the final partition of both formulations is the connected
components of the UNION graph

    E = {cheb-1 edges between occupied voxels}          (CVC 26-connectivity,
         src/ssc.cpp:299-419)
      u {intensity-qualifying edges at cheb 2..search_c} (refineClusterBy-
         Intensity predicate, src/ssc.cpp:588-595, evaluated both ways as
         an undirected union - see ri3_kernel.py's derivation)

because RI3's "same pre-RI3 cluster" fusion rule is exactly the transitive
closure of the cheb-1 edges: running CC first adds nothing to the fixpoint
that this union-graph CC does not reach. Min-label winners are identical
(the minimum original flat id of each component), so the fused kernel is a
drop-in replacement for cc_pallas + ri3_pallas with one outer convergence
loop, one HBM round trip per iteration instead of two, and no label
remap/re-encode between the phases.

Kernel structure per local iteration (tiling identical to cc_kernel.py:
rows (a*R + r) x sector lanes, AB azimuth slabs + H halo slabs per tile):
  * cheb-1: unconditional separable 3-tap axis mins (exactly the 3x3x3
    box min - empty cells hold inf and act as conduits, never sources);
  * cheb-2..search_c shells: intensity-gated offsets, the per-voxel
    (occ, qual, mean) triple packed into ONE int32 plane
    (occ<<22 | qual<<21 | round(mean * 8192));
  * occupied-RUN scans (segmented log-depth min along sector / range /
    azimuth runs of occupied voxels): any axis-contiguous occupied run is
    cheb-1 connected, so a merged label crosses a whole wall per
    iteration instead of one hop.

With `enable_shell=False` the gated shells are skipped and this is a pure
CC kernel (the "-RI3" ablation, cfg.seg.iteration == 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cc_kernel import _roll, _round_up

_AV_SCALE = 8192.0     # fixed-point mean scale (255 * 8192 < 2^21)
_AV_BITS = 21          # mean bits [0,21); qual bit 21; occ bit 22
_AV_MASK = (1 << _AV_BITS) - 1


def _fused_tile_kernel(lab_hbm, enc_hbm, lab_out, changed_out,
                       lab_s, enc_s, sem,
                       *, R: int, S_pad: int, AB: int, H: int,
                       local_iters: int, cc_reps: int, inf: int,
                       pad_r: int, far_range_bin: int, av_diff_q: int,
                       enable_shell: bool):
    i = pl.program_id(0)
    tile_rows = (AB + 2 * H) * R
    row0 = i * AB * R

    for hbm, s in ((lab_hbm, lab_s), (enc_hbm, enc_s)):
        cp = pltpu.make_async_copy(hbm.at[pl.ds(row0, tile_rows), :], s, sem)
        cp.start()
        cp.wait()

    lab0 = lab_s[:]
    enc = enc_s[:]
    occ = enc >= (1 << 22)
    av_q = enc & _AV_MASK

    rows_a = tile_rows // R
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, S_pad), 0)
    r_iota = row_iota % R
    a_iota = row_iota // R
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, S_pad), 1)

    def axis_min3(v, axis, stride, coord, length):
        """Min over {-1,0,+1} along one axis; inf at empty cells makes the
        separable composition the exact 3x3x3 box min (conduits carry,
        never source)."""
        lo = _roll(v, stride, axis) if axis == 0 else _roll(v, 1, 1)
        hi = _roll(v, -stride, axis) if axis == 0 else _roll(v, -1, 1)
        lo = jnp.where(coord < 1, inf, lo)
        hi = jnp.where(coord >= length - 1, inf, hi)
        return jnp.minimum(v, jnp.minimum(lo, hi))

    def occ_run_scan(v, axis, stride, coord, length):
        """Segmented min-scan along occupied RUNS of one axis (runs break
        at empty cells and axis boundaries); forward + backward so the run
        min reaches every member in log depth."""
        n_steps = max(1, (length - 1).bit_length())
        out = v
        f0 = (~occ).astype(jnp.int32)
        for reverse in (False, True):
            vv = jnp.where(occ, v, inf)
            f = f0
            for k in range(n_steps):
                step = 1 << k
                s = stride * step
                if reverse:
                    v_sh = _roll(vv, -s, axis)
                    f_sh = _roll(f, -s, axis)
                    oob = coord >= length - step
                else:
                    v_sh = _roll(vv, s, axis)
                    f_sh = _roll(f, s, axis)
                    oob = coord < step
                v_sh = jnp.where(oob, inf, v_sh)
                f_sh = jnp.where(oob, 1, f_sh)
                vv = jnp.where(f > 0, vv, jnp.minimum(vv, v_sh))
                f = f | f_sh
            out = jnp.minimum(out, vv)
        return out

    def cc_sweep(tot):
        """One full cheb-1 propagation: separable 27-box min followed by
        log-depth occupied-run scans along all three axes."""
        m = axis_min3(tot, 1, 1, lane, S_pad)
        m = axis_min3(m, 0, 1, r_iota, R)
        m = axis_min3(m, 0, R, a_iota, rows_a)
        tot = jnp.minimum(tot, jnp.where(occ, m, inf))
        tot = occ_run_scan(tot, 1, 1, lane, S_pad)
        tot = occ_run_scan(tot, 0, 1, r_iota, R)
        tot = occ_run_scan(tot, 0, R, a_iota, rows_a)
        return tot

    def one_iter(lab):
        tot = jnp.where(occ, lab, inf)

        # --- cheb 2..search_c shells: intensity-gated union edges.
        # The shell (98 offsets at search_c=2) dominates the per-round
        # cost, so it runs ONCE per round while the cheap cheb-1
        # propagation repeats `cc_reps` times - CC structure converges in
        # fewer (expensive) outer rounds that way.
        if enable_shell:
            qual_v = (enc & (1 << 21)) != 0
            for ds in range(-pad_r, pad_r + 1):
                if ds > 0:
                    lane_bad = lane >= S_pad - ds
                elif ds < 0:
                    lane_bad = lane < -ds
                else:
                    lane_bad = lane < 0  # all-false
                for da in range(-pad_r, pad_r + 1):
                    for dr in range(-pad_r, pad_r + 1):
                        if max(abs(da), abs(dr), abs(ds)) < 2:
                            continue  # cheb-1 handled separably above
                        off = da * R + dr

                        def sh2(x):
                            y = _roll(x, -ds, 1) if ds else x
                            return _roll(y, -off, 0) if off else y

                        nb_lab = sh2(lab)
                        nb_enc = sh2(enc)
                        nb_occ = nb_enc >= (1 << 22)
                        nb_qual = (nb_enc & (1 << 21)) != 0
                        close = (jnp.abs(av_q - (nb_enc & _AV_MASK))
                                 <= av_diff_q)
                        # pull: edge centred at v (neighbour variance,
                        # radius at v's range index)
                        ok = nb_qual & (r_iota <= far_range_bin)
                        # push folded into the opposite offset: edge
                        # centred at n (centre variance, radius at n)
                        ok = ok | (qual_v & (r_iota <= far_range_bin - dr))
                        # the destination-occupancy gate is LOAD-BEARING:
                        # an ungated write would park a label on an empty
                        # cell, and the cheb-1 sweep below would conduit
                        # it into occupied neighbours - a false edge at
                        # cheb 3-4 with no intensity gate between them
                        ok = ok & occ & nb_occ & close
                        if dr >= 1:
                            ok = ok & (r_iota < R - dr)
                        elif dr <= -1:
                            ok = ok & (r_iota >= -dr)
                        # azimuth boundary guard: pltpu.roll wraps
                        # circularly over the scratch slab axis, and on
                        # multi-tile grids both scratch edges are REAL
                        # halo slabs - without this mask a wrapped
                        # neighbour ~(AB+2H) slabs away could form a
                        # false union edge that the run scans below
                        # propagate into the tile interior
                        if da >= 1:
                            ok = ok & (a_iota < rows_a - da)
                        elif da <= -1:
                            ok = ok & (a_iota >= -da)
                        ok = ok & ~lane_bad
                        tot = jnp.minimum(tot, jnp.where(ok, nb_lab, inf))

        # --- cheb-1 propagation sweeps (cheap relative to the shell)
        for _ in range(cc_reps):
            tot = cc_sweep(tot)
        return jnp.where(occ, tot, lab)

    lab = jax.lax.fori_loop(0, local_iters, lambda k, l: one_iter(l), lab0)

    lo = H * R
    hi = lo + AB * R
    interior = lab[lo:hi]
    lab_out[:] = interior
    changed_out[i] = jnp.sum((interior != lab0[lo:hi]).astype(jnp.int32))


def cluster_labels_pallas(occupied3: jnp.ndarray,
                          intensity_mean: jnp.ndarray,
                          intensity_var: jnp.ndarray,
                          search_c: int, intensity_cov: float,
                          intensity_diff: float, far_range_frac: float,
                          enable_shell: bool = True,
                          max_outer: int = 32,
                          local_iters: int = 1,
                          cc_reps: int = 1,
                          ab: int = 20,
                          return_iters: bool = False,
                          interpret: bool = False) -> jnp.ndarray:
    # NB cc_reps > 2 at full grid size with ab=20 overflows the v5e
    # scoped-VMEM budget (117 MB live temporaries vs the 106 MB limit,
    # measured) and buys < 2 ms - one cheb-1 sweep per round is the
    # shipping config; `ab` (azimuth slabs per tile) trades VMEM
    # pressure for grid-step count.
    """Fused CVC + RI3 labels: [A,R,S] occupancy (+ per-voxel intensity
    stats) -> [G] int32 min-original-flat-id component labels under the
    union graph (empty cells hold their own flat id).

    Drop-in equivalent of
        ri3.refine_by_intensity_pallas(cc.connected_components_pallas(occ),
                                       ...)
    and, with enable_shell=False, of cc.connected_components_pallas alone.
    """
    A, R, S = occupied3.shape
    G = A * R * S
    S_pad = _round_up(S, 128)
    H = max(2, search_c) * local_iters
    AB = min(A, ab)
    n_tiles = -(-A // AB)
    A_pad = n_tiles * AB + 2 * H
    inf = jnp.iinfo(jnp.int32).max // 2
    far_bin = int(R * far_range_frac)

    occ = occupied3
    qual3 = occ & (intensity_var.reshape(A, R, S) <= intensity_cov)

    def pad_rows(x3, fill):
        out = jnp.full((A_pad, R, S_pad), fill, x3.dtype)
        return out.at[H:H + A, :, :S].set(x3).reshape(A_pad * R, S_pad)

    # initial labels: padded flat id ((a+H)*R + r)*S_pad + s - strictly
    # monotone in (a, r, s), so component minima map back to the original
    # min-flat-id (cc_kernel.py's contract)
    own = jax.lax.broadcasted_iota(jnp.int32, (A_pad * R, S_pad), 0) * S_pad \
        + jax.lax.broadcasted_iota(jnp.int32, (A_pad * R, S_pad), 1)
    occ_rows = pad_rows(occ, False)
    lab0 = jnp.where(occ_rows, own, inf)

    av_q3 = jnp.clip(jnp.round(intensity_mean.reshape(A, R, S) * _AV_SCALE),
                     0, _AV_MASK).astype(jnp.int32)
    enc3 = jnp.where(occ, (1 << 22) + qual3.astype(jnp.int32) * (1 << 21)
                     + av_q3, 0)
    enc_rows = pad_rows(enc3, 0)
    av_diff_q = int(round(intensity_diff * _AV_SCALE))

    kernel = functools.partial(
        _fused_tile_kernel, R=R, S_pad=S_pad, AB=AB, H=H,
        local_iters=local_iters, cc_reps=cc_reps, inf=inf,
        pad_r=max(2, search_c),
        far_range_bin=far_bin, av_diff_q=av_diff_q,
        enable_shell=enable_shell and search_c >= 2)
    tile_rows = (AB + 2 * H) * R

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
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
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def body(state):
        lab, _, it = state
        new_interior, changed = call(lab, enc_rows)
        new = lab.at[H * R:(H + n_tiles * AB) * R].set(new_interior)
        return new, jnp.sum(changed), it + 1

    lab, _, n_it = jax.lax.while_loop(
        lambda s: (s[1] > 0) & (s[2] < max_outer), body,
        (lab0, jnp.ones((), jnp.int32), jnp.zeros((), jnp.int32)))

    # un-pad; padded ids back to original flat ids
    lab3 = lab.reshape(A_pad, R, S_pad)[H:H + A, :, :S]
    t = lab3 // S_pad
    s = lab3 % S_pad
    a = t // R - H
    r = t % R
    orig = (a * R + r) * S + s
    own_orig = jnp.arange(G, dtype=jnp.int32)
    out = jnp.where(occ.reshape(-1), orig.reshape(-1), own_orig)
    if return_iters:
        return out, n_it
    return out
