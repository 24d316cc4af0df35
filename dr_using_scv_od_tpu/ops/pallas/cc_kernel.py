"""Pallas TPU kernel: connected components on the curved-voxel grid.

The XLA formulation of CC label propagation (ops/clustering.py) spends
~110 ms/frame shuffling 5 MB grid arrays through HBM for every of its
O(diameter) iterations. This kernel keeps a tile of the grid resident in
VMEM and performs LOCAL_ITERS full propagation steps per HBM round trip,
each step combining:

  * a segmented min-scan along the sector axis (lanes): log2(S) strided
    rolls spread a label across an entire occupied run per step;
  * a 3x3 neighbourhood min over (azimuth, range) row offsets, with the
    +-1 sector tolerance folded in, i.e. the full 26-connectivity hop.

Tiling: the grid [A, R, S] flattens to rows (a*R + r) x lanes (sector,
padded to a 128 multiple). Tiles cover AB azimuth slabs plus H = LOCAL_ITERS
halo slabs on each side, so tile interiors are exact after LOCAL_ITERS
in-VMEM iterations (information crosses at most one slab per iteration).
Scratch rolls over the azimuth slab axis are circular, and on multi-tile
grids both scratch edges are REAL halo slabs, so every azimuth offset and
scan carries an explicit a-coordinate boundary mask. The outer convergence
loop lives in XLA and re-invokes the kernel until no label changes.

Labels use the PADDED flat id ((a+H)*R + r)*S_pad + s during iteration -
strictly monotone in (a, r, s), so the component minimum maps back to the
same voxel as the original-id minimum demanded by the
`connected_components` contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative shifts normalized (it requires shift >= 0)."""
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


def _cc_tile_kernel(occ_hbm, lab_hbm, lab_out, changed_out,
                    occ_s, lab_s, sem,
                    *, R: int, S_pad: int, AB: int, H: int,
                    local_iters: int, inf: int):
    i = pl.program_id(0)
    tile_rows = (AB + 2 * H) * R
    row0 = i * AB * R  # start in the padded array (halo begins here)

    cp1 = pltpu.make_async_copy(
        occ_hbm.at[pl.ds(row0, tile_rows), :], occ_s, sem)
    cp1.start()
    cp1.wait()
    cp2 = pltpu.make_async_copy(
        lab_hbm.at[pl.ds(row0, tile_rows), :], lab_s, sem)
    cp2.start()
    cp2.wait()

    occ = occ_s[:] != 0
    lab0 = lab_s[:]
    lab = jnp.where(occ, lab0, inf)

    rows_a = tile_rows // R  # azimuth slabs in the tile (incl. halo)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, S_pad), 0)
    r_iota = row_iota % R
    a_iota = row_iota // R
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, S_pad), 1)
    n_scan = max(1, (S_pad - 1).bit_length())

    def seg_scan(v, reverse: bool):
        """Segmented min-scan along lanes; empty cells break runs."""
        f = (~occ).astype(jnp.int32)
        for k in range(n_scan):
            stride = 1 << k
            if reverse:
                v_sh = _roll(v, -stride, 1)
                f_sh = _roll(f, -stride, 1)
                oob = lane >= S_pad - stride
            else:
                v_sh = _roll(v, stride, 1)
                f_sh = _roll(f, stride, 1)
                oob = lane < stride
            v_sh = jnp.where(oob, inf, v_sh)
            f_sh = jnp.where(oob, 1, f_sh)
            v = jnp.where(f > 0, v, jnp.minimum(v, v_sh))
            f = f | f_sh
        return v

    def seg_scan_rows(v, axis_iota, axis_len: int, stride_rows: int):
        """Segmented min-scan along a ROW axis (range: stride 1, azimuth:
        stride R); runs break at empty cells and axis boundaries. Spreads
        a label across a whole occupied run (wall) in log2 steps instead
        of one cell per iteration - the sector scan's row-space sibling."""
        n = max(1, (axis_len - 1).bit_length())
        out = v
        for reverse in (False, True):
            vv = v
            f = (~occ).astype(jnp.int32)
            for k in range(n):
                step = 1 << k
                s = stride_rows * step
                if reverse:
                    v_sh = _roll(vv, -s, 0)
                    f_sh = _roll(f, -s, 0)
                    oob = axis_iota >= axis_len - step
                else:
                    v_sh = _roll(vv, s, 0)
                    f_sh = _roll(f, s, 0)
                    oob = axis_iota < step
                v_sh = jnp.where(oob, inf, v_sh)
                f_sh = jnp.where(oob, 1, f_sh)
                vv = jnp.where(f > 0, vv, jnp.minimum(vv, v_sh))
                f = f | f_sh
            out = jnp.minimum(out, vv)
        return out

    def one_iter(lab):
        m = jnp.minimum(seg_scan(lab, False), seg_scan(lab, True))
        # +-1 sector tolerance for diagonal hops
        left = jnp.where(lane < 1, inf, _roll(m, 1, 1))
        right = jnp.where(lane >= S_pad - 1, inf, _roll(m, -1, 1))
        m3 = jnp.minimum(m, jnp.minimum(left, right))
        tot = m3
        for da in (-1, 0, 1):
            for dr in (-1, 0, 1):
                if da == 0 and dr == 0:
                    continue
                off = da * R + dr
                sh = _roll(m3, -off, 0)
                if dr == 1:
                    sh = jnp.where(r_iota == R - 1, inf, sh)
                elif dr == -1:
                    sh = jnp.where(r_iota == 0, inf, sh)
                # azimuth wrap guard: the roll is circular over the
                # scratch, and on multi-tile grids the scratch-edge
                # slabs are REAL halo voxels, not empty padding
                if da == 1:
                    sh = jnp.where(a_iota == rows_a - 1, inf, sh)
                elif da == -1:
                    sh = jnp.where(a_iota == 0, inf, sh)
                tot = jnp.minimum(tot, sh)
        tot = jnp.where(occ, jnp.minimum(lab, tot), inf)
        # log-depth propagation along occupied RANGE and AZIMUTH runs
        # (walls/trunks are contiguous there; without these scans a label
        # crosses one azimuth slab per iteration and big components need
        # ~4 outer HBM rounds to settle)
        tot = seg_scan_rows(tot, r_iota, R, 1)
        tot = seg_scan_rows(tot, a_iota, rows_a, R)
        return jnp.where(occ, tot, inf)

    lab = jax.lax.fori_loop(0, local_iters, lambda k, l: one_iter(l), lab)

    final = jnp.where(occ, lab, lab0)
    # write back the interior rows only
    lo = H * R
    hi = lo + AB * R
    interior = final[lo:hi]
    lab_out[:] = interior
    changed_out[i] = jnp.sum(
        (interior != lab0[lo:hi]).astype(jnp.int32))


def connected_components_pallas(occupied: jnp.ndarray,
                                max_outer: int = 64,
                                ab: int = 20,
                                interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.clustering.connected_components:
    [A,R,S] bool -> [G] int32 min-original-flat-id labels (empty cells hold
    their own flat id)."""
    A, R, S = occupied.shape
    G = A * R * S
    S_pad = _round_up(S, 128)
    # With the in-tile range/azimuth run-scans a label crosses whole
    # occupied runs per local iteration; the remaining slow mode is
    # diagonal (non-axis-run) propagation at one cheb-hop per iteration,
    # so keep a few local iters per HBM round for blobby/sloped shapes
    local_iters = 4
    H = 4
    AB = min(A, ab)
    n_tiles = -(-A // AB)
    A_pad = n_tiles * AB + 2 * H
    inf = jnp.iinfo(jnp.int32).max // 2

    # padded occupancy rows [(A_pad)*R, S_pad]
    occ_p = jnp.zeros((A_pad, R, S_pad), bool)
    occ_p = occ_p.at[H:H + A, :, :S].set(occupied)
    occ_rows = occ_p.reshape(A_pad * R, S_pad).astype(jnp.int32)

    # initial labels: padded flat id
    own = jax.lax.broadcasted_iota(jnp.int32, (A_pad * R, S_pad), 0) * S_pad \
        + jax.lax.broadcasted_iota(jnp.int32, (A_pad * R, S_pad), 1)
    lab0 = jnp.where(occ_rows != 0, own, inf)

    kernel = functools.partial(_cc_tile_kernel, R=R, S_pad=S_pad, AB=AB,
                               H=H, local_iters=local_iters, inf=inf)
    tile_rows = (AB + 2 * H) * R

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
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
        new_interior, changed = call(occ_rows, lab)
        new = lab.at[H * R:(H + n_tiles * AB) * R].set(new_interior)
        return new, jnp.sum(changed), it + 1

    def cond(state):
        _, changed, it = state
        return (changed > 0) & (it < max_outer)

    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab0, jnp.ones((), jnp.int32), jnp.zeros((), jnp.int32)))

    # un-pad and convert padded ids back to original flat ids
    lab3 = lab.reshape(A_pad, R, S_pad)[H:H + A, :, :S]
    t = lab3 // S_pad            # padded row = (a + H) * R + r
    s = lab3 % S_pad
    a = t // R - H
    r = t % R
    orig = (a * R + r) * S + s
    own_orig = jnp.arange(G, dtype=jnp.int32)
    flat = jnp.where(occupied.reshape(-1), orig.reshape(-1), own_orig)
    return flat
