"""Benchmark: full dynamic-removal pipeline throughput, ms per frame.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} on stdout.
Everything else (per-stage device timings, odometry throughput, roofline
estimates) goes to stderr.

Baseline: the reference C++ pipeline logs 213.67 ms/frame on SemanticKITTI
seq 00 (doc/note.txt:2, 8-core desktop CPU; BASELINE.md). The dataset is
not available in this environment, so the bench runs synthetic scans of
comparable size (~75k raw points -> ~130k cap) through the identical
pipeline stages (ground seg + curved-voxel build + clustering + RI3 +
recognition + tracking pair). vs_baseline = reference_ms / our_ms
(higher is better).

Measurement discipline: repetitions run INSIDE one jit (a production
pipeline streams scans with data resident on device), and every rep's
input depends on the previous rep's OUTPUT (a 1e-30-scaled carry term), so
XLA's loop-invariant code motion cannot hoist the body out of the loop -
each rep genuinely recomputes the pipeline. Per-call tunnel dispatch
overhead (~1 s of host<->device transfer per call on the axon relay) is
excluded by construction. NB: on this platform block_until_ready does not
synchronize - only a host fetch does.
"""

import json
import sys
import time

import numpy as np

REPS = 3
BASELINE_MS = 213.67  # doc/note.txt:2 (seq 00, full method)

# peak specs per TPU generation for roofline estimates (public numbers;
# bf16 peak TFLOP/s, HBM TB/s). Unknown kinds fall back to None -> no MFU.
# "TPU v5 lite" is the PJRT device_kind string v5e chips report.
_PEAKS = {
    "TPU v4": (275.0, 1.2),
    "TPU v5 lite": (197.0, 0.82),
    "TPU v5e": (197.0, 0.82),
    "TPU v5p": (459.0, 2.77),
    "TPU v6e": (918.0, 1.64),
}


def _loop(fn, n, *args):
    """Build a jitted n-rep loop of fn whose body is NOT loop-invariant:
    each rep's first input is perturbed by 1e-30 * (previous output sum),
    far below f32 resolution of the coordinates yet opaque to XLA."""
    import jax
    import jax.numpy as jnp

    def run(*a):
        def body(_, acc):
            out = fn(a[0] + 1e-30 * acc, *a[1:])
            leaves = [jnp.sum(x.astype(jnp.float32)) for x in
                      jax.tree.leaves(out) if jnp.issubdtype(
                          jnp.asarray(x).dtype, jnp.number)]
            # the carry GENUINELY depends on the output (scaled so the
            # perturbation stays ~1e-40, far below f32 input resolution)
            return acc + 1.0 + 1e-20 * jnp.sum(jnp.stack(leaves))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    return jax.jit(run)


def _time(jfn, *args):
    """Compile, warm, then time one call (host fetch = sync)."""
    np.asarray(jfn(*args))
    t0 = time.perf_counter()
    np.asarray(jfn(*args))
    return time.perf_counter() - t0


def _cost(fn, *args):
    """XLA cost analysis (flops, bytes) of a SINGLE-call jit.

    NB: cost must be read off the plain jitted function - wrapping the
    body in the rep fori_loop hides its cost from XLA's analysis (the
    round-2 bench reported 0 flops for exactly that reason).
    """
    import jax
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0)), \
            float(c.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def main():
    import jax
    # persistent compilation cache: the full pipeline takes ~20 min to
    # compile through the remote TPU compiler; cached executables load in
    # seconds on subsequent runs
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from dr_using_scv_od_tpu import config
    from dr_using_scv_od_tpu.models import odometry, pipeline
    from dr_using_scv_od_tpu.utils import synthetic

    cfg = config.semantickitti()
    scene = synthetic.make_scene()
    F = 6
    win = synthetic.render_window(scene, F, cfg.shapes.max_points)
    xyz = jnp.asarray(win["xyz"])
    inten = jnp.asarray(win["intensity"])
    valid = jnp.asarray(win["valid"])
    poses = jnp.asarray(win["poses"])

    err = lambda *a: print(*a, file=sys.stderr)

    # ---- headline: full removal pipeline, ms/frame
    run = _loop(lambda x, i, v, p: pipeline.run_window(x, i, v, p, cfg),
                REPS, xyz, inten, valid, poses)
    dt = _time(run, xyz, inten, valid, poses)
    ms_per_frame = dt / REPS / F * 1000.0

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    peaks = next((v for k, v in _PEAKS.items() if k in str(kind)), None)

    # ---- per-stage device timings + roofline (each stage timed as its
    # own rep loop; flops/bytes read off the stage's SINGLE-call compile,
    # where XLA's cost model actually reports them)
    try:
        from dr_using_scv_od_tpu.models import (patchwork, recognition,
                                                segmentation, tracking)

        x0, i0, v0, p0 = xyz[0], inten[0], valid[0], poses[0]
        stages = []

        def stage(name, fn, *args, per_frame=1):
            t = _time(_loop(fn, REPS, *args), *args) / REPS / per_frame
            fl, by = _cost(fn, *args)
            stages.append((name, t, fl / per_frame, by / per_frame))
            return t

        stage("patchwork",
              lambda x, v: patchwork.estimate_ground(x, v, cfg.patchwork),
              x0, v0)
        pw = jax.jit(lambda x, v: patchwork.estimate_ground(
            x, v, cfg.patchwork))(x0, v0)
        stage("segment",
              lambda x, i, ng, g, d: segmentation.segment_frame(
                  x, i, ng, g, d, cfg),
              x0, i0, pw.nonground, pw.ground, pw.dropped)
        seg, point_voxel, vgrid = jax.jit(
            lambda x, i, ng, g, d: segmentation.segment_frame(
                x, i, ng, g, d, cfg))(x0, i0, pw.nonground, pw.ground,
                                      pw.dropped)
        stage("recognize",
              lambda x, pc, pv: recognition.recognize(
                  seg.clusters, x, pc, pv, cfg,
                  label_grid=seg.label_grid, voxel_count=vgrid.count),
              x0, seg.point_cluster, point_voxel)
        frames = jax.jit(lambda *a: pipeline.process_window(*a, cfg))(
            xyz, inten, valid, poses)
        in_grid = frames.state.point_voxel >= 0
        stage("tracking",
              lambda x, pv, pva, lg, po: tracking.track_window(
                  x, pv, pva, lg, frames.state.clusters, po, cfg),
              xyz, frames.state.point_voxel, in_grid & valid,
              frames.state.label_grid, poses, per_frame=F)

        tot_t = sum(s[1] for s in stages)
        tot_fl = sum(s[2] for s in stages)
        tot_by = sum(s[3] for s in stages)
        err(f"[stages ms/frame] "
            + "  ".join(f"{n}={t * 1e3:.2f}" for n, t, _, _ in stages)
            + f"  (sum={tot_t * 1e3:.2f}, e2e={ms_per_frame:.2f})")
        for n, t, fl, by in stages:
            line = (f"[roofline] {n:<10} {fl / t / 1e12:6.2f} TFLOP/s  "
                    f"{by / t / 1e12:6.3f} TB/s")
            if peaks:
                line += (f"  MFU {100 * fl / t / 1e12 / peaks[0]:5.2f}%  "
                         f"HBM {100 * by / t / 1e12 / peaks[1]:5.1f}%")
            err(line)
        line = (f"[roofline] device={kind}  pipeline total "
                f"{tot_fl / tot_t / 1e12:.2f} TFLOP/s, "
                f"{tot_by / tot_t / 1e12:.3f} TB/s (XLA cost model, "
                f"per-stage compiles)")
        if peaks:
            line += (f"  -> MFU {100 * tot_fl / tot_t / 1e12 / peaks[0]:.2f}%"
                     f", HBM util {100 * tot_by / tot_t / 1e12 / peaks[1]:.1f}%")
        err(line)

        # cross-check one stage's flops by hand: patchwork's dominant cost
        # is its one-hot moment/histogram matmuls (models/patchwork.py) -
        # 2*P*N per output column: 10 moment cols x num_iter fits + 2*NB
        # histogram cols + 1 count col.
        P = cfg.patchwork.num_patches
        N = cfg.shapes.max_points
        cols = 10 * cfg.patchwork.num_iter + 2 * 128 + 1
        hand = 2.0 * P * N * cols
        xla_pw = stages[0][2]
        err(f"[roofline] hand-check patchwork matmul flops: "
            f"{hand / 1e9:.2f} GFLOP vs XLA total {xla_pw / 1e9:.2f} GFLOP "
            f"(matmuls should dominate; ratio {xla_pw / hand:.2f}x)")
    except Exception as e:  # stage breakdown must never kill the bench
        err(f"[stages] breakdown failed: {type(e).__name__}: {e}")

    # ---- secondary metric: GICP scan-to-scan odometry throughput
    try:
        t_odo = _time(_loop(
            lambda x, v: odometry.estimate_window_poses(x, v, cfg),
            REPS, xyz, valid), xyz, valid) / REPS / (F - 1)
        err(f"[odometry] {t_odo * 1e3:.2f} ms/frame (scan-to-scan GICP)")
    except Exception as e:
        err(f"[odometry] failed: {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "dynamic_removal_ms_per_frame",
        "value": round(ms_per_frame, 3),
        "unit": "ms/frame",
        "vs_baseline": round(BASELINE_MS / ms_per_frame, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
