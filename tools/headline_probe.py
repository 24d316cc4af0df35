"""Re-measure ONLY the bench headline (pipeline ms/frame) cheaply.

Replicates bench.py's headline section bit-for-bit (same shapes, same
rep-loop, same REPS) so the jit hits the persistent compilation cache
warmed by a prior full `bench.py` run and the measurement costs seconds,
not a ~20-minute remote compile. Use after a hot-path freeze to confirm
the number of record without re-running the whole bench.

Usage: python tools/headline_probe.py [--reps N]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=None,
                    help="override bench.REPS (default: same as bench.py)")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import bench

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from dr_using_scv_od_tpu import config
    from dr_using_scv_od_tpu.models import pipeline
    from dr_using_scv_od_tpu.utils import synthetic

    reps = args.reps or bench.REPS
    cfg = config.semantickitti()
    scene = synthetic.make_scene()
    F = 6
    win = synthetic.render_window(scene, F, cfg.shapes.max_points)
    xyz = jnp.asarray(win["xyz"])
    inten = jnp.asarray(win["intensity"])
    valid = jnp.asarray(win["valid"])
    poses = jnp.asarray(win["poses"])

    run = bench._loop(lambda x, i, v, p: pipeline.run_window(x, i, v, p, cfg),
                      reps, xyz, inten, valid, poses)
    t0 = time.perf_counter()
    np.asarray(run(xyz, inten, valid, poses))      # compile/cache-load + warm
    print(f"[probe] warm call (incl. cache load): "
          f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
    best = min(bench._time(run, xyz, inten, valid, poses) for _ in range(3))
    ms = best / reps / F * 1000.0
    print(f"[probe] pipeline {ms:.2f} ms/frame "
          f"({reps} reps, best of 3 timed calls, "
          f"vs_baseline {bench.BASELINE_MS / ms:.2f}x)")


if __name__ == "__main__":
    main()
