"""End-to-end synthetic drive (CPU): full removal pipeline -> PR/RR.

The /verify drive recipe as a script: render a synthetic labeled window,
run the full pipeline, report patchwork quality + PR/RR + dynamic counts.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dr_using_scv_od_tpu import config  # noqa: E402
from dr_using_scv_od_tpu.eval import metrics  # noqa: E402
from dr_using_scv_od_tpu.models import patchwork, pipeline  # noqa: E402
from dr_using_scv_od_tpu.utils import synthetic  # noqa: E402


def main():
    cfg = config.semantickitti()
    scene = synthetic.make_scene()
    F = 4
    win = synthetic.render_window(scene, F, cfg.shapes.max_points)
    xyz = jnp.asarray(win["xyz"])
    inten = jnp.asarray(win["intensity"])
    valid = jnp.asarray(win["valid"])
    poses = jnp.asarray(win["poses"])
    labels = np.asarray(win["label"])

    # patchwork quality, frame 0
    pw = jax.jit(lambda x, v: patchwork.estimate_ground(
        x, v, cfg.patchwork))(xyz[0], valid[0])
    g = np.asarray(pw.ground)
    is_gnd = (labels[0] == 40) & np.asarray(valid[0])
    recall = (g & is_gnd).sum() / max(is_gnd.sum(), 1)
    prec = (g & is_gnd).sum() / max(g.sum(), 1)
    print(f"patchwork: recall={recall:.3f} precision={prec:.3f}")
    assert recall > 0.85 and prec > 0.95, "patchwork quality floor"

    res = pipeline.run_window(xyz, inten, valid, poses, cfg)
    removed = np.asarray(res.removed)
    print(f"n_clusters/frame: {np.asarray(res.frames.n_clusters)}")
    print(f"n_dynamic verdicts: {np.asarray(res.n_dynamic)}")
    m = metrics.removal_metrics(
        jnp.asarray(labels[:F - 1].reshape(-1)),
        jnp.asarray(removed[:F - 1].reshape(-1)),
        valid[:F - 1].reshape(-1))
    print(f"PR={m.pr:.2f} RR={m.rr:.2f} F1={m.f1:.4f}")
    assert m.pr > 95.0 and m.rr > 80.0, "pipeline accuracy floor"
    print("E2E DRIVE OK")


if __name__ == "__main__":
    main()
