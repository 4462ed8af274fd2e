"""Calibrate the adoption-gate regression net (clean + noisy regimes)."""
import os
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax.numpy as jnp
from test_planes import plane_config, make_host_window
from pvio_tpu.io import synthetic
from pvio_tpu.core.kernels import DeviceKernels
from pvio_tpu.core.plane_extractor import PlaneExtractor
from pvio_tpu.map.window import TF_PLANE, TF_VALID
from pvio_tpu.map import window as win

scene = synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                             n_points=60, n_plane_points=130,
                             plane_z=4.6, seed=648)
kf = [0, 4, 8, 12, 16, 20]


def regime(kp_noise_px, retriangulate):
    cfg = plane_config()
    hw, extr, info = make_host_window(scene, cfg, kf)
    kern = DeviceKernels(cfg)
    if kp_noise_px > 0:
        rng = np.random.default_rng(7)
        f = 200.0
        hw.kp = hw.kp + rng.normal(size=hw.kp.shape) * (kp_noise_px / f)
        cfg.camera_noise_cov = np.eye(2) * kp_noise_px ** 2
    if retriangulate:
        pts, inv_d, ok = [np.asarray(a) for a in
                          win.triangulate_tracks(hw.to_device(), kern.extr)]
        upd = ok.astype(bool) & hw.track_mask
        hw.inv_depth[upd] = inv_d[upd]
    pe = PlaneExtractor(cfg, kern)
    pe.update_map(hw)
    assert hw.plane_mask.sum() == 1
    s = int(np.nonzero(hw.plane_mask)[0][0])
    members = ((hw.plane_id == s) & hw.track_mask
               & ((hw.track_flags & TF_PLANE) != 0))
    # unflag every other member -> they become candidates again
    unflag = np.nonzero(members)[0][::2]
    for c in unflag:
        hw.track_flags[c] &= ~TF_PLANE
        hw.plane_id[c] = -1
    before = (hw.track_flags & TF_PLANE) != 0
    pe.extend_planes(hw)
    adopted = ((hw.track_flags & TF_PLANE) != 0) & ~before
    chosen = info["chosen"]
    true_on = np.array([scene.plane_of_point[chosen[c]] == 0
                        for c in range(info["n_tracks"])])
    readopt = adopted[unflag].sum()
    wrong = (adopted & ~true_on).sum()
    print(f"noise={kp_noise_px}px: members={members.sum()}, unflagged="
          f"{len(unflag)}, re-adopted={readopt} "
          f"({readopt/len(unflag):.0%}), wrong adoptions={wrong}, "
          f"total adopted={adopted.sum()}")
    return readopt / len(unflag), wrong


print("CLEAN:"); regime(0.0, False)
print("NOISY 2px:"); regime(2.0, True)
print("NOISY 3px:"); regime(3.0, True)
