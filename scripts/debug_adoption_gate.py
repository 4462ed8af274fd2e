"""Diagnose the adoption sigma gate: distribution of off-plane distances
vs the computed thresholds for genuine plane tracks on the clean oracle
scene (the regime where test_pipeline_with_planes starves)."""
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

from test_planes import plane_config, make_host_window
from pvio_tpu.io import synthetic
from pvio_tpu.core.kernels import DeviceKernels
from pvio_tpu.core.plane_extractor import PlaneExtractor
from pvio_tpu.map.window import TF_PLANE, TF_VALID
from pvio_tpu.geometry import nplie

scene = synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                             n_points=60, n_plane_points=130,
                             plane_z=4.6, seed=648)
cfg = plane_config()
kf = [0, 4, 8, 12, 16, 20]
hw, extr, info = make_host_window(scene, cfg, kf)
kern = DeviceKernels(cfg)
pe = PlaneExtractor(cfg, kern)
pe.update_map(hw)
s = int(np.nonzero(hw.plane_mask)[0][0])
members = ((hw.plane_id == s) & hw.track_mask
           & ((hw.track_flags & TF_PLANE) != 0))
print("detected members:", members.sum())

# un-flag 60% of members -> candidates extend_planes must re-adopt
mem_idx = np.nonzero(members)[0]
unflag = mem_idx[::5 * 0 + 2]  # every other
for c in unflag:
    hw.track_flags[c] &= ~TF_PLANE
    hw.plane_id[c] = -1
print("unflagged (should be re-adopted):", len(unflag))

chosen = info["chosen"]
true_on = np.array([scene.plane_of_point[chosen[c]] == 0
                    for c in range(info["n_tracks"])])

# now replicate the gate internals
pts = pe._landmarks(hw)
n = hw.plane_normal[s]
d = hw.plane_distance[s]
cand = hw.track_mask & ((hw.track_flags & TF_VALID) != 0) & ((hw.track_flags & TF_PLANE) == 0)
cols = np.nonzero(cand)[0]
off = np.abs(pts[cols] @ n - d)
K = cfg.K
f_px = float(0.5 * (K[0, 0] + K[1, 1]))
sigma = float(np.sqrt(np.mean(np.diag(cfg.camera_noise_cov))))
z = 1.0 / np.maximum(np.abs(hw.inv_depth[cols]), 1e-6)
base_c = pe._baseline(hw, pts)[cols]
ang = sigma / f_px
sig_z = ang * z * z / np.maximum(base_c, 1e-3)
n_obs = (hw.obs_mask[:, cols] & hw.frame_mask[:, None]).sum(axis=0)
red = 1.0 / np.sqrt(np.maximum(n_obs - 1, 1).astype(float))
# assume c2=1 bound
sigma_pl = red * sig_z
thresh = np.minimum(0.1, np.maximum(0.005, 3.0 * sigma_pl))
on = true_on[cols]
print(f"candidates: {len(cols)} ({on.sum()} truly on-plane)")
print("ON-PLANE  off: ", np.percentile(off[on], [10, 50, 90]) if on.any() else "-")
print("ON-PLANE  thr: ", np.percentile(thresh[on], [10, 50, 90]) if on.any() else "-")
print("ON-PLANE  pass:", (off[on] <= thresh[on]).mean() if on.any() else "-")
print("OFF-PLANE off: ", np.percentile(off[~on], [10, 50, 90]) if (~on).any() else "-")
print("OFF-PLANE thr: ", np.percentile(thresh[~on], [10, 50, 90]) if (~on).any() else "-")
print("OFF-PLANE pass:", (off[~on] <= thresh[~on]).mean() if (~on).any() else "-")
print("sig_z on-plane percentiles:", np.percentile(sig_z[on], [10, 50, 90]))
print("baseline on-plane:", np.percentile(base_c[on], [10, 50, 90]))
print("z on-plane:", np.percentile(z[on], [10, 50, 90]))
print("n_obs on-plane:", np.percentile(n_obs[on], [10, 50, 90]))

before = (hw.track_flags & TF_PLANE) != 0
pe.extend_planes(hw)
adopted = ((hw.track_flags & TF_PLANE) != 0) & ~before
print("extend_planes adopted:", adopted.sum(), "of", len(unflag), "unflagged on-plane")
print("wrong adoptions:", (adopted & ~true_on).sum())
