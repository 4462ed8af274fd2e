"""Post-BA quality distribution on the ORACLE feature path (perfect
association, projected keypoints + small noise): discriminates whether
the 5-8 px post-solve reprojection plateau seen on rendered imagery is
frontend-specific (KLT drift) or estimation-wide."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pvio_tpu import Config
from pvio_tpu.core.frontend_worker import FrontendWorker
from pvio_tpu.core.kernels import DeviceKernels
from pvio_tpu.io import synthetic

cfg = Config()
cfg.camera_intrinsic = np.array([200.0, 200.0, 160.0, 120.0])
cfg.image_size = (320, 240)
cfg.sliding_window_size = 6
cfg.window_frame_capacity = 7
cfg.track_capacity = 96
cfg.feature_tracker_max_keypoint_detection = 60
cfg.feature_tracker_min_keypoint_distance = 12.0
cfg.initializer_keyframe_gap = 4
cfg.initializer_min_matches = 20
cfg.initializer_min_parallax = 5.0
cfg.initializer_min_triangulation = 15
cfg.initializer_min_landmarks = 15
cfg.keyframe_min_common_tracks = 20
cfg.keyframe_parallax_px = 25.0
cfg.solver_iteration_limit = 8
cfg.dtype = "float64"
cfg.enable_plane_constraint = False
cfg.imu_buffer_capacity = 64

scene = synthetic.make_scene(duration=4.0, fps=20.0, imu_rate=200.0,
                             n_points=320, seed=648)
kern = DeviceKernels(cfg)

_orig_ba_step = kern.ba_step


def traced_ba_step(w_in, *args):
    w_out, info, xw, tri = _orig_ba_step(w_in, *args)
    tm = np.array(w_in.track_mask)
    vo = tm & ((np.array(w_out.track_flags) & 3) != 0)
    qual = np.array(w_out.quality)
    if vo.any():
        print(f"  [ba qual] valid_out={int(vo.sum())} qual p50/p90/max = "
              f"{np.percentile(qual[vo], [50, 90, 100]).round(2)} "
              f">3px: {int((qual[vo] > 3.0).sum())} "
              f"cost {float(info['initial_cost']):.3g}->"
              f"{float(info['final_cost']):.3g} "
              f"acc={int(info['accepted'])}", flush=True)
    return w_out, info, xw, tri


kern.ba_step = traced_ba_step

oracle = synthetic.OracleFeatureSource(
    scene, cfg.K, cfg.image_size,
    max_keypoints=cfg.feature_tracker_max_keypoint_detection, kp_noise_px=0.3)
fw = FrontendWorker(cfg, kern, oracle)
for fi in range(len(scene.frame_t)):
    t = scene.frame_t[fi]
    sel = (scene.imu_t <= t) if fi == 0 else (
        (scene.imu_t >= scene.frame_t[fi - 1]) & (scene.imu_t < t))
    rf = oracle.make_frame(fi, fi, scene.imu_t[sel], scene.gyro[sel],
                           scene.accel[sel])
    fw.issue_frame(rf)
print("init:", fw.initialized, "reinits:", fw.n_reinits)
