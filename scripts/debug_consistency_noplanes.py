"""Control: same pipeline, planes fully disabled — is the window's
internal consistency collapse caused by plane factors or by the scene?"""
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

from test_planes import plane_config
from pvio_tpu.io import synthetic
from pvio_tpu.core.kernels import DeviceKernels
from pvio_tpu.core.frontend_worker import FrontendWorker
from pvio_tpu.core.swt import SlidingWindowTracker
from pvio_tpu.map.window import TF_PLANE, TF_VALID
from pvio_tpu.map import window as win

cfg = plane_config()
cfg.initializer_keyframe_gap = 4
cfg.initializer_min_matches = 20
cfg.initializer_min_parallax = 5.0
cfg.initializer_min_triangulation = 15
cfg.initializer_min_landmarks = 15
cfg.keyframe_min_common_tracks = 20
cfg.keyframe_parallax_px = 25.0
cfg.feature_tracker_max_keypoint_detection = 120
import os as _os
cfg.enable_plane_constraint = not _os.environ.get("PLANES_ON")
if _os.environ.get("PLANES_ON") == "2":
    cfg.plane_supplement = True  # only effect here: disables the re-anchor depth refresh
scene = synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                             n_points=60, n_plane_points=130,
                             plane_z=4.6, seed=648)
kern = DeviceKernels(cfg)
oracle = synthetic.OracleFeatureSource(
    scene, cfg.K, cfg.image_size, max_keypoints=120, kp_noise_px=0.3)

from pvio_tpu.core.plane_extractor import PlaneExtractor as _PE
fw = FrontendWorker(cfg, kern, oracle, plane_extractor_factory=(lambda: _PE(cfg, kern)) if _os.environ.get("PLANES_ON") else None)

from pvio_tpu.core.plane_extractor import PlaneExtractor as PE


def consistency(hw, kern):
    w_dev = hw.to_device()
    ptsF, invF, okF = [np.asarray(a) for a in
                       win.triangulate_tracks(w_dev, kern.extr)]
    pe = PE.__new__(PE)
    pe.cfg = cfg
    vcols = np.nonzero(hw.track_mask & ((hw.track_flags & TF_VALID) != 0))[0]
    rpeF = PE._rpe_batch(pe, hw, ptsF[vcols][:, None, :], cols=vcols)[:, 0]
    okv = okF[vcols].astype(bool) & np.isfinite(rpeF)
    if okv.any():
        return float(np.percentile(rpeF[okv], 50)), float(np.percentile(rpeF[okv], 90))
    return -1.0, -1.0


orig_track = SlidingWindowTracker.track
def traced(self, raw_new):
    tail_was_kf = bool(self.hw.keyframe[self.hw.n_frames - 1])
    r = orig_track(self, raw_new)
    hw = self.hw
    import hashlib
    h = hashlib.md5()
    for a in (hw.q, hw.p, hw.v, hw.inv_depth, hw.track_flags.astype(np.int64),
              hw.obs_mask, hw.frame_id, hw.quality):
        h.update(np.ascontiguousarray(a).tobytes())
    print(f"frame {raw_new.id}: kf={tail_was_kf} state={h.hexdigest()[:10]} "
          f"tailp={hw.p[hw.n_frames-1]}")
    if r and tail_was_kf:
        p50, p90 = consistency(self.hw, self.k)
        print(f"  kf consistency: rpeF p50={p50:.3f} p90={p90:.3f}")
    return r
SlidingWindowTracker.track = traced

for fi in range(len(scene.frame_t)):
    t = scene.frame_t[fi]
    sel = (scene.imu_t <= t) if fi == 0 else (
        (scene.imu_t >= scene.frame_t[fi - 1]) & (scene.imu_t < t))
    rf = oracle.make_frame(fi, fi, scene.imu_t[sel], scene.gyro[sel],
                           scene.accel[sel])
    fw.issue_frame(rf)
print("done; initialized:", fw.initialized)
