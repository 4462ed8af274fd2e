"""Replicate test_pipeline_with_planes and trace plane membership and the
adoption gate internals per keyframe."""
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
from pvio_tpu.core.plane_extractor import PlaneExtractor as PE
from pvio_tpu.map.window import TF_PLANE, TF_VALID

cfg = plane_config()
cfg.initializer_keyframe_gap = 4
cfg.initializer_min_matches = 20
cfg.initializer_min_parallax = 5.0
cfg.initializer_min_triangulation = 15
cfg.initializer_min_landmarks = 15
cfg.keyframe_min_common_tracks = 20
cfg.keyframe_parallax_px = 25.0
cfg.feature_tracker_max_keypoint_detection = 120
scene = synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                             n_points=60, n_plane_points=130,
                             plane_z=4.6, seed=648)
kern = DeviceKernels(cfg)
oracle = synthetic.OracleFeatureSource(
    scene, cfg.K, cfg.image_size, max_keypoints=120, kp_noise_px=0.3)

# monkeypatch extend_planes to trace gate-by-gate
orig_rpe_batch = PE._rpe_batch
orig_extend = PE.extend_planes
def traced_extend(self, hw, **kw):
    import numpy as np
    from pvio_tpu.geometry import nplie
    from pvio_tpu.map import sector_area as sa
    before = ((hw.track_flags & TF_PLANE) != 0).sum()
    cand_m = (hw.track_mask & ((hw.track_flags & TF_VALID) != 0)
              & ((hw.track_flags & TF_PLANE) == 0))
    # replicate gates for the first plane slot
    slots = np.nonzero(hw.plane_mask)[0]
    if len(slots):
        pts = self._landmarks(hw)
        s = slots[0]
        cols = np.nonzero(cand_m)[0]
        n, d0 = hw.plane_normal[s], hw.plane_distance[s]
        mm = ((hw.plane_id == s) & hw.track_mask
              & ((hw.track_flags & TF_PLANE) != 0))
        med = np.median(pts[mm] @ n - d0) if mm.any() else 0.0
        q_bc, p_bc = np.asarray(self.cfg.q_bc), np.asarray(self.cfg.p_bc)
        ref = hw.ref_frame[cols]
        R_ref = nplie.quat_to_mat(hw.q[ref])
        R_wc = R_ref @ nplie.quat_to_mat(q_bc)[None]
        o = hw.p[ref] + np.einsum("cij,j->ci", R_ref, p_bc)
        kp_ref = hw.kp[ref, cols]
        C = len(cols)
        bearing = np.einsum("cij,cj->ci", R_wc,
                            np.concatenate([kp_ref, np.ones((C, 1))], -1))
        denom = bearing @ n
        not_par = np.abs(denom) >= np.linalg.norm(bearing, axis=-1) * np.sin(np.deg2rad(20))
        s_len = (d0 + med - o @ n) / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        cast = o + s_len[:, None] * bearing
        y = np.einsum("cji,cj->ci", R_wc, cast - o)
        valid = not_par & (y[:, 2] >= 0)
        rpe_b = orig_rpe_batch(self, hw, pts[cols, None, :], cols=cols)[:, 0]
        rpe_a = np.where(valid, orig_rpe_batch(self, hw, cast[:, None, :], cols=cols)[:, 0], np.inf)
        sigma = float(np.sqrt(np.mean(np.diag(np.asarray(self.cfg.camera_noise_cov)))))
        chi_ok = rpe_a ** 2 <= rpe_b ** 2 + (0.5 * sigma) ** 2
        abs_ok = rpe_a < max(0.5, 0.7 * sigma)
        p1 = (chi_ok | abs_ok) & valid
        off = np.abs(pts[cols] @ n - (d0 + med))
        K = self.cfg.K
        f_px = float(0.5 * (K[0, 0] + K[1, 1]))
        z = 1.0 / np.maximum(np.abs(hw.inv_depth[cols]), 1e-6)
        base_c = self._baseline(hw, pts)[cols]
        ang = sigma / f_px
        sig_z = ang * z * z / np.maximum(base_c, 1e-3)
        n_obs = (hw.obs_mask[:, cols] & hw.frame_mask[:, None]).sum(axis=0)
        red = 1.0 / np.sqrt(np.maximum(n_obs - 1, 1).astype(float))
        bd = bearing / np.linalg.norm(bearing, axis=-1, keepdims=True)
        c2 = (bd @ n) ** 2
        sig_lat = ang * z
        sigma_pl = red * np.sqrt(c2 * sig_z ** 2 + (1 - c2) * sig_lat ** 2)
        thr = np.minimum(0.1, np.maximum(0.005, 3.0 * sigma_pl))
        p2 = p1 & (off <= thr)
        area = self.areas.get(int(s))
        p3 = p2.copy()
        if area is not None and p2.any():
            p3[p2] = sa.is_near_boundary_batch(area, cast[p2], True, 1.2, 0.1)
        print(f"  gates: cand={C} valid={valid.sum()} chi/abs={p1.sum()} "
              f"sigma={p2.sum()} boundary={p3.sum()} "
              f"| off p50={np.percentile(off[valid], 50) if valid.any() else -1:.4f} "
              f"thr p50={np.percentile(thr[valid], 50) if valid.any() else -1:.4f} "
              f"rpe_a p50={np.percentile(rpe_a[valid], 50) if valid.any() else -1:.3f} "
              f"rpe_b p50={np.percentile(rpe_b[valid], 50) if valid.any() else -1:.3f} med={med:.4f}")
        # fresh triangulation from current poses (what escape uses)
        from pvio_tpu.map import window as win
        import jax.numpy as jnp
        w_dev = hw.to_device()
        ptsF, invF, okF = [np.asarray(a) for a in
                           win.triangulate_tracks(w_dev, self.k.extr)]
        offF = np.abs(ptsF[cols] @ n - (d0 + med))
        okc = okF[cols].astype(bool)
        print(f"  fresh-tri: ok={okc.sum()}/{C} offF p50="
              f"{np.percentile(offF[okc], 50) if okc.any() else -1:.4f} "
              f"p80={np.percentile(offF[okc], 80) if okc.any() else -1:.4f} "
              f"| members offF p50="
              f"{np.percentile(np.abs(ptsF[mm] @ n - (d0 + med)), 50) if mm.any() else -1:.4f}")
        # keyframe pose error vs ground truth (match by frame time)
        t2i = {round(t, 6): i for i, t in enumerate(SCENE.frame_t)}
        fm = np.nonzero(hw.frame_mask)[0]
        perr, rerr = [], []
        for f in fm:
            i = t2i.get(round(float(hw.frame_t[f]), 6))
            if i is None:
                continue
            perr.append(np.linalg.norm(hw.p[f] - SCENE.p_wb[i]))
            dq = nplie.quat_mul(nplie.quat_conj(SCENE.q_wb[i]), hw.q[f])
            rerr.append(2 * np.degrees(np.arcsin(
                min(1.0, np.linalg.norm(dq[1:])))))
        if perr:
            print(f"  pose err: p max={max(perr):.4f} m, rot max={max(rerr):.3f} deg")
        # window internal consistency: rpe of FRESH triangulations over all
        # valid tracks (should be ~kp noise if relative poses are right)
        vcols = np.nonzero(hw.track_mask & ((hw.track_flags & TF_VALID) != 0))[0]
        rpeF = orig_rpe_batch(self, hw, ptsF[vcols][:, None, :], cols=vcols)[:, 0]
        rpeS = orig_rpe_batch(self, hw, pts[vcols][:, None, :], cols=vcols)[:, 0]
        okv = okF[vcols].astype(bool) & np.isfinite(rpeF)
        n_obs_v = (hw.obs_mask[:, vcols] & hw.frame_mask[:, None]).sum(axis=0)
        print(f"  consistency: fresh-tri rpe p50={np.percentile(rpeF[okv], 50):.3f} "
              f"p90={np.percentile(rpeF[okv], 90):.3f} | stored rpe "
              f"p50={np.percentile(rpeS[np.isfinite(rpeS)], 50):.3f} | "
              f"n_obs p50={np.percentile(n_obs_v, 50):.0f} "
              f"(rpeF p50 @ n_obs>=4: "
              f"{np.percentile(rpeF[okv & (n_obs_v >= 4)], 50) if (okv & (n_obs_v>=4)).any() else -1:.3f})")
    orig_extend(self, hw, **kw)
    after = ((hw.track_flags & TF_PLANE) != 0).sum()
    print(f"  extend: members {before} -> {after} (cands {cand_m.sum()})")
PE.extend_planes = traced_extend

SCENE = scene
import os as _os
if _os.environ.get("BIGMIN"):
    cfg.plane_min_tracks = 999
    kern = DeviceKernels(cfg)
    oracle = synthetic.OracleFeatureSource(scene, cfg.K, cfg.image_size, max_keypoints=120, kp_noise_px=0.3)
if _os.environ.get("NOCAST"):
    cfg.pnp_use_plane_points = False
    kern = DeviceKernels(cfg)
    oracle = synthetic.OracleFeatureSource(scene, cfg.K, cfg.image_size, max_keypoints=120, kp_noise_px=0.3)
if _os.environ.get("ZEROW"):
    cfg.plane_distance_cov = 1e12
    kern = DeviceKernels(cfg)
    oracle = synthetic.OracleFeatureSource(scene, cfg.K, cfg.image_size, max_keypoints=120, kp_noise_px=0.3)
if _os.environ.get("SUPPLEMENT"):
    cfg.plane_supplement = True
    kern = DeviceKernels(cfg)
    oracle = synthetic.OracleFeatureSource(scene, cfg.K, cfg.image_size, max_keypoints=120, kp_noise_px=0.3)
if _os.environ.get("NO_INSOLVER"):
    cfg.plane_estimate_in_solver = False
    kern = DeviceKernels(cfg)
    oracle = synthetic.OracleFeatureSource(scene, cfg.K, cfg.image_size, max_keypoints=120, kp_noise_px=0.3)
fw = FrontendWorker(cfg, kern, oracle,
                    plane_extractor_factory=lambda: PE(cfg, kern))
for fi in range(len(scene.frame_t)):
    t = scene.frame_t[fi]
    sel = (scene.imu_t <= t) if fi == 0 else (
        (scene.imu_t >= scene.frame_t[fi - 1]) & (scene.imu_t < t))
    rf = oracle.make_frame(fi, fi, scene.imu_t[sel], scene.gyro[sel],
                           scene.accel[sel])
    st = fw.issue_frame(rf)
    if fw.initialized:
        hw = fw.swt.hw
        npl = int(((hw.track_flags & TF_PLANE) != 0).sum())
        nplanes = int(hw.plane_mask.sum())
        print(f"frame {fi}: planes={nplanes} plane_tracks={npl}")
