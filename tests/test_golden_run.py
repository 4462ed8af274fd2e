"""Golden-run regression: full frontend-in-the-loop accuracy at production
resolution on geometrically-exact textured imagery (SURVEY §4's de-facto
validation; the stand-in for the EuRoC/TUM-VI dataset runs of
pvio-pc/src/main.cpp:214-257 while no real datasets exist in this env).

Unlike test_pipeline's blob imagery (loose 0.8 m bound), these render a
multi-octave-noise textured box room — dense gradients at every scale, no
KLT center-drift artifacts — through the REAL lens models: the image is
rendered with radtan / equidistant distortion and undistorted by
io/undistort inside the loop, exactly as the dataset readers do.
"""

import numpy as np
import pytest

from pvio_tpu import PVIO, Config
from pvio_tpu.geometry import wahba
from pvio_tpu.io import synthetic
from pvio_tpu.io.undistort import ImageUndistorter

import jax.numpy as jnp


def _ate(traj, scene):
    t2idx = {round(t, 6): i for i, t in enumerate(scene.frame_t)}
    est, gt = [], []
    for (t, q, p) in traj:
        i = t2idx.get(round(t, 6))
        if i is not None:
            est.append(p)
            gt.append(scene.p_wb[i])
    est = jnp.asarray(np.array(est))
    gt = jnp.asarray(np.array(gt))
    s, _, _ = wahba.find_srt(est, gt)
    nq = max(len(est) // 4, 1)
    ate_q0 = float(wahba.ate_rmse(est[:nq], gt[:nq], with_scale=False))
    return (float(wahba.ate_rmse(est, gt, with_scale=False)), float(s),
            len(est), ate_q0)


def _run(cfg, scene):
    und = ImageUndistorter(cfg.K, cfg.camera_distortion,
                           cfg.camera_distortion_model, cfg.image_size)
    q_bc, p_bc = np.asarray(cfg.q_bc), np.asarray(cfg.p_bc)
    vio = PVIO(cfg)
    n_frames = len(scene.frame_t)
    fi = 0
    for k in range(len(scene.imu_t)):
        t = scene.imu_t[k]
        vio.track_gyroscope(t, *scene.gyro[k])
        vio.track_accelerometer(t, *scene.accel[k])
        while fi < n_frames and scene.frame_t[fi] <= t:
            img = synthetic.render_frame_room(
                scene, fi, cfg.K, cfg.image_size, q_bc=q_bc, p_bc=p_bc,
                distortion=cfg.camera_distortion,
                distortion_model=cfg.camera_distortion_model)
            u8 = (img * 255.0 + 0.5).astype(np.uint8)
            vio.track_camera(scene.frame_t[fi], und.apply(u8))
            fi += 1
    return vio


@pytest.mark.slow
def test_golden_run_euroc_shaped():
    """EuRoC-shaped golden run: 480x752, radtan-distorted rendering,
    production config loaded from the reference-schema YAML, >= 10 s.
    The accuracy bar (ATE < 0.10 m) is BASELINE.md's north-star tier."""
    cfg = Config.from_yaml("config/euroc.yaml")
    cfg.dtype = "float64"
    # the synthetic rig sweeps ~1.5 m during the init window — beyond the
    # reference's <1 m scale sanity bound (initializer.cpp:216)
    cfg.initializer_max_scale = 5.0
    scene = synthetic.make_scene(duration=12.0, fps=20.0, imu_rate=200.0,
                                 n_points=8, seed=648)
    vio = _run(cfg, scene)
    assert vio.initialized
    assert vio.core.frontend.n_reinits == 0
    assert len(vio.get_planes()) >= 1, "walls must be detected as planes"
    traj = vio.get_trajectory()
    ate, scale, n, ate_q0 = _ate([(t, q, p) for (t, q, p) in traj], scene)
    assert n >= 180, n
    # Round-3 regression bounds (measured: ATE 0.028 m, scale 1.005,
    # first-quarter 0.009 m after the merged-IMU-span truncation fix —
    # see PERF_NOTES round 3; bounds carry ~3x margin for render/KLT
    # noise across seeds).
    assert ate_q0 < 0.05, f"first-quarter ATE {ate_q0} m"
    assert abs(scale - 1.0) < 0.05, f"scale {scale}"
    assert ate < 0.10, f"ATE {ate} m"


@pytest.mark.slow
def test_golden_run_tumvi_shaped():
    """TUM-VI-shaped golden run: 512x512 fisheye (equidistant) rendering
    through the fisheye undistorter, tum-vi.yaml config end-to-end."""
    cfg = Config.from_yaml("config/tum-vi.yaml")
    cfg.image_size = (512, 512)   # TUM-VI 512 geometry (the reference
    cfg.dtype = "float64"         # hardcodes it, tum_dataset_reader.cpp:73)
    cfg.initializer_max_scale = 5.0
    scene = synthetic.make_scene(duration=8.0, fps=20.0, imu_rate=200.0,
                                 n_points=8, seed=648)
    vio = _run(cfg, scene)
    assert vio.initialized
    assert vio.core.frontend.n_reinits == 0
    assert len(vio.get_planes()) >= 1, "walls must be detected as planes"
    traj = vio.get_trajectory()
    ate, scale, n, ate_q0 = _ate([(t, q, p) for (t, q, p) in traj], scene)
    assert n >= 120, n
    # Round-3 regression bounds (measured: ATE 0.030 m, scale 0.995,
    # first-quarter 0.011 m) with ~3x margin.
    assert ate_q0 < 0.04, f"first-quarter ATE {ate_q0} m"
    assert abs(scale - 1.0) < 0.05, f"scale {scale}"
    assert ate < 0.10, f"ATE {ate} m"


@pytest.mark.slow
def test_golden_run_blackout_reinit_production_res():
    """BASELINE config-3 behavior AT PRODUCTION RESOLUTION: occlude the
    camera mid-sequence on textured renders through the real lens model
    (not the 320x240 blob tier of test_pipeline) — the frontend must
    lose tracking, fall back to a fresh Initializer
    (frontend_worker.cpp:71-77), re-initialize, and resume with a sane
    post-recovery trajectory."""
    cfg = Config.from_yaml("config/euroc.yaml")
    cfg.dtype = "float64"
    cfg.initializer_max_scale = 5.0
    scene = synthetic.make_scene(duration=7.0, fps=20.0, imu_rate=200.0,
                                 n_points=8, seed=648)
    und = ImageUndistorter(cfg.K, cfg.camera_distortion,
                           cfg.camera_distortion_model, cfg.image_size)
    q_bc, p_bc = np.asarray(cfg.q_bc), np.asarray(cfg.p_bc)
    vio = PVIO(cfg)
    blackout = range(55, 62)      # ~0.35 s occlusion after init settles
    W, H = cfg.image_size
    fi = 0
    post_recovery = []
    for k in range(len(scene.imu_t)):
        t = scene.imu_t[k]
        vio.track_gyroscope(t, *scene.gyro[k])
        vio.track_accelerometer(t, *scene.accel[k])
        while fi < len(scene.frame_t) and scene.frame_t[fi] <= t:
            if fi in blackout:
                img = np.zeros((H, W), np.uint8)
            else:
                rimg = synthetic.render_frame_room(
                    scene, fi, cfg.K, cfg.image_size, q_bc=q_bc, p_bc=p_bc,
                    distortion=cfg.camera_distortion,
                    distortion_model=cfg.camera_distortion_model)
                img = und.apply((rimg * 255.0 + 0.5).astype(np.uint8))
            vio.track_camera(scene.frame_t[fi], img)
            if fi > blackout.stop + 40 and vio.initialized:
                st = vio.get_latest_state()
                if st is not None:
                    post_recovery.append((scene.frame_t[fi], st.p.copy()))
            fi += 1
    assert vio.core.frontend.n_reinits >= 1, "blackout must force re-init"
    assert vio.initialized, "must re-initialize after the blackout"
    assert len(post_recovery) >= 20, len(post_recovery)
    # post-recovery trajectory must track ground truth (fresh gauge:
    # rigid-align the recovered segment only)
    t2idx = {round(tt, 6): i for i, tt in enumerate(scene.frame_t)}
    est = np.array([p for (tt, p) in post_recovery
                    if t2idx.get(round(tt, 6)) is not None])
    gt = np.array([scene.p_wb[t2idx[round(tt, 6)]] for (tt, p) in post_recovery
                   if t2idx.get(round(tt, 6)) is not None])
    ate = float(wahba.ate_rmse(jnp.asarray(est), jnp.asarray(gt),
                               with_scale=False))
    assert ate < 0.10, f"post-recovery ATE {ate} m"
    assert np.isfinite(est).all()
