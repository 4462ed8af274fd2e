"""End-to-end pipeline tests (the golden-run regression of SURVEY §4, with
the synthetic scene standing in for EuRoC — no datasets in this env).

Two tiers:
  * oracle features (projected keypoints + noise, perfect association):
    strict accuracy assertions on the estimation chain (init + PnP + BA +
    marginalization + keyframing);
  * rendered images through the full detection/KLT frontend: functional
    assertions with a loose ATE bound (blob imagery drifts more than real
    texture).
"""

import numpy as np
import pytest

from pvio_tpu import PVIO, Config
from pvio_tpu.core.frontend_worker import FrontendWorker
from pvio_tpu.core.kernels import DeviceKernels
from pvio_tpu.geometry import wahba
from pvio_tpu.io import synthetic

import jax.numpy as jnp


def small_config(**kw):
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
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def run_oracle(cfg, scene, kp_noise_px):
    kern = DeviceKernels(cfg)
    oracle = synthetic.OracleFeatureSource(
        scene, cfg.K, cfg.image_size,
        max_keypoints=cfg.feature_tracker_max_keypoint_detection,
        kp_noise_px=kp_noise_px,
    )
    fw = FrontendWorker(cfg, kern, oracle)
    outputs = []
    for fi in range(len(scene.frame_t)):
        t = scene.frame_t[fi]
        if fi == 0:
            sel = scene.imu_t <= t
        else:
            sel = (scene.imu_t >= scene.frame_t[fi - 1]) & (scene.imu_t < t)
        rf = oracle.make_frame(fi, fi, scene.imu_t[sel], scene.gyro[sel],
                               scene.accel[sel])
        st = fw.issue_frame(rf)
        if st is not None:
            outputs.append((st[0], st[2].copy()))
    return fw, outputs


def ate_of(outputs, scene):
    t2idx = {round(t, 6): i for i, t in enumerate(scene.frame_t)}
    est, gt = [], []
    for (t, p) in outputs:
        i = t2idx.get(round(t, 6))
        if i is not None:
            est.append(p)
            gt.append(scene.p_wb[i])
    est = jnp.asarray(np.array(est))
    gt = jnp.asarray(np.array(gt))
    s, _, _ = wahba.find_srt(est, gt)
    return (float(wahba.ate_rmse(est, gt, with_scale=False)), float(s))


@pytest.mark.slow
def test_oracle_pipeline_accuracy():
    cfg = small_config()
    scene = synthetic.make_scene(duration=4.0, fps=20.0, imu_rate=200.0,
                                 n_points=320, seed=648)
    fw, outputs = run_oracle(cfg, scene, kp_noise_px=0.3)
    assert fw.initialized
    assert fw.n_reinits == 0
    assert len(outputs) >= 40
    ate, scale = ate_of(outputs, scene)
    assert abs(scale - 1.0) < 0.06, f"scale {scale}"
    assert ate < 0.12, f"ATE {ate} m"


@pytest.mark.slow
def test_image_pipeline_smoke():
    """PLUMBING smoke test: the full frontend (CLAHE + Shi-Tomasi + KLT +
    F-gate) on rendered blob imagery must initialize, never re-init, and
    not diverge (loose 0.8 m sanity bound only — blob imagery has no
    stable texture; ACCURACY is asserted by tests/test_golden_run.py on
    textured renders at production resolution)."""
    cfg = small_config()
    scene = synthetic.make_scene(duration=4.0, fps=20.0, imu_rate=200.0,
                                 n_points=320, seed=648)
    vio = PVIO(cfg)
    K = cfg.K
    n_frames = len(scene.frame_t)
    fi = 0
    max_map_points = 0
    for k in range(len(scene.imu_t)):
        t = scene.imu_t[k]
        vio.track_gyroscope(t, *scene.gyro[k])
        vio.track_accelerometer(t, *scene.accel[k])
        while fi < n_frames and scene.frame_t[fi] <= t:
            img = synthetic.render_frame(scene, fi, K, cfg.image_size)
            vio.track_camera(scene.frame_t[fi], img)
            if fi % 10 == 0 and vio.initialized:
                max_map_points = max(max_map_points, len(vio.get_map_points()))
            fi += 1
    assert vio.initialized
    assert vio.core.frontend.n_reinits == 0
    traj = vio.get_trajectory()
    # plumbing smoke only: blob imagery initializes marginally later
    # under the round-3 gate set (relative photometric cull + fb gate)
    assert len(traj) >= 30
    ate, scale = ate_of([(t, p) for (t, q, p) in traj], scene)
    assert ate < 0.8, f"ATE {ate} m"
    st = vio.get_latest_state()
    assert st is not None and np.isfinite(st.p).all()
    # blob imagery degrades late in the sequence (KLT drift), so gate on
    # the best map population seen during the run, not the final frame
    assert max_map_points > 10, max_map_points


@pytest.mark.slow
def test_pipeline_determinism():
    """Determinism by construction (SURVEY §4): fixed seeds + inline
    workers + fixed-budget RANSAC => two identical runs produce
    bit-identical trajectories (golden-regression precondition)."""
    cfg = small_config()
    scene = synthetic.make_scene(duration=2.5, fps=20.0, imu_rate=200.0,
                                 n_points=320, seed=648)
    _, out1 = run_oracle(cfg, scene, kp_noise_px=0.3)
    _, out2 = run_oracle(cfg, scene, kp_noise_px=0.3)
    assert len(out1) == len(out2) and len(out1) > 10
    for (t1, p1), (t2, p2) in zip(out1, out2):
        assert t1 == t2
        np.testing.assert_array_equal(p1, p2)


@pytest.mark.slow
def test_tracking_loss_reinit_and_recovery():
    """BASELINE config-3 behavior: occlude the camera mid-sequence (black
    frames kill every track), the frontend must fall back to a fresh
    Initializer (frontend_worker.cpp:71-77) and then re-initialize and
    resume producing poses."""
    cfg = small_config()
    scene = synthetic.make_scene(duration=6.0, fps=20.0, imu_rate=200.0,
                                 n_points=320, seed=648)
    vio = PVIO(cfg)
    K = cfg.K
    n_frames = len(scene.frame_t)
    blackout = range(45, 52)  # ~0.35 s occlusion after init settles
    fi = 0
    post_recovery_poses = 0
    for k in range(len(scene.imu_t)):
        t = scene.imu_t[k]
        vio.track_gyroscope(t, *scene.gyro[k])
        vio.track_accelerometer(t, *scene.accel[k])
        while fi < n_frames and scene.frame_t[fi] <= t:
            if fi in blackout:
                img = np.zeros((cfg.image_size[1], cfg.image_size[0]),
                               np.float32)
            else:
                img = synthetic.render_frame(scene, fi, K, cfg.image_size)
            pose = vio.track_camera(scene.frame_t[fi], img)
            if fi > blackout.stop and pose is not None and vio.initialized:
                post_recovery_poses += 1
            fi += 1
    assert vio.core.frontend.n_reinits >= 1
    assert vio.initialized, "must re-initialize after the blackout"
    assert post_recovery_poses >= 20
    st = vio.get_latest_state()
    assert st is not None and np.isfinite(st.p).all()


@pytest.mark.slow
def test_fused_keyframe_pipeline():
    """Config.fused_keyframe: the whole keyframe (marginalize + append +
    BA) as ONE device dispatch + ONE fetch (kernels.kf_step). Must
    initialize, never re-init, make the SAME keyframe decisions as the
    separate marg_step/ba_step path, and stay within a tight accuracy
    bound of it (the two documented deviations — plane bookkeeping on
    the pre-marg window; victim-referenced triangulation adoptions
    defer one frame — must cost noise, not accuracy)."""
    from pvio_tpu.io import synthetic as syn

    def run(fused):
        cfg = small_config()
        cfg.fused_keyframe = fused
        scene = syn.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                               n_points=320, seed=648)
        fw, outputs = run_oracle(cfg, scene, kp_noise_px=0.3)
        assert fw.initialized and fw.n_reinits == 0
        ate, scale = ate_of(outputs, scene)
        return ate, len(outputs), fw.swt.n_keyframes

    ate_std, n_std, kf_std = run(False)
    ate_fused, n_fused, kf_fused = run(True)
    assert n_fused == n_std
    # identical keyframe schedule: the fused path sees the same keyframe
    # statistics (p80 parallax / common-track count) as the separate path
    assert kf_fused == kf_std, (kf_fused, kf_std)
    assert kf_std >= 3, kf_std
    # tight accuracy fencing (round-4 ADVICE: the old 2x bound could hide
    # a substantial regression): 1.2x relative plus a 2 cm absolute floor
    # for seed-level noise on this short scene
    assert ate_fused < max(1.2 * ate_std, ate_std + 0.02), (ate_fused, ate_std)


@pytest.mark.slow
def test_chained_keyframe_bit_identical():
    """Config.chained_keyframe: the fused keyframe step consuming the
    motion step's DEVICE outputs (kernels.kf_step_chained, one combined
    deferred fetch per frame) must produce BIT-IDENTICAL trajectories
    and keyframe schedules to the fetch-then-re-upload fused path — the
    chained kernel sees the same values (device->host->device of f64 is
    exact), and every host guard it computes at dispatch time equals the
    fused path's finish-time computation (no window mutation can
    interleave). Exercised through the sequential track() path here;
    the Core pipelined loop is covered by the pipelined variant below
    plus test_pipelined_host_bit_identical."""
    from pvio_tpu.io import synthetic as syn

    def run(chained):
        cfg = small_config()
        cfg.fused_keyframe = True
        cfg.chained_keyframe = chained
        scene = syn.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                               n_points=320, seed=648)
        fw, outputs = run_oracle(cfg, scene, kp_noise_px=0.3)
        assert fw.initialized and fw.n_reinits == 0
        return outputs, fw.swt.n_keyframes

    out_fused, kf_fused = run(False)
    out_chained, kf_chained = run(True)
    assert kf_chained == kf_fused
    assert len(out_chained) == len(out_fused)
    for (t1, p1), (t2, p2) in zip(out_fused, out_chained):
        assert t1 == t2
        np.testing.assert_array_equal(p1, p2, err_msg=f"t={t1}")


def test_pipelined_host_bit_identical():
    """Config.pipelined_host: the latency-hiding dispatch/finish split
    (core/core.py:_process_frame/_advance_pipeline/flush) must produce
    BIT-IDENTICAL trajectories to the sequential loop — same ops, same
    order, same inputs; only the host blocking pattern changes (the
    claim made in README/PARITY row 32, previously untested). Covers
    depth 1 and depth 2, and a mid-run blackout (tracking loss +
    re-init while stages are in flight)."""
    scene = synthetic.make_scene(duration=5.0, fps=20.0, imu_rate=200.0,
                                 n_points=320, seed=648)
    blackout = range(55, 61)

    def run(pipelined, depth):
        cfg = small_config()
        cfg.pipelined_host = pipelined
        cfg.pipeline_depth = depth
        vio = PVIO(cfg)
        if vio.core.hub is None:
            pytest.skip("native sensor hub unavailable "
                        "(pipelined path requires csrc build)")
        fi = 0
        H, W = cfg.image_size[1], cfg.image_size[0]
        for k in range(len(scene.imu_t)):
            t = scene.imu_t[k]
            vio.track_gyroscope(t, *scene.gyro[k])
            vio.track_accelerometer(t, *scene.accel[k])
            while fi < len(scene.frame_t) and scene.frame_t[fi] <= t:
                if fi in blackout:
                    img = np.zeros((H, W), np.float32)
                else:
                    img = synthetic.render_frame(scene, fi, cfg.K,
                                                 cfg.image_size)
                vio.track_camera(scene.frame_t[fi], img)
                fi += 1
        traj = vio.get_trajectory()  # drains the pipeline
        return traj, vio.core.frontend.n_reinits, vio.initialized

    traj_seq, reinits_seq, init_seq = run(False, 1)
    assert init_seq and reinits_seq >= 1, (
        "scene must exercise a re-init segment")
    for depth in (1, 2):
        traj_pipe, reinits_pipe, init_pipe = run(True, depth)
        assert init_pipe and reinits_pipe == reinits_seq
        assert len(traj_pipe) == len(traj_seq), (
            f"depth {depth}: {len(traj_pipe)} vs {len(traj_seq)} poses")
        for (t1, q1, p1), (t2, q2, p2) in zip(traj_seq, traj_pipe):
            assert t1 == t2
            np.testing.assert_array_equal(p1, p2,
                                          err_msg=f"depth {depth}, t={t1}")
            np.testing.assert_array_equal(q1, q2,
                                          err_msg=f"depth {depth}, t={t1}")


@pytest.mark.slow
def test_pipelined_chained_keyframe_bit_identical():
    """The full production fast path — pipelined host loop (depth 2) +
    fused keyframe + chained keyframe — must stay BIT-IDENTICAL to the
    sequential fused run through the Core loop, including a blackout
    with a chained keyframe potentially in flight during tracking loss
    and re-init."""
    scene = synthetic.make_scene(duration=5.0, fps=20.0, imu_rate=200.0,
                                 n_points=320, seed=648)
    blackout = range(55, 61)

    def run(pipelined, chained):
        cfg = small_config()
        cfg.fused_keyframe = True
        cfg.chained_keyframe = chained
        cfg.pipelined_host = pipelined
        cfg.pipeline_depth = 2
        vio = PVIO(cfg)
        if vio.core.hub is None:
            pytest.skip("native sensor hub unavailable "
                        "(pipelined path requires csrc build)")
        fi = 0
        H, W = cfg.image_size[1], cfg.image_size[0]
        for k in range(len(scene.imu_t)):
            t = scene.imu_t[k]
            vio.track_gyroscope(t, *scene.gyro[k])
            vio.track_accelerometer(t, *scene.accel[k])
            while fi < len(scene.frame_t) and scene.frame_t[fi] <= t:
                if fi in blackout:
                    img = np.zeros((H, W), np.float32)
                else:
                    img = synthetic.render_frame(scene, fi, cfg.K,
                                                 cfg.image_size)
                vio.track_camera(scene.frame_t[fi], img)
                fi += 1
        traj = vio.get_trajectory()
        return traj, vio.core.frontend.n_reinits, vio.initialized

    traj_seq, reinits_seq, init_seq = run(False, False)
    assert init_seq and reinits_seq >= 1, (
        "scene must exercise a re-init segment")
    traj_ch, reinits_ch, init_ch = run(True, True)
    assert init_ch and reinits_ch == reinits_seq
    assert len(traj_ch) == len(traj_seq), (len(traj_ch), len(traj_seq))
    for (t1, q1, p1), (t2, q2, p2) in zip(traj_seq, traj_ch):
        assert t1 == t2
        np.testing.assert_array_equal(p1, p2, err_msg=f"t={t1}")
        np.testing.assert_array_equal(q1, q2, err_msg=f"t={t1}")


def test_health_backstop_windowed_fraction():
    """swt.health_update: the strict-consecutive detector (default)
    misses a persistently sick map whose landmark count bounces over
    the floor (each bounce resets the counter — the measured 60 s
    endurance post-re-init runaway); the opt-in windowed-fraction
    detector fires on the same sequence. Pure logic test."""
    from types import SimpleNamespace

    from pvio_tpu.core.swt import health_update

    def drive(cfg, counts):
        st = SimpleNamespace(peak_valid=0, unhealthy_keyframes=0)
        for i, n in enumerate(counts):
            st.peak_valid = max(st.peak_valid, n)
            if health_update(st, cfg, n):
                return i
        return None

    # bouncing sick map: peak 100 -> floor 15; dips below floor 3 of
    # every 4 keyframes but never 8 in a row
    bounce = [100] + [5, 8, 11, 20] * 10
    base = dict(track_health_min_landmarks=8, track_health_max_keyframes=8)
    cfg_strict = SimpleNamespace(**base, track_health_window=0,
                                 track_health_frac=0.7)
    assert drive(cfg_strict, bounce) is None, (
        "strict-consecutive must miss the bouncing map (the documented gap)")
    cfg_win = SimpleNamespace(**base, track_health_window=8,
                              track_health_frac=0.7)
    fired = drive(cfg_win, bounce)
    assert fired is not None and fired <= 12, fired

    # healthy map must never fire either detector
    healthy = [100] * 3 + [60, 80, 40, 90] * 10
    assert drive(cfg_strict, healthy) is None
    assert drive(cfg_win, healthy) is None

    # truly-consecutive starvation still fires the strict detector at
    # the same keyframe as before (no regression in the default path)
    dead = [100] + [5] * 12
    assert drive(cfg_strict, dead) == 8
    assert drive(cfg_win, dead) <= 8
