"""Plane subsystem tests: detection, track flagging, plane factors in BA,
merging, and the plane-aware PnP point substitution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvio_tpu.core.host_window import HostWindow
from pvio_tpu.core.kernels import DeviceKernels
from pvio_tpu.core.plane_extractor import PlaneExtractor
from pvio_tpu.estimation import ba, factors
from pvio_tpu.io import synthetic
from pvio_tpu.io.config import Config
from pvio_tpu.map import window as win
from pvio_tpu.map.window import TF_PLANE, TF_VALID


def plane_config():
    cfg = Config()
    cfg.camera_intrinsic = np.array([200.0, 200.0, 160.0, 120.0])
    cfg.image_size = (320, 240)
    cfg.sliding_window_size = 6
    cfg.window_frame_capacity = 7
    cfg.track_capacity = 128
    cfg.plane_capacity = 4
    cfg.solver_iteration_limit = 8
    cfg.dtype = "float64"
    cfg.enable_plane_constraint = True
    # the test camera's focal (200 px) is ~half EuRoC's; depth noise
    # doubles, so scale the reference's 3 cm RANSAC gate accordingly
    cfg.plane_ransac_threshold = 0.07
    cfg.plane_min_inliers = 25
    # short synthetic scenes: tracks max out at ~6 observations in the
    # 7-frame window, so lower the reference's life>=10 maturity gate
    cfg.plane_min_track_life = 4
    return cfg


@pytest.fixture(scope="module")
def plane_scene():
    return synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                                n_points=60, n_plane_points=130,
                                plane_z=4.6, seed=648)


def make_host_window(scene, cfg, kf):
    """Ground-truth HostWindow with observations + valid depths."""
    w_dev, extr, info = synthetic.solver_window_from_scene(
        scene, kf, F_cap=cfg.window_frame_capacity, T_cap=cfg.track_capacity,
        P_cap=cfg.plane_capacity, dtype=jnp.float64)
    hw = HostWindow(cfg.window_frame_capacity, cfg.track_capacity,
                    cfg.plane_capacity, np.float64)
    hw.q = np.array(w_dev.q)
    hw.p = np.array(w_dev.p)
    hw.v = np.array(w_dev.v)
    hw.frame_mask = np.array(w_dev.frame_mask)
    hw.frame_t[: len(kf)] = scene.frame_t[kf]
    hw.kp = np.array(w_dev.kp)
    hw.obs_mask = np.array(w_dev.obs_mask)
    hw.ref_frame = np.array(w_dev.ref_frame)
    hw.track_mask = np.array(w_dev.track_mask)
    hw.track_flags = np.array(w_dev.track_flags)
    hw.inv_depth = np.array(w_dev.inv_depth)
    hw.track_life = np.array(w_dev.obs_mask.sum(axis=0), np.int32)
    hw.quality[:] = 0.1
    return hw, extr, info


def test_plane_detection_and_flagging(plane_scene):
    cfg = plane_config()
    kf = [0, 4, 8, 12, 16, 20]
    hw, extr, info = make_host_window(plane_scene, cfg, kf)
    kern = DeviceKernels(cfg)
    pe = PlaneExtractor(cfg, kern)
    pe.update_map(hw)
    assert hw.plane_mask.sum() == 1
    s = int(np.nonzero(hw.plane_mask)[0][0])
    n = hw.plane_normal[s]
    sgn = np.sign(n[2]) or 1.0
    assert np.allclose(sgn * n, [0, 0, 1.0], atol=0.02), n
    assert abs(sgn * hw.plane_distance[s] - (4.6)) < 0.05
    # the flagged tracks should be (mostly) true plane members
    flagged = np.nonzero((hw.track_flags & TF_PLANE) != 0)[0]
    assert len(flagged) >= 25
    chosen = info["chosen"]
    true_plane = np.array([plane_scene.plane_of_point[chosen[c]] == 0 for c in flagged])
    assert true_plane.mean() > 0.9


def test_plane_factor_zero_at_truth(plane_scene):
    """Augmented plane residual vanishes for exact plane geometry."""
    cfg = plane_config()
    kf = [0, 4, 8, 12, 16]
    hw, extr, info = make_host_window(plane_scene, cfg, kf)
    chosen = info["chosen"]
    # pick a true plane track
    cols = [c for c in range(info["n_tracks"])
            if plane_scene.plane_of_point[chosen[c]] == 0
            and hw.obs_mask[:, c].sum() >= 3]
    c = cols[0]
    obs = jnp.asarray(hw.obs_mask[:, c] & hw.frame_mask)
    r = factors.augmented_plane_distance_residual(
        jnp.asarray(hw.q), jnp.asarray(hw.p), jnp.asarray(hw.kp[:, c]),
        obs, jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(4.6), extr, 100.0,
    )
    assert abs(float(r)) < 1e-6


def test_ba_with_plane_factors(plane_scene, rng):
    """BA with the plane prior: plane tracks use the augmented factor; the
    solve must converge and keep poses near truth."""
    cfg = plane_config()
    kf = [0, 4, 8, 12, 16, 20]
    hw, extr, info = make_host_window(plane_scene, cfg, kf)
    kern = DeviceKernels(cfg)
    pe = PlaneExtractor(cfg, kern)
    pe.update_map(hw)
    assert hw.plane_mask.sum() == 1
    hw.fix_mask[0] = True

    w = hw.to_device()
    w = w._replace(delta_valid=jnp.zeros_like(w.delta_valid))  # vision-only
    # perturb
    F = w.q.shape[0]
    from pvio_tpu.geometry import lie
    # frames 0 and 1 are gauge-fixed below — they must stay at truth
    # (perturbing a frozen frame leaves unremovable residual); stay inside
    # the Cauchy inlier region of the whitened plane factor as the
    # incremental pipeline does
    zero01 = lambda x: x.at[0].set(0.0).at[1].set(0.0)
    dq = zero01(jnp.asarray(rng.normal(size=(F, 3)) * 0.001))
    dp = zero01(jnp.asarray(rng.normal(size=(F, 3)) * 0.003))
    w_p = w._replace(
        q=lie.quat_normalize(lie.quat_mul(w.q, lie.expmap(dq))),
        p=w.p + dp,
        fix_mask=w.fix_mask.at[1].set(True),
    )
    bacfg = ba.BAConfig(iterations=10, kp_sqrt_inv_cov=283.0,
                        plane_sqrt_inv_cov=100.0, use_inertial=False,
                        use_planes=True)
    w2, out = ba.solve(w_p, extr, bacfg)
    assert float(out["final_cost"]) < 0.05 * float(out["initial_cost"])
    nkf = len(kf)
    p_err = np.linalg.norm(np.asarray(w2.p - w.p)[:nkf], axis=-1)
    assert p_err.max() < 2e-3, p_err
    assert np.isfinite(np.asarray(w2.p)).all()


def test_plane_merge(plane_scene):
    cfg = plane_config()
    kf = [0, 4, 8, 12, 16]
    hw, extr, info = make_host_window(plane_scene, cfg, kf)
    kern = DeviceKernels(cfg)
    pe = PlaneExtractor(cfg, kern)
    pe.update_map(hw)
    assert hw.plane_mask.sum() == 1
    s = int(np.nonzero(hw.plane_mask)[0][0])
    # forge a duplicate plane with half the members
    dup = 1 if s != 1 else 2
    hw.plane_mask[dup] = True
    hw.plane_normal[dup] = hw.plane_normal[s] + 0.01
    hw.plane_normal[dup] /= np.linalg.norm(hw.plane_normal[dup])
    hw.plane_distance[dup] = hw.plane_distance[s] + 0.02
    members = np.nonzero(hw.plane_id == s)[0]
    hw.plane_id[members[::2]] = dup
    pe.merge_planes(hw)
    assert hw.plane_mask.sum() == 1
    assert (hw.plane_id[members] == np.nonzero(hw.plane_mask)[0][0]).all()


@pytest.mark.slow
def test_pipeline_with_planes(plane_scene):
    """Oracle-feature pipeline with the plane subsystem enabled: planes
    must be detected during tracking and accuracy must hold."""
    from pvio_tpu.core.frontend_worker import FrontendWorker
    from pvio_tpu.core.plane_extractor import PlaneExtractor as PE
    from pvio_tpu.geometry import wahba

    cfg = plane_config()
    cfg.initializer_keyframe_gap = 4
    cfg.initializer_min_matches = 20
    cfg.initializer_min_parallax = 5.0
    cfg.initializer_min_triangulation = 15
    cfg.initializer_min_landmarks = 15
    cfg.keyframe_min_common_tracks = 20
    cfg.keyframe_parallax_px = 25.0
    cfg.feature_tracker_max_keypoint_detection = 120
    scene = plane_scene
    kern = DeviceKernels(cfg)
    oracle = synthetic.OracleFeatureSource(
        scene, cfg.K, cfg.image_size, max_keypoints=120, kp_noise_px=0.3)
    fw = FrontendWorker(cfg, kern, oracle,
                        plane_extractor_factory=lambda: PE(cfg, kern))
    outputs = []
    for fi in range(len(scene.frame_t)):
        t = scene.frame_t[fi]
        sel = (scene.imu_t <= t) if fi == 0 else (
            (scene.imu_t >= scene.frame_t[fi - 1]) & (scene.imu_t < t))
        rf = oracle.make_frame(fi, fi, scene.imu_t[sel], scene.gyro[sel],
                               scene.accel[sel])
        st = fw.issue_frame(rf)
        if st is not None:
            outputs.append((st[0], st[2].copy()))
    assert fw.initialized and fw.n_reinits == 0
    hw = fw.swt.hw
    assert hw.plane_mask.sum() >= 1, "no plane detected during tracking"
    s = int(np.nonzero(hw.plane_mask)[0][0])
    n = hw.plane_normal[s] * (np.sign(hw.plane_normal[s][2]) or 1.0)
    assert abs(n[2]) > 0.98, n
    n_plane_tracks = int(((hw.track_flags & TF_PLANE) != 0).sum())
    assert n_plane_tracks >= 10
    # accuracy with plane factors active
    t2idx = {round(t, 6): i for i, t in enumerate(scene.frame_t)}
    est, gt = [], []
    for (t, p) in outputs:
        i = t2idx.get(round(t, 6))
        if i is not None:
            est.append(p)
            gt.append(scene.p_wb[i])
    ate = float(wahba.ate_rmse(jnp.asarray(np.array(est)),
                               jnp.asarray(np.array(gt)), with_scale=False))
    assert ate < 0.15, f"ATE {ate} m"


def _corrupt_adoption(hw, pe, info, plane_scene, slot):
    """Force-adopt a genuinely off-plane VALID track onto plane `slot`
    (what a wrong extend_planes adoption does: flag + cast the landmark
    onto the plane). Returns (column, true inverse depth)."""
    chosen = info["chosen"]
    cands = [
        c for c in range(info["n_tracks"])
        if plane_scene.plane_of_point[chosen[c]] != 0
        and (hw.track_flags[c] & TF_VALID)
        and not (hw.track_flags[c] & TF_PLANE)
        and hw.obs_mask[:, c].sum() >= 5
    ]
    assert cands, "no free off-plane track available"
    c = cands[0]
    true_inv_d = float(hw.inv_depth[c])
    ref = hw.ref_frame[c]
    q_bc = np.asarray(pe.cfg.q_bc)
    p_bc = np.asarray(pe.cfg.p_bc)
    from pvio_tpu.geometry import nplie
    q_wc = nplie.quat_mul(hw.q[ref], q_bc)
    o = hw.p[ref] + nplie.quat_to_mat(hw.q[ref]) @ p_bc
    bearing = nplie.quat_to_mat(q_wc) @ np.concatenate([hw.kp[ref, c], [1.0]])
    n, d = hw.plane_normal[slot], hw.plane_distance[slot]
    s_len = (d - n @ o) / (n @ bearing)
    point = o + s_len * bearing
    hw.track_flags[c] |= TF_PLANE
    hw.plane_id[c] = slot
    pe._set_landmark(hw, c, point)
    return c, true_inv_d


def test_plane_track_escape(plane_scene):
    """Post-BA plane-track escape (bundle_adjustor.cpp:251-275): a track
    wrongly adopted onto a plane is re-triangulated as a free point
    after the solve; since it sits > 0.1 m off the plane it is released
    back to TF_VALID with the re-triangulated depth, and the BA cost
    drops versus keeping the bad constraint."""
    cfg = plane_config()
    # this fixture window has <= 6 observations per track, so lower the
    # escape maturity gate (reference default: life > 10,
    # bundle_adjustor.cpp:257) to let the escape fire at all
    cfg.plane_escape_min_life = 4
    kf = [0, 4, 8, 12, 16, 20]
    hw, extr, info = make_host_window(plane_scene, cfg, kf)
    kern = DeviceKernels(cfg)
    pe = PlaneExtractor(cfg, kern)
    pe.update_map(hw)
    assert hw.plane_mask.sum() == 1
    s = int(np.nonzero(hw.plane_mask)[0][0])
    c, true_inv_d = _corrupt_adoption(hw, pe, info, plane_scene, s)
    members_before = (hw.plane_id == s) & hw.track_mask

    # cost with the corrupted adoption in place
    bacfg = kern.ba_cfg._replace(use_inertial=False)
    w = hw.to_device()
    life = jnp.asarray(hw.track_life)
    cost_bad = float(ba.evaluate_cost(w, extr, bacfg))

    # unit: escape releases exactly the corrupted track
    w2 = ba.plane_track_escape(w, extr, life,
                               min_life=cfg.plane_min_track_life,
                               escape_dist=cfg.plane_escape_distance)
    flags2 = np.array(w2.track_flags)
    assert not (flags2[c] & TF_PLANE)
    assert flags2[c] & TF_VALID
    assert int(np.array(w2.plane_id)[c]) == -1
    # re-triangulated depth is back near truth (the cast depth was wrong)
    assert abs(float(np.array(w2.inv_depth)[c]) - true_inv_d) < 0.05 * true_inv_d
    # genuine members stay on the plane
    genuine = members_before.copy()
    genuine[c] = False
    assert ((flags2[genuine] & TF_PLANE) != 0).all()
    cost_escaped = float(ba.evaluate_cost(w2, extr, bacfg))
    assert cost_escaped < cost_bad

    # end-to-end: the fused ba_step applies the escape after the solve
    hw.fix_mask[0] = True
    F, N = cfg.window_frame_capacity, cfg.imu_buffer_capacity
    dt = np.float64
    imu_ops = (np.zeros((F, N), dt), np.zeros((F, N, 3), dt),
               np.zeros((F, N, 3), dt), np.zeros((F, N), bool),
               hw.frame_t.astype(dt))
    w_in, ops = hw.to_device(extra=imu_ops + (hw.track_life.copy(),))
    w_out, sol_info, _, _ = kern.ba_step(w_in, *ops, False)
    flags_out = np.array(w_out.track_flags)
    assert not (flags_out[c] & TF_PLANE)
    assert flags_out[c] & TF_VALID
    assert float(sol_info["final_cost"]) < float(sol_info["initial_cost"])


def test_noise_scaled_plane_gates(plane_scene):
    """Noise-scaled membership tests (beyond-reference; PERF_NOTES r3):

    (a) escape — a handful of members whose observations actually see a
        point 9 cm off the plane (a bad adoption at below the reference's
        0.1 m radar, bundle_adjustor.cpp:263) must be shed by the
        sigma-scaled gate while genuine members stay;
    (a') a uniform plane-parameter shift is COMMON-MODE (the anchored
        plane lagging window drift) and must shed nobody;
    (b) adoption — extend_planes must not adopt confidently-off-plane
        tracks, and must NOT overwrite adopted tracks' triangulated
        inverse depth (the cast-point overwrite was a measured
        contamination path on degraded imagery)."""
    from pvio_tpu.geometry import nplie

    cfg = plane_config()
    kf = [0, 4, 8, 12, 16, 20]
    hw, extr, info = make_host_window(plane_scene, cfg, kf)
    kern = DeviceKernels(cfg)
    pe = PlaneExtractor(cfg, kern)
    pe.update_map(hw)
    s = int(np.nonzero(hw.plane_mask)[0][0])
    members = ((hw.plane_id == s) & hw.track_mask
               & ((hw.track_flags & TF_PLANE) != 0))
    assert members.sum() >= 25
    n_pl = hw.plane_normal[s]

    # (a) rewrite 4 members' observations to view a point 9 cm off the
    # plane along its normal — what a bad adoption near a wall edge
    # looks like; below the reference 0.1 m gate
    q_bc, p_bc = np.asarray(cfg.q_bc), np.asarray(cfg.p_bc)

    def reobserve(c, x_new):
        for f in np.nonzero(hw.obs_mask[:, c] & hw.frame_mask)[0]:
            q_wc = nplie.quat_mul(hw.q[f], q_bc)
            o = hw.p[f] + nplie.quat_to_mat(hw.q[f]) @ p_bc
            y = nplie.quat_to_mat(q_wc).T @ (x_new - o)
            hw.kp[f, c] = y[:2] / y[2]

    pts0 = pe._landmarks(hw)
    # pick mature members (escape needs life > plane_min_track_life)
    n_obs = (hw.obs_mask & hw.frame_mask[:, None]).sum(axis=0)
    bad = np.nonzero(members & (n_obs >= 5))[0][:4]
    assert len(bad) == 4
    for c in bad:
        reobserve(int(c), pts0[c] + 0.09 * n_pl)

    w = hw.to_device()
    life = jnp.asarray(hw.track_life)
    K = cfg.K
    f_px = float(0.5 * (K[0, 0] + K[1, 1]))
    sigma_px = float(np.sqrt(np.mean(np.diag(cfg.camera_noise_cov))))

    w_legacy = ba.plane_track_escape(
        w, extr, life, min_life=cfg.plane_min_track_life, escape_dist=0.1)
    legacy_escaped = members & (
        (np.array(w_legacy.track_flags) & TF_PLANE) == 0)
    assert legacy_escaped.sum() == 0, "0.1 m gate must not see 9 cm offsets"

    w_sigma = ba.plane_track_escape(
        w, extr, life, min_life=cfg.plane_min_track_life, escape_dist=0.1,
        kp_sigma_px=sigma_px, f_px=f_px, sigma_k=3.0, dist_floor=0.005)
    flags_s = np.array(w_sigma.track_flags)
    assert ((flags_s[bad] & TF_PLANE) == 0).all(), "bad members must escape"
    genuine = members.copy()
    genuine[bad] = False
    stay = ((flags_s[genuine] & TF_PLANE) != 0)
    assert stay.mean() > 0.9, f"genuine members kept: {stay.mean():.2f}"

    # (a') a uniform 8 cm plane shift is common-mode: nobody escapes
    hw2s, _, _ = make_host_window(plane_scene, cfg, kf)
    pe2s = PlaneExtractor(cfg, kern)
    pe2s.update_map(hw2s)
    s2s = int(np.nonzero(hw2s.plane_mask)[0][0])
    members2 = ((hw2s.plane_id == s2s) & hw2s.track_mask
                & ((hw2s.track_flags & TF_PLANE) != 0))
    hw2s.plane_distance[s2s] += 0.08
    w_shift = ba.plane_track_escape(
        hw2s.to_device(), extr, jnp.asarray(hw2s.track_life),
        min_life=cfg.plane_min_track_life, escape_dist=0.1,
        kp_sigma_px=sigma_px, f_px=f_px, sigma_k=3.0, dist_floor=0.005)
    shed = members2 & ((np.array(w_shift.track_flags) & TF_PLANE) == 0)
    assert shed.sum() == 0, "uniform plane shift must be absorbed as drift"

    # (b) fresh window: adoption must keep depths and reject off-plane
    hw2, extr2, info2 = make_host_window(plane_scene, cfg, kf)
    pe2 = PlaneExtractor(cfg, kern)
    pe2.update_map(hw2)
    s2 = int(np.nonzero(hw2.plane_mask)[0][0])
    before_plane = (hw2.track_flags & TF_PLANE) != 0
    depth_before = hw2.inv_depth.copy()
    pe2.extend_planes(hw2)
    adopted = ((hw2.track_flags & TF_PLANE) != 0) & ~before_plane
    chosen = info2["chosen"]
    for c in np.nonzero(adopted)[0]:
        assert plane_scene.plane_of_point[chosen[c]] == 0, (
            f"track {c} adopted but its true point is off-plane")
        assert hw2.inv_depth[c] == depth_before[c], (
            "adoption must not overwrite the triangulated depth")


def test_adoption_gate_regression_net(plane_scene):
    """Adoption-gate regression net (round-3 verdict item 6): the
    chi2/sigma adoption gates must SIMULTANEOUSLY (a) keep adopting
    genuine members on clean data and (b) reject contamination under
    noise — asserted on BOTH regimes so a future gate recalibration
    cannot silently break one side (the round-3 regression broke the
    clean side while tuning for noise; extend_planes semantics,
    plane_extractor.cpp:131-145)."""
    from pvio_tpu.map import window as win

    kf = [0, 4, 8, 12, 16, 20]

    def regime(kp_noise_px):
        cfg = plane_config()
        hw, extr, info = make_host_window(plane_scene, cfg, kf)
        kern = DeviceKernels(cfg)
        if kp_noise_px > 0:
            rng = np.random.default_rng(7)
            hw.kp = hw.kp + rng.normal(size=hw.kp.shape) * (kp_noise_px / 200.0)
            cfg.camera_noise_cov = np.eye(2) * kp_noise_px ** 2
            # realistic estimation state: depths from the NOISY
            # observations, not oracle depths
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
        unflag = np.nonzero(members)[0][::2]
        for c in unflag:
            hw.track_flags[c] &= ~TF_PLANE
            hw.plane_id[c] = -1
        before = (hw.track_flags & TF_PLANE) != 0
        pe.extend_planes(hw)
        adopted = ((hw.track_flags & TF_PLANE) != 0) & ~before
        chosen = info["chosen"]
        true_on = np.array([plane_scene.plane_of_point[chosen[c]] == 0
                            for c in range(info["n_tracks"])])
        return adopted[unflag].sum() / len(unflag), int((adopted & ~true_on).sum())

    # clean floor: the gates must not starve adoption (measured 100%)
    readopt, wrong = regime(0.0)
    assert readopt >= 0.9, f"clean re-adoption collapsed to {readopt:.0%}"
    assert wrong == 0, f"{wrong} off-plane tracks adopted on clean data"
    # noisy ceiling: contamination must stay out (measured 82% / 0 wrong
    # at 2 px noise with noisy re-triangulated depths)
    readopt_n, wrong_n = regime(2.0)
    assert readopt_n >= 0.6, f"noisy re-adoption collapsed to {readopt_n:.0%}"
    assert wrong_n <= 1, f"{wrong_n} off-plane tracks adopted under noise"


def test_escape_reanchor_regression_net(plane_scene):
    """Escape/re-anchor regression net (round-4 verdict item 6), the
    drifted-gauge counterpart of the adoption net above: the per-keyframe
    gauge re-anchor (plane_extractor.update_parameters with
    plane_estimate_in_solver; reference refit plane.cpp:64-114) and the
    post-solve escape (bundle_adjustor.cpp:251-275) must TOGETHER
    (a) not mass-escape genuine members when the window gauge has
    drifted relative to the detection-time plane parameters,
    (b) still escape a genuinely off-plane bad adoption, and
    (c) re-anchor the plane onto the drifted gauge within a tight bound.
    These three behaviors carried the round-4 hard-mode headline win and
    were previously protected only by end-to-end ATE."""
    from pvio_tpu.geometry import nplie

    cfg = plane_config()
    cfg.plane_estimate_in_solver = True
    cfg.plane_escape_min_life = 4
    kf = [0, 4, 8, 12, 16, 20]
    hw, extr, info = make_host_window(plane_scene, cfg, kf)
    kern = DeviceKernels(cfg)
    pe = PlaneExtractor(cfg, kern)
    pe.update_map(hw)
    assert hw.plane_mask.sum() == 1
    s = int(np.nonzero(hw.plane_mask)[0][0])

    # a genuinely off-plane bad adoption (flag + cast, like a wrong
    # extend_planes decision)
    c_bad, true_inv_d = _corrupt_adoption(hw, pe, info, plane_scene, s)
    members = ((hw.plane_id == s) & hw.track_mask
               & ((hw.track_flags & TF_PLANE) != 0))
    genuine = members.copy()
    genuine[c_bad] = False
    assert genuine.sum() >= 25

    # simulate accumulated gauge drift: rigidly transform the WHOLE
    # window (small pitch/roll + translation) while the plane keeps its
    # detection-time parameters. Observations/inv-depths are camera-
    # frame quantities — unchanged under a rigid world transform.
    rv = np.array([0.5, 1.5, 0.8]) * np.pi / 180.0  # ~1.8 deg total
    dq = nplie.expmap(rv)
    Rd = nplie.quat_to_mat(dq)
    t_shift = np.array([0.05, -0.03, 0.04])
    for f in np.nonzero(hw.frame_mask)[0]:
        hw.q[f] = nplie.quat_mul(dq, hw.q[f])
        hw.p[f] = Rd @ hw.p[f] + t_shift
        hw.v[f] = Rd @ hw.v[f]
    n_stale = hw.plane_normal[s].copy()
    d_stale = float(hw.plane_distance[s])
    # the true plane expressed in the drifted gauge
    n_true = Rd @ n_stale
    d_true = d_stale + float(n_true @ t_shift)

    # fresh triangulations from the drifted poses (what ba_step's fetch
    # delivers to the host refit in production)
    w = hw.to_device()
    pts_d, inv_d_d, ok_d = win.triangulate_tracks(w, kern.extr)
    baseline_d = win.track_baselines(w)
    fresh = tuple(np.asarray(a) for a in (pts_d, inv_d_d, ok_d, baseline_d))

    # the drift scenario must actually be stressful: members are spread
    # 0.05-0.2 m around the STALE plane (tilt + offset), i.e. without a
    # re-anchor the sigma escape would shed genuine members
    K = cfg.K
    f_px = float(0.5 * (K[0, 0] + K[1, 1]))
    sigma_px = float(np.sqrt(np.mean(np.diag(cfg.camera_noise_cov))))
    life = jnp.asarray(hw.track_life)
    w_noanchor = ba.plane_track_escape(
        w, kern.extr, life, min_life=cfg.plane_min_track_life,
        escape_dist=0.1, kp_sigma_px=sigma_px, f_px=f_px, sigma_k=3.0,
        dist_floor=0.005)
    shed_noanchor = genuine & (
        (np.array(w_noanchor.track_flags) & TF_PLANE) == 0)
    assert shed_noanchor.sum() >= 1, (
        "drift scenario too mild — the stale-anchor escape sheds nobody, "
        "so the net would not exercise the re-anchor's job")

    # (c) re-anchor: the robust refit must track the drifted gauge
    pe.update_parameters(hw, fresh=fresh)
    n_re = hw.plane_normal[s]
    if n_re @ n_true < 0:
        n_re, d_re = -n_re, -float(hw.plane_distance[s])
    else:
        d_re = float(hw.plane_distance[s])
    assert float(n_re @ n_true) > 0.9995, (
        f"re-anchored normal off by {np.degrees(np.arccos(min(1.0, float(n_re @ n_true)))):.2f} deg")
    assert abs(d_re - d_true) < 0.02, (d_re, d_true)

    # (a)+(b): escape AFTER the re-anchor sheds exactly the bad adoption
    w2 = hw.to_device()
    w_escaped = ba.plane_track_escape(
        w2, kern.extr, life, min_life=cfg.plane_min_track_life,
        escape_dist=0.1, kp_sigma_px=sigma_px, f_px=f_px, sigma_k=3.0,
        dist_floor=0.005)
    flags2 = np.array(w_escaped.track_flags)
    assert not (flags2[c_bad] & TF_PLANE), (
        "genuinely off-plane bad adoption must escape")
    assert flags2[c_bad] & TF_VALID
    stay = ((flags2[genuine] & TF_PLANE) != 0)
    assert stay.mean() > 0.95, (
        f"re-anchored escape must not mass-shed: kept {stay.mean():.2f}")
    # the escaped track's depth returns to (near) its free-point truth
    assert abs(float(np.array(w_escaped.inv_depth)[c_bad]) - true_inv_d) \
        < 0.05 * true_inv_d


def test_plane_track_points_for_pnp(plane_scene):
    cfg = plane_config()
    kf = [0, 4, 8, 12, 16]
    hw, extr, info = make_host_window(plane_scene, cfg, kf)
    kern = DeviceKernels(cfg)
    pe = PlaneExtractor(cfg, kern)
    pe.update_map(hw)
    w = hw.to_device()
    x0 = kern.landmarks(w)
    x1 = pe.plane_track_points(w, x0)
    is_plane = (np.array(w.track_flags) & TF_PLANE) != 0
    # plane tracks: substituted point lies on the plane
    s = int(np.nonzero(hw.plane_mask)[0][0])
    d = np.einsum("ti,i->t", np.asarray(x1), hw.plane_normal[s]) - hw.plane_distance[s]
    assert np.abs(d[is_plane]).max() < 1e-6
    # non-plane tracks unchanged
    assert np.allclose(np.asarray(x1)[~is_plane], np.asarray(x0)[~is_plane])


def test_plane_prior_improves_noisy_window():
    """The paper's core claim (README:1-3, bundle_adjustor.cpp:162-196),
    asserted at the tier where it is deterministic: under significant
    keypoint noise, arming the plane prior must reduce window pose error
    substantially vs the plane-free solve (measured ~2x at 3 px noise),
    and the anchored in-solve plane estimation must not give that back."""
    import jax
    from pvio_tpu.estimation import ba as ba_mod
    from pvio_tpu.io import synthetic

    scene = synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                                 n_points=140, n_plane_points=160, seed=648)
    noise_px = 3.0
    w, extr, info = synthetic.solver_window_from_scene(
        scene, list(range(0, 32, 4)), F_cap=9, T_cap=256, dtype=jnp.float64,
        kp_noise=noise_px / 458.0)
    w, n_members = synthetic.flag_plane_tracks(w, scene, info)
    assert n_members >= 20
    rng = np.random.default_rng(1)
    wp = w._replace(
        p=w.p + jnp.asarray(rng.normal(size=w.p.shape)) * 0.02,
        fix_mask=jnp.zeros_like(w.fix_mask).at[0].set(True))
    gt_p = np.array(w.p)
    fm = np.array(w.frame_mask)

    def err(planes, est):
        cfg = ba_mod.BAConfig(iterations=15, kp_sqrt_inv_cov=458.0 / noise_px,
                              use_planes=planes, estimate_planes=est,
                              use_inertial=True, min_plane_tracks=20)
        w2, _ = ba_mod.solve(wp, extr, cfg)
        return float(np.linalg.norm(np.array(w2.p) - gt_p, axis=1)[fm].mean())

    e_off = err(False, False)
    e_fixed = err(True, False)
    e_anchored = err(True, True)
    # measured: 31.3 / 16.8 / 16.7 mm
    assert e_fixed < 0.75 * e_off, (e_fixed, e_off)
    assert e_anchored < 0.75 * e_off, (e_anchored, e_off)
    # the anchor must hold: anchored estimation within 25% of fixed-plane
    assert e_anchored < 1.25 * e_fixed, (e_anchored, e_fixed)
