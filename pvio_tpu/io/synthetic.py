"""Synthetic VIO scene generator (host-side, numpy).

The reference validates against EuRoC/TUM-VI datasets; none are available
in this environment, so the framework carries its own simulator: a smooth
analytic trajectory, landmarks (free-space + on planes), pinhole
projections with body-camera extrinsics, and IMU samples derived from the
trajectory (gyro from quaternion differencing, accelerometer from the
second derivative plus gravity, expressed in body frame). This plays the
role of the golden-run datasets in SURVEY §4 and feeds bench.py.
"""

from typing import NamedTuple, Optional

import numpy as np

from pvio_tpu.geometry import lie
from pvio_tpu.imu.preintegration import GRAVITY_NOMINAL

import jax.numpy as jnp

GRAVITY = np.array([0.0, 0.0, -GRAVITY_NOMINAL])


class SyntheticScene(NamedTuple):
    # trajectory at frame rate (body frame states, world coords)
    frame_t: np.ndarray     # (N,)
    q_wb: np.ndarray        # (N, 4)
    p_wb: np.ndarray        # (N, 3)
    v_wb: np.ndarray        # (N, 3)
    # imu stream
    imu_t: np.ndarray       # (M,)
    gyro: np.ndarray        # (M, 3) body angular rate (with bias+noise if any)
    accel: np.ndarray       # (M, 3) specific force in body frame
    bg_true: np.ndarray     # (3,)
    ba_true: np.ndarray     # (3,)
    # structure
    points: np.ndarray      # (L, 3)
    plane_of_point: np.ndarray  # (L,) int, -1 = free-space point
    plane_normals: np.ndarray   # (P, 3)
    plane_distances: np.ndarray  # (P,)


def _traj_pose(t, span=8.0):
    """Smooth analytic trajectory: slow oval + yaw sweep + gentle roll."""
    w = 2 * np.pi / span
    p = np.stack(
        [1.2 * np.sin(w * t), 0.8 * np.sin(2 * w * t), 0.25 * np.sin(w * t + 0.4)],
        axis=-1,
    )
    yaw = 0.5 * np.sin(w * t)
    pitch = 0.12 * np.sin(2 * w * t + 0.3)
    roll = 0.10 * np.sin(w * t + 1.1)
    rv = np.stack([roll, pitch, yaw], axis=-1)
    q = np.asarray(lie.expmap(jnp.asarray(rv)))
    return q, p


def make_scene(
    seed=648,
    duration=4.0,
    fps=20.0,
    imu_rate=200.0,
    n_points=160,
    n_plane_points=0,
    plane_z=-0.6,
    gyro_noise=0.0,
    accel_noise=0.0,
    bg=(0.0, 0.0, 0.0),
    ba=(0.0, 0.0, 0.0),
) -> SyntheticScene:
    rng = np.random.default_rng(seed)
    assert imu_rate % fps == 0, "frame times must align with the IMU grid"
    stride = int(round(imu_rate / fps))
    imu_t = np.arange(0.0, duration + 0.5 / imu_rate, 1.0 / imu_rate)
    n_frames = int(duration * fps)
    frame_idx = np.arange(n_frames) * stride
    frame_t = imu_t[frame_idx]

    # Sample ideal gyro/accel from the analytic trajectory...
    h = 1e-4

    def vel(t):
        _, pp = _traj_pose(t + h)
        _, pm = _traj_pose(t - h)
        return (pp - pm) / (2 * h)

    def acc(t):
        _, pp = _traj_pose(t + h)
        _, p0 = _traj_pose(t)
        _, pm = _traj_pose(t - h)
        return (pp - 2 * p0 + pm) / (h * h)

    q_i, _ = _traj_pose(imu_t)
    q_ip, _ = _traj_pose(imu_t + h)
    # body angular rate: omega = logmap(q(t)^-1 q(t+h)) / h
    dq = lie.quat_mul(lie.quat_conj(jnp.asarray(q_i)), jnp.asarray(q_ip))
    omega = np.asarray(lie.logmap(dq)) / h
    a_w = acc(imu_t)
    # specific force in body frame: f = R_wb^T (a - g)
    R_bw = np.asarray(lie.quat_to_mat(lie.quat_conj(jnp.asarray(q_i))))
    f_b = np.einsum("nij,nj->ni", R_bw, a_w - GRAVITY)

    bg = np.asarray(bg, float)
    ba = np.asarray(ba, float)
    gyro = omega + bg + rng.normal(size=omega.shape) * gyro_noise
    accel = f_b + ba + rng.normal(size=f_b.shape) * accel_noise

    # ...then define ground truth AS the piecewise-constant integration of
    # the bias-corrected noise-free samples, so preintegrated deltas are
    # exactly consistent with the trajectory (no discretization mismatch).
    q_all = np.zeros((len(imu_t), 4))
    p_all = np.zeros((len(imu_t), 3))
    v_all = np.zeros((len(imu_t), 3))
    q0, p0 = _traj_pose(np.array([0.0]))
    q_all[0] = q0[0]
    p_all[0] = p0[0]
    v_all[0] = vel(np.array([0.0]))[0]
    for i in range(len(imu_t) - 1):
        dt = imu_t[i + 1] - imu_t[i]
        Rwb = np.asarray(lie.quat_to_mat(jnp.asarray(q_all[i])))
        a_world = Rwb @ f_b[i] + GRAVITY
        p_all[i + 1] = p_all[i] + dt * v_all[i] + 0.5 * dt * dt * a_world
        v_all[i + 1] = v_all[i] + dt * a_world
        qn = np.asarray(
            lie.quat_mul(jnp.asarray(q_all[i]), lie.expmap(jnp.asarray(omega[i] * dt)))
        )
        q_all[i + 1] = qn / np.linalg.norm(qn)
    q_f = q_all[frame_idx]
    p_f = p_all[frame_idx]
    v_f = v_all[frame_idx]

    # landmarks in a shell around the trajectory, in front of the cameras
    pts = rng.uniform(-1.0, 1.0, size=(n_points, 3)) * np.array([4.0, 4.0, 1.5])
    pts[:, 2] += rng.uniform(1.0, 3.0, size=n_points)  # mostly above/around
    plane_of_point = -np.ones(n_points + n_plane_points, dtype=np.int64)
    if n_plane_points > 0:
        # horizontal plane z = plane_z (normal +z, distance plane_z)
        ppts = np.concatenate(
            [rng.uniform(-4.0, 4.0, size=(n_plane_points, 2)),
             np.full((n_plane_points, 1), plane_z)], axis=-1
        )
        pts = np.concatenate([pts, ppts], axis=0)
        plane_of_point[n_points:] = 0
        plane_normals = np.array([[0.0, 0.0, 1.0]])
        plane_distances = np.array([plane_z])
    else:
        plane_normals = np.zeros((0, 3))
        plane_distances = np.zeros((0,))

    return SyntheticScene(
        frame_t=frame_t, q_wb=q_f, p_wb=p_f, v_wb=v_f,
        imu_t=imu_t, gyro=gyro, accel=accel, bg_true=bg, ba_true=ba,
        points=pts, plane_of_point=plane_of_point,
        plane_normals=plane_normals, plane_distances=plane_distances,
    )


def project_points(scene: SyntheticScene, frame_indices, q_bc=None, p_bc=None,
                   max_angle_tan=0.9, min_z=0.3, kp_noise=0.0, seed=0):
    """Project all landmarks into the chosen frames.

    Returns (kp (F, L, 2) normalized coords, visible (F, L) bool).
    """
    rng = np.random.default_rng(seed)
    if q_bc is None:
        q_bc = np.array([1.0, 0, 0, 0])
    if p_bc is None:
        p_bc = np.zeros(3)
    q = scene.q_wb[frame_indices]
    p = scene.p_wb[frame_indices]
    q_wc = np.asarray(lie.quat_mul(jnp.asarray(q), jnp.asarray(np.broadcast_to(q_bc, q.shape))))
    p_wc = p + np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(np.broadcast_to(p_bc, p.shape))))
    R_cw = np.asarray(lie.quat_to_mat(lie.quat_conj(jnp.asarray(q_wc))))
    rel = scene.points[None, :, :] - p_wc[:, None, :]
    y = np.einsum("fij,flj->fli", R_cw, rel)
    z = y[..., 2]
    visible = z > min_z
    zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
    kp = y[..., :2] / zs[..., None]
    visible &= np.all(np.abs(kp) < max_angle_tan, axis=-1)
    if kp_noise > 0:
        kp = kp + rng.normal(size=kp.shape) * kp_noise
    return kp, visible
