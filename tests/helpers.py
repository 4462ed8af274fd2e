"""Shared test utilities: build WindowState fixtures from synthetic scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from pvio_tpu.geometry import lie
from pvio_tpu.imu import preintegration as pre
from pvio_tpu.io import synthetic
from pvio_tpu.map import window as win


def imu_noise(dtype=jnp.float64):
    return pre.ImuNoise.isotropic(1e-4, 1e-2, 1e-8, 1e-6, dtype=dtype)


def build_window(
    scene: synthetic.SyntheticScene,
    kf_indices,
    F_cap=8,
    T_cap=64,
    P_cap=4,
    dtype=jnp.float64,
    kp_noise=0.0,
    seed=1,
    bg_est=None,
    ba_est=None,
):
    """Ground-truth window from a synthetic scene: true states, true
    depths, preintegrated deltas at bias estimate (bg_est, ba_est)."""
    nkf = len(kf_indices)
    assert nkf <= F_cap
    w = win.empty_window(F_cap, T_cap, P_cap, dtype)
    extr = win.Extrinsics.identity(dtype)

    kp, vis = synthetic.project_points(scene, kf_indices, kp_noise=kp_noise, seed=seed)
    # choose up to T_cap tracks observed in >= 2 frames
    counts = vis.sum(axis=0)
    order = np.argsort(-counts)
    chosen = [l for l in order if counts[l] >= 2][:T_cap]
    L = len(chosen)

    kp_grid = np.zeros((F_cap, T_cap, 2))
    obs = np.zeros((F_cap, T_cap), dtype=bool)
    kp_grid[:nkf, :L] = kp[:, chosen]
    obs[:nkf, :L] = vis[:, chosen]

    ref = np.argmax(obs, axis=0)  # first observing frame
    # true inverse depth in the reference frame camera
    pts = scene.points[chosen]
    q_ref = scene.q_wb[np.asarray(kf_indices)[ref[:L]]]
    p_ref = scene.p_wb[np.asarray(kf_indices)[ref[:L]]]
    R_cw = np.asarray(lie.quat_to_mat(lie.quat_conj(jnp.asarray(q_ref))))
    y = np.einsum("lij,lj->li", R_cw, pts - p_ref)
    inv_depth = np.ones(T_cap)
    inv_depth[:L] = 1.0 / y[:, 2]

    # preintegrate IMU between consecutive keyframes
    bg_est = np.zeros(3) if bg_est is None else np.asarray(bg_est)
    ba_est = np.zeros(3) if ba_est is None else np.asarray(ba_est)
    noise = imu_noise(dtype)
    deltas = []
    dvalid = np.zeros(F_cap, dtype=bool)
    cap = int(np.ceil(scene.imu_t.shape[0] / max(nkf - 1, 1))) + 8
    empty = win.empty_delta(1, dtype)
    for j in range(F_cap):
        if 1 <= j < nkf:
            t0 = scene.frame_t[kf_indices[j - 1]]
            t1 = scene.frame_t[kf_indices[j]]
            sel = (scene.imu_t >= t0) & (scene.imu_t < t1)
            ts = scene.imu_t[sel]
            n = len(ts)
            ts_p = np.zeros(cap)
            ws_p = np.zeros((cap, 3))
            as_p = np.zeros((cap, 3))
            m_p = np.zeros(cap, dtype=bool)
            ts_p[:n] = ts
            ws_p[:n] = scene.gyro[sel]
            as_p[:n] = scene.accel[sel]
            m_p[:n] = True
            d = pre.preintegrate(
                jnp.asarray(ts_p, dtype), jnp.asarray(ws_p, dtype),
                jnp.asarray(as_p, dtype), jnp.asarray(m_p), t1,
                jnp.asarray(bg_est, dtype), jnp.asarray(ba_est, dtype), noise,
            )
            deltas.append(d)
            dvalid[j] = True
        else:
            deltas.append(jax.tree.map(lambda a: a[0], empty))
    delta = jax.tree.map(lambda *xs: jnp.stack(xs), *deltas)

    fm = np.zeros(F_cap, dtype=bool)
    fm[:nkf] = True
    q = np.tile([1.0, 0, 0, 0], (F_cap, 1))
    p = np.zeros((F_cap, 3))
    v = np.zeros((F_cap, 3))
    q[:nkf] = scene.q_wb[kf_indices]
    p[:nkf] = scene.p_wb[kf_indices]
    v[:nkf] = scene.v_wb[kf_indices]

    flags = np.where(np.arange(T_cap) < L, win.TF_VALID, 0).astype(np.int32)

    w = w._replace(
        q=jnp.asarray(q, dtype),
        p=jnp.asarray(p, dtype),
        v=jnp.asarray(v, dtype),
        bg=jnp.tile(jnp.asarray(bg_est, dtype), (F_cap, 1)),
        ba=jnp.tile(jnp.asarray(ba_est, dtype), (F_cap, 1)),
        frame_mask=jnp.asarray(fm),
        fix_mask=jnp.zeros(F_cap, bool).at[0].set(True),
        delta=delta,
        delta_valid=jnp.asarray(dvalid),
        bg_lin=jnp.tile(jnp.asarray(bg_est, dtype), (F_cap, 1)),
        ba_lin=jnp.tile(jnp.asarray(ba_est, dtype), (F_cap, 1)),
        inv_depth=jnp.asarray(inv_depth, dtype),
        ref_frame=jnp.asarray(ref, jnp.int32),
        track_mask=jnp.arange(T_cap) < L,
        track_flags=jnp.asarray(flags),
        kp=jnp.asarray(kp_grid, dtype),
        obs_mask=jnp.asarray(obs),
    )
    return w, extr, {"n_frames": nkf, "n_tracks": L, "chosen": chosen}
