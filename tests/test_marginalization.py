"""Marginalization + PnP validation.

Key property (the 'subtle and silently wrong if mismatched' part, SURVEY
§7): after marginalizing the oldest frame, the prior must encode the same
information about the remaining states — re-solving the reduced window
with the prior should reproduce (approximately) the full-window solution,
and the prior gradient must vanish at the linearization point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvio_tpu.estimation import ba, factors, marginalization as marg, pnp
from pvio_tpu.geometry import lie
from pvio_tpu.imu import preintegration as pre
from pvio_tpu.io import synthetic
from pvio_tpu.map import window as win

from tests.helpers import build_window, imu_noise


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(duration=3.0, n_points=140)


def cfg():
    return ba.BAConfig(iterations=8, kp_sqrt_inv_cov=400.0, use_planes=False)


def test_prior_zero_residual_at_linearization(scene):
    w, extr, info = build_window(scene, [0, 4, 8, 12, 16], F_cap=6, T_cap=48)
    w2 = marg.marginalize_and_remove(w, extr, cfg(), index=0)
    # at the capture point the prior residual equals infovec; gradient of
    # 0.5*|r|^2 w.r.t. the states is sqrt_info^T @ r
    r = factors.marginalization_residual(w2.q, w2.p, w2.v, w2.bg, w2.ba, w2.prior)
    g = w2.prior.sqrt_info.T @ r
    # the gradient should match b of the accumulated system (Schur'd), i.e.
    # the prior reproduces first-order information; at a BA optimum it is ~0
    assert np.all(np.isfinite(np.asarray(r)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_marginalization_preserves_solution(scene, rng):
    """Solve full window; marginalize frame 0; perturb; re-solve reduced
    window; states must return near the full solution (gauge now held by
    the prior, no fixed frames)."""
    kf = [0, 4, 8, 12, 16, 20]
    w_true, extr, info = build_window(scene, kf, F_cap=6, T_cap=48)
    c = cfg()
    w_opt, _ = ba.solve(w_true, extr, c)

    # hand gauge-keeping over from fix_mask to the anchoring prior before
    # marginalizing (init -> SWT transition, sliding_window_tracker.cpp:90-113)
    w_opt = w_opt._replace(prior=marg.make_initial_prior(w_opt))
    w_reb = marg.rebase_tracks(w_opt, extr, removed_slot=0)
    w_m = marg.marginalize_and_remove(w_reb, extr, c, index=0)
    w_m = w_m._replace(fix_mask=jnp.zeros_like(w_m.fix_mask))  # prior holds gauge

    nkf = info["n_frames"] - 1
    # perturb remaining states slightly
    F = w_m.q.shape[0]
    dq = jnp.asarray(rng.normal(size=(F, 3)) * 0.002)
    dp = jnp.asarray(rng.normal(size=(F, 3)) * 0.005)
    w_p = w_m._replace(
        q=lie.quat_normalize(lie.quat_mul(w_m.q, lie.expmap(dq))),
        p=w_m.p + dp,
    )
    w_s, out = ba.solve(w_p, extr, c)
    p_err = np.linalg.norm(np.asarray(w_s.p - w_m.p)[:nkf], axis=-1)
    assert p_err.max() < 1e-3, p_err
    for f in range(nkf):
        d = lie.quat_mul(lie.quat_conj(w_m.q[f]), w_s.q[f])
        assert np.linalg.norm(np.asarray(lie.logmap(d))) < 1e-3


def test_rebase_tracks_preserves_landmarks(scene):
    w, extr, info = build_window(scene, [0, 4, 8, 12], F_cap=5, T_cap=48)
    x_before = np.asarray(win.landmark_points(w, extr))
    w2 = marg.rebase_tracks(w, extr, removed_slot=0)
    x_after = np.asarray(win.landmark_points(w2, extr))
    moved = np.asarray(w.ref_frame != w2.ref_frame)
    L = info["n_tracks"]
    still_valid = np.asarray(w2.track_mask)[:L]
    sel = moved[:L] & still_valid
    assert sel.sum() > 0  # some tracks were re-based
    assert np.allclose(x_before[:L][sel], x_after[:L][sel], atol=1e-9)
    assert np.all(np.asarray(w2.ref_frame)[:L][still_valid] != 0)


def test_pnp_refines_predicted_pose(scene, rng):
    """Perturb the newest frame pose; PnP with fixed landmarks + IMU prior
    must pull it back to ground truth."""
    kf = [0, 4, 8, 12, 16]
    w, extr, info = build_window(scene, kf, F_cap=5, T_cap=48)
    new = info["n_frames"] - 1
    last = new - 1

    x_world = win.landmark_points(w, extr)
    obs_mask = w.obs_mask[new] & w.obs_mask[last] & w.track_mask
    z_obs = w.kp[new]

    q_t, p_t = w.q[new], w.p[new]
    q0 = lie.quat_mul(q_t, lie.expmap(jnp.asarray(rng.normal(size=3) * 0.01)))
    p0 = p_t + jnp.asarray(rng.normal(size=3) * 0.03)
    v0 = w.v[new] + jnp.asarray(rng.normal(size=3) * 0.05)

    delta = jax.tree.map(lambda a: a[new], w.delta)
    c = pnp.PnPConfig(iterations=10, kp_sqrt_inv_cov=400.0)
    q, p, v, bg, ba = pnp.solve_pnp(
        q0, p0, v0, w.bg[new], w.ba[new],
        w.q[last], w.p[last], w.v[last], w.bg[last], w.ba[last],
        delta, w.bg_lin[new], w.ba_lin[new],
        x_world, z_obs, obs_mask, extr, c,
    )
    assert np.linalg.norm(np.asarray(p - p_t)) < 1e-4
    assert np.linalg.norm(np.asarray(lie.logmap(lie.quat_mul(lie.quat_conj(q_t), q)))) < 1e-4
    assert np.linalg.norm(np.asarray(v - w.v[new])) < 5e-3


def test_pnp_vision_only(scene, rng):
    kf = [0, 4, 8, 12]
    w, extr, info = build_window(scene, kf, F_cap=4, T_cap=48)
    new = info["n_frames"] - 1
    x_world = win.landmark_points(w, extr)
    obs_mask = w.obs_mask[new] & w.track_mask
    q_t, p_t = w.q[new], w.p[new]
    q0 = lie.quat_mul(q_t, lie.expmap(jnp.asarray(rng.normal(size=3) * 0.02)))
    p0 = p_t + jnp.asarray(rng.normal(size=3) * 0.05)
    c = pnp.PnPConfig(iterations=10, kp_sqrt_inv_cov=400.0, use_inertial=False)
    dummy = jax.tree.map(lambda a: a[0], w.delta)
    q, p, v, bg, ba = pnp.solve_pnp(
        q0, p0, w.v[new], w.bg[new], w.ba[new],
        w.q[0], w.p[0], w.v[0], w.bg[0], w.ba[0],
        dummy, w.bg_lin[0], w.ba_lin[0],
        x_world, w.kp[new], obs_mask, extr, c,
    )
    assert np.linalg.norm(np.asarray(p - p_t)) < 1e-6
    assert np.linalg.norm(np.asarray(lie.logmap(lie.quat_mul(lie.quat_conj(q_t), q)))) < 1e-6
