"""Bundle-adjustment solver validation on synthetic windows.

Covers: gradient consistency of the full linearization (the
CostFunctionValidator role, cost_function_validator.h:26-328), LM
convergence to ground truth with visual-inertial factors, bias recovery,
and robustness plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvio_tpu.estimation import ba, factors
from pvio_tpu.geometry import lie
from pvio_tpu.imu import preintegration as pre
from pvio_tpu.io import synthetic
from pvio_tpu.map import window as win

from tests.helpers import build_window, imu_noise


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(duration=2.0, n_points=120)


def make_cfg(**kw):
    base = dict(iterations=8, kp_sqrt_inv_cov=400.0, use_planes=False)
    base.update(kw)
    return ba.BAConfig(**base)


def perturb_window(w, rng, pose_sigma=0.01, rot_sigma=0.005, depth_sigma=0.02,
                   v_sigma=0.02):
    F = w.q.shape[0]
    T = w.inv_depth.shape[0]
    keep0 = lambda x: x.at[0].set(0.0)  # frame 0 fixed (gauge)
    dq = keep0(jnp.asarray(rng.normal(size=(F, 3)) * rot_sigma))
    dp = keep0(jnp.asarray(rng.normal(size=(F, 3)) * pose_sigma))
    dv = jnp.asarray(rng.normal(size=(F, 3)) * v_sigma)
    dd = jnp.asarray(rng.normal(size=T) * depth_sigma)
    return w._replace(
        q=lie.quat_normalize(lie.quat_mul(w.q, lie.expmap(dq))),
        p=w.p + dp,
        v=w.v + dv,
        inv_depth=w.inv_depth + dd,
    )


def test_gradient_matches_fd(scene, rng):
    """b from linearize must equal 0.5 * d(cost)/d(tangent)."""
    w, extr, info = build_window(scene, [0, 4, 8, 12, 16], F_cap=6, T_cap=48)
    w = perturb_window(w, rng)
    cfg = make_cfg()
    Hpp, Hpd, Hdd, bp, bd, depth_active, cost, dims = ba.linearize(w, extr, cfg)
    F = w.q.shape[0]

    c0 = float(ba.evaluate_cost(w, extr, cfg))
    assert np.isclose(c0, float(cost), rtol=1e-10)

    eps = 1e-7
    idx_frames = [(1, 0), (1, 4), (2, 7), (3, 10), (4, 14), (2, 2)]
    for (f, k) in idx_frames:
        d = jnp.zeros((F, 15)).at[f, k].set(eps)
        cp = float(ba.evaluate_cost(win.retract(w, d, jnp.zeros_like(w.inv_depth)), extr, cfg))
        cm = float(ba.evaluate_cost(win.retract(w, -d, jnp.zeros_like(w.inv_depth)), extr, cfg))
        g_fd = (cp - cm) / (2 * eps)
        g_an = 2.0 * float(bp[f * 15 + k])
        assert np.isclose(g_an, g_fd, rtol=1e-4, atol=1e-6), (f, k, g_an, g_fd)

    for t in [0, 5, 17]:
        dd = jnp.zeros_like(w.inv_depth).at[t].set(eps)
        cp = float(ba.evaluate_cost(win.retract(w, jnp.zeros((F, 15)), dd), extr, cfg))
        cm = float(ba.evaluate_cost(win.retract(w, jnp.zeros((F, 15)), -dd), extr, cfg))
        g_fd = (cp - cm) / (2 * eps)
        g_an = 2.0 * float(bd[t])
        assert np.isclose(g_an, g_fd, rtol=1e-4, atol=1e-6), (t, g_an, g_fd)


def test_solve_recovers_ground_truth(scene, rng):
    kf = [0, 4, 8, 12, 16, 20]
    w_true, extr, info = build_window(scene, kf, F_cap=6, T_cap=48)
    w0 = perturb_window(w_true, rng)
    cfg = make_cfg()
    w1, out = ba.solve(w0, extr, cfg)

    nkf = info["n_frames"]
    assert float(out["final_cost"]) < float(out["initial_cost"]) * 1e-3
    p_err = np.linalg.norm(np.asarray(w1.p - w_true.p)[:nkf], axis=-1)
    assert p_err.max() < 2e-4, p_err
    for f in range(nkf):
        dq = lie.quat_mul(lie.quat_conj(w_true.q[f]), w1.q[f])
        assert np.linalg.norm(np.asarray(lie.logmap(dq))) < 2e-4
    L = info["n_tracks"]
    d_err = np.abs(np.asarray(w1.inv_depth - w_true.inv_depth)[:L])
    assert np.median(d_err) < 1e-3


def test_solve_recovers_imu_bias(rng):
    bg_true = np.array([0.004, -0.003, 0.002])
    ba_true = np.array([0.03, -0.02, 0.05])
    sc = synthetic.make_scene(duration=3.0, n_points=120, bg=bg_true, ba=ba_true)
    kf = [0, 5, 10, 15, 20, 25, 30]
    # biases estimated as zero: preintegration linearized at 0
    w_true, extr, info = build_window(sc, kf, F_cap=7, T_cap=48)
    w0 = perturb_window(w_true, rng, pose_sigma=0.005, rot_sigma=0.002)
    cfg = make_cfg(iterations=10)
    w1, out = ba.solve(w0, extr, cfg)
    nkf = info["n_frames"]
    bg_est = np.asarray(w1.bg)[:nkf].mean(axis=0)
    ba_est = np.asarray(w1.ba)[:nkf].mean(axis=0)
    assert np.allclose(bg_est, bg_true, atol=5e-4), bg_est
    assert np.allclose(ba_est, ba_true, atol=2e-2), ba_est


def test_vision_only_mode(scene, rng):
    w_true, extr, info = build_window(scene, [0, 4, 8, 12, 16], F_cap=6, T_cap=48)
    # fix scale gauge too: fix first two poses (vision-only has 7 dof gauge)
    w_true = w_true._replace(fix_mask=w_true.fix_mask.at[1].set(True))
    w0 = perturb_window(w_true, rng, pose_sigma=0.005, rot_sigma=0.002)
    w0 = w0._replace(
        q=w0.q.at[1].set(w_true.q[1]), p=w0.p.at[1].set(w_true.p[1])
    )
    cfg = make_cfg(use_inertial=False)
    w1, out = ba.solve(w0, extr, cfg)
    assert float(out["final_cost"]) < float(out["initial_cost"]) * 1e-2
    nkf = info["n_frames"]
    p_err = np.linalg.norm(np.asarray(w1.p - w_true.p)[:nkf], axis=-1)
    assert p_err.max() < 1e-3


def test_outlier_robustness(scene, rng):
    """Cauchy loss: corrupt a few observations; solution should stay
    near truth instead of being dragged away."""
    kf = [0, 4, 8, 12, 16, 20]
    w_true, extr, info = build_window(scene, kf, F_cap=6, T_cap=48)
    kp_bad = w_true.kp
    # corrupt 5 observations of frame 2 by large offsets
    for t in [3, 9, 14, 20, 31]:
        kp_bad = kp_bad.at[2, t].add(jnp.asarray(rng.normal(size=2) * 0.2))
    w0 = perturb_window(w_true._replace(kp=kp_bad), rng)
    cfg = make_cfg(iterations=10)
    w1, out = ba.solve(w0, extr, cfg)
    nkf = info["n_frames"]
    p_err = np.linalg.norm(np.asarray(w1.p - w_true.p)[:nkf], axis=-1)
    assert p_err.max() < 5e-3, p_err


def test_post_solve_depth_gate(scene, rng):
    w, extr, info = build_window(scene, [0, 4, 8, 12], F_cap=5, T_cap=48)
    K = jnp.asarray(np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]]))
    # force one track behind the camera
    w_bad = w._replace(inv_depth=w.inv_depth.at[2].set(-0.5))
    w2 = ba.post_solve_update(w_bad, extr, K)
    assert int(w2.track_flags[2]) & win.TF_VALID == 0
    # good tracks keep flag and get small quality
    L = info["n_tracks"]
    good = [t for t in range(L) if t != 2]
    flags = np.asarray(w2.track_flags)[good]
    assert np.all(flags & win.TF_VALID)
    assert float(np.median(np.asarray(w2.quality)[good])) < 0.5


def test_solve_jits_and_is_deterministic(scene, rng):
    w_true, extr, info = build_window(scene, [0, 4, 8, 12], F_cap=5, T_cap=32)
    w0 = perturb_window(w_true, rng)
    cfg = make_cfg(iterations=3)
    solve_jit = jax.jit(lambda w: ba.solve(w, extr, cfg))
    w1a, _ = solve_jit(w0)
    w1b, _ = solve_jit(w0)
    assert np.array_equal(np.asarray(w1a.p), np.asarray(w1b.p))
