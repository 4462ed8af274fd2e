"""Analytic factor Jacobians vs autodiff-through-retraction (the
CostFunctionValidator role applied to the hand-derived fast paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvio_tpu.estimation import factors
from pvio_tpu.estimation.validator import validate_factor
from pvio_tpu.geometry import lie
from pvio_tpu.imu import preintegration as pre
from pvio_tpu.io import synthetic
from pvio_tpu.map import window as win

from tests.helpers import build_window, imu_noise


@pytest.fixture(scope="module")
def setup():
    scene = synthetic.make_scene(duration=1.0, n_points=60,
                                 bg=(0.003, -0.002, 0.004))
    w, extr, info = build_window(scene, [0, 4, 8], F_cap=4, T_cap=32)
    # non-trivial extrinsics to exercise every term
    extr = win.Extrinsics(
        q_bc=lie.expmap(jnp.asarray([0.03, -0.02, 0.7])),
        p_bc=jnp.asarray([0.02, -0.06, 0.01]),
        q_bi=lie.expmap(jnp.asarray([0.01, 0.02, -0.015])),
        p_bi=jnp.asarray([0.005, 0.01, -0.02]),
    )
    return w, extr


def test_preintegration_jacobians_match_autodiff(setup, rng):
    w, extr = setup
    delta = jax.tree.map(lambda a: a[1], w.delta)
    # perturb states so residual is nonzero
    qs = lie.quat_normalize(lie.quat_mul(w.q[:2], lie.expmap(
        jnp.asarray(rng.normal(size=(2, 3)) * 0.02))))
    args_i = (qs[0], w.p[0] + 0.01, w.v[0] + 0.02, w.bg[0] + 0.003, w.ba[0] + 0.01)
    args_j = (qs[1], w.p[1] - 0.01, w.v[1] - 0.02, w.bg[1] - 0.002, w.ba[1] - 0.02)

    r, Ji, Jj = factors.preintegration_residual_and_jacobians(
        *args_i, *args_j, delta, w.bg_lin[1], w.ba_lin[1], extr
    )

    def residual_fn(d30):
        di, dj = d30[:15], d30[15:]

        def ret(args, d):
            q, p, v, bg, ba = args
            return (lie.quat_mul(q, lie.expmap(d[0:3])), p + d[3:6],
                    v + d[6:9], bg + d[9:12], ba + d[12:15])

        return factors.preintegration_residual(
            *ret(args_i, di), *ret(args_j, dj),
            delta, w.bg_lin[1], w.ba_lin[1], extr,
        )

    from pvio_tpu.utils.autodiff import value_and_jacfwd

    r_ad, J_ad = value_and_jacfwd(residual_fn, jnp.zeros(30, jnp.float64))
    assert np.allclose(r, r_ad, atol=1e-12)
    J_an = np.concatenate([np.asarray(Ji), np.asarray(Jj)], axis=1)
    err = np.abs(J_an - np.asarray(J_ad))
    scale = np.maximum(np.abs(np.asarray(J_ad)), 1.0)
    assert (err / scale).max() < 1e-6, (err / scale).max()


def test_marginalization_jacobian_matches_autodiff(setup, rng):
    w, extr = setup
    from pvio_tpu.estimation.marginalization import make_initial_prior

    prior = make_initial_prior(w, yaw_only=False)
    F = w.q.shape[0]
    q = lie.quat_normalize(lie.quat_mul(w.q, lie.expmap(
        jnp.asarray(rng.normal(size=(F, 3)) * 0.01))))
    p = w.p + 0.02

    r, J = factors.marginalization_residual_and_jacobian(
        q, p, w.v, w.bg, w.ba, prior
    )

    def residual_fn(dF15):
        d = dF15.reshape(F, 15)
        q2 = lie.quat_mul(q, lie.expmap(d[:, 0:3]))
        return factors.marginalization_residual(
            q2, p + d[:, 3:6], w.v + d[:, 6:9], w.bg + d[:, 9:12],
            w.ba + d[:, 12:15], prior,
        )

    from pvio_tpu.utils.autodiff import value_and_jacfwd

    r_ad, J_ad = value_and_jacfwd(residual_fn, jnp.zeros(F * 15, jnp.float64))
    assert np.allclose(r, r_ad, atol=1e-12)
    err = np.abs(np.asarray(J) - np.asarray(J_ad))
    assert err.max() < 1e-8, err.max()


def test_validator_on_reprojection(setup):
    w, extr = setup
    z_ref = w.kp[0, 0]
    z_tgt = w.kp[1, 0]

    def residual_fn(d13):
        return factors.reprojection_residual(
            lie.quat_mul(w.q[1], lie.expmap(d13[0:3])), w.p[1] + d13[3:6],
            lie.quat_mul(w.q[0], lie.expmap(d13[6:9])), w.p[0] + d13[9:12],
            w.inv_depth[0] + d13[12], z_ref, z_tgt, extr, 283.0,
        )

    rep = validate_factor(residual_fn, 13)
    assert rep.passed, str(rep)


def test_dependency_check_nan_tagging(setup, rng):
    """The functional counterpart of the reference's tagged-NaN
    uninitialized-entry detection (cost_function_validator.h:152-159):
    a hand-written Jacobian that silently drops a dependency must be
    flagged, and the real analytic Jacobians must come back clean."""
    from pvio_tpu.estimation.validator import check_dependencies

    w, extr = setup
    # identity whitener: the dependency structure under test is the raw
    # factor's, not the whitener's cross-coupling
    delta = jax.tree.map(lambda a: a[1], w.delta)._replace(
        sqrt_inv_cov=jnp.eye(15, dtype=jnp.float64))
    args_i = (w.q[0], w.p[0], w.v[0], w.bg[0], w.ba[0])
    args_j = (w.q[1], w.p[1], w.v[1], w.bg[1], w.ba[1])

    def residual_fn(d30):
        di, dj = d30[:15], d30[15:]

        def ret(args, d):
            q, p, v, bg, ba = args
            return (lie.quat_mul(q, lie.expmap(d[0:3])), p + d[3:6],
                    v + d[6:9], bg + d[9:12], ba + d[12:15])

        return factors.preintegration_residual(
            *ret(args_i, di), *ret(args_j, dj),
            delta, w.bg_lin[1], w.ba_lin[1], extr,
        )

    _, Ji, Jj = factors.preintegration_residual_and_jacobians(
        *args_i, *args_j, delta, w.bg_lin[1], w.ba_lin[1], extr
    )
    J = np.concatenate([np.asarray(Ji), np.asarray(Jj)], axis=1)
    assert check_dependencies(residual_fn, J, 30) == []

    # break the Jacobian: claim the rotation residual ignores frame i's
    # gyro-bias block (a classic forgotten first-order bias-correction
    # term, preintegration_error_cost.h:79-83)
    J_broken = J.copy()
    J_broken[0:3, 9:12] = 0.0
    suspects = check_dependencies(residual_fn, J_broken, 30)
    flagged = {(i, k) for (i, k) in suspects}
    assert any(i < 3 and 9 <= k < 12 for (i, k) in flagged), suspects
