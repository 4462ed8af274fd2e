"""IMU preintegration validation.

Strategy (SURVEY §4): analytic pieces validated against finite differences
and against an independent dead-reckoning integration on synthetic motion —
the role the reference's CostFunctionValidator plays for factor Jacobians.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pvio_tpu.geometry import lie
from pvio_tpu.imu import preintegration as pre


def make_imu(rng, n=40, dt=0.005):
    ts = jnp.asarray(np.arange(n) * dt)
    ws = jnp.asarray(rng.normal(size=(n, 3)) * 0.4)
    accs = jnp.asarray(rng.normal(size=(n, 3)) * 1.5 + np.array([0, 0, 9.80665]))
    mask = jnp.ones(n, dtype=bool)
    return ts, ws, accs, mask, float(n * dt)


def noise64():
    return pre.ImuNoise.isotropic(1e-4, 1e-2, 1e-6, 1e-4, dtype=jnp.float64)


def naive_deltas(ts, ws, accs, t_target, bg, ba):
    """Independent numpy reimplementation of the delta recursions."""
    q = np.array([1.0, 0, 0, 0])
    p = np.zeros(3)
    v = np.zeros(3)
    ts = np.asarray(ts)
    n = len(ts)
    for i in range(n):
        t_next = t_target if i == n - 1 else ts[i + 1]
        dt = t_next - ts[i]
        w = np.asarray(ws[i]) - np.asarray(bg)
        a = np.asarray(accs[i]) - np.asarray(ba)
        R = np.asarray(lie.quat_to_mat(jnp.asarray(q)))
        p = p + dt * v + 0.5 * dt * dt * (R @ a)
        v = v + dt * (R @ a)
        q = np.array(lie.quat_mul(jnp.asarray(q), lie.expmap(jnp.asarray(w * dt))))
        q = q / np.linalg.norm(q)
    return q, p, v


def test_deltas_match_naive(rng):
    ts, ws, accs, mask, t_target = make_imu(rng)
    bg = jnp.asarray(rng.normal(size=3) * 0.01)
    ba = jnp.asarray(rng.normal(size=3) * 0.05)
    d = pre.preintegrate(ts, ws, accs, mask, t_target, bg, ba, noise64())
    qn, pn, vn = naive_deltas(ts, ws, accs, t_target, bg, ba)
    assert np.allclose(d.q, qn, atol=1e-12)
    assert np.allclose(d.p, pn, atol=1e-12)
    assert np.allclose(d.v, vn, atol=1e-12)
    assert np.isclose(float(d.t), t_target)


def test_padding_is_identity(rng):
    """Extending the buffer with masked-out samples must not change the
    result — the key invariant for fixed-capacity batching."""
    ts, ws, accs, mask, t_target = make_imu(rng, n=30)
    bg = jnp.zeros(3)
    ba = jnp.zeros(3)
    d1 = pre.preintegrate(ts, ws, accs, mask, t_target, bg, ba, noise64())
    pad = 10
    ts2 = jnp.concatenate([ts, jnp.zeros(pad)])
    ws2 = jnp.concatenate([ws, jnp.ones((pad, 3))])
    accs2 = jnp.concatenate([accs, jnp.ones((pad, 3))])
    mask2 = jnp.concatenate([mask, jnp.zeros(pad, dtype=bool)])
    d2 = pre.preintegrate(ts2, ws2, accs2, mask2, t_target, bg, ba, noise64())
    for a, b in zip(d1, d2):
        assert np.allclose(a, b, atol=1e-14)


def test_bias_jacobians_match_fd(rng):
    """dq/dbg etc. vs central finite differences of the deltas."""
    ts, ws, accs, mask, t_target = make_imu(rng, n=20)
    bg0 = jnp.asarray(rng.normal(size=3) * 0.01)
    ba0 = jnp.asarray(rng.normal(size=3) * 0.05)
    d0 = pre.preintegrate(ts, ws, accs, mask, t_target, bg0, ba0, noise64())

    def deltas(bg, ba):
        d = pre.preintegrate(ts, ws, accs, mask, t_target, bg, ba, noise64(),
                             compute_covariance=False)
        return d.q, d.p, d.v

    eps = 1e-6
    num_dq_dbg = np.zeros((3, 3))
    num_dp_dbg = np.zeros((3, 3))
    num_dv_dbg = np.zeros((3, 3))
    num_dp_dba = np.zeros((3, 3))
    num_dv_dba = np.zeros((3, 3))
    for k in range(3):
        e = jnp.zeros(3).at[k].set(eps)
        qp, pp, vp = deltas(bg0 + e, ba0)
        qm, pm, vm = deltas(bg0 - e, ba0)
        # rotation difference in the tangent: log(q0^-1 q)
        num_dq_dbg[:, k] = (
            np.asarray(lie.logmap(lie.quat_mul(lie.quat_conj(qm), qp))) / (2 * eps)
        )
        num_dp_dbg[:, k] = np.asarray(pp - pm) / (2 * eps)
        num_dv_dbg[:, k] = np.asarray(vp - vm) / (2 * eps)
        qp, pp, vp = deltas(bg0, ba0 + e)
        qm, pm, vm = deltas(bg0, ba0 - e)
        num_dp_dba[:, k] = np.asarray(pp - pm) / (2 * eps)
        num_dv_dba[:, k] = np.asarray(vp - vm) / (2 * eps)

    assert np.allclose(d0.dq_dbg, num_dq_dbg, atol=1e-6)
    assert np.allclose(d0.dp_dbg, num_dp_dbg, atol=1e-6)
    assert np.allclose(d0.dv_dbg, num_dv_dbg, atol=1e-6)
    assert np.allclose(d0.dp_dba, num_dp_dba, atol=1e-6)
    assert np.allclose(d0.dv_dba, num_dv_dba, atol=1e-6)


def test_covariance_psd_and_scaling(rng):
    ts, ws, accs, mask, t_target = make_imu(rng)
    d = pre.preintegrate(ts, ws, accs, mask, t_target, jnp.zeros(3), jnp.zeros(3), noise64())
    ev = np.linalg.eigvalsh(np.asarray(d.cov))
    assert np.all(ev > -1e-18)
    # whitener: S^T S = cov^{-1} (S is L^-1 D^-1 from the
    # correlation-equilibrated Cholesky — NOT triangular; only the
    # whitening property is contractual)
    S = np.asarray(d.sqrt_inv_cov)
    err = S.T @ S @ np.asarray(d.cov) - np.eye(15)
    assert np.max(np.abs(err)) < 1e-4


def test_covariance_monte_carlo(rng):
    """Propagated covariance vs sample covariance of perturbed integrations
    (ground-truth check of the A/B discrete propagation)."""
    n, dt = 20, 0.005
    ts = jnp.asarray(np.arange(n) * dt)
    ws = jnp.asarray(rng.normal(size=(n, 3)) * 0.3)
    accs = jnp.asarray(rng.normal(size=(n, 3)) + np.array([0, 0, 9.8]))
    mask = jnp.ones(n, dtype=bool)
    t_target = n * dt
    sw, sa = 1e-4, 4e-4
    noise = pre.ImuNoise.isotropic(sw, sa, 0.0, 0.0, dtype=jnp.float64)
    d = pre.preintegrate(ts, ws, accs, mask, t_target, jnp.zeros(3), jnp.zeros(3), noise)

    trials = 800
    wn = rng.normal(size=(trials, n, 3)) * np.sqrt(sw / dt)
    an = rng.normal(size=(trials, n, 3)) * np.sqrt(sa / dt)

    def run(wn_i, an_i):
        di = pre.preintegrate(ts, ws + wn_i, accs + an_i, mask, t_target,
                              jnp.zeros(3), jnp.zeros(3), noise,
                              compute_covariance=False)
        dq = lie.logmap(lie.quat_mul(lie.quat_conj(d.q), di.q))
        return jnp.concatenate([dq, di.p - d.p, di.v - d.v])

    errs = jax.vmap(run)(jnp.asarray(wn), jnp.asarray(an))
    sample_cov = np.cov(np.asarray(errs).T)
    prop_cov = np.asarray(d.cov)[:9, :9]
    # loose MC tolerance: relative Frobenius error
    denom = np.linalg.norm(prop_cov)
    assert np.linalg.norm(sample_cov - prop_cov) / denom < 0.25


def test_predict_under_gravity_only():
    """Static IMU measuring exactly gravity: predict must keep the state
    stationary."""
    n, dt = 50, 0.005
    ts = jnp.asarray(np.arange(n) * dt)
    ws = jnp.zeros((n, 3))
    accs = jnp.broadcast_to(jnp.array([0.0, 0.0, pre.GRAVITY_NOMINAL]), (n, 3))
    mask = jnp.ones(n, dtype=bool)
    d = pre.preintegrate(ts, ws, accs, mask, n * dt, jnp.zeros(3), jnp.zeros(3), noise64())
    q0 = jnp.array([1.0, 0, 0, 0])
    q, p, v, bg, ba = pre.predict(d, q0, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3))
    assert np.allclose(q, q0, atol=1e-12)
    assert np.allclose(p, 0.0, atol=1e-10)
    assert np.allclose(v, 0.0, atol=1e-10)
