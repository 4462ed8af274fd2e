"""Motion-only visual-inertial PnP for the newest frame.

Re-design of reference visual_inertial_pnp (pnp.cpp:32-100): optimize the
newest frame's (q, p, v, bg, ba) against
  * a preintegration *prior* from the last window frame's (fixed) state
    through the latest IMU delta (PreIntegrationPriorCost,
    preintegration_error_cost.h:167-206), and
  * pose-only reprojection residuals with fixed world landmarks, Cauchy
    robustified (PoseOnlyReprojection[XYZ]ErrorCost). Plane tracks supply
    ray-cast plane points, other valid tracks their inverse-depth point —
    the caller prepares (x_world, z, mask).

The 15-dim LM solve is tiny and fully jittable; it is the per-frame hot
path (called for every tracked frame, sliding_window_tracker.cpp:75-79).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pvio_tpu.estimation import factors
from pvio_tpu.geometry import lie
from pvio_tpu.imu.preintegration import PreintDelta
from pvio_tpu.map.window import Extrinsics
from pvio_tpu.utils.autodiff import value_and_jacfwd


class PnPConfig(NamedTuple):
    iterations: int = 10
    kp_sqrt_inv_cov: float = 458.0
    use_inertial: bool = True
    cauchy_scale: float = 1.0  # robust-loss scale in whitened units
    lm_lambda_init: float = 1e-4
    lm_lambda_up: float = 4.0
    lm_lambda_down: float = 0.5


def solve_pnp(
    q0, p0, v0, bg0, ba0,
    last_q, last_p, last_v, last_bg, last_ba,
    delta: PreintDelta, bg_lin, ba_lin,
    x_world, z_obs, obs_mask,
    extr: Extrinsics, cfg: PnPConfig,
):
    """Returns (q, p, v, bg, ba) of the refined newest frame.

    x_world (T, 3) fixed landmark points, z_obs (T, 2) their keypoints in
    the new frame, obs_mask (T,).
    """
    dtype = p0.dtype
    sic = jnp.asarray(cfg.kp_sqrt_inv_cov, dtype)
    c2 = jnp.asarray(cfg.cauchy_scale * cfg.cauchy_scale, dtype)
    m = obs_mask.astype(dtype)

    def residuals(state):
        q, p, v, bg, ba = state
        r2 = jax.vmap(
            lambda x, zz: factors.pose_only_reprojection_residual(q, p, x, zz, extr, sic)
        )(x_world, z_obs)  # (T, 2)
        s = jnp.sum(r2 * r2, axis=-1)
        cost = jnp.sum(c2 * jnp.log1p(s / c2) * m)
        if cfg.use_inertial:
            rp = factors.preintegration_residual(
                last_q, last_p, last_v, last_bg, last_ba,
                q, p, v, bg, ba, delta, bg_lin, ba_lin, extr,
            )
            cost = cost + jnp.sum(rp * rp)
        else:
            rp = jnp.zeros(15, dtype)
        return r2, s, rp, cost

    def retract(state, d15):
        q, p, v, bg, ba = state
        return (
            lie.quat_normalize(lie.quat_mul(q, lie.expmap(d15[0:3]))),
            p + d15[3:6], v + d15[6:9], bg + d15[9:12], ba + d15[12:15],
        )

    def lm_step(state, lam):
        def r_repro_t(d15):
            q, p, _, _, _ = retract(state, d15)
            return jax.vmap(
                lambda x, zz: factors.pose_only_reprojection_residual(q, p, x, zz, extr, sic)
            )(x_world, z_obs).reshape(-1)

        r2, s, rp, cost0 = residuals(state)
        _, J2 = value_and_jacfwd(r_repro_t, jnp.zeros(15, dtype))  # (2T, 15)
        J2 = J2.reshape(-1, 2, 15)
        wgt = jnp.sqrt(1.0 / (1.0 + s / c2)) * m
        r_w = r2 * wgt[:, None]
        J_w = J2 * wgt[:, None, None]
        H = jnp.einsum("tai,taj->ij", J_w, J_w)
        b = jnp.einsum("tai,ta->i", J_w, r_w)
        if cfg.use_inertial:
            q, p, v, bg, ba = state
            rpv, _, Jp = factors.preintegration_residual_and_jacobians(
                last_q, last_p, last_v, last_bg, last_ba,
                q, p, v, bg, ba, delta, bg_lin, ba_lin, extr,
            )
            H = H + Jp.T @ Jp
            b = b + Jp.T @ rpv
        diag = jnp.maximum(jnp.diag(H), 1e-8)
        Hd = H + jnp.diag(lam * diag)
        # SPD system: Cholesky solve (LU-backed jnp.linalg.solve has no
        # f64 TPU kernel; the damped GN Hessian is SPD by construction)
        ch = jax.scipy.linalg.cho_factor(
            Hd + 1e-9 * jnp.trace(Hd) / 15 * jnp.eye(15, dtype=dtype))
        d = -jax.scipy.linalg.cho_solve(ch, b)
        new_state = retract(state, d)
        _, _, _, cost1 = residuals(new_state)
        return new_state, cost0, cost1

    def body(carry, _):
        state, lam = carry
        new_state, cost0, cost1 = lm_step(state, lam)
        accept = cost1 < cost0
        lam = jnp.where(accept, lam * cfg.lm_lambda_down, lam * cfg.lm_lambda_up)
        lam = jnp.clip(lam, 1e-10, 1e8)
        state = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), state, new_state)
        return (state, lam), cost1

    init = ((q0, p0, v0, bg0, ba0), jnp.asarray(cfg.lm_lambda_init, dtype))
    (state, _), _ = jax.lax.scan(body, init, None, length=cfg.iterations)
    return state
