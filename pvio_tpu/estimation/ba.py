"""Batched sliding-window bundle adjustment: Levenberg-Marquardt with
landmark Schur elimination, built from dense masked einsums.

TPU-native replacement for the reference's Ceres SPARSE_SCHUR + DOGLEG
solve (bundle_adjustor.cpp:52-346, solver_options.h:26-33). Design:

  * The problem has fixed shape: F frame slots x T track slots. Every
    factor is evaluated on the dense (F, T) observation grid under masks;
    dead entries contribute exact zeros.
  * Jacobians come from forward-mode autodiff *through the retraction* at
    the linearization point (the reference's local-parameterization trick,
    quaternion_parameterization.h:27-44), per factor, vmapped.
  * Per-factor Jacobians are densified into the global Gauss-Newton system
    with one-hot einsums — H assembly is pure matmul work for the MXU, no
    scatters (SURVEY §7: "explicit landmark Schur elimination").
  * Landmark (inverse-depth) block is diagonal => Schur elimination is an
    elementwise divide + one (F*15 x T) @ (T x F*15) matmul; the reduced
    camera system (F*15)^2 is solved densely by Cholesky.
  * Robustness: Cauchy(1.0) IRLS weights on reprojection and plane factors
    (bundle_adjustor.cpp:142-196 uses ceres::CauchyLoss(1.0)).
  * Gauge: FIX_POSE frames (initializer.cpp:91-93) are handled by masking
    their (theta, p) tangent dims instead of the reference's 1e15
    information prior — float32-safe on TPU.

Factor selection semantics preserved from bundle_adjustor.cpp:91-242:
  - reprojection for TF_VALID tracks, skipping the reference-frame
    observation; plane tracks keep reprojection while their plane has
    < 20 member tracks, and switch to the augmented plane factor when the
    plane is "big";
  - preintegration between consecutive frames (use_inertial only);
  - marginalization prior over all frames;
  - plane normal/distance held constant during BA.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pvio_tpu.estimation import factors
from pvio_tpu.geometry import camera, lie
from pvio_tpu.imu.preintegration import PreintDelta
from pvio_tpu.map import window as win
from pvio_tpu.map.window import TF_PLANE, TF_VALID, Extrinsics, WindowState
from pvio_tpu.utils.autodiff import value_and_jacfwd


class BAConfig(NamedTuple):
    """Solver knobs (reference Config defaults, config.cpp:24-93)."""

    iterations: int = 10              # solver_iteration_limit (euroc.yaml:65)
    kp_sqrt_inv_cov: float = 458.0    # focal / keypoint sigma, whitens normalized residuals
    plane_sqrt_inv_cov: float = 100.0  # 1/sqrt(plane_distance_cov) (pvio-pc config plane.noise 1e-4)
    min_plane_tracks: int = 20        # bundle_adjustor.cpp:162
    use_inertial: bool = True
    use_planes: bool = True
    # re-estimate plane normal/distance INSIDE the solve (3-dof tangent
    # per armed plane appended to the reduced camera system). The
    # reference holds plane parameters constant during BA and hard-refits
    # them on the host between solves (bundle_adjustor.cpp:120-124,
    # plane.cpp:64-114). CRITICAL: the joint pose+plane system has a
    # near-null drift mode (translate the window along the normal while
    # the plane distance follows — every plane residual is unchanged),
    # and the plane's whole value is being the WORLD ANCHOR that
    # suppresses exactly that drift; unconstrained joint estimation
    # measured 6-11x WORSE pose error than a fixed plane. The anchor
    # sigmas below therefore put a stiff stay-here prior on the plane
    # tangent each solve: the plane behaves as a slowly-varying state —
    # per-solve corrections at the anchor scale, fixed-plane drift
    # suppression along the null mode.
    estimate_planes: bool = True
    plane_anchor_sigma_n: float = 0.002   # rad (~0.1 deg) per solve
    plane_anchor_sigma_d: float = 0.001   # meters per solve
    # Keep the reprojection factors (and free inverse depth) of plane
    # tracks ALONGSIDE the augmented plane factor. The reference
    # REPLACES reprojection with the 1-D plane residual for members of
    # >=20-track planes (bundle_adjustor.cpp:162-196), which discards
    # those tracks' reprojection information; measured at pipeline tier
    # (clean oracle scene), that replacement tripled the window's
    # internal inconsistency during aggressive-motion segments (free-
    # track fresh-triangulation rpe 1.3 -> 2.6-4.4 px) because ~40% of
    # the window's vision constraints collapse to one scalar each. With
    # supplement=True the plane factor acts as a pure coplanarity PRIOR
    # on top of full vision information.
    plane_supplement: bool = False
    cauchy_scale: float = 1.0  # robust-loss scale in whitened units (see Config.cauchy_scale)
    fused_preint: bool = False   # struct-of-arrays fused preint factor bank
    lm_lambda_init: float = 1e-4
    lm_lambda_up: float = 4.0
    lm_lambda_down: float = 0.5
    lm_lambda_min: float = 1e-10
    lm_lambda_max: float = 1e8


# ----------------------------------------------------------------------------
# factor masks
# ----------------------------------------------------------------------------

def _factor_masks(w: WindowState, cfg: BAConfig, tp_axis=None):
    """tp_axis: mapped-axis name when tracks are sharded across devices —
    the plane member count (a cross-track statistic gating the augmented
    plane factor, bundle_adjustor.cpp:162) must then be psum'd globally."""
    F, T = w.kp.shape[0], w.kp.shape[1]
    P = w.plane_mask.shape[0]
    is_valid = (w.track_flags & TF_VALID) != 0
    is_plane = (w.track_flags & TF_PLANE) != 0

    if cfg.use_planes:
        pid = jnp.clip(w.plane_id, 0, P - 1)
        member = w.track_mask & is_plane & (w.plane_id >= 0)
        counts = jnp.zeros(P, jnp.int32).at[pid].add(member.astype(jnp.int32) * 1)
        if tp_axis is not None:
            counts = jax.lax.psum(counts, tp_axis)
        plane_big = (counts >= cfg.min_plane_tracks) & w.plane_mask
        big_track = member & plane_big[pid]
    else:
        big_track = jnp.zeros(T, bool)

    if cfg.use_planes and cfg.plane_supplement:
        repro_track = w.track_mask & (is_valid | is_plane)
    else:
        repro_track = w.track_mask & (is_valid | is_plane) & ~big_track
    fm = w.frame_mask
    not_ref = jnp.arange(F)[:, None] != w.ref_frame[None, :]
    repro_mask = w.obs_mask & fm[:, None] & repro_track[None, :] & not_ref
    ref_ok = fm[w.ref_frame]  # reference frame must be alive
    repro_mask = repro_mask & ref_ok[None, :]
    depth_active = repro_track & ref_ok & jnp.any(repro_mask, axis=0)
    plane_track = big_track & ref_ok
    if not cfg.use_planes:
        plane_big = jnp.zeros(P, bool)
    return repro_mask, depth_active, plane_track, plane_big


def _active_dims(w: WindowState):
    """(F, 15) float mask of active tangent dims: dead frames fully
    inactive; FIX_POSE frames freeze (theta, p)."""
    F = w.q.shape[0]
    dtype = w.p.dtype
    m = jnp.broadcast_to(w.frame_mask[:, None], (F, 15)).astype(dtype)
    first6 = (jnp.arange(15) < 6).astype(dtype)
    m = m * (1.0 - w.fix_mask[:, None].astype(dtype) * first6[None, :])
    return m


# ----------------------------------------------------------------------------
# residual evaluation (shared by cost and linearization)
# ----------------------------------------------------------------------------

def _cauchy_w(s, c2):
    """IRLS weight of ceres::CauchyLoss(c): rho(s) = c^2 log(1+s/c^2),
    w = rho'(s) = 1/(1+s/c^2), applied as sqrt(w) on residual and
    Jacobian (reference: CauchyLoss(1.0), bundle_adjustor.cpp:142-161;
    the scale is configurable here so a few pixels of systematic
    front-end error do not saturate vision against the stiff IMU)."""
    return 1.0 / (1.0 + s / c2)


def _cauchy_rho(s, c2):
    """Robustified cost of the squared residual s."""
    return c2 * jnp.log1p(s / c2)


def _repro_residual_t(delta13, q_t, p_t, q_r, p_r, d, z_r, z_t, extr, sic):
    q_tgt = lie.quat_mul(q_t, lie.expmap(delta13[0:3]))
    p_tgt = p_t + delta13[3:6]
    q_ref = lie.quat_mul(q_r, lie.expmap(delta13[6:9]))
    p_ref = p_r + delta13[9:12]
    return factors.reprojection_residual(
        q_tgt, p_tgt, q_ref, p_ref, d + delta13[12], z_r, z_t, extr, sic
    )


def _preint_residual_t(delta30, qi, pi, vi, bgi, bai, qj, pj, vj, bgj, baj,
                       delta, bg_lin, ba_lin, extr):
    di, dj = delta30[:15], delta30[15:]
    return factors.preintegration_residual(
        lie.quat_mul(qi, lie.expmap(di[0:3])), pi + di[3:6], vi + di[6:9],
        bgi + di[9:12], bai + di[12:15],
        lie.quat_mul(qj, lie.expmap(dj[0:3])), pj + dj[3:6], vj + dj[6:9],
        bgj + dj[9:12], baj + dj[12:15],
        delta, bg_lin, ba_lin, extr,
    )


def _plane_residual_t(delta6F, q, p, kps, mask, normal, dist, extr, sic):
    # delta6F: (F*6,) pose tangent of all frames
    d = delta6F.reshape(-1, 6)
    qd = lie.quat_mul(q, lie.expmap(d[:, 0:3]))
    pd = p + d[:, 3:6]
    return factors.augmented_plane_distance_residual(
        qd, pd, kps, mask, normal, dist, extr, sic
    )


def _marg_residual_t(deltaF15, w: WindowState):
    d = deltaF15.reshape(-1, 15)
    q = lie.quat_mul(w.q, lie.expmap(d[:, 0:3]))
    return factors.marginalization_residual(
        q, w.p + d[:, 3:6], w.v + d[:, 6:9], w.bg + d[:, 9:12],
        w.ba + d[:, 12:15], w.prior,
    )


def _gather_track_inputs(w: WindowState):
    """Per-(f, t) gathered reference-frame quantities."""
    q_ref = w.q[w.ref_frame]            # (T, 4)
    p_ref = w.p[w.ref_frame]            # (T, 3)
    T = w.kp.shape[1]
    z_ref = jnp.take_along_axis(w.kp, w.ref_frame[None, :, None], axis=0)[0]  # (T, 2)
    return q_ref, p_ref, z_ref


def evaluate_cost(w: WindowState, extr: Extrinsics, cfg: BAConfig,
                  tp_axis=None):
    """Total robustified cost at the current state (no Jacobians)."""
    dtype = w.p.dtype
    repro_mask, depth_active, plane_track, _ = _factor_masks(w, cfg, tp_axis)
    q_ref, p_ref, z_ref = _gather_track_inputs(w)
    sic = jnp.asarray(cfg.kp_sqrt_inv_cov, dtype)
    c2 = jnp.asarray(cfg.cauchy_scale * cfg.cauchy_scale, dtype)

    def one_obs(q_t, p_t, z_t, q_r, p_r, z_r, d):
        return factors.reprojection_residual(q_t, p_t, q_r, p_r, d, z_r, z_t, extr, sic)

    r = jax.vmap(  # over frames
        jax.vmap(one_obs, in_axes=(None, None, 0, 0, 0, 0, 0)),
        in_axes=(0, 0, 0, None, None, None, None),
    )(w.q, w.p, w.kp, q_ref, p_ref, z_ref, w.inv_depth)  # (F, T, 2)
    s = jnp.sum(r * r, axis=-1) * repro_mask.astype(dtype)
    cost = jnp.sum(_cauchy_rho(s, c2) * repro_mask.astype(dtype))

    if cfg.use_inertial:
        mask_pre = w.frame_mask[:-1] & w.frame_mask[1:] & w.delta_valid[1:]
        delta_j = jax.tree.map(lambda a: a[1:], w.delta)
        rp = jax.vmap(
            lambda qi, pi, vi, bgi, bai, qj, pj, vj, bgj, baj, dd, bl, al:
            factors.preintegration_residual(qi, pi, vi, bgi, bai, qj, pj, vj,
                                            bgj, baj, dd, bl, al, extr)
        )(w.q[:-1], w.p[:-1], w.v[:-1], w.bg[:-1], w.ba[:-1],
          w.q[1:], w.p[1:], w.v[1:], w.bg[1:], w.ba[1:],
          delta_j, w.bg_lin[1:], w.ba_lin[1:])
        cost = cost + jnp.sum(jnp.sum(rp * rp, axis=-1) * mask_pre.astype(dtype))

    rm = factors.marginalization_residual(w.q, w.p, w.v, w.bg, w.ba, w.prior)
    cost = cost + jnp.sum(rm * rm)

    if cfg.use_planes:
        P = w.plane_mask.shape[0]
        pid = jnp.clip(w.plane_id, 0, P - 1)
        psic = jnp.asarray(cfg.plane_sqrt_inv_cov, dtype)
        obs_cols = w.obs_mask & w.frame_mask[:, None]

        def one_plane_track(kps, omask, n, dist):
            return factors.augmented_plane_distance_residual(
                w.q, w.p, kps, omask, n, dist, extr, psic
            )

        rpl = jax.vmap(one_plane_track, in_axes=(1, 1, 0, 0))(
            w.kp, obs_cols, w.plane_normal[pid], w.plane_distance[pid]
        )  # (T,)
        spl = rpl * rpl * plane_track.astype(dtype)
        cost = cost + jnp.sum(_cauchy_rho(spl, c2) * plane_track.astype(dtype))
    return cost


# ----------------------------------------------------------------------------
# linearization: build (Hpp, Hpd, Hdd, bp, bd)
# ----------------------------------------------------------------------------

def linearize(w: WindowState, extr: Extrinsics, cfg: BAConfig, tp_axis=None):
    """Build the Gauss-Newton system. Returns (H (D, D), Hpd (D, T),
    Hdd (T,), b (D,), bd (T,), depth_active (T,), cost, dims (D,)) where
    D = F*15, extended to F*15 + P*3 when plane parameters are estimated
    in-solve (cfg.estimate_planes) — the extra dims are each armed
    plane's (normal-tangent, distance) block, and `dims` is the active-
    dimension mask over the WHOLE extended state."""
    F, T = w.kp.shape[0], w.kp.shape[1]
    dtype = w.p.dtype
    repro_mask, depth_active, plane_track, plane_big = _factor_masks(w, cfg, tp_axis)
    q_ref, p_ref, z_ref = _gather_track_inputs(w)
    sic = jnp.asarray(cfg.kp_sqrt_inv_cov, dtype)
    c2 = jnp.asarray(cfg.cauchy_scale * cfg.cauchy_scale, dtype)

    Hpp = jnp.zeros((F, 15, F, 15), dtype)
    bp = jnp.zeros((F, 15), dtype)

    # ---- reprojection over the dense (F, T) grid ----
    def one_obs(q_t, p_t, z_t, q_r, p_r, z_r, d):
        f = lambda dd: _repro_residual_t(dd, q_t, p_t, q_r, p_r, d, z_r, z_t, extr, sic)
        return value_and_jacfwd(f, jnp.zeros(13, dtype))

    r, J = jax.vmap(
        jax.vmap(one_obs, in_axes=(None, None, 0, 0, 0, 0, 0)),
        in_axes=(0, 0, 0, None, None, None, None),
    )(w.q, w.p, w.kp, q_ref, p_ref, z_ref, w.inv_depth)  # r (F,T,2), J (F,T,2,13)

    m = repro_mask.astype(dtype)
    s = jnp.sum(r * r, axis=-1)
    sqrt_wgt = jnp.sqrt(_cauchy_w(s, c2)) * m          # (F, T)
    cost = jnp.sum(_cauchy_rho(s, c2) * m)
    r_w = r * sqrt_wgt[..., None]
    J_w = J * sqrt_wgt[..., None, None]
    J_tgt = J_w[..., 0:6]    # (F, T, 2, 6)
    J_ref = J_w[..., 6:12]
    J_d = J_w[..., 12]       # (F, T, 2)

    eyeF = jnp.eye(F, dtype=dtype)
    onehot_ref = eyeF[w.ref_frame]  # (T, F)
    # full per-observation pose Jacobian (F, T, 2, F, 6)
    Jfull = jnp.einsum("ftai,fg->ftagi", J_tgt, eyeF) + jnp.einsum(
        "ftai,tg->ftagi", J_ref, onehot_ref
    )
    Hpose = jnp.einsum("ftagi,ftahj->gihj", Jfull, Jfull)
    Hpp = Hpp.at[:, 0:6, :, 0:6].add(Hpose)
    bp = bp.at[:, 0:6].add(jnp.einsum("ftagi,fta->gi", Jfull, r_w))
    Hpd = jnp.zeros((F, 15, T), dtype)
    Hpd = Hpd.at[:, 0:6, :].set(jnp.einsum("ftagi,fta->git", Jfull, J_d))
    Hdd = jnp.einsum("fta,fta->t", J_d, J_d)
    bd = jnp.einsum("fta,fta->t", J_d, r_w)

    # ---- preintegration factors between consecutive frames ----
    # analytic Jacobians (factors.preintegration_residual_and_jacobians):
    # ~30x cheaper than pushing 30 tangents through the residual on TPU
    if cfg.use_inertial:
        mask_pre = (w.frame_mask[:-1] & w.frame_mask[1:] & w.delta_valid[1:]).astype(dtype)
        delta_j = jax.tree.map(lambda a: a[1:], w.delta)

        if cfg.fused_preint:
            from pvio_tpu.estimation.preint_soa import preint_factor_bank_soa

            rp, Ji, Jj = preint_factor_bank_soa(
                w.q, w.p, w.v, w.bg, w.ba, w.delta, w.bg_lin, w.ba_lin, extr
            )
        else:
            rp, Ji, Jj = jax.vmap(
                lambda qi, pi, vi, bgi, bai, qj, pj, vj, bgj, baj, dd, bl, al:
                factors.preintegration_residual_and_jacobians(
                    qi, pi, vi, bgi, bai, qj, pj, vj, bgj, baj, dd, bl, al, extr
                )
            )(
                w.q[:-1], w.p[:-1], w.v[:-1], w.bg[:-1], w.ba[:-1],
                w.q[1:], w.p[1:], w.v[1:], w.bg[1:], w.ba[1:],
                delta_j, w.bg_lin[1:], w.ba_lin[1:],
            )  # rp (F-1, 15), Ji/Jj (F-1, 15, 15)
        rp = rp * mask_pre[:, None]
        Ji = Ji * mask_pre[:, None, None]
        Jj = Jj * mask_pre[:, None, None]
        cost = cost + jnp.sum(rp * rp)
        Ei = eyeF[:-1]  # (F-1, F) one-hot of frame j-1
        Ej = eyeF[1:]
        # densify with explicit broadcasts (outer-product einsums lower to
        # pathologically padded dots on TPU) and one clean (kr)x(gi) matmul
        Jfull_pre = (
            Ji[:, :, None, :] * Ei[:, None, :, None]
            + Jj[:, :, None, :] * Ej[:, None, :, None]
        )  # (F-1, 15, F, 15)
        A_pre = Jfull_pre.reshape((F - 1) * 15, F * 15)
        Hpp = Hpp + (A_pre.T @ A_pre).reshape(F, 15, F, 15)
        bp = bp + (A_pre.T @ rp.reshape(-1)).reshape(F, 15)

    # ---- marginalization prior (analytic Jacobian) ----
    rm, Jm = factors.marginalization_residual_and_jacobian(
        w.q, w.p, w.v, w.bg, w.ba, w.prior
    )
    cost = cost + jnp.sum(rm * rm)
    Hpp = Hpp + (Jm.T @ Jm).reshape(F, 15, F, 15)
    bp = bp + (Jm.T @ rm).reshape(F, 15)

    # ---- augmented plane factors (analytic chain rule through the
    # pseudo-inverse — the F*6-tangent jacfwd per track cost ~8x the rest
    # of the solve combined; validated bit-tight against the autodiff
    # path in tests/test_analytic_jacobians.py) ----
    ext = cfg.use_planes and cfg.estimate_planes
    P = w.plane_mask.shape[0]
    if cfg.use_planes:
        pid = jnp.clip(w.plane_id, 0, P - 1)
        psic = jnp.asarray(cfg.plane_sqrt_inv_cov, dtype)
        obs_cols = w.obs_mask & w.frame_mask[:, None]

        out = factors.augmented_plane_residual_and_pose_jacobian(
            w.q, w.p, w.kp, obs_cols, w.plane_normal[pid],
            w.plane_distance[pid], extr, psic, with_plane_jacobian=ext,
        )  # (T,), (T, F, 6)[, (T, 3)]
        rpl, Jpl = out[0], out[1]
        mp = plane_track.astype(dtype)
        spl = rpl * rpl
        wpl = jnp.sqrt(_cauchy_w(spl, c2)) * mp
        cost = cost + jnp.sum(_cauchy_rho(spl, c2) * mp)
        rpl_w = rpl * wpl
        Jpl_w = Jpl * wpl[:, None, None]
        Hpl = jnp.einsum("tgi,thj->gihj", Jpl_w, Jpl_w)
        Hpp = Hpp.at[:, 0:6, :, 0:6].add(Hpl)
        bp = bp.at[:, 0:6].add(jnp.einsum("tgi,t->gi", Jpl_w, rpl_w))

    dims_pose = _active_dims(w).reshape(-1)
    H = Hpp.reshape(F * 15, F * 15)
    Hpd = Hpd.reshape(F * 15, T)
    b = bp.reshape(F * 15)
    if not ext:
        return H, Hpd, Hdd, b, bd, depth_active, cost, dims_pose

    # extend the reduced system with each armed plane's 3-dof tangent
    Jpl3_w = out[2] * wpl[:, None]                      # (T, 3)
    Epl = jax.nn.one_hot(pid, P, dtype=dtype)           # (T, P)
    Hplpl = jnp.einsum("ti,tp,tj->pij", Jpl3_w, Epl, Jpl3_w)
    Hpose_pl = jnp.einsum("tgi,tp,tj->gipj", Jpl_w, Epl, Jpl3_w)  # (F,6,P,3)
    b_pl = jnp.einsum("ti,tp,t->pi", Jpl3_w, Epl, rpl_w)
    D = F * 15 + P * 3
    cross = jnp.zeros((F, 15, P, 3), dtype).at[:, 0:6].set(Hpose_pl)
    cross = cross.reshape(F * 15, P * 3)
    # stay-here anchor on the plane tangent (see BAConfig docstring):
    # pure information, zero gradient (linearization point = current
    # parameters), so it bounds the per-solve correction without biasing
    anchor = jnp.asarray([
        1.0 / cfg.plane_anchor_sigma_n ** 2,
        1.0 / cfg.plane_anchor_sigma_n ** 2,
        1.0 / cfg.plane_anchor_sigma_d ** 2,
    ], dtype)
    Hplpl = Hplpl + jnp.diag(anchor)[None, :, :]
    Hpp_pl = jnp.einsum("pij,pq->piqj", Hplpl,
                        jnp.eye(P, dtype=dtype)).reshape(P * 3, P * 3)
    He = jnp.zeros((D, D), dtype)
    He = He.at[: F * 15, : F * 15].set(H)
    He = He.at[: F * 15, F * 15 :].set(cross)
    He = He.at[F * 15 :, : F * 15].set(cross.T)
    He = He.at[F * 15 :, F * 15 :].set(Hpp_pl)
    be = jnp.concatenate([b, b_pl.reshape(-1)])
    Hpd_e = jnp.concatenate([Hpd, jnp.zeros((P * 3, T), dtype)], axis=0)
    dims_pl = jnp.repeat((plane_big & w.plane_mask).astype(dtype), 3)
    dims = jnp.concatenate([dims_pose, dims_pl])
    return He, Hpd_e, Hdd, be, bd, depth_active, cost, dims


# ----------------------------------------------------------------------------
# LM solve with Schur elimination
# ----------------------------------------------------------------------------

def _lm_step(w: WindowState, extr, cfg, lam):
    F, T = w.kp.shape[0], w.kp.shape[1]
    P = w.plane_mask.shape[0]
    dtype = w.p.dtype
    Hpp, Hpd, Hdd, bp, bd, depth_active, cost0, m = linearize(w, extr, cfg)
    D = Hpp.shape[0]

    da = depth_active.astype(dtype)
    Hpp = Hpp * m[:, None] * m[None, :]
    bp = bp * m
    Hpd = Hpd * m[:, None] * da[None, :]
    bd = bd * da
    Hdd = jnp.where(depth_active, Hdd, 1.0)

    # LM damping: scale diagonals
    diag = jnp.diag(Hpp)
    diag_floor = jnp.maximum(diag, 1e-8)
    Hpp_d = Hpp + jnp.diag(lam * diag_floor + (1.0 - m))  # inactive dims get unit diag
    Hdd_d = Hdd * (1.0 + lam)

    # Schur: eliminate depths
    Hdd_inv = 1.0 / Hdd_d
    Hred = Hpp_d - (Hpd * Hdd_inv[None, :]) @ Hpd.T
    bred = bp - Hpd @ (bd * Hdd_inv)
    # solve Hred dp = -bred
    jitter = 1e-9 * jnp.trace(Hred) / D
    L = jax.scipy.linalg.cho_factor(Hred + jitter * jnp.eye(D, dtype=dtype))
    dp = jax.scipy.linalg.cho_solve(L, -bred) * m
    dd = (-bd - Hpd.T @ dp) * Hdd_inv * da

    w_new = win.retract(w, dp[: F * 15].reshape(F, 15), dd)
    if D > F * 15:
        w_new = win.retract_planes(w_new, dp[F * 15 :].reshape(P, 3))
    cost1 = evaluate_cost(w_new, extr, cfg)
    return w_new, cost0, cost1


def solve(w: WindowState, extr: Extrinsics, cfg: BAConfig):
    """Run cfg.iterations LM steps (reference: <=10 dogleg iterations,
    solver_options.h:26-33). Returns (w_final, info dict)."""
    dtype = w.p.dtype
    lam0 = jnp.asarray(cfg.lm_lambda_init, dtype)

    def body(carry, _):
        w, lam = carry
        w_new, cost0, cost1 = _lm_step(w, extr, cfg, lam)
        accept = cost1 < cost0
        lam = jnp.where(
            accept,
            jnp.maximum(lam * cfg.lm_lambda_down, cfg.lm_lambda_min),
            jnp.minimum(lam * cfg.lm_lambda_up, cfg.lm_lambda_max),
        )
        w = jax.tree.map(lambda a, b: jnp.where(accept, b, a), w, w_new)
        return (w, lam), (cost0, cost1, accept)

    (w, lam), (costs0, costs1, accepts) = jax.lax.scan(
        body, (w, lam0), None, length=cfg.iterations
    )
    info = {
        "initial_cost": costs0[0],
        "final_cost": jnp.where(accepts[-1], costs1[-1], costs0[-1]),
        "accepted": jnp.sum(accepts),
        "lambda": lam,
    }
    return w, info


# ----------------------------------------------------------------------------
# post-solve track maintenance (bundle_adjustor.cpp:251-299)
# ----------------------------------------------------------------------------

def plane_track_escape(w: WindowState, extr: Extrinsics, track_life,
                       min_life=10, escape_dist=0.1,
                       kp_sigma_px=None, f_px=None,
                       sigma_k=3.0, dist_floor=0.005):
    """Post-solve plane-track escape (bundle_adjustor.cpp:251-275).

    After BA, re-triangulate every TF_PLANE track as a free point from
    the current (just-optimized) poses; if the track is mature
    (life > min_life), has enough baseline (plane_extractor.cpp:200-203)
    and the free point sits off its plane by more than the track's own
    triangulation uncertainty allows, the plane constraint was a bad
    adoption: release the track back to TF_VALID with the re-triangulated
    depth. Runs device-side inside the fused ba_step — `track_life` is
    the (T,) observation count (Track::life) shipped with the window
    upload.

    The reference uses a fixed 0.1 m gate (bundle_adjustor.cpp:263),
    which never sheds cm-regime bad adoptions in room-scale scenes —
    measured as the dominant plane contamination path on degraded
    imagery (PERF_NOTES round 3). When `kp_sigma_px`/`f_px` are given,
    the threshold becomes noise-scaled per track:
    min(escape_dist, max(dist_floor, sigma_k * sigma_plane)) where
    sigma_plane is the first-order plane-distance std of the free
    triangulation (depth error (sigma/f) z^2/baseline projected on the
    plane normal + lateral bearing error) — the reference's 0.1 m stays
    as the hard envelope, but well-constrained tracks escape as soon as
    they are *significantly* off-plane.

    Evidence gate (sigma mode only): a fresh triangulation is only
    trustworthy evidence of being off-plane if it actually EXPLAINS the
    track's observations — during transient window inconsistency (hard
    turns, right after marginalization) free triangulations scatter
    0.2-0.5 m and mass-escaping on them (and overwriting the escapees'
    depths with those junk points, which the per-frame PnP then uses as
    fixed landmarks) measurably locks the damage into the pose chain.
    So: escape requires rpe(fresh) <= max(2 kp_sigma, 1 px), and the
    depth overwrite additionally requires rpe(fresh) < rpe(stored).
    """
    pts, inv_d, tri_ok = win.triangulate_tracks(w, extr)
    baseline = win.track_baselines(w)
    # enough_baseline gate on the CURRENT landmark depth
    enough = (baseline > 0.5) | (
        (w.inv_depth < 5.0) & (baseline * w.inv_depth > 0.5)
    )
    is_plane = ((w.track_flags & TF_PLANE) != 0) & w.track_mask
    P = w.plane_mask.shape[0]
    pid = jnp.clip(w.plane_id, 0, P - 1)
    n_pl = w.plane_normal[pid]
    # Per-plane common-mode compensation: with the plane estimated as a
    # slowly-varying WORLD anchor (BAConfig.estimate_planes), the window
    # (poses + free triangulations) can drift centimeters relative to the
    # plane before the factor pulls it back — that shared offset is the
    # anchor doing its job, not evidence that any particular adoption was
    # wrong. Measure each member against the ROBUST (median) member
    # offset, so only a track's deviation from its peers triggers escape.
    signed = jnp.einsum("ti,ti->t", n_pl, pts) - w.plane_distance[pid]
    member_ok = is_plane & (w.plane_id >= 0) & tri_ok
    # P independent nanmedians over (T,) — P is the plane-slot CAPACITY
    # (4-8 in every config, map/window plane_capacity), so the traced
    # loop stays a handful of small sorts; revisit with a single-sort
    # masked rank selection only if plane capacity ever grows
    med = jnp.zeros(P, signed.dtype)
    for p in range(P):
        vals = jnp.where(member_ok & (pid == p), signed, jnp.nan)
        m_p = jnp.nanmedian(vals)
        med = med.at[p].set(jnp.where(jnp.isnan(m_p), 0.0, m_p))
    if kp_sigma_px is not None and f_px is not None:
        z = 1.0 / jnp.maximum(jnp.abs(inv_d), 1e-6)
        T = w.kp.shape[1]
        z_ref = jnp.take_along_axis(w.kp, w.ref_frame[None, :, None],
                                    axis=0)[0]
        q_wc = lie.quat_mul(w.q[w.ref_frame],
                            jnp.broadcast_to(extr.q_bc, (T, 4)))
        bearing = lie.quat_rotate(
            q_wc,
            jnp.concatenate([z_ref, jnp.ones((T, 1), z_ref.dtype)], axis=-1))
        bearing = bearing / jnp.linalg.norm(bearing, axis=-1, keepdims=True)
        c2 = jnp.einsum("ti,ti->t", n_pl, bearing) ** 2
        ang = kp_sigma_px / f_px
        sig_z = ang * z * z / jnp.maximum(baseline, 1e-3)
        sig_lat = ang * z
        # multi-view averaging: the two-view depth-error model above
        # overstates an n-view DLT's error by ~sqrt(n-1)
        n_obs = jnp.sum(w.obs_mask & w.frame_mask[:, None], axis=0)
        red = jax.lax.rsqrt(jnp.maximum(n_obs - 1, 1).astype(z.dtype))
        sigma_pl = red * jnp.sqrt(c2 * sig_z**2 + (1.0 - c2) * sig_lat**2)
        thresh = jnp.minimum(escape_dist,
                             jnp.maximum(dist_floor, sigma_k * sigma_pl))
    else:
        thresh = escape_dist
    off = jnp.abs(signed - med[pid]) > thresh
    escape = (
        is_plane & (w.plane_id >= 0) & w.plane_mask[pid]
        & (track_life > min_life) & enough & tri_ok & off
    )
    depth_write = escape
    if kp_sigma_px is not None and f_px is not None:
        rpe_fresh = _mean_rpe_norm(w, extr, pts) * f_px
        rpe_stored = _mean_rpe_norm(w, extr, win.landmark_points(w, extr)) * f_px
        evidence = rpe_fresh <= jnp.maximum(2.0 * kp_sigma_px, 1.0)
        escape = escape & evidence
        depth_write = escape & (rpe_fresh < rpe_stored)
    flags = jnp.where(escape, (w.track_flags & ~TF_PLANE) | TF_VALID,
                      w.track_flags)
    return w._replace(
        track_flags=flags,
        inv_depth=jnp.where(depth_write, inv_d, w.inv_depth),
        plane_id=jnp.where(escape, -1, w.plane_id),
    )


def _mean_rpe_norm(w: WindowState, extr: Extrinsics, x):
    """Mean NORMALIZED-coordinate reprojection error of candidate points
    `x` (T, 3) over each track's observing frames; +inf on cheirality
    failure or no observations (compute_reprojection_error role,
    plane_extractor.cpp:184-198, device-side)."""
    q_ws = lie.quat_mul(w.q, jnp.broadcast_to(extr.q_bc, w.q.shape))
    p_ws = w.p + lie.quat_rotate(w.q, jnp.broadcast_to(extr.p_bc, w.p.shape))
    y = lie.quat_rotate(
        lie.quat_conj(q_ws)[:, None, :], x[None, :, :] - p_ws[:, None, :]
    )  # (F, T, 3)
    z = y[..., 2]
    obs = w.obs_mask & w.frame_mask[:, None]
    err = jnp.linalg.norm(camera.project(y) - w.kp, axis=-1)
    cnt = jnp.sum(obs, axis=0)
    mean = jnp.sum(jnp.where(obs, err, 0.0), axis=0) / jnp.maximum(cnt, 1)
    bad = jnp.any(obs & (z <= 1e-6), axis=0) | (cnt == 0)
    return jnp.where(bad, jnp.inf, mean)


def post_solve_update(w: WindowState, extr: Extrinsics, K, min_z=1.0e-3, max_z=50.0):
    """Depth gating + quality update after a BA solve.

    For every VALID track: landmark point must project with depth in
    (min_z, max_z) in every observing frame, else the track is
    invalidated; quality = mean pixel reprojection error
    (bundle_adjustor.cpp:277-296). Plane-track escape
    (plane_track_escape) runs before this, as in the reference.
    """
    dtype = w.p.dtype
    x = win.landmark_points(w, extr)  # (T, 3)
    # camera pose of every frame: q_ws = q_wb * q_bc, p_ws = p + q_wb p_bc
    q_ws = lie.quat_mul(w.q, jnp.broadcast_to(extr.q_bc, w.q.shape))
    p_ws = w.p + lie.quat_rotate(w.q, jnp.broadcast_to(extr.p_bc, w.p.shape))
    y = lie.quat_rotate(
        lie.quat_conj(q_ws)[:, None, :], x[None, :, :] - p_ws[:, None, :]
    )  # (F, T, 3)
    z = y[..., 2]
    obs = w.obs_mask & w.frame_mask[:, None]
    bad = jnp.any(obs & ((z <= min_z) | (z > max_z)), axis=0)

    proj = camera.project(y)
    err_px = jnp.linalg.norm(
        camera.apply_k(proj, K) - camera.apply_k(w.kp, K), axis=-1
    )
    cnt = jnp.maximum(jnp.sum(obs, axis=0).astype(dtype), 1.0)
    quality = jnp.sum(jnp.where(obs, err_px, 0.0), axis=0) / cnt

    is_valid = (w.track_flags & TF_VALID) != 0
    flags = jnp.where(bad, w.track_flags & ~(TF_VALID | TF_PLANE), w.track_flags)
    quality = jnp.where(is_valid & ~bad, quality, w.quality)
    return w._replace(track_flags=flags, quality=quality)
