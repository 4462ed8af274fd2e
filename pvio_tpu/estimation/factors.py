"""Factor residuals for sliding-window visual-inertial bundle adjustment.

Pure functions of (state, measurement) -> whitened residual, re-designing
the Ceres cost functions of reference pvio/src/pvio/estimation/ceres/*.h.
Jacobians are NOT hand-coded: the solver differentiates each residual
through the retraction at the linearization point (jacfwd over the tangent
delta), which reproduces the reference's local-parameterization trick
(QuaternionParameterization + 2x4 Jacobians with zeroed 4th column,
quaternion_parameterization.h:27-44) exactly but lets XLA fuse the chain.
The sole exception is the implicit triangulation inside the plane factor,
which gets a custom JVP (see `_solve_augmented_point`) because its value
path goes through a clamped eigen-pseudo-inverse.

All functions broadcast over leading batch dims unless noted.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pvio_tpu.geometry import camera, lie
from pvio_tpu.imu.preintegration import GRAVITY_NOMINAL, PreintDelta
from pvio_tpu.map.window import Extrinsics

GRAVITY = (0.0, 0.0, -GRAVITY_NOMINAL)


def reprojection_residual(
    q_tgt, p_tgt, q_ref, p_ref, inv_depth, z_ref, z_tgt, extr: Extrinsics,
    sqrt_inv_cov,
):
    """Inverse-depth reprojection residual (reprojection_error_cost.h:31-126).

    The landmark lives at depth 1/inv_depth along the bearing [z_ref, 1] in
    the *first observing* camera; it is mapped through body-camera
    extrinsics into the target camera. Returns (2,) whitened residual.
    sqrt_inv_cov: scalar or (2, 2) keypoint information square root.
    """
    inv_d = jnp.where(jnp.abs(inv_depth) < 1e-12, 1e-12, inv_depth)
    y_ref = jnp.concatenate([z_ref, jnp.ones_like(z_ref[..., :1])], axis=-1) / inv_d[..., None]
    y_ref_center = lie.quat_rotate(extr.q_bc, y_ref) + extr.p_bc
    x = lie.quat_rotate(q_ref, y_ref_center) + p_ref
    y_tgt_center = lie.quat_rotate(lie.quat_conj(q_tgt), x - p_tgt)
    y_tgt = lie.quat_rotate(lie.quat_conj(extr.q_bc), y_tgt_center - extr.p_bc)
    r = camera.project(y_tgt) - z_tgt
    return _whiten2(r, sqrt_inv_cov)


def pose_only_reprojection_residual(q_tgt, p_tgt, x_world, z_tgt, extr, sqrt_inv_cov):
    """Fixed-landmark variant (PoseOnlyReprojectionXYZErrorCost,
    reprojection_error_cost.h:159-203) used by motion-only PnP."""
    y_tgt_center = lie.quat_rotate(lie.quat_conj(q_tgt), x_world - p_tgt)
    y_tgt = lie.quat_rotate(lie.quat_conj(extr.q_bc), y_tgt_center - extr.p_bc)
    r = camera.project(y_tgt) - z_tgt
    return _whiten2(r, sqrt_inv_cov)


def _whiten2(r, sqrt_inv_cov):
    S = jnp.asarray(sqrt_inv_cov)
    if S.ndim == 0:
        return S * r
    return jnp.einsum("ij,...j->...i", S, r)


def preintegration_residual(
    q_i, p_i, v_i, bg_i, ba_i,
    q_j, p_j, v_j, bg_j, ba_j,
    delta: PreintDelta, bg_lin, ba_lin, extr: Extrinsics,
):
    """15-dim preintegration residual with first-order bias correction
    (preintegration_error_cost.h:31-165), whitened by delta.sqrt_inv_cov.

    q_i/p_i are *body-center* states; the residual acts on imu-sensor
    frames through the body-imu extrinsic (preintegration_error_cost.h:60-63).
    bg_lin/ba_lin: the bias at which delta was integrated (frame i's bias).
    """
    g = jnp.asarray(GRAVITY, q_i.dtype)
    qi = lie.quat_mul(q_i, extr.q_bi)
    pi = p_i + lie.quat_rotate(q_i, extr.p_bi)
    qj = lie.quat_mul(q_j, extr.q_bi)
    pj = p_j + lie.quat_rotate(q_j, extr.p_bi)

    dt = delta.t
    dbg = bg_i - bg_lin
    dba = ba_i - ba_lin

    dq_corr = lie.quat_mul(delta.q, lie.expmap(delta.dq_dbg @ dbg))
    qi_conj = lie.quat_conj(qi)
    rq = lie.logmap(lie.quat_mul(lie.quat_conj(dq_corr), lie.quat_mul(qi_conj, qj)))
    rp = lie.quat_rotate(qi_conj, pj - pi - dt * v_i - 0.5 * dt * dt * g) - (
        delta.p + delta.dp_dbg @ dbg + delta.dp_dba @ dba
    )
    rv = lie.quat_rotate(qi_conj, v_j - v_i - dt * g) - (
        delta.v + delta.dv_dbg @ dbg + delta.dv_dba @ dba
    )
    r = jnp.concatenate([rq, rp, rv, bg_j - bg_i, ba_j - ba_i])
    return delta.sqrt_inv_cov @ r


def preintegration_residual_and_jacobians(
    q_i, p_i, v_i, bg_i, ba_i,
    q_j, p_j, v_j, bg_j, ba_j,
    delta: PreintDelta, bg_lin, ba_lin, extr: Extrinsics,
    approx_trig: bool = False,
):
    """Whitened residual + analytic 15x15 Jacobians w.r.t. the two frames'
    error states (theta, p, v, bg, ba), mirroring the reference's
    hand-derived blocks (preintegration_error_cost.h:86-155). Autodiff
    through the residual is numerically identical but costs ~30x more on
    TPU (tested against `preintegration_residual` via FD in the suite).

    Returns (r (15,), Ji (15, 15), Jj (15, 15)).
    """
    dtype = q_i.dtype
    dt = delta.t
    # gravity built from traced zeros: no captured constant (Pallas-safe)
    _z = dt * 0.0
    g = jnp.stack([_z, _z, _z + GRAVITY[2]])
    qi = lie.quat_mul(q_i, extr.q_bi)
    pi = p_i + lie.quat_rotate(q_i, extr.p_bi)
    qj = lie.quat_mul(q_j, extr.q_bi)
    pj = p_j + lie.quat_rotate(q_j, extr.p_bi)
    dbg = bg_i - bg_lin
    dba = ba_i - ba_lin
    corr = lie.expmap(lie.mv(delta.dq_dbg, dbg))
    dq_corr = lie.quat_mul(delta.q, corr)
    qi_conj = lie.quat_conj(qi)
    _logmap = lie.logmap_approx if approx_trig else lie.logmap
    rq = _logmap(lie.quat_mul(lie.quat_conj(dq_corr), lie.quat_mul(qi_conj, qj)))
    dp_arg = pj - pi - dt * v_i - 0.5 * dt * dt * g
    dv_arg = v_j - v_i - dt * g
    rp = lie.quat_rotate(qi_conj, dp_arg) - (
        delta.p + lie.mv(delta.dp_dbg, dbg) + lie.mv(delta.dp_dba, dba)
    )
    rv = lie.quat_rotate(qi_conj, dv_arg) - (
        delta.v + lie.mv(delta.dv_dbg, dbg) + lie.mv(delta.dv_dba, dba)
    )
    r = jnp.concatenate([rq, rp, rv, bg_j - bg_i, ba_j - ba_i])

    Jr_inv = lie.right_jacobian_inv(rq)
    R_qi_T = lie.quat_to_mat(qi_conj)
    R_qci = lie.quat_to_mat(q_i)
    R_qj_T = lie.quat_to_mat(lie.quat_conj(qj))
    R_bi_T = lie.quat_to_mat(lie.quat_conj(extr.q_bi))
    R_qcj = lie.quat_to_mat(q_j)
    Z3 = jnp.zeros((3, 3), dtype) * dt       # traced zero (Pallas-safe)
    I3 = Z3 + jnp.eye(3, dtype=dtype)

    # assembled with concatenation (transposing a stacked (5,5,3,3) block
    # tensor lowers to a pathological generic transpose on TPU)
    def blocks_to_mat(B):
        # B: list of 5 rows of 5 (3, 3) blocks
        return jnp.concatenate(
            [jnp.concatenate(row, axis=-1) for row in B], axis=-2
        )

    mm = lie.mm
    Ji = blocks_to_mat([
        [-mm(mm(Jr_inv, R_qj_T), R_qci), Z3, Z3,
         -mm(mm(mm(Jr_inv, lie.quat_to_mat(lie.expmap(rq)).T),
                lie.right_jacobian(lie.mv(delta.dq_dbg, dbg))), delta.dq_dbg), Z3],
        [mm(R_bi_T, lie.hat(lie.quat_rotate(lie.quat_conj(q_i),
                                            pj - p_i - dt * v_i - 0.5 * dt * dt * g))),
         -R_qi_T, -dt * R_qi_T, -delta.dp_dbg, -delta.dp_dba],
        [mm(R_bi_T, lie.hat(lie.quat_rotate(lie.quat_conj(q_i), dv_arg))),
         Z3, -R_qi_T, -delta.dv_dbg, -delta.dv_dba],
        [Z3, Z3, Z3, -I3, Z3],
        [Z3, Z3, Z3, Z3, -I3],
    ])
    Jj = blocks_to_mat([
        [mm(Jr_inv, R_bi_T), Z3, Z3, Z3, Z3],
        [-mm(mm(R_qi_T, R_qcj), lie.hat(extr.p_bi)), R_qi_T, Z3, Z3, Z3],
        [Z3, Z3, R_qi_T, Z3, Z3],
        [Z3, Z3, Z3, I3, Z3],
        [Z3, Z3, Z3, Z3, I3],
    ])

    S = delta.sqrt_inv_cov
    return lie.mv(S, r), mm(S, Ji), mm(S, Jj)


def marginalization_residual_and_jacobian(q, p, v, bg, ba, prior):
    """Whitened prior residual + analytic Jacobian w.r.t. the stacked
    frame error states (marginalization_error_cost.h:70-88: the only
    non-identity block is d log(q0^-1 q)/d theta = Jr^-1(rq)).

    q (F, 4) etc. Returns (r (F*15,), J (F*15, F*15))."""
    F = q.shape[0]
    dtype = p.dtype
    rq = lie.logmap(lie.quat_mul(lie.quat_conj(prior.q0), q))
    dx = jnp.concatenate(
        [rq, p - prior.p0, v - prior.v0, bg - prior.bg0, ba - prior.ba0], axis=-1
    )
    r = prior.sqrt_info @ dx.reshape(-1) + prior.infovec
    Jr_inv = lie.right_jacobian_inv(rq)  # (F, 3, 3)
    blocks = jnp.tile(jnp.eye(15, dtype=dtype), (F, 1, 1))
    blocks = blocks.at[:, 0:3, 0:3].set(Jr_inv)
    # block-diagonal (F*15, F*15) via scatter into eye-masked layout
    D = jnp.einsum("fij,fg->figj", blocks, jnp.eye(F, dtype=dtype)).reshape(
        F * 15, F * 15
    )
    return r, prior.sqrt_info @ D


def marginalization_residual(q, p, v, bg, ba, prior):
    """Prior residual over all frame slots
    (marginalization_error_cost.h:53-93): r = sqrt_info @ dx + infovec with
    dx_i = [log(q0_i^-1 q_i); p - p0; v - v0; bg - bg0; ba - ba0].

    q (F, 4), p/v/bg/ba (F, 3). Returns (F*15,).
    """
    rq = lie.logmap(lie.quat_mul(lie.quat_conj(prior.q0), q))
    dx = jnp.concatenate(
        [rq, p - prior.p0, v - prior.v0, bg - prior.bg0, ba - prior.ba0], axis=-1
    )  # (F, 15)
    return prior.sqrt_info @ dx.reshape(-1) + prior.infovec


# ----------------------------------------------------------------------------
# Plane factor: implicit DLT triangulation augmented with a plane row
# ----------------------------------------------------------------------------

def _sym3_inv(M, ridge_rel=None):
    """Closed-form inverse of a batched symmetric PSD 3x3 via the
    adjugate, with a trace-relative Tikhonov ridge standing in for the
    reference's eigenvalue clamp at 1e-8
    (augmented_plane_distance_error_cost.h:92-95). The plane
    regularization row guarantees an O(1) eigenvalue along the plane
    normal, so near-singular directions are orthogonal to the residual's
    n-projection and the ridge-vs-clamp difference is second order; the
    closed form keeps the plane factor inside one fused XLA kernel
    (batched eigh is a fusion-breaking custom call on TPU)."""
    if ridge_rel is None:
        # at the working precision's eigenvalue noise floor: the ridge
        # then perturbs the solution no more than roundoff already does
        ridge_rel = 1e-7 if M.dtype == jnp.float32 else 1e-13
    tr = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]
    eps = ridge_rel * tr + jnp.asarray(1e-18, M.dtype)
    Mr = M + eps[..., None, None] * jnp.eye(3, dtype=M.dtype)
    a, b, c = Mr[..., 0, 0], Mr[..., 0, 1], Mr[..., 0, 2]
    d, e, f = Mr[..., 1, 1], Mr[..., 1, 2], Mr[..., 2, 2]
    A00 = d * f - e * e
    A01 = c * e - b * f
    A02 = b * e - c * d
    A11 = a * f - c * c
    A12 = b * c - a * e
    A22 = a * d - b * b
    det = a * A00 + b * A01 + c * A02
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], -1),
        jnp.stack([A01, A11, A12], -1),
        jnp.stack([A02, A12, A22], -1),
    ], -2)
    return adj / det[..., None, None]


@jax.custom_jvp
def _solve_augmented_point(A, b):
    """x = -(A^T A)^+ A^T b (augmented_plane_distance_error_cost.h:87-96;
    pseudo-inverse realised by _sym3_inv). The JVP comes from the normal
    equations (A^T A) x = -A^T b via the implicit function theorem — the
    same formulas as the reference's analytic Jacobians (:98-131).
    A (..., R, 3), b (..., R)."""
    AtA = jnp.einsum("...ri,...rj->...ij", A, A)
    Atb = jnp.einsum("...ri,...r->...i", A, b)
    AtAinv = _sym3_inv(AtA)
    return -jnp.einsum("...ij,...j->...i", AtAinv, Atb)


@_solve_augmented_point.defjvp
def _solve_augmented_point_jvp(primals, tangents):
    A, b = primals
    dA, db = tangents
    AtA = jnp.einsum("...ri,...rj->...ij", A, A)
    Atb = jnp.einsum("...ri,...r->...i", A, b)
    AtAinv = _sym3_inv(AtA)
    x = -jnp.einsum("...ij,...j->...i", AtAinv, Atb)
    # residual of the normal equations: d(AtA) x + d(Atb) =
    #   dA^T (A x + b) + A^T (dA x + db)
    Axb = jnp.einsum("...ri,...i->...r", A, x) + b
    rhs = jnp.einsum("...ri,...r->...i", dA, Axb) + jnp.einsum(
        "...ri,...r->...i", A, jnp.einsum("...ri,...i->...r", dA, x) + db
    )
    dx = -jnp.einsum("...ij,...j->...i", AtAinv, rhs)
    return x, dx


def plane_point_rows(q_frames, p_frames, kps, mask, extr: Extrinsics):
    """DLT rows of one track across its observing frames
    (augmented_plane_distance_error_cost.h:59-76).

    q_frames (F, 4), p_frames (F, 3), kps (F, 2), mask (F,).
    Returns (A (2F, 3), b (2F,)); masked-out frames give zero rows.
    """
    q_ws = lie.quat_mul(q_frames, extr.q_bc[None])  # world <- sensor
    Rsw = lie.quat_to_mat(lie.quat_conj(q_ws))      # (F, 3, 3) world -> sensor
    p_sensor = p_frames + lie.quat_rotate(q_frames, extr.p_bc[None])
    Tsw = -jnp.einsum("fij,fj->fi", Rsw, p_sensor)  # (F, 3)
    u = kps[:, 0:1]
    v = kps[:, 1:2]
    a0 = u * Rsw[:, 2, :] - Rsw[:, 0, :]
    a1 = v * Rsw[:, 2, :] - Rsw[:, 1, :]
    b0 = u[:, 0] * Tsw[:, 2] - Tsw[:, 0]
    b1 = v[:, 0] * Tsw[:, 2] - Tsw[:, 1]
    m = mask.astype(kps.dtype)[:, None]
    A = jnp.concatenate([a0 * m, a1 * m], axis=0)           # (2F, 3)
    b = jnp.concatenate([b0 * m[:, 0], b1 * m[:, 0]], axis=0)
    return A, b


def augmented_plane_distance_residual(
    q_frames, p_frames, kps, mask, normal, distance, extr: Extrinsics,
    sqrt_inv_cov, regularization_weight=1.0,
):
    """The paper's multi-plane prior factor
    (augmented_plane_distance_error_cost.h:32-143): triangulate the track
    from all observing poses with an extra plane-regularization row, then
    penalize the signed plane distance n.x - d of the implicit point.
    Scalar whitened residual.

    Note: the DLT rows satisfy a.x + b = 0, so with the n.x = d plane
    convention (plane.cpp:110-117) the regularization row is (w*n, -w*d).
    The reference appends +w*d (augmented_plane_distance_error_cost.h:84-85),
    which under its own conventions biases the implicit point *away* from
    the plane — a latent sign quirk we do not reproduce."""
    A, b = plane_point_rows(q_frames, p_frames, kps, mask, extr)
    w = jnp.asarray(regularization_weight, A.dtype)
    A = jnp.concatenate([A, (w * normal)[None, :]], axis=0)
    b = jnp.concatenate([b, (-w * distance)[None]], axis=0)
    x = _solve_augmented_point(A, b)
    r = jnp.dot(normal, x) - distance
    return sqrt_inv_cov * r


def augmented_plane_residual_and_pose_jacobian(
    q_frames, p_frames, kps_ft, mask_ft, normals_t, dists_t,
    extr: Extrinsics, sqrt_inv_cov, regularization_weight=1.0,
    with_plane_jacobian=False,
):
    """Batched residual + analytic pose Jacobian of the augmented plane
    factor for ALL track columns at once — the chain rule through the
    clamped pseudo-inverse, mirroring the reference's analytic Jacobians
    (augmented_plane_distance_error_cost.h:98-131) instead of pushing an
    F*6-dim tangent through the implicit solve per track (which made the
    plane-enabled solve ~8x the cost of everything else combined).

    Derivation: r = sic*(n.x - d) with (A^T A) x = -A^T b. The implicit
    function theorem gives dr = -sic * g^T (dA^T s + A^T (dA x + db)),
    where g = (A^T A)^+ n and s = A x + b. Only frame f's two DLT rows
    depend on frame f's pose, and their derivatives split into a
    track-independent per-frame part (dRsw, dTsw — obtained exactly by a
    6-tangent jacfwd of the tiny camera-matrix map) and the track's
    scalar pixel coordinates. The expensive per-track solve is computed
    ONCE; everything else is batched einsum work.

    q_frames (F, 4), p_frames (F, 3), kps_ft (F, T, 2), mask_ft (F, T),
    normals_t (T, 3), dists_t (T,).
    Returns (r (T,), J (T, F, 6)).
    """
    F = q_frames.shape[0]
    dtype = p_frames.dtype

    def camera_rows(d6, q, p):
        q2 = lie.quat_mul(q, lie.expmap(d6[0:3]))
        p2 = p + d6[3:6]
        q_ws = lie.quat_mul(q2, extr.q_bc)
        Rsw = lie.quat_to_mat(lie.quat_conj(q_ws))
        ps = p2 + lie.quat_rotate(q2, extr.p_bc)
        Tsw = -Rsw @ ps
        return Rsw, Tsw

    zero6 = jnp.zeros(6, dtype)

    def one_frame(q, p):
        (Rsw, Tsw), lin = jax.linearize(lambda d: camera_rows(d, q, p), zero6)
        dR, dT = jax.vmap(lin)(jnp.eye(6, dtype=dtype))  # (6,3,3), (6,3)
        return Rsw, Tsw, dR, dT

    Rsw, Tsw, dR, dT = jax.vmap(one_frame)(q_frames, p_frames)
    # Rsw (F,3,3), Tsw (F,3), dR (F,6,3,3), dT (F,6,3)

    u = kps_ft[..., 0]                  # (F, T)
    v = kps_ft[..., 1]
    m = mask_ft.astype(dtype)
    # DLT rows per (frame, track): a.x + b = 0
    a0 = (u[..., None] * Rsw[:, None, 2, :] - Rsw[:, None, 0, :]) * m[..., None]
    a1 = (v[..., None] * Rsw[:, None, 2, :] - Rsw[:, None, 1, :]) * m[..., None]
    b0 = (u * Tsw[:, None, 2] - Tsw[:, None, 0]) * m
    b1 = (v * Tsw[:, None, 2] - Tsw[:, None, 1]) * m

    w = jnp.asarray(regularization_weight, dtype)
    # normal equations per track, incl. the plane-regularization row
    # (w*n, -w*d); see augmented_plane_distance_residual for the sign note
    nn = w * normals_t                              # (T, 3)
    AtA = (
        jnp.einsum("fti,ftj->tij", a0, a0)
        + jnp.einsum("fti,ftj->tij", a1, a1)
        + nn[:, :, None] * nn[:, None, :]
    )
    Atb = (
        jnp.einsum("fti,ft->ti", a0, b0)
        + jnp.einsum("fti,ft->ti", a1, b1)
        + nn * (-w * dists_t)[:, None]
    )
    AtAinv = _sym3_inv(AtA)
    x = -jnp.einsum("tij,tj->ti", AtAinv, Atb)      # (T, 3)
    g = jnp.einsum("tij,tj->ti", AtAinv, normals_t)  # (T, 3)
    r = jnp.einsum("ti,ti->t", normals_t, x) - dists_t

    # row residuals s = A x + b (the plane row never enters the pose
    # Jacobian: its derivative w.r.t. poses is zero)
    s0 = jnp.einsum("fti,ti->ft", a0, x) + b0       # (F, T)
    s1 = jnp.einsum("fti,ti->ft", a1, x) + b1
    a0g = jnp.einsum("fti,ti->ft", a0, g)
    a1g = jnp.einsum("fti,ti->ft", a1, g)

    # track-dependent derivative contractions (masking rides the masked
    # row factors s*/a*g — every Jacobian term carries exactly one)
    DRg = jnp.einsum("fkij,tj->tfki", dR, g)        # (T, F, 6, 3)
    DRx = jnp.einsum("fkij,tj->tfki", dR, x)
    uT = u.T[:, :, None]                            # (T, F, 1)
    vT = v.T[:, :, None]
    da0g = uT * DRg[..., 2] - DRg[..., 0]           # (T, F, 6)
    da1g = vT * DRg[..., 2] - DRg[..., 1]
    da0x = uT * DRx[..., 2] - DRx[..., 0]
    da1x = vT * DRx[..., 2] - DRx[..., 1]
    db0 = uT * dT[None, :, :, 2] - dT[None, :, :, 0]  # (T, F, 6)
    db1 = vT * dT[None, :, :, 2] - dT[None, :, :, 1]

    J = -(
        s0.T[:, :, None] * da0g + s1.T[:, :, None] * da1g
        + a0g.T[:, :, None] * (da0x + db0)
        + a1g.T[:, :, None] * (da1x + db1)
    )
    sic = jnp.asarray(sqrt_inv_cov, dtype)
    if not with_plane_jacobian:
        return sic * r, sic * J

    # Jacobian w.r.t. the plane's own 3-dof tangent (2 on the normal's
    # S^2 tangent basis + distance) — the piece the reference holds
    # constant (bundle_adjustor.cpp:120-124) but this solver estimates.
    # Same implicit chain rule, with the perturbation now entering only
    # the regularization row (w*dn, -w*dd):
    #   dr/d(dn) = sic [ (1 - w^2 g.n) x - w s_pl g ]
    #   dr/d(dd) = sic [ w^2 g.n - 1 ]
    # where g = (A^T A)^+ n, s_pl = w (n.x - d) is the plane row residual.
    gn = jnp.einsum("ti,ti->t", g, normals_t)           # (T,)
    s_pl = w * r
    dr_dn = (1.0 - w * w * gn)[:, None] * x - (w * s_pl)[:, None] * g
    dr_dd = w * w * gn - 1.0
    Tg = jax.vmap(lie.s2_tangential_basis)(normals_t)   # (T, 3, 2)
    Jn2 = jnp.einsum("ti,tik->tk", dr_dn, Tg)           # (T, 2)
    Jpl = sic * jnp.concatenate([Jn2, dr_dd[:, None]], axis=-1)  # (T, 3)
    return sic * r, sic * J, Jpl


def plane_cast_point(normal, distance, origin, bearing):
    """Ray-cast from origin along bearing onto the plane n.x = d
    (map/plane.cpp:120-126). Returns the 3D intersection (garbage when
    near-parallel — callers gate on |n.bearing|)."""
    denom = jnp.sum(normal * bearing, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    s = (distance - jnp.sum(normal * origin, axis=-1)) / denom
    return origin + s[..., None] * bearing
