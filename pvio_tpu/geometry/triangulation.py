"""Multi-view DLT triangulation, batched and masked.

Re-designs reference pvio/src/pvio/geometry/stereo.{h,cpp} (triangulate_point
/ _checked / _scored / triangulate_from_rt[_scored]) as fixed-shape array
programs: the homogeneous point is the smallest eigenvector of the 4x4
normal matrix A^T A (eigh — batched-friendly on TPU, unlike tall SVDs),
invalid observations contribute zero rows via masks, and the 8-hypothesis
(R, T) selection of two-view bootstrapping is a vmap + argmax instead of a
host loop.

Validity semantics preserved from the reference (stereo.h:86-128): every
observing camera must see positive depth and depth/w < 100; the score is the
mean squared reprojection error in normalized coordinates.
"""

import jax
import jax.numpy as jnp

from pvio_tpu.geometry.camera import project

MAX_DEPTH = 100.0


def _dlt_rows(P, x):
    """Two DLT rows for one camera: P (..., 3, 4), x (..., 2) -> (..., 2, 4)."""
    r0 = x[..., 0:1] * P[..., 2, :] - P[..., 0, :]
    r1 = x[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    return jnp.stack([r0, r1], axis=-2)


def triangulate_homogeneous(Ps, xs, mask=None):
    """DLT point from N views: Ps (..., N, 3, 4), xs (..., N, 2),
    mask (..., N) -> homogeneous (..., 4) (unit norm).

    Masked-out views contribute zero rows (no effect on A^T A).
    """
    rows = _dlt_rows(Ps, xs)  # (..., N, 2, 4)
    if mask is not None:
        rows = rows * mask[..., None, None].astype(rows.dtype)
    A = rows.reshape(*rows.shape[:-3], -1, 4)
    AtA = jnp.einsum("...ri,...rj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]  # eigenvector of smallest eigenvalue


def triangulate_scored(Ps, xs, mask=None):
    """Triangulate + cheirality/depth check + reprojection score.

    Returns (point (..., 3), valid (...,) bool, score (...,)).
    Mirrors stereo.h:104-128: valid iff every (masked-in) view has
    z * w > 0 and z / w < 100; score = mean sq. reprojection error over
    masked-in views. When invalid the reference returns the normalized
    direction (q.head<3>().normalized()); we do the same so the caller can
    still use the bearing.
    """
    q = triangulate_homogeneous(Ps, xs, mask)
    w = q[..., 3]
    qc = jnp.einsum("...nij,...j->...ni", Ps, q)  # (..., N, 3) per-camera homog
    z = qc[..., 2]
    ws = jnp.where(jnp.abs(w) < 1e-18, 1e-18, w)
    depth_ratio = z / ws[..., None]
    # cheirality (z and w same sign) + bounded depth, per view
    ok = (z * w[..., None] > 0) & (depth_ratio < MAX_DEPTH)
    err = jnp.sum((project(qc) - xs) ** 2, axis=-1)  # (..., N)
    if mask is not None:
        m = mask.astype(q.dtype)
        cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        score = jnp.sum(err * m, axis=-1) / cnt
        valid = jnp.all(ok | ~mask, axis=-1)
    else:
        score = jnp.mean(err, axis=-1)
        valid = jnp.all(ok, axis=-1)
    p_valid = q[..., :3] / ws[..., None]
    dirn = q[..., :3] / jnp.linalg.norm(q[..., :3], axis=-1, keepdims=True)
    point = jnp.where(valid[..., None], p_valid, dirn)
    return point, valid, score


def pose_matrix(R, t):
    """(..., 3, 3), (..., 3) -> (..., 3, 4) projection [R | t]."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def triangulate_two_view(R, t, x1, x2):
    """Two-view batch: R/t map frame-1 coords into frame 2 (P1 = [I|0],
    P2 = [R|t]); x1, x2 (..., 2). Returns (point, valid, score)."""
    dtype = x1.dtype
    I = jnp.broadcast_to(jnp.eye(3, 4, dtype=dtype), (*x1.shape[:-1], 3, 4))
    P2 = jnp.broadcast_to(pose_matrix(R, t), (*x1.shape[:-1], 3, 4))
    Ps = jnp.stack([I, P2], axis=-3)
    xs = jnp.stack([x1, x2], axis=-2)
    return triangulate_scored(Ps, xs)


def select_rt_hypothesis(Rs, Ts, x1, x2, count_threshold=0, R_prior=None,
                         prior_max_angle=None):
    """Choose among H candidate (R, T) pairs by triangulating all N matches
    under each (reference stereo.cpp:149-171, triangulate_from_rt_scored).

    Rs (H, 3, 3), Ts (H, 3), x1/x2 (N, 2).
    Returns (best_idx, points (N, 3), status (N,) bool, count).

    Selection rule preserved: prefer hypotheses whose inlier count exceeds
    `count_threshold` with minimal mean score; otherwise maximal count.

    `R_prior` (3, 3) + `prior_max_angle` (radians): optional rotation
    prior — hypotheses whose rotation is further than the bound from the
    prior are deprioritized (used only if at least one hypothesis lies
    within it). For visual-INERTIAL initialization the preintegrated gyro
    rotation is such a prior, and it decisively resolves the twofold
    planar (homography) ambiguity: on a wall-dominant view both
    decompositions reproject coplanar points equally well, so the
    reference's count/score rule degenerates to a coin flip — the gyro,
    already in hand, is off by at most bias*dt (<~2 deg) while the wrong
    hypothesis is off by several degrees.
    """
    def per_hyp(R, T):
        pts, valid, score = triangulate_two_view(R, T, x1, x2)
        count = jnp.sum(valid)
        total = jnp.sum(jnp.where(valid, score, 0.0))
        mean_score = total / jnp.maximum(count, 1).astype(score.dtype)
        return pts, valid, count, mean_score

    pts, valid, counts, scores = jax.vmap(per_hyp)(Rs, Ts)
    passing = counts > count_threshold
    big = jnp.array(jnp.finfo(scores.dtype).max, scores.dtype)
    if R_prior is not None and prior_max_angle is not None:
        dR = jnp.einsum("hij,kj->hik", Rs, R_prior)   # R_h @ R_prior^T
        tr = dR[:, 0, 0] + dR[:, 1, 1] + dR[:, 2, 2]
        ang = jnp.arccos(jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0))
        within = ang < prior_max_angle
        # only apply the prior when some hypothesis satisfies it
        use = jnp.any(within)
        scores = jnp.where(within | ~use, scores, big)
        counts = jnp.where(within | ~use, counts, 0)
        passing = passing & (within | ~use)
    score_key = jnp.where(passing, scores, big)
    best_by_score = jnp.argmin(score_key)
    best_by_count = jnp.argmax(counts)
    best = jnp.where(jnp.any(passing), best_by_score, best_by_count)
    return best, pts[best], valid[best], counts[best]
