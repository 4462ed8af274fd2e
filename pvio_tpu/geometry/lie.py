"""SO(3)/quaternion Lie algebra, batch-first and autodiff-safe.

TPU-native re-design of the role of reference pvio/src/pvio/geometry/
lie_algebra.{h,cpp} (hat / expmap / logmap / right_jacobian with Taylor
fallbacks, S^2 tangential bases). All functions broadcast over arbitrary
leading batch dimensions, are dtype-polymorphic (float32 on TPU, float64 in
CPU tests), and use guarded Taylor expansions so that both the value *and*
its gradient are finite at the small-angle singularity (a plain
``jnp.where(small, series, exact)`` still propagates NaN through the dead
branch's gradient, so every ratio is computed with a safe denominator).

Quaternion convention: arrays of shape (..., 4) ordered (w, x, y, z),
Hamilton product, unit quaternions represent rotations acting as
R(q) v = q * v * conj(q).
"""

import jax.numpy as jnp

# Angle^2 below this uses the Taylor series branch.
_EPS2 = 1e-12


def mm(A, B):
    """Batched small-matrix product via broadcast-multiply-reduce.

    For tiny matrices (3x3, 15x15) with small batch, XLA's dot_general
    pads each operand to full MXU tiles — measured ~0.8 ms per batched
    3x3 matmul on TPU v5e, which dominated the whole BA linearization.
    The elementwise formulation runs on the VPU in microseconds."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def mv(A, x):
    """Batched small matrix-vector product (same rationale as mm)."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def _safe(x2):
    """Return x2 clamped away from zero plus the small-angle mask."""
    small = x2 < _EPS2
    return jnp.where(small, jnp.ones_like(x2), x2), small


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix (lie_algebra.h:27)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def quat_mul(p, q):
    """Hamilton product of (..., 4) quaternions (w, x, y, z)."""
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )


def quat_conj(q):
    # concatenation instead of multiplying by a constant sign vector: keeps
    # the op free of captured array constants (required inside Pallas kernels)
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Uses the expanded two-cross-product form (cheaper than forming R).
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_mat(q):
    """(..., 4) -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R):
    """(..., 3, 3) -> (..., 4), branch-free (all four Shepperd candidates
    are computed and the best-conditioned one selected with where-masks so
    the op stays jittable with static shapes)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q_i*q vectors, one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def expmap(w):
    """Rotation vector (..., 3) -> unit quaternion (..., 4).

    q = [cos(|w|/2), sinc(|w|/2)/2 * w] with Taylor guard at |w| -> 0
    (reference lie_algebra.cpp expmap returns an Eigen quaternion).
    """
    t2 = jnp.sum(w * w, axis=-1, keepdims=True)
    t2s, small = _safe(t2)
    t = jnp.sqrt(t2s)
    half = 0.5 * t
    # sin(t/2)/t, guarded: series 1/2 - t^2/48
    s = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(half) / t)
    c = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(half))
    return jnp.concatenate([c, s * w], axis=-1)


def logmap(q):
    """Unit quaternion (..., 4) -> rotation vector (..., 3), |w| in [0, pi]."""
    q = q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))  # w >= 0 branch
    w = q[..., :1]
    u = q[..., 1:]
    n2 = jnp.sum(u * u, axis=-1, keepdims=True)
    n2s, small = _safe(n2)
    n = jnp.sqrt(n2s)
    angle = 2.0 * jnp.arctan2(n, w)
    # angle/n guarded: for small n, angle ~ 2n/w -> scale ~ 2/w (w ~ 1)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), angle / n)
    return scale * u


def logmap_approx(q):
    """Unit quaternion -> rotation vector without atan2 (which Mosaic
    cannot lower inside Pallas TPU kernels): theta = 2*atan(n/w) computed
    by two half-angle reductions + degree-7 Taylor — |error| < 2e-7 rad
    for |theta| <= pi/2+, float32-grade. Use inside kernels only; the
    exact `logmap` stays the default elsewhere."""
    q = q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))  # w >= 0
    w = q[..., :1]
    u = q[..., 1:]
    n2 = jnp.sum(u * u, axis=-1, keepdims=True)
    n2s, small = _safe(n2)
    n = jnp.sqrt(n2s)
    ws = jnp.maximum(w, 1e-6)
    t = n / ws
    # two reductions: atan(t) = 4*atan(t2), t2 = t1/(1+sqrt(1+t1^2))
    t1 = t / (1.0 + jnp.sqrt(1.0 + t * t))
    t2 = t1 / (1.0 + jnp.sqrt(1.0 + t1 * t1))
    t2sq = t2 * t2
    atan_t2 = t2 * (1.0 - t2sq * (1.0 / 3.0 - t2sq * (0.2 - t2sq / 7.0)))
    angle = 8.0 * atan_t2  # = 2*atan(t)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), angle / n)
    return scale * u


def expmap_mat(w):
    """Rotation vector -> rotation matrix (Rodrigues)."""
    return quat_to_mat(expmap(w))


def logmap_mat(R):
    return logmap(mat_to_quat(R))


def right_jacobian(w):
    """SO(3) right Jacobian Jr(w): (..., 3) -> (..., 3, 3).

    Jr = I - (1-cos t)/t^2 W + (t - sin t)/t^3 W^2, Taylor-guarded
    (reference lie_algebra.cpp:22-59).
    """
    t2 = jnp.sum(w * w, axis=-1)
    t2s, small = _safe(t2)
    t = jnp.sqrt(t2s)
    a = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    b = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / (t2s * t))
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - a[..., None, None] * W + b[..., None, None] * mm(W, W)


def right_jacobian_inv(w):
    """Inverse right Jacobian Jr^{-1}(w).

    Jr^-1 = I + W/2 + (1/t^2 - (1+cos t)/(2 t sin t)) W^2, Taylor-guarded.
    """
    t2 = jnp.sum(w * w, axis=-1)
    t2s, small = _safe(t2)
    t = jnp.sqrt(t2s)
    sin_t = jnp.sin(t)
    sin_ts = jnp.where(jnp.abs(sin_t) < 1e-12, jnp.ones_like(sin_t), sin_t)
    c = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        1.0 / t2s - (1.0 + jnp.cos(t)) / (2.0 * t * sin_ts),
    )
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + 0.5 * W + c[..., None, None] * mm(W, W)


def s2_tangential_basis(x):
    """Orthonormal basis of the tangent plane at x in S^2: (..., 3) -> (..., 3, 2)
    (reference lie_algebra.cpp:61-75; used by gravity refinement and planes)."""
    # Pick the unit axis least aligned with x to avoid degeneracy, branch-free.
    ax = jnp.abs(x)
    idx = jnp.argmin(ax, axis=-1)
    e = jnp.eye(3, dtype=x.dtype)[idx]
    b0 = jnp.cross(x, e)
    b0 = b0 / jnp.linalg.norm(b0, axis=-1, keepdims=True)
    b1 = jnp.cross(x, b0)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    return jnp.stack([b0, b1], axis=-1)
