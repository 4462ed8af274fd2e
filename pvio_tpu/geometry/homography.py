"""4-point homography estimation + analytic decomposition.

Re-design of reference pvio/src/pvio/geometry/homography.{h,cpp}: Hartley-
normalized DLT (solve via eigh of the 9x9 normal matrix — batched-friendly),
and a branch-free Malis-Vargas-style decomposition (homography.cpp:22-91)
where the reference's 3-way dominant-diagonal branch becomes a computed
select so the whole function jits with static shapes.
"""

import jax.numpy as jnp

from pvio_tpu.geometry import lie


def _normalize_points(x):
    """Hartley normalization: (N, 2) -> (normalized points, 3x3 transform,
    3x3 inverse transform). The inverse is closed-form (the transform is a
    uniform-scale + translation similarity) — composing with it must not
    go through a generic linear solve: batched LU has no f64 TPU kernel,
    and RANSAC vmaps this over hundreds of hypotheses."""
    c = jnp.mean(x, axis=-2, keepdims=True)
    d = jnp.mean(jnp.linalg.norm(x - c, axis=-1), axis=-1)
    s = jnp.sqrt(jnp.asarray(2.0, x.dtype)) / jnp.maximum(d, 1e-12)
    xn = (x - c) * s
    cx, cy = c[..., 0, 0], c[..., 0, 1]
    T = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], dtype=x.dtype)
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * cx).at[1, 2].set(-s * cy)
    Tinv = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], dtype=x.dtype)
    inv_s = 1.0 / s
    Tinv = Tinv.at[0, 0].set(inv_s).at[1, 1].set(inv_s)
    Tinv = Tinv.at[0, 2].set(cx).at[1, 2].set(cy)
    return xn, T, Tinv


def solve_homography(x1, x2):
    """DLT homography from N >= 4 correspondences (x2 ~ H x1), both (N, 2)
    in normalized camera coords. Returns (3, 3) H."""
    p1, T1, _ = _normalize_points(x1)
    p2, _, T2inv = _normalize_points(x2)
    u, v = p1[..., 0], p1[..., 1]
    up, vp = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    # Standard two rows per correspondence.
    r1 = jnp.stack([u, v, one, zero, zero, zero, -up * u, -up * v, -up], axis=-1)
    r2 = jnp.stack([zero, zero, zero, u, v, one, -vp * u, -vp * v, -vp], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[:, 0]
    Hn = h.reshape(3, 3)
    H = T2inv @ (Hn @ T1)
    return H / H[2, 2]


def inv3(M):
    """Closed-form 3x3 inverse via the adjugate — stays on the VPU
    (LU-backed jnp.linalg.inv has no f64 TPU kernel and breaks fusion
    when vmapped over RANSAC hypothesis batches)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    Hc = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    # sign-preserving clamp: flipping a small negative determinant to
    # +eps would silently negate the inverse
    det = jnp.where(det >= 0, jnp.maximum(det, 1e-18),
                    jnp.minimum(det, -1e-18))
    adj = jnp.stack([
        jnp.stack([A, B, C], axis=-1),
        jnp.stack([D, E, F], axis=-1),
        jnp.stack([G, Hc, I], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def homography_geometric_error(H, p1, p2):
    """Squared transfer error d(p2, H p1)^2 (homography.h:31-33), batched."""
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    q = jnp.einsum("ij,...j->...i", H, p1h)
    z = q[..., 2:3]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    return jnp.sum((p2 - q[..., :2] / zs) ** 2, axis=-1)


def _sqrt0(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def decompose_homography(H):
    """Analytic decomposition of a calibrated homography.

    Returns (Rs (2, 3, 3), Ts (2, 3), ns (2, 3), is_pure_rotation bool).
    Mirrors homography.cpp:22-91: H is scaled by its middle singular value,
    S = Hn^T Hn - I; pure rotation when ||S||_inf < 1e-3 (then R = closest
    rotation via SVD and T = n = 0); otherwise the two Malis-Vargas
    solutions. The reference's if/else over the dominant S diagonal entry
    becomes an arithmetic select over all three candidates.
    """
    sv = jnp.linalg.svd(H, compute_uv=False)
    Hn = H / sv[1]
    S = Hn.T @ Hn - jnp.eye(3, dtype=H.dtype)
    is_pure_rotation = jnp.max(jnp.abs(S)) <= 1e-3

    # --- pure-rotation branch values ---
    U, _, Vt = jnp.linalg.svd(H)
    Rpr = U @ Vt
    Rpr = jnp.where(jnp.linalg.det(Rpr) < 0, -Rpr, Rpr)

    # --- general branch (Malis-Vargas) ---
    Ms00 = S[1, 2] * S[1, 2] - S[1, 1] * S[2, 2]
    Ms11 = S[0, 2] * S[0, 2] - S[0, 0] * S[2, 2]
    Ms22 = S[0, 1] * S[0, 1] - S[0, 0] * S[1, 1]
    s00, s11, s22 = _sqrt0(Ms00), _sqrt0(Ms11), _sqrt0(Ms22)
    tr = S[0, 0] + S[1, 1] + S[2, 2]
    nu = 2.0 * _sqrt0(1.0 + tr - Ms00 - Ms11 - Ms22)
    tenormsq = 2.0 + tr - nu

    def sgn(x):
        return jnp.where(x < 0, -1.0, 1.0).astype(H.dtype)

    # Candidate (n1, n2) for each dominant diagonal entry of S.
    e12 = sgn(S[0, 1] * S[0, 2] - S[0, 0] * S[1, 2])
    n1_a = jnp.stack([S[0, 0], S[0, 1] + s22, S[0, 2] + e12 * s11])
    n2_a = jnp.stack([S[0, 0], S[0, 1] - s22, S[0, 2] - e12 * s11])
    d_a = S[0, 0]

    e02 = sgn(S[1, 1] * S[0, 2] - S[0, 1] * S[1, 2])
    n1_b = jnp.stack([S[0, 1] + s22, S[1, 1], S[1, 2] - e02 * s00])
    n2_b = jnp.stack([S[0, 1] - s22, S[1, 1], S[1, 2] + e02 * s00])
    d_b = S[1, 1]

    e01 = sgn(S[1, 2] * S[0, 2] - S[0, 1] * S[2, 2])
    n1_c = jnp.stack([S[0, 2] + e01 * s11, S[1, 2] + s00, S[2, 2]])
    n2_c = jnp.stack([S[0, 2] - e01 * s11, S[1, 2] - s00, S[2, 2]])
    d_c = S[2, 2]

    diag = jnp.stack([S[0, 0], S[1, 1], S[2, 2]])
    case = jnp.argmax(diag)
    n1 = jnp.select([case == 0, case == 1], [n1_a, n1_b], n1_c)
    n2 = jnp.select([case == 0, case == 1], [n2_a, n2_b], n2_c)
    d = jnp.select([case == 0, case == 1], [d_a, d_b], d_c)
    ds = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

    tstar1 = jnp.linalg.norm(n1) * n2 / ds
    tstar2 = jnp.linalg.norm(n2) * n1 / ds
    n1 = n1 / jnp.maximum(jnp.linalg.norm(n1), 1e-12)
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2), 1e-12)
    tstar1 = tstar1 - tenormsq * n1
    tstar2 = tstar2 - tenormsq * n2
    nus = jnp.where(jnp.abs(nu) < 1e-12, 1e-12, nu)
    I3 = jnp.eye(3, dtype=H.dtype)
    R1 = Hn @ (I3 - jnp.outer(tstar1 / nus, n1))
    R2 = Hn @ (I3 - jnp.outer(tstar2 / nus, n2))
    T1 = R1 @ (0.5 * tstar1)
    T2 = R2 @ (0.5 * tstar2)

    zeros3 = jnp.zeros(3, dtype=H.dtype)
    Rs = jnp.where(is_pure_rotation, jnp.stack([Rpr, Rpr]), jnp.stack([R1, R2]))
    Ts = jnp.where(is_pure_rotation, jnp.stack([zeros3, zeros3]), jnp.stack([T1, T2]))
    ns = jnp.where(is_pure_rotation, jnp.stack([zeros3, zeros3]), jnp.stack([n1, n2]))
    return Rs, Ts, ns, is_pure_rotation
