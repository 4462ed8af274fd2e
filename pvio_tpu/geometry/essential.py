"""Essential-matrix estimation: 8-point linear and 5-point Nistér solvers.

Re-design of reference pvio/src/pvio/geometry/essential.{h,cpp} for TPU: the
reference solves the 5-point problem by eigendecomposing a nonsymmetric
10x10 action matrix per RANSAC iteration (essential.cpp:178-209) — an
operation XLA cannot lower on TPU. Here the Gröbner step is re-expressed
with fixed shapes end-to-end:

  1. nullspace basis of the 5x9 epipolar system via eigh of the 9x9 normal
     matrix;
  2. the ten cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
     built *numerically* with dense trivariate-polynomial coefficient
     tensors (degree <= 3 in x, y, z => (4,4,4) arrays, products via 3-D
     convolution);
  3. a jittable 10-step Gauss-Jordan with partial pivoting reduces the
     10x20 monomial matrix;
  4. eliminating x, y leaves a degree-10 univariate polynomial in z whose
     real roots are found with a tan-substitution sign-change scan +
     vectorized bisection (static shapes, no eig);
  5. back-substitution recovers (x, y), E = x X + y Y + z Z + W.

Returns a fixed-size batch of 10 candidate matrices with a validity mask —
the natural shape for vmapped RANSAC scoring.
"""

from functools import partial

import jax
import jax.numpy as jnp

_GRID = 1024  # theta samples for the root scan
_BISECT_ITERS = 64
_MAX_ROOTS = 10


def essential_geometric_error(E, p1, p2):
    """Squared epipolar-line distance of p2 from E p1 (essential.h:29-33),
    batched over leading dims of p1/p2."""
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    p2h = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], axis=-1)
    Ep1 = jnp.einsum("ij,...j->...i", E, p1h)
    r = jnp.sum(p2h * Ep1, axis=-1)
    denom = jnp.maximum(Ep1[..., 0] ** 2 + Ep1[..., 1] ** 2, 1e-18)
    return r * r / denom


def essential_symmetric_error(E, p1, p2):
    """Two-sided error used by the reference's RANSAC evaluator
    (stereo.cpp:44-52)."""
    return essential_geometric_error(E, p1, p2) + essential_geometric_error(E.T, p2, p1)


def decompose_essential(E):
    """E -> (R1, R2, T) via SVD with det sign fixes (essential.cpp:276-289).
    The four pose hypotheses are (R1, T), (R1, -T), (R2, T), (R2, -T)."""
    U, _, Vt = jnp.linalg.svd(E)
    U = jnp.where(jnp.linalg.det(U) < 0, -U, U)
    Vt = jnp.where(jnp.linalg.det(Vt) < 0, -Vt, Vt)
    W = jnp.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    T = U[:, 2]
    return R1, R2, T


def _epipolar_rows(x1, x2):
    """(N, 2) x2 -> rows a s.t. a . vec(E) = 0 with E row-major and
    x2^T E x1 = 0."""
    u, v = x1[..., 0], x1[..., 1]
    up, vp = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u)
    return jnp.stack(
        [up * u, up * v, up, vp * u, vp * v, vp, u, v, one], axis=-1
    )


def solve_essential_8pt(x1, x2):
    """Linear N >= 8 point solve + projection to the essential manifold.

    Fully batch/TPU-friendly; used for large inlier refits.
    """
    A = _epipolar_rows(x1, x2)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[:, 0].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E)
    sm = (s[0] + s[1]) * 0.5
    return U @ jnp.diag(jnp.stack([sm, sm, jnp.zeros_like(sm)])) @ Vt


# ----------------------------------------------------------------------------
# 5-point solver machinery
# ----------------------------------------------------------------------------

def _pmul(a, b):
    """Multiply trivariate coefficient tensors (truncated to degree 3)."""
    full = jax.scipy.signal.convolve(a, b, mode="full")
    return full[:4, :4, :4]


def _nullspace_basis(x1, x2):
    """(5, 2) x2 -> four 3x3 basis matrices X, Y, Z, W spanning the right
    nullspace of the epipolar system."""
    A = _epipolar_rows(x1, x2)  # (5, 9)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    basis = vecs[:, :4]  # 4 smallest eigenvectors
    return basis.T.reshape(4, 3, 3), basis  # (4, 3, 3), (9, 4)


# Nistér monomial ordering for the 10x20 system. First 10 are eliminated.
_MONOMIALS = (
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
)


def _constraints_matrix(XYZW):
    """Build the 10x20 coefficient matrix of the Gröbner constraints.

    Entry (i, j) = coefficient of monomial _MONOMIALS[j] in constraint i.
    Constraint 0 = det(E); 1..9 = 2 E E^T E - tr(E E^T) E (row-major).
    E(x, y, z) = x X + y Y + z Z + W.
    """
    dtype = XYZW.dtype
    # E entries as degree-1 coefficient tensors (2, 2, 2).
    Epoly = jnp.zeros((3, 3, 2, 2, 2), dtype)
    Epoly = Epoly.at[:, :, 1, 0, 0].set(XYZW[0])
    Epoly = Epoly.at[:, :, 0, 1, 0].set(XYZW[1])
    Epoly = Epoly.at[:, :, 0, 0, 1].set(XYZW[2])
    Epoly = Epoly.at[:, :, 0, 0, 0].set(XYZW[3])
    # Pad to (4, 4, 4) so all products share shapes.
    E = jnp.zeros((3, 3, 4, 4, 4), dtype).at[:, :, :2, :2, :2].set(Epoly)

    mul = _pmul

    def det3(M):
        a = mul(mul(M[1, 1], M[2, 2]) - mul(M[1, 2], M[2, 1]), M[0, 0])
        b = mul(mul(M[1, 0], M[2, 2]) - mul(M[1, 2], M[2, 0]), M[0, 1])
        c = mul(mul(M[1, 0], M[2, 1]) - mul(M[1, 1], M[2, 0]), M[0, 2])
        return a - b + c

    detE = det3(E)

    # M = E E^T (degree 2), C = 2 M E - tr(M) E (degree 3)
    M = jnp.zeros((3, 3, 4, 4, 4), dtype)
    for i in range(3):
        for j in range(3):
            acc = jnp.zeros((4, 4, 4), dtype)
            for k in range(3):
                acc = acc + mul(E[i, k], E[j, k])
            M = M.at[i, j].set(acc)
    trM = M[0, 0] + M[1, 1] + M[2, 2]
    C = jnp.zeros((3, 3, 4, 4, 4), dtype)
    for i in range(3):
        for j in range(3):
            acc = jnp.zeros((4, 4, 4), dtype)
            for k in range(3):
                acc = acc + mul(M[i, k], E[k, j])
            C = C.at[i, j].set(2.0 * acc - mul(trM, E[i, j]))

    polys = jnp.concatenate([detE[None], C.reshape(9, 4, 4, 4)], axis=0)
    idx = jnp.array(_MONOMIALS)
    return polys[:, idx[:, 0], idx[:, 1], idx[:, 2]]  # (10, 20)


def _gauss_jordan(A):
    """Reduce (10, 20) A so the left 10x10 block becomes identity, with
    partial pivoting. Fixed 10 steps — jit-friendly."""
    n = A.shape[0]

    def step(k, A):
        col = jnp.abs(A[:, k])
        rows = jnp.arange(n)
        col = jnp.where(rows >= k, col, -1.0)
        p = jnp.argmax(col)
        # swap rows k and p
        rk, rp = A[k], A[p]
        A = A.at[k].set(rp).at[p].set(rk)
        piv = A[k, k]
        piv = jnp.where(jnp.abs(piv) < 1e-18, 1e-18, piv)
        A = A.at[k].set(A[k] / piv)
        factors = A[:, k].at[k].set(0.0)
        A = A - factors[:, None] * A[k][None, :]
        return A

    return jax.lax.fori_loop(0, n, step, A)


def _poly_z_forms(B):
    """From the reduced right block B (10, 10) build the 3x3 polynomial
    matrix K(z): rows from monomial pairs (x^2 z, x^2), (y^2 z, y^2),
    (xyz, xy); K[k] = [p_k(z) (deg 3), q_k(z) (deg 3), r_k(z) (deg 4)],
    returned as coefficient arrays padded to length 5 (ascending powers)."""
    dtype = B.dtype

    def lin_form(row):
        # row . v with v = [xz^2, xz, x, yz^2, yz, y, z^3, z^2, z, 1]
        # -> x-coeff poly [c0 + c1 z + c2 z^2], etc. (ascending)
        px = jnp.stack([row[2], row[1], row[0]])
        py = jnp.stack([row[5], row[4], row[3]])
        pc = jnp.stack([row[9], row[8], row[7], row[6]])
        return px, py, pc

    def pad(p, n):
        return jnp.zeros(n, dtype).at[: p.shape[0]].set(p)

    def shift(p):  # multiply by z
        return jnp.concatenate([jnp.zeros(1, dtype), p])

    Ks = []
    for (rz, r1) in ((4, 5), (6, 7), (8, 9)):
        # relation: (B[r1] . v) z - (B[rz] . v) = 0
        pxz, pyz, pcz = lin_form(B[rz])
        px1, py1, pc1 = lin_form(B[r1])
        p = pad(shift(px1), 5) - pad(pxz, 5)
        q = pad(shift(py1), 5) - pad(pyz, 5)
        r = pad(shift(pc1), 5) - pad(pcz, 5)
        Ks.append(jnp.stack([p, q, r]))
    return jnp.stack(Ks)  # (3, 3, 5)


def _upoly_mul(a, b):
    return jnp.convolve(a, b)


def _det_poly(K):
    """det of the 3x3 matrix of univariate polynomials -> degree-10 coeffs
    (length 11, ascending). Entries are length-5 coeff vectors."""
    def m(a, b):
        return _upoly_mul(a, b)  # length 9

    # cofactor expansion along first row
    c00 = m(K[1, 1], K[2, 2]) - m(K[1, 2], K[2, 1])  # len 9
    c01 = m(K[1, 0], K[2, 2]) - m(K[1, 2], K[2, 0])
    c02 = m(K[1, 0], K[2, 1]) - m(K[1, 1], K[2, 0])
    det = (
        jnp.convolve(K[0, 0], c00)
        - jnp.convolve(K[0, 1], c01)
        + jnp.convolve(K[0, 2], c02)
    )  # len 13; degrees > 10 are structurally zero
    return det[:11]


def _real_roots_deg10(c):
    """Real roots of a degree-10 polynomial (coeffs ascending, length 11)
    with static shapes: substitute z = tan(theta) and scan
    g(theta) = sum_k c_k sin^k cos^(10-k) for sign changes, then bisect.

    Returns (roots (10,), mask (10,)).
    """
    dtype = c.dtype
    thetas = jnp.linspace(-jnp.pi / 2 + 1e-4, jnp.pi / 2 - 1e-4, _GRID, dtype=dtype)

    def g(theta):
        s, co = jnp.sin(theta), jnp.cos(theta)
        k = jnp.arange(11)
        return jnp.sum(c * s[..., None] ** k * co[..., None] ** (10 - k), axis=-1)

    vals = g(thetas)
    sign_change = jnp.sign(vals[:-1]) * jnp.sign(vals[1:]) < 0  # (_GRID-1,)
    idx = jnp.arange(_GRID - 1)
    order = jnp.argsort(jnp.where(sign_change, idx, _GRID))  # valid first
    take = order[:_MAX_ROOTS]
    mask = sign_change[take]
    lo = thetas[take]
    hi = thetas[take + 1]
    glo = g(lo)

    def bis(_, carry):
        lo, hi, glo = carry
        mid = 0.5 * (lo + hi)
        gm = g(mid)
        left = jnp.sign(glo) * jnp.sign(gm) < 0
        lo2 = jnp.where(left, lo, mid)
        hi2 = jnp.where(left, mid, hi)
        glo2 = jnp.where(left, glo, gm)
        return lo2, hi2, glo2

    lo, hi, _ = jax.lax.fori_loop(0, _BISECT_ITERS, bis, (lo, hi, glo))
    roots = jnp.tan(0.5 * (lo + hi))
    return roots, mask


def solve_essential_5pt(x1, x2):
    """Nistér 5-point solver: x1, x2 (5, 2) normalized correspondences
    (x2^T E x1 = 0). Returns (Es (10, 3, 3), mask (10,)).

    All-array, jittable, vmappable over RANSAC samples.
    """
    XYZW, _ = _nullspace_basis(x1, x2)
    A = _constraints_matrix(XYZW)
    A = _gauss_jordan(A)
    B = A[:, 10:]
    K = _poly_z_forms(B)
    n = _det_poly(K)
    # normalize coefficients for conditioning
    n = n / jnp.maximum(jnp.max(jnp.abs(n)), 1e-18)
    roots, mask = _real_roots_deg10(n)

    def solve_xy(z):
        # evaluate p, q, r at z; least-squares for (x, y)
        powers = z ** jnp.arange(5)
        Kz = jnp.einsum("ijc,c->ij", K, powers)  # (3, 3): [p q r]
        Apq = Kz[:, :2]
        b = -Kz[:, 2]
        AtA = Apq.T @ Apq + 1e-12 * jnp.eye(2, dtype=Kz.dtype)
        # closed-form 2x2 solve (LU-backed jnp.linalg.solve has no f64
        # TPU kernel and this is vmapped over the root candidates)
        rhs = Apq.T @ b
        det = AtA[0, 0] * AtA[1, 1] - AtA[0, 1] * AtA[1, 0]
        det = jnp.where(jnp.abs(det) < 1e-24, 1e-24, det)
        xy = jnp.stack([
            (AtA[1, 1] * rhs[0] - AtA[0, 1] * rhs[1]) / det,
            (AtA[0, 0] * rhs[1] - AtA[1, 0] * rhs[0]) / det,
        ])
        return xy

    xys = jax.vmap(solve_xy)(roots)  # (10, 2)
    coeffs = jnp.concatenate(
        [xys, roots[:, None], jnp.ones_like(roots[:, None])], axis=-1
    )  # (10, 4) for (x, y, z, 1)
    Es = jnp.einsum("rk,kij->rij", coeffs, XYZW)
    Es = Es / jnp.maximum(
        jnp.linalg.norm(Es.reshape(10, 9), axis=-1, keepdims=True), 1e-18
    ).reshape(10, 1, 1)
    return Es, mask
