"""Component-wise (struct-of-arrays) preintegration factor bank.

Why this exists: the straightforward array formulation of the analytic
preintegration Jacobians builds (K, 3, 3)/(K, 15, 15) tensors through
dozens of stack/concat/slice ops. On TPU each of those is a fusion
boundary, and with K = F-1 ~ 8 every intermediate is far below one
(8, 128) tile — measured ~0.5 ms per boundary on the target stack, making
the factor bank cost ~70 ms per 10-iteration BA solve (>90% of the entire
solver!). Representing every quaternion/vector/matrix as a *tuple of (K,)
arrays* keeps the whole chain elementwise: XLA fuses it into a handful of
kernels, with exactly three boundaries left (input slicing, one final
stack, one whitening contraction).

Numerics are identical to factors.preintegration_residual_and_jacobians
(validated against it in tests/test_analytic_jacobians.py).
"""

import jax.numpy as jnp

from pvio_tpu.imu.preintegration import GRAVITY_NOMINAL, PreintDelta
from pvio_tpu.map.window import Extrinsics

_EPS2 = 1e-12

# quaternions: (w, x, y, z) tuples; vectors: (x, y, z); matrices: row-major
# 9-tuples (m00..m22). All entries are (K,) arrays (or scalars that
# broadcast).


def _qmul(p, q):
    pw, px, py, pz = p
    qw, qx, qy, qz = q
    return (
        pw * qw - px * qx - py * qy - pz * qz,
        pw * qx + px * qw + py * qz - pz * qy,
        pw * qy - px * qz + py * qw + pz * qx,
        pw * qz + px * qy - py * qx + pz * qw,
    )


def _qconj(q):
    w, x, y, z = q
    return (w, -x, -y, -z)


def _qrot(q, v):
    w, x, y, z = q
    vx, vy, vz = v
    ux, uy, uz = (y * vz - z * vy, z * vx - x * vz, x * vy - y * vx)
    wx, wy, wz = (y * uz - z * uy, z * ux - x * uz, x * uy - y * ux)
    return (
        vx + 2.0 * (w * ux + wx),
        vy + 2.0 * (w * uy + wy),
        vz + 2.0 * (w * uz + wz),
    )


def _qmat(q):
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    )


def _mmul(A, B):
    a00, a01, a02, a10, a11, a12, a20, a21, a22 = A
    b00, b01, b02, b10, b11, b12, b20, b21, b22 = B
    return (
        a00 * b00 + a01 * b10 + a02 * b20,
        a00 * b01 + a01 * b11 + a02 * b21,
        a00 * b02 + a01 * b12 + a02 * b22,
        a10 * b00 + a11 * b10 + a12 * b20,
        a10 * b01 + a11 * b11 + a12 * b21,
        a10 * b02 + a11 * b12 + a12 * b22,
        a20 * b00 + a21 * b10 + a22 * b20,
        a20 * b01 + a21 * b11 + a22 * b21,
        a20 * b02 + a21 * b12 + a22 * b22,
    )


def _mt(A):
    a00, a01, a02, a10, a11, a12, a20, a21, a22 = A
    return (a00, a10, a20, a01, a11, a21, a02, a12, a22)


def _mneg(A):
    return tuple(-a for a in A)


def _mscale(s, A):
    return tuple(s * a for a in A)


def _mv(A, v):
    a00, a01, a02, a10, a11, a12, a20, a21, a22 = A
    x, y, z = v
    return (a00 * x + a01 * y + a02 * z,
            a10 * x + a11 * y + a12 * z,
            a20 * x + a21 * y + a22 * z)


def _hat(v):
    x, y, z = v
    zero = x * 0.0
    return (zero, -z, y, z, zero, -x, -y, x, zero)


def _expmap(v):
    x, y, z = v
    t2 = x * x + y * y + z * z
    small = t2 < _EPS2
    t = jnp.sqrt(jnp.where(small, 1.0, t2))
    s = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(0.5 * t) / t)
    c = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(0.5 * t))
    return (c, s * x, s * y, s * z)


def _logmap(q):
    w, x, y, z = q
    sgn = jnp.sign(jnp.where(w == 0, 1.0, w))
    w, x, y, z = w * sgn, x * sgn, y * sgn, z * sgn
    n2 = x * x + y * y + z * z
    small = n2 < _EPS2
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    angle = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), angle / n)
    return (scale * x, scale * y, scale * z)


def _right_jacobian_terms(v):
    x, y, z = v
    t2 = x * x + y * y + z * z
    small = t2 < _EPS2
    t2s = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2s)
    a = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    b = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / (t2s * t))
    return a, b


def _right_jacobian(v):
    a, b = _right_jacobian_terms(v)
    W = _hat(v)
    WW = _mmul(W, W)
    one = v[0] * 0.0 + 1.0
    I = (one, one * 0, one * 0, one * 0, one, one * 0, one * 0, one * 0, one)
    return tuple(I[k] - a * W[k] + b * WW[k] for k in range(9))


def _right_jacobian_inv(v):
    x, y, z = v
    t2 = x * x + y * y + z * z
    small = t2 < _EPS2
    t2s = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2s)
    sin_t = jnp.sin(t)
    sin_ts = jnp.where(jnp.abs(sin_t) < 1e-12, 1.0, sin_t)
    c = jnp.where(small, 1.0 / 12.0 + t2 / 720.0,
                  1.0 / t2s - (1.0 + jnp.cos(t)) / (2.0 * t * sin_ts))
    W = _hat(v)
    WW = _mmul(W, W)
    one = x * 0.0 + 1.0
    I = (one, one * 0, one * 0, one * 0, one, one * 0, one * 0, one * 0, one)
    return tuple(I[k] + 0.5 * W[k] + c * WW[k] for k in range(9))


def _cols3(M):
    """Extract a (K, 3, 3) array as a row-major component tuple."""
    return tuple(M[..., r, c] for r in range(3) for c in range(3))


def preint_factor_bank_soa(q, p, v, bg, ba, delta: PreintDelta, bg_lin, ba_lin,
                           extr: Extrinsics):
    """Residuals + Jacobians of all consecutive-frame preintegration
    factors, fully fused. Inputs as in window layout: q (F, 4),
    p/v/bg/ba (F, 3), delta batched over F (slot j spans j-1 -> j).

    Returns (r (F-1, 15), Ji (F-1, 15, 15), Jj (F-1, 15, 15)) — whitened.
    """
    F = q.shape[0]

    def qc(arr, s):  # component tuple from (F, 4)/(F, 3) slice
        return tuple(arr[s, k] for k in range(arr.shape[1]))

    qi_c = qc(q, slice(0, F - 1))
    qj_c = qc(q, slice(1, F))
    pi_c = qc(p, slice(0, F - 1))
    pj_c = qc(p, slice(1, F))
    vi_c = qc(v, slice(0, F - 1))
    vj_c = qc(v, slice(1, F))
    bgi_c = qc(bg, slice(0, F - 1))
    bgj_c = qc(bg, slice(1, F))
    bai_c = qc(ba, slice(0, F - 1))
    baj_c = qc(ba, slice(1, F))
    bgl_c = qc(bg_lin, slice(1, F))
    bal_c = qc(ba_lin, slice(1, F))

    dt = delta.t[1:]
    dq_c = tuple(delta.q[1:, k] for k in range(4))
    dp_c = tuple(delta.p[1:, k] for k in range(3))
    dv_c = tuple(delta.v[1:, k] for k in range(3))
    dqdbg = _cols3(delta.dq_dbg[1:])
    dpdbg = _cols3(delta.dp_dbg[1:])
    dpdba = _cols3(delta.dp_dba[1:])
    dvdbg = _cols3(delta.dv_dbg[1:])
    dvdba = _cols3(delta.dv_dba[1:])

    ex_qbi = tuple(extr.q_bi[k] for k in range(4))
    ex_pbi = tuple(extr.p_bi[k] for k in range(3))

    gz = -GRAVITY_NOMINAL
    zero = dt * 0.0
    g = (zero, zero, zero + gz)

    # sensor-frame states
    qi = _qmul(qi_c, ex_qbi)
    qj = _qmul(qj_c, ex_qbi)
    rot_pbi_i = _qrot(qi_c, ex_pbi)
    rot_pbi_j = _qrot(qj_c, ex_pbi)
    pi = tuple(pi_c[k] + rot_pbi_i[k] for k in range(3))
    pj = tuple(pj_c[k] + rot_pbi_j[k] for k in range(3))

    dbg = tuple(bgi_c[k] - bgl_c[k] for k in range(3))
    dba = tuple(bai_c[k] - bal_c[k] for k in range(3))

    dqdbg_dbg = _mv(dqdbg, dbg)
    corr = _expmap(dqdbg_dbg)
    dq_corr = _qmul(dq_c, corr)
    qi_conj = _qconj(qi)
    rq = _logmap(_qmul(_qconj(dq_corr), _qmul(qi_conj, qj)))

    dp_arg = tuple(pj[k] - pi[k] - dt * vi_c[k] - 0.5 * dt * dt * g[k]
                   for k in range(3))
    dv_arg = tuple(vj_c[k] - vi_c[k] - dt * g[k] for k in range(3))
    rp_rot = _qrot(qi_conj, dp_arg)
    rv_rot = _qrot(qi_conj, dv_arg)
    dpdbg_dbg = _mv(dpdbg, dbg)
    dpdba_dba = _mv(dpdba, dba)
    dvdbg_dbg = _mv(dvdbg, dbg)
    dvdba_dba = _mv(dvdba, dba)
    rp = tuple(rp_rot[k] - (dp_c[k] + dpdbg_dbg[k] + dpdba_dba[k]) for k in range(3))
    rv = tuple(rv_rot[k] - (dv_c[k] + dvdbg_dbg[k] + dvdba_dba[k]) for k in range(3))
    rbg = tuple(bgj_c[k] - bgi_c[k] for k in range(3))
    rba = tuple(baj_c[k] - bai_c[k] for k in range(3))
    r_comp = rq + rp + rv + rbg + rba  # 15 (K,) arrays

    # Jacobian blocks
    Jr_inv = _right_jacobian_inv(rq)
    R_qi_T = _qmat(qi_conj)
    R_qci = _qmat(qi_c)
    R_qj_T = _qmat(_qconj(qj))
    R_bi_T = _qmat(_qconj(ex_qbi))
    R_qcj = _qmat(qj_c)
    one = zero + 1.0
    I3 = (one, zero, zero, zero, one, zero, zero, zero, one)
    Z3 = (zero,) * 9

    b_q_ti = _mneg(_mmul(_mmul(Jr_inv, R_qj_T), R_qci))
    b_q_bgi = _mneg(_mmul(_mmul(_mmul(Jr_inv, _mt(_qmat(_expmap(rq)))),
                                _right_jacobian(dqdbg_dbg)), dqdbg))
    hp = _qrot(_qconj(qi_c), tuple(pj[k] - pi_c[k] - dt * vi_c[k]
                                   - 0.5 * dt * dt * g[k] for k in range(3)))
    b_p_ti = _mmul(R_bi_T, _hat(hp))
    hv = _qrot(_qconj(qi_c), dv_arg)
    b_v_ti = _mmul(R_bi_T, _hat(hv))
    nR_qi_T = _mneg(R_qi_T)
    b_p_vi = _mscale(-dt, R_qi_T)
    b_q_tj = _mmul(Jr_inv, R_bi_T)
    b_p_tj = _mneg(_mmul(_mmul(R_qi_T, R_qcj), _hat(ex_pbi)))
    nI3 = _mneg(I3)
    ndpdbg = _mneg(dpdbg)
    ndpdba = _mneg(dpdba)
    ndvdbg = _mneg(dvdbg)
    ndvdba = _mneg(dvdba)

    def rows(blockrow):
        """blockrow: list of 5 matrices (9-tuples) -> 3 rows of 15 comps."""
        out = []
        for r in range(3):
            row = []
            for B in blockrow:
                row.extend(B[3 * r : 3 * r + 3])
            out.append(row)
        return out

    Ji_rows = (
        rows([b_q_ti, Z3, Z3, b_q_bgi, Z3])
        + rows([b_p_ti, nR_qi_T, b_p_vi, ndpdbg, ndpdba])
        + rows([b_v_ti, Z3, nR_qi_T, ndvdbg, ndvdba])
        + rows([Z3, Z3, Z3, nI3, Z3])
        + rows([Z3, Z3, Z3, Z3, nI3])
    )
    Jj_rows = (
        rows([b_q_tj, Z3, Z3, Z3, Z3])
        + rows([b_p_tj, R_qi_T, Z3, Z3, Z3])
        + rows([Z3, Z3, R_qi_T, Z3, Z3])
        + rows([Z3, Z3, Z3, I3, Z3])
        + rows([Z3, Z3, Z3, Z3, I3])
    )

    # three boundaries total: the final stacks + the whitening einsums
    K = F - 1
    r_arr = jnp.stack(r_comp, axis=-1)                             # (K, 15)
    Ji_arr = jnp.stack([c for row in Ji_rows for c in row], axis=-1).reshape(K, 15, 15)
    Jj_arr = jnp.stack([c for row in Jj_rows for c in row], axis=-1).reshape(K, 15, 15)
    S = delta.sqrt_inv_cov[1:]
    # elementwise contraction (batched 15x15 dots pad to MXU tiles)
    r_w = jnp.sum(S * r_arr[:, None, :], axis=-1)
    Ji_w = jnp.sum(S[:, :, :, None] * Ji_arr[:, None, :, :], axis=-2)
    Jj_w = jnp.sum(S[:, :, :, None] * Jj_arr[:, None, :, :], axis=-2)
    return r_w, Ji_w, Jj_w
