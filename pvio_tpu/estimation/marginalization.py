"""Frame marginalization: dense Schur complement -> sqrt-info prior.

Re-design of reference BundleAdjustor::marginalize_frame
(bundle_adjustor.cpp:348-599) on the fixed-capacity window:

  1. accumulate the Gauss-Newton information (H, b) over all F*15 frame
     states from (a) the existing marginalization prior, (b) the
     preintegration factor(s) adjacent to the victim frame, (c) the
     *unrobustified* reprojection factors of every VALID non-plane track
     observed in the victim frame (all of their observations);
  2. Schur-eliminate each involved landmark (scalar, rank-1 each,
     bundle_adjustor.cpp:535-545);
  3. Schur-eliminate the victim frame's 15-dim block (:547-581);
  4. eigendecompose with eigenvalues clamped at 1e-8 and store the new
     prior as sqrt_info = sqrt(lambda) V^T, infovec =
     sqrt(lambda)^-1 V^T b (:583-598).

The victim slot is removed by shifting all window arrays down one slot;
the prior matrix rows/cols are shifted accordingly (its last 15 dims
become zero).
"""

import jax
import jax.numpy as jnp

from pvio_tpu.estimation import factors
from pvio_tpu.estimation.ba import (
    BAConfig,
    _gather_track_inputs,
    _marg_residual_t,
    _preint_residual_t,
    _repro_residual_t,
)
from pvio_tpu.geometry import lie
from pvio_tpu.map import window as win
from pvio_tpu.map.window import TF_PLANE, TF_VALID, Extrinsics, MargPrior, WindowState
from pvio_tpu.utils.autodiff import value_and_jacfwd


def _clamped_pinv(M, eps=1e-8):
    lam, V = jnp.linalg.eigh(M)
    lam_inv = jnp.where(lam > eps, 1.0 / jnp.where(lam > eps, lam, 1.0), 0.0)
    return (V * lam_inv[None, :]) @ V.T


def accumulate_information(w: WindowState, extr: Extrinsics, cfg: BAConfig, index: int):
    """Build (H (F15, F15), b (F15,)) of the factors the reference collects
    for marginalizing frame slot `index`, with landmarks already
    Schur-eliminated."""
    F, T = w.kp.shape[0], w.kp.shape[1]
    dtype = w.p.dtype
    H = jnp.zeros((F, 15, F, 15), dtype)
    b = jnp.zeros((F, 15), dtype)
    eyeF = jnp.eye(F, dtype=dtype)

    # (a) existing prior (analytic Jacobian)
    rm, Jm = factors.marginalization_residual_and_jacobian(
        w.q, w.p, w.v, w.bg, w.ba, w.prior
    )
    H = H + (Jm.T @ Jm).reshape(F, 15, F, 15)
    b = b + (Jm.T @ rm).reshape(F, 15)

    # (b) preintegration factors j in {index, index+1}
    include = jnp.zeros(F - 1, bool)
    if index + 1 < F:
        include = include.at[index].set(True)      # j=index+1 spans index -> index+1
    if index >= 1:
        include = include.at[index - 1].set(True)  # j=index spans index-1 -> index
    mask_pre = (w.frame_mask[:-1] & w.frame_mask[1:] & w.delta_valid[1:] & include).astype(dtype)
    delta_j = jax.tree.map(lambda a: a[1:], w.delta)

    rp, Ji, Jj = jax.vmap(
        lambda qi, pi, vi, bgi, bai, qj, pj, vj, bgj, baj, dd, bl, al:
        factors.preintegration_residual_and_jacobians(
            qi, pi, vi, bgi, bai, qj, pj, vj, bgj, baj, dd, bl, al, extr
        )
    )(
        w.q[:-1], w.p[:-1], w.v[:-1], w.bg[:-1], w.ba[:-1],
        w.q[1:], w.p[1:], w.v[1:], w.bg[1:], w.ba[1:],
        delta_j, w.bg_lin[1:], w.ba_lin[1:],
    )
    rp = rp * mask_pre[:, None]
    Ji = Ji * mask_pre[:, None, None]
    Jj = Jj * mask_pre[:, None, None]
    Jfull_pre = (
        Ji[:, :, None, :] * eyeF[:-1][:, None, :, None]
        + Jj[:, :, None, :] * eyeF[1:][:, None, :, None]
    )
    A_pre = Jfull_pre.reshape((F - 1) * 15, F * 15)
    H = H + (A_pre.T @ A_pre).reshape(F, 15, F, 15)
    b = b + (A_pre.T @ rp.reshape(-1)).reshape(F, 15)

    # (c) reprojection factors of victim-frame tracks (unrobustified)
    is_valid = (w.track_flags & TF_VALID) != 0
    is_plane = (w.track_flags & TF_PLANE) != 0
    marg_track = w.obs_mask[index] & w.track_mask & is_valid & ~is_plane
    ref_ok = w.frame_mask[w.ref_frame]
    marg_track = marg_track & ref_ok
    not_ref = jnp.arange(F)[:, None] != w.ref_frame[None, :]
    m_obs = (w.obs_mask & w.frame_mask[:, None] & marg_track[None, :] & not_ref).astype(dtype)

    q_ref, p_ref, z_ref = _gather_track_inputs(w)
    sic = jnp.asarray(cfg.kp_sqrt_inv_cov, dtype)

    def one_obs(q_t, p_t, z_t, q_r, p_r, z_r, d):
        f = lambda dd: _repro_residual_t(dd, q_t, p_t, q_r, p_r, d, z_r, z_t, extr, sic)
        return value_and_jacfwd(f, jnp.zeros(13, dtype))

    r, J = jax.vmap(
        jax.vmap(one_obs, in_axes=(None, None, 0, 0, 0, 0, 0)),
        in_axes=(0, 0, 0, None, None, None, None),
    )(w.q, w.p, w.kp, q_ref, p_ref, z_ref, w.inv_depth)
    r = r * m_obs[..., None]
    J = J * m_obs[..., None, None]
    J_tgt = J[..., 0:6]
    J_ref = J[..., 6:12]
    J_d = J[..., 12]
    onehot_ref = eyeF[w.ref_frame]
    Jfull = jnp.einsum("ftai,fg->ftagi", J_tgt, eyeF) + jnp.einsum(
        "ftai,tg->ftagi", J_ref, onehot_ref
    )  # (F, T, 2, F, 6)
    Hpose = jnp.einsum("ftagi,ftahj->gihj", Jfull, Jfull)
    H = H.at[:, 0:6, :, 0:6].add(Hpose)
    b = b.at[:, 0:6].add(jnp.einsum("ftagi,fta->gi", Jfull, r))

    # landmark Schur elimination (rank-1 per track)
    Hdd = jnp.einsum("fta,fta->t", J_d, J_d)
    bd = jnp.einsum("fta,fta->t", J_d, r)
    h = jnp.einsum("ftagi,fta->tgi", Jfull, J_d)  # (T, F, 6)
    Hdd_inv = jnp.where(Hdd > 1e-12, 1.0 / jnp.where(Hdd > 1e-12, Hdd, 1.0), 0.0)
    H = H.at[:, 0:6, :, 0:6].add(-jnp.einsum("tgi,t,thj->gihj", h, Hdd_inv, h))
    b = b.at[:, 0:6].add(-jnp.einsum("tgi,t->gi", h, Hdd_inv * bd))

    return H.reshape(F * 15, F * 15), b.reshape(F * 15)


def make_initial_prior(w: WindowState, sqrt_info_value=3.0e3, index: int = 0,
                       yaw_only: bool = True) -> MargPrior:
    """Gauge-anchoring prior on frame `index`'s pose, created when the
    sliding-window tracker takes over from the initializer
    (sliding_window_tracker.cpp:90-113: 1e15 information on the first
    pose). Two deliberate departures from the reference:

      * magnitude: 1e15 information is float64-only; sqrt_info 3e3
        (information ~1e7) holds the gauge to sub-0.1 mm while keeping
        the reduced camera system well-conditioned in float32;
      * rank (yaw_only=True): a VIO window's true gauge freedoms are
        position + yaw only — gravity makes roll/pitch observable. The
        reference anchors all 6 pose dofs, freezing any initializer
        roll/pitch error into the world frame forever; we anchor position
        and the yaw tangent direction (a = R_wb^T e_z in the body-frame
        tangent) so subsequent BAs can rotate the window onto the true
        gravity direction.
    """
    F = w.q.shape[0]
    dtype = w.p.dtype
    s = jnp.asarray(sqrt_info_value, dtype)
    M = jnp.zeros((F * 15, F * 15), dtype)
    sl = index * 15
    if yaw_only:
        a = lie.quat_rotate(lie.quat_conj(w.q[index]),
                            jnp.array([0.0, 0.0, 1.0], dtype))
        a = a / jnp.maximum(jnp.linalg.norm(a), 1e-12)
        M = M.at[sl : sl + 3, sl : sl + 3].set(s * jnp.outer(a, a))
    else:
        M = M.at[sl : sl + 3, sl : sl + 3].set(s * jnp.eye(3, dtype=dtype))
    M = M.at[sl + 3 : sl + 6, sl + 3 : sl + 6].set(s * jnp.eye(3, dtype=dtype))
    return MargPrior(
        sqrt_info=M,
        infovec=jnp.zeros(F * 15, dtype),
        q0=w.q, p0=w.p, v0=w.v, bg0=w.bg, ba0=w.ba,
        valid=jnp.asarray(True),
    )


def _shift_out(arr, index):
    """Remove slot `index` along axis 0, pad a zeroed slot at the end."""
    pad = jnp.zeros_like(arr[:1])
    return jnp.concatenate([arr[:index], arr[index + 1 :], pad], axis=0)


def marginalize_and_remove(
    w: WindowState, extr: Extrinsics, cfg: BAConfig, index: int = 0
) -> WindowState:
    """Marginalize frame slot `index` into the prior and compact the
    window (map.cpp:76-88 -> bundle_adjustor.cpp:348-599). `index` must be
    a static Python int. Track bookkeeping for observations referencing
    the removed frame is the caller's job (inverse-depth re-basing,
    track.cpp:39-59 — see `rebase_tracks`)."""
    F, T = w.kp.shape[0], w.kp.shape[1]
    dtype = w.p.dtype
    H, b = accumulate_information(w, extr, cfg, index)

    # Schur-eliminate the victim block
    sl = slice(index * 15, (index + 1) * 15)
    Hkk_inv = _clamped_pinv(H[sl, sl])
    Hk = H[:, sl]  # (F15, 15)
    H2 = H - Hk @ Hkk_inv @ Hk.T
    b2 = b - Hk @ (Hkk_inv @ b[sl])
    # zero victim rows/cols, then shift rows/cols down
    keep = jnp.ones(F * 15, bool).at[sl].set(False)
    H2 = H2 * keep[:, None] * keep[None, :]
    b2 = b2 * keep
    H3 = H2.reshape(F, 15, F, 15)
    H3 = _shift_out(_shift_out(H3, index).transpose(2, 3, 0, 1), index).transpose(2, 3, 0, 1)
    b3 = _shift_out(b2.reshape(F, 15), index)

    # sqrt-info factorization with clamped eigenvalues
    lam, V = jnp.linalg.eigh(H3.reshape(F * 15, F * 15))
    ok = lam > 1e-8
    lam_c = jnp.where(ok, lam, 0.0)
    lam_inv = jnp.where(ok, 1.0 / jnp.where(ok, lam, 1.0), 0.0)
    sqrt_info = jnp.sqrt(lam_c)[:, None] * V.T
    infovec = jnp.sqrt(lam_inv)[:, None] * V.T @ b3.reshape(-1)

    # shift window arrays
    new_q = _shift_out(w.q, index)
    new_q = new_q.at[-1].set(jnp.array([1.0, 0, 0, 0], dtype))
    shifted = w._replace(
        q=new_q,
        p=_shift_out(w.p, index),
        v=_shift_out(w.v, index),
        bg=_shift_out(w.bg, index),
        ba=_shift_out(w.ba, index),
        frame_mask=_shift_out(w.frame_mask, index),
        fix_mask=_shift_out(w.fix_mask, index),
        delta=jax.tree.map(lambda a: _shift_out(a, index), w.delta),
        delta_valid=_shift_out(w.delta_valid, index),
        bg_lin=_shift_out(w.bg_lin, index),
        ba_lin=_shift_out(w.ba_lin, index),
        kp=_shift_out(w.kp, index),
        obs_mask=_shift_out(w.obs_mask, index),
        ref_frame=jnp.where(
            w.ref_frame > index, w.ref_frame - 1, jnp.where(w.ref_frame == index, 0, w.ref_frame)
        ),
        prior=MargPrior(
            sqrt_info=sqrt_info,
            infovec=infovec,
            q0=_shift_out(w.q, index),
            p0=_shift_out(w.p, index),
            v0=_shift_out(w.v, index),
            bg0=_shift_out(w.bg, index),
            ba0=_shift_out(w.ba, index),
            valid=jnp.asarray(True),
        ),
    )
    # note: the preintegration delta that spanned (index-1 -> index) and
    # (index -> index+1) must be merged by the caller before marginalizing
    # if the downstream factor should span the gap; the reference instead
    # re-integrates deltas from raw IMU before each BA solve, which we
    # mirror in the pipeline.
    return shifted


def rebase_tracks(w: WindowState, extr: Extrinsics, removed_slot: int = 0):
    """Before removing `removed_slot`, re-base tracks whose reference frame
    is that slot onto their next observation (track.cpp:39-59): the
    inverse depth is transported so the landmark's world position is
    unchanged.

    Returns a window whose ref_frame != removed_slot for all tracks that
    have another observation (tracks without one are invalidated).
    """
    F, T = w.kp.shape[0], w.kp.shape[1]
    dtype = w.p.dtype
    needs = (w.ref_frame == removed_slot) & w.track_mask
    # next observation slot (first f != removed with obs)
    obs = w.obs_mask & w.frame_mask[:, None]
    obs_not_removed = obs.at[removed_slot].set(False)
    has_next = jnp.any(obs_not_removed, axis=0)
    next_slot = jnp.argmax(obs_not_removed, axis=0).astype(jnp.int32)

    # world landmark from current reference
    x = win.landmark_points(w, extr)  # (T, 3)
    # depth in the new reference camera
    q_new = w.q[next_slot]
    p_new = w.p[next_slot]
    q_ws = lie.quat_mul(q_new, jnp.broadcast_to(extr.q_bc, q_new.shape))
    p_ws = p_new + lie.quat_rotate(q_new, jnp.broadcast_to(extr.p_bc, p_new.shape))
    y = lie.quat_rotate(lie.quat_conj(q_ws), x - p_ws)
    z = y[..., 2]
    new_inv_depth = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)

    apply = needs & has_next
    drop = needs & ~has_next
    return w._replace(
        ref_frame=jnp.where(apply, next_slot, w.ref_frame),
        inv_depth=jnp.where(apply, new_inv_depth, w.inv_depth),
        track_flags=jnp.where(drop, w.track_flags & ~(TF_VALID | TF_PLANE), w.track_flags),
        track_mask=w.track_mask & ~drop,
    )
