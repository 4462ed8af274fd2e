"""Sliding-window state: fixed-capacity, masked, structure-of-arrays.

TPU-native re-design of the reference's pointer-graph map
(pvio/src/pvio/map/{map,frame,track}.{h,cpp}): `Map` holds a frame deque, a
recycled track pool and per-frame keypoint/track-pointer arrays; here the
whole window is one pytree of dense arrays with validity masks:

  * frames: per-slot (q, p, v, bg, ba) + mask — slot order IS time order
    (the reference keeps the deque sorted, map.cpp:39-59);
  * tracks: inverse depth in the *first observing frame*
    (track.h:36-44) + the index of that reference slot + masks/flags;
  * observations: a dense (F, T, 2) grid of K-normalized keypoints with an
    (F, T) mask — "pruning" is mask-clearing, "recycling" is reusing a
    dead column (SURVEY §7 translation table);
  * preintegration deltas between consecutive slots (delta[j] spans
    slot j-1 -> j), matching Frame::preintegration covering the interval
    since the previous frame;
  * planes: (P, 3) normals + distances + masks (map/plane.h:31-46).

The error-state tangent of a window is (F, 15) frame perturbations ordered
(theta, p, v, bg, ba) — estimation/state.h:29-36 — plus (T,) inverse-depth
perturbations. `retract` applies a tangent step with the same quaternion
boxplus the reference's QuaternionParameterization uses
(q * expmap(delta), quaternion_parameterization.h:33-37).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pvio_tpu.geometry import lie
from pvio_tpu.imu.preintegration import PreintDelta

ES_SIZE = 15

# Track flags (bitmask) — roles of the reference's TrackFlag enum.
TF_VALID = 1       # has a triangulated depth
TF_PLANE = 2       # associated with a plane (map/track.h flag TF_PLANE)


class Extrinsics(NamedTuple):
    """Body-center <-> sensor transforms (reference ExtrinsicParams,
    estimation/state.h:60-66): x_center = q_cs * x_sensor + p_cs."""

    q_bc: jnp.ndarray  # (4,) camera-to-body rotation
    p_bc: jnp.ndarray  # (3,)
    q_bi: jnp.ndarray  # (4,) imu-to-body rotation
    p_bi: jnp.ndarray  # (3,)

    @staticmethod
    def identity(dtype=jnp.float32):
        return Extrinsics(
            jnp.array([1.0, 0, 0, 0], dtype),
            jnp.zeros(3, dtype),
            jnp.array([1.0, 0, 0, 0], dtype),
            jnp.zeros(3, dtype),
        )


class MargPrior(NamedTuple):
    """Marginalization prior factor over all frame slots
    (marginalization_error_cost.h:30-106): r = sqrt_info @ dx + infovec,
    with dx the error-state difference from the capture linearization
    point. Fixed shape (F*15); rows/cols of dead slots are zero."""

    sqrt_info: jnp.ndarray  # (F*15, F*15)
    infovec: jnp.ndarray    # (F*15,)
    q0: jnp.ndarray         # (F, 4) linearization states
    p0: jnp.ndarray         # (F, 3)
    v0: jnp.ndarray
    bg0: jnp.ndarray
    ba0: jnp.ndarray
    valid: jnp.ndarray      # () bool — whether the prior exists at all


class WindowState(NamedTuple):
    # frames
    q: jnp.ndarray           # (F, 4)
    p: jnp.ndarray           # (F, 3)
    v: jnp.ndarray           # (F, 3)
    bg: jnp.ndarray          # (F, 3)
    ba: jnp.ndarray          # (F, 3)
    frame_mask: jnp.ndarray  # (F,) bool
    fix_mask: jnp.ndarray    # (F,) bool — pose gauge-fixed (FIX_POSE flag)
    # preintegration deltas: delta[j] spans frame j-1 -> j (delta[0] unused)
    delta: PreintDelta       # batched over F
    delta_valid: jnp.ndarray  # (F,) bool
    bg_lin: jnp.ndarray      # (F, 3) bias linearization point of delta[j] (frame j-1's bias)
    ba_lin: jnp.ndarray      # (F, 3)
    # tracks
    inv_depth: jnp.ndarray    # (T,)
    ref_frame: jnp.ndarray    # (T,) int32 index of first observing slot
    track_mask: jnp.ndarray   # (T,) bool — allocated
    track_flags: jnp.ndarray  # (T,) int32 bitmask (TF_*)
    quality: jnp.ndarray      # (T,) mean reprojection error (bundle_adjustor.cpp:277-296)
    plane_id: jnp.ndarray     # (T,) int32, -1 = none
    # observations
    kp: jnp.ndarray          # (F, T, 2) K-normalized keypoints
    obs_mask: jnp.ndarray    # (F, T) bool
    # planes
    plane_normal: jnp.ndarray    # (P, 3)
    plane_distance: jnp.ndarray  # (P,)
    plane_mask: jnp.ndarray      # (P,) bool
    # prior
    prior: MargPrior


def empty_delta(F, dtype):
    z3 = jnp.zeros((F, 3), dtype)
    z33 = jnp.zeros((F, 3, 3), dtype)
    return PreintDelta(
        t=jnp.zeros((F,), dtype),
        q=jnp.tile(jnp.array([[1.0, 0, 0, 0]], dtype), (F, 1)),
        p=z3,
        v=z3,
        cov=jnp.zeros((F, 15, 15), dtype),
        sqrt_inv_cov=jnp.zeros((F, 15, 15), dtype),
        dq_dbg=z33,
        dp_dbg=z33,
        dp_dba=z33,
        dv_dbg=z33,
        dv_dba=z33,
    )


def empty_prior(F, dtype):
    return MargPrior(
        sqrt_info=jnp.zeros((F * ES_SIZE, F * ES_SIZE), dtype),
        infovec=jnp.zeros(F * ES_SIZE, dtype),
        q0=jnp.tile(jnp.array([[1.0, 0, 0, 0]], dtype), (F, 1)),
        p0=jnp.zeros((F, 3), dtype),
        v0=jnp.zeros((F, 3), dtype),
        bg0=jnp.zeros((F, 3), dtype),
        ba0=jnp.zeros((F, 3), dtype),
        valid=jnp.asarray(False),
    )


def empty_window(F, T, P, dtype=jnp.float32):
    return WindowState(
        q=jnp.tile(jnp.array([[1.0, 0, 0, 0]], dtype), (F, 1)),
        p=jnp.zeros((F, 3), dtype),
        v=jnp.zeros((F, 3), dtype),
        bg=jnp.zeros((F, 3), dtype),
        ba=jnp.zeros((F, 3), dtype),
        frame_mask=jnp.zeros(F, bool),
        fix_mask=jnp.zeros(F, bool),
        delta=empty_delta(F, dtype),
        delta_valid=jnp.zeros(F, bool),
        bg_lin=jnp.zeros((F, 3), dtype),
        ba_lin=jnp.zeros((F, 3), dtype),
        inv_depth=jnp.ones(T, dtype),
        ref_frame=jnp.zeros(T, jnp.int32),
        track_mask=jnp.zeros(T, bool),
        track_flags=jnp.zeros(T, jnp.int32),
        quality=jnp.zeros(T, dtype),
        plane_id=-jnp.ones(T, jnp.int32),
        kp=jnp.zeros((F, T, 2), dtype),
        obs_mask=jnp.zeros((F, T), bool),
        plane_normal=jnp.zeros((P, 3), dtype).at[:, 2].set(1.0),
        plane_distance=jnp.zeros(P, dtype),
        plane_mask=jnp.zeros(P, bool),
        prior=empty_prior(F, dtype),
    )


def num_frames(w: WindowState) -> int:
    return w.q.shape[0]


def num_tracks(w: WindowState) -> int:
    return w.inv_depth.shape[0]


def retract(w: WindowState, d_frames, d_depth):
    """Apply a tangent step: d_frames (F, 15) ordered (theta, p, v, bg, ba),
    d_depth (T,). Quaternion update q <- normalize(q * expmap(theta))."""
    q = lie.quat_normalize(lie.quat_mul(w.q, lie.expmap(d_frames[:, 0:3])))
    return w._replace(
        q=q,
        p=w.p + d_frames[:, 3:6],
        v=w.v + d_frames[:, 6:9],
        bg=w.bg + d_frames[:, 9:12],
        ba=w.ba + d_frames[:, 12:15],
        inv_depth=w.inv_depth + d_depth,
    )


def retract_planes(w: WindowState, d_planes):
    """Apply a plane-parameter tangent step: d_planes (P, 3) = (2-dof
    normal update on the S^2 tangent basis, distance update). Used when
    the solver estimates plane parameters jointly (BAConfig.
    estimate_planes) — the reference holds them constant during BA
    (bundle_adjustor.cpp:120-124)."""
    Tg = jax.vmap(lie.s2_tangential_basis)(w.plane_normal)  # (P, 3, 2)
    n = w.plane_normal + jnp.einsum("pik,pk->pi", Tg, d_planes[:, :2])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return w._replace(
        plane_normal=n,
        plane_distance=w.plane_distance + d_planes[:, 2],
    )


def landmark_points(w: WindowState, extr: Extrinsics):
    """World-space landmark for every track (track.cpp:137-147):
    x_world = T_world_body(ref) * T_body_cam * ([z_ref, 1] / inv_depth).

    Returns (T, 3). Invalid tracks give garbage — mask with track_mask.
    """
    T = w.inv_depth.shape[0]
    z_ref = jnp.take_along_axis(w.kp, w.ref_frame[None, :, None], axis=0)[0]  # (T, 2)
    inv_d = jnp.where(jnp.abs(w.inv_depth) < 1e-12, 1e-12, w.inv_depth)
    y = jnp.concatenate([z_ref, jnp.ones((T, 1), w.kp.dtype)], axis=-1) / inv_d[:, None]
    y_body = lie.quat_rotate(extr.q_bc[None], y) + extr.p_bc[None]
    q_ref = w.q[w.ref_frame]
    p_ref = w.p[w.ref_frame]
    return lie.quat_rotate(q_ref, y_body) + p_ref


def frame_states_flat(w: WindowState):
    """(F, 16) stacked [q, p, v, bg, ba] for debugging / host transfer."""
    return jnp.concatenate([w.q, w.p, w.v, w.bg, w.ba], axis=-1)


def triangulate_tracks(w: WindowState, extr: Extrinsics):
    """Multi-view DLT for every track column from current window poses
    (Track::triangulate, track.cpp:61-106), vmapped over the T axis.

    Returns (pts (T, 3) world points, inv_d (T,) inverse depth in the
    reference frame, ok (T,) bool cheirality/depth gate)."""
    from pvio_tpu.geometry import triangulation

    q_ws = lie.quat_mul(w.q, jnp.broadcast_to(extr.q_bc, w.q.shape))
    p_ws = w.p + lie.quat_rotate(w.q, jnp.broadcast_to(extr.p_bc, w.p.shape))
    R_sw = lie.quat_to_mat(lie.quat_conj(q_ws))
    t_sw = -jnp.einsum("fij,fj->fi", R_sw, p_ws)
    Ps = jnp.concatenate([R_sw, t_sw[..., None]], axis=-1)  # (F, 3, 4)
    obs = w.obs_mask & w.frame_mask[:, None]

    def one(kps, m):
        pt, ok, score = triangulation.triangulate_scored(Ps, kps, m)
        return pt, ok & (jnp.sum(m) >= 2)

    pts, ok = jax.vmap(one, in_axes=(1, 1))(w.kp, obs)  # (T, 3)
    # inverse depth in the reference frame
    q_ref = q_ws[w.ref_frame]
    p_ref = p_ws[w.ref_frame]
    y = lie.quat_rotate(lie.quat_conj(q_ref), pts - p_ref)
    z = y[..., 2]
    ok = ok & (z > 1e-3) & (z < triangulation.MAX_DEPTH)
    inv_d = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    return pts, inv_d, ok


def triangulate_tracks_virtual(w: WindowState, extr: Extrinsics,
                               q_new, p_new, z_new, m_new):
    """Multi-view DLT like `triangulate_tracks`, but with one VIRTUAL
    extra frame appended (body pose q_new/p_new, normalized observations
    z_new (T, 2) masked by m_new) — the just-tracked frame before it is
    appended to the window. Lets the per-frame fused motion step return
    fresh-track depths in the same fetch as the PnP result (no separate
    triangulation sync). Returns (inv_d (T,), ok (T,))."""
    from pvio_tpu.geometry import triangulation

    q_all = jnp.concatenate([w.q, q_new[None]], axis=0)
    p_all = jnp.concatenate([w.p, p_new[None]], axis=0)
    q_ws = lie.quat_mul(q_all, jnp.broadcast_to(extr.q_bc, q_all.shape))
    p_ws = p_all + lie.quat_rotate(
        q_all, jnp.broadcast_to(extr.p_bc, p_all.shape))
    R_sw = lie.quat_to_mat(lie.quat_conj(q_ws))
    t_sw = -jnp.einsum("fij,fj->fi", R_sw, p_ws)
    Ps = jnp.concatenate([R_sw, t_sw[..., None]], axis=-1)  # (F+1, 3, 4)
    obs = jnp.concatenate(
        [w.obs_mask & w.frame_mask[:, None], m_new[None]], axis=0)
    kp = jnp.concatenate([w.kp, z_new[None]], axis=0)

    def one(kps, m):
        pt, ok, score = triangulation.triangulate_scored(Ps, kps, m)
        return pt, ok & (jnp.sum(m) >= 2)

    pts, ok = jax.vmap(one, in_axes=(1, 1))(kp, obs)  # (T, 3)
    # inverse depth in the (in-window) reference frame
    q_ref = q_ws[w.ref_frame]
    p_ref = p_ws[w.ref_frame]
    y = lie.quat_rotate(lie.quat_conj(q_ref), pts - p_ref)
    z = y[..., 2]
    ok = ok & (z > 1e-3) & (z < triangulation.MAX_DEPTH)
    inv_d = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    return inv_d, ok


def track_baselines(w: WindowState):
    """Per-track baseline: sum of body-position distances between
    consecutive observing frames (Track::compute_baseline,
    track.cpp:125-136). Slot order is time order, so "consecutive" is
    adjacent observing slots. Returns (T,)."""
    F, T = w.obs_mask.shape
    obs = w.obs_mask & w.frame_mask[:, None]
    idx = jnp.where(obs, jnp.arange(F, dtype=jnp.int32)[:, None], -1)
    prev_incl = jax.lax.cummax(idx, axis=0)                    # (F, T)
    prev = jnp.concatenate(
        [jnp.full((1, T), -1, jnp.int32), prev_incl[:-1]], axis=0
    )  # last observing slot strictly before f
    seg = obs & (prev >= 0)
    d = jnp.linalg.norm(
        w.p[:, None, :] - w.p[jnp.clip(prev, 0, F - 1)], axis=-1
    )  # (F, T)
    return jnp.sum(jnp.where(seg, d, 0.0), axis=0)
