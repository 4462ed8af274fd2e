"""Jitted device kernels for the VIO pipeline.

One `DeviceKernels` instance per PVIO engine: builds every jitted callable
once with the static shapes from Config (window capacity, track capacity,
image size, IMU buffer size), so the host state machine never triggers
recompilation. This replaces the reference's worker-thread boundaries
(utility/worker.h) with host-dispatched fused device programs.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pvio_tpu.estimation import ba as ba_mod
from pvio_tpu.estimation import marginalization as marg_mod
from pvio_tpu.estimation import pnp as pnp_mod
from pvio_tpu.frontend import detect as detect_mod
from pvio_tpu.frontend import image as image_mod
from pvio_tpu.frontend import klt as klt_mod
from pvio_tpu.frontend import ransac as ransac_mod
from pvio_tpu.geometry import camera, lie, triangulation
from pvio_tpu.imu import preintegration as pre
from pvio_tpu.map import window as win


_KERNEL_CACHE = {}


def _kernel_cache_key(config):
    """Canonical tuple of every config value baked into the jitted
    closures. Two Configs with equal keys can share one DeviceKernels
    (and therefore every compiled executable)."""

    def h(a):
        return np.asarray(a, np.float64).tobytes()

    return (
        config.dtype,
        bool(config.feature_tracker_clahe),
        int(config.feature_tracker_max_keypoint_detection),
        float(config.feature_tracker_min_keypoint_distance),
        bool(config.feature_tracker_predict_keypoints),
        int(config.solver_iteration_limit),
        bool(config.enable_plane_constraint),
        float(config.plane_distance_cov),
        int(config.plane_min_tracks),
        int(getattr(config, "plane_min_track_life", 10)),
        int(getattr(config, "plane_escape_min_life", 10)),
        float(getattr(config, "plane_escape_distance", 0.1)),
        float(getattr(config, "plane_sigma_gate_k", 3.0)),
        float(getattr(config, "plane_sigma_gate_floor", 0.005)),
        int(config.imu_buffer_capacity),
        float(config.kp_sqrt_inv_cov),
        float(getattr(config, "cauchy_scale", 1.0)),
        float(getattr(config, "feature_tracker_fb_threshold", 0.0)),
        bool(getattr(config, "plane_estimate_in_solver", True)),
        bool(getattr(config, "plane_supplement", False)),
        bool(getattr(config, "pnp_use_plane_points", True)),
        bool(getattr(config, "preint_assoc", True)),
        h(config.K), h(config.q_bc), h(config.p_bc),
        h(config.q_bi), h(config.p_bi),
        h(config.imu_cov_g), h(config.imu_cov_a),
        h(config.imu_cov_bg), h(config.imu_cov_ba),
    )


class DeviceKernels:
    """Per-engine bundle of jitted device programs.

    Prefer `DeviceKernels.get(config)`: engines created with an
    equivalent config (same baked constants — shapes are specialized per
    call by jit) share one instance, so resetting or re-creating a PVIO
    engine, or serving many sequences from one process, does not
    recompile anything. The cache assumes the config's kernel-relevant
    fields are not mutated after the first engine is built from it.
    """

    @classmethod
    def get(cls, config):
        key = _kernel_cache_key(config)
        inst = _KERNEL_CACHE.get(key)
        if inst is None:
            inst = cls(config)
            _KERNEL_CACHE[key] = inst
        return inst

    def __init__(self, config):
        self.cfg = config
        dtype = jnp.float32 if config.dtype == "float32" else jnp.float64
        self.dtype = dtype
        self.extr = win.Extrinsics(
            q_bc=jnp.asarray(config.q_bc, dtype),
            p_bc=jnp.asarray(config.p_bc, dtype),
            q_bi=jnp.asarray(config.q_bi, dtype),
            p_bi=jnp.asarray(config.p_bi, dtype),
        )
        self.K = jnp.asarray(config.K, dtype)
        self.noise = pre.ImuNoise(
            cov_w=jnp.asarray(config.imu_cov_g, dtype),
            cov_a=jnp.asarray(config.imu_cov_a, dtype),
            cov_bg=jnp.asarray(config.imu_cov_bg, dtype),
            cov_ba=jnp.asarray(config.imu_cov_ba, dtype),
        )
        self.ba_cfg = ba_mod.BAConfig(
            iterations=config.solver_iteration_limit,
            kp_sqrt_inv_cov=config.kp_sqrt_inv_cov,
            plane_sqrt_inv_cov=float(1.0 / np.sqrt(config.plane_distance_cov)),
            min_plane_tracks=config.plane_min_tracks,
            use_inertial=True,
            use_planes=config.enable_plane_constraint,
            estimate_planes=bool(getattr(config, "plane_estimate_in_solver", True)),
            plane_supplement=bool(getattr(config, "plane_supplement", False)),
            cauchy_scale=float(getattr(config, "cauchy_scale", 1.0)),
            fused_preint=(jax.default_backend() != "cpu"),
        )
        self.ba_cfg_vo = self.ba_cfg._replace(use_inertial=False, use_planes=False)
        self.pnp_cfg = pnp_mod.PnPConfig(
            iterations=config.solver_iteration_limit,
            kp_sqrt_inv_cov=config.kp_sqrt_inv_cov,
            use_inertial=True,
            cauchy_scale=float(getattr(config, "cauchy_scale", 1.0)),
        )
        self.pnp_cfg_vo = self.pnp_cfg._replace(use_inertial=False)

        self._build()

    # ------------------------------------------------------------------
    def _build(self):
        cfg = self.cfg
        dtype = self.dtype
        # associative (log-depth tree) preintegration is the TPU-fast
        # path; the sequential scan is the fallback for backends whose
        # compiler mishandles the tree's batched small dots (XLA CPU
        # 0.9.0 aborts in algebraic_simplifier when a third batch dim —
        # vmapped multi-sequence — is added; docs/xla_cpu_segfault.md)
        _assoc = bool(getattr(cfg, "preint_assoc", True))

        def _preintegrate(*args, **kw):
            kw.setdefault("assoc", _assoc)
            return pre.preintegrate(*args, **kw)
        extr = self.extr
        K = self.K
        # 3 pyramid images (full, /2, /4): the gyro-predicted initial
        # flow already absorbs the large inter-frame motion the /8 level
        # existed for, and every level costs the same (fixed-size
        # per-keypoint windows) — measured no accuracy change, -25% KLT
        levels = 2

        def preprocess(img):
            # accept 8-bit grayscale natively (the reference's Image ABC is
            # 8-bit, opencv_image.h) — shipping uint8 and normalizing
            # in-graph quarters the per-frame host->device transfer
            if img.dtype == jnp.uint8:
                img = img.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
            else:
                img = img.astype(dtype)
            img = image_mod.clahe(img) if cfg.feature_tracker_clahe else image_mod.normalize(img)
            return tuple(image_mod.build_pyramid(img, levels))

        self.preprocess = jax.jit(preprocess)

        fb_px = float(getattr(cfg, "feature_tracker_fb_threshold", 0.0))

        def track(pyr_prev, pyr_next, kp, guess, mask):
            return klt_mod.track_keypoints(
                list(pyr_prev), list(pyr_next), kp, guess, mask,
                border=20.0, fb_threshold=fb_px,
            )

        self.track = jax.jit(track)

        # (the axon serving backend reports its own platform name, so
        # test for the CPU fallback rather than for "tpu")
        use_pallas = jax.default_backend() != "cpu"

        def response_of(img0):
            if use_pallas:
                from pvio_tpu.ops.stencil import shi_tomasi_response_tpu

                return shi_tomasi_response_tpu(img0)
            return detect_mod.shi_tomasi_response(img0)

        def detect(img0, existing, existing_mask, response=None):
            return detect_mod.detect_keypoints(
                img0,
                max_keypoints=cfg.feature_tracker_max_keypoint_detection,
                min_distance=cfg.feature_tracker_min_keypoint_distance,
                existing_xy=existing,
                existing_mask=existing_mask,
                border=20,
                use_pallas_response=use_pallas,
                response=response,
            )

        self.detect = jax.jit(lambda img0, e, em: detect(img0, e, em))

        def fransac(key, kp1, kp2, mask):
            F, inl, count = ransac_mod.find_fundamental(key, kp1, kp2, mask, threshold=1.0)
            return inl, count

        self.fransac = jax.jit(fransac)

        def predict_kp_(kp, mask, dq_cam):
            z = camera.remove_k(kp, K)
            b = jnp.concatenate([z, jnp.ones_like(z[..., :1])], axis=-1)
            b2 = lie.quat_rotate(lie.quat_conj(dq_cam)[None, :], b)
            zs = jnp.where(jnp.abs(b2[..., 2:3]) < 1e-6, 1e-6, b2[..., 2:3])
            out = camera.apply_k(b2[..., :2] / zs, K)
            return jnp.where(mask[:, None], out, kp)

        def frame_step(pyr_prev, resp_prev, img_next, kp_prev, mask_prev,
                       dq_cam, key_data, with_detect=True):
            """Fused per-frame frontend: preprocess + gyro-predicted
            initial flow + pyramidal KLT + F-RANSAC gate + detection +
            detection merge, one device dispatch (the reference does all
            of this inside FeatureTracker::work, feature_tracker.cpp:
            37-141; splitting it into per-op dispatches wastes launch
            latency). `key_data` is a host-built (2,) uint32 — wrapping it
            in-graph keeps RNG off the host/device round-trip path.

            with_detect=False compiles the detection-free variant: when
            the keypoint budget is (nearly) full the Poisson-disk
            suppression against existing keypoints rejects essentially
            every candidate anyway (opencv_image.cpp:54-86), so the host
            skips the detection work entirely on those frames and calls
            this variant — same outputs, det_mask all-false.

            Returns (pyr_next, kp_merged, mask_merged, status, det_mask):
            kp_merged keeps tracked keypoints in place and fills free rows
            with fresh detections in ascending-row order — the host
            replays the same deterministic rule on track ids from
            (status, det_mask) alone, and feeds kp_merged/mask_merged
            straight back as next frame's device-resident input."""
            key = jax.random.wrap_key_data(key_data, impl="threefry2x32")
            pyr_next = preprocess(img_next)
            # one corner-response pass serves the KLT trackability gate
            # AND detection (the patch-sampling gate variant cost ~2.5 ms
            # of vmapped dynamic-slice gathers per frame)
            resp_next = response_of(pyr_next[0])
            if cfg.feature_tracker_predict_keypoints:
                guess = predict_kp_(kp_prev, mask_prev, dq_cam)
            else:
                guess = kp_prev
            kp_new, status = klt_mod.track_keypoints(
                list(pyr_prev), list(pyr_next), kp_prev, guess, mask_prev,
                border=20.0, fb_threshold=fb_px,
                resp_prev=resp_prev, resp_next=resp_next,
            )
            # fundamental-matrix outlier gate (opencv_image.cpp:121-129):
            # applied only when >=8 tracked survivors and >=8 inliers
            _, inl, count = ransac_mod.find_fundamental(
                key, kp_prev, kp_new, status, threshold=1.0
            )
            gate_on = (jnp.sum(status) >= 8) & (count >= 8)
            status = jnp.where(gate_on, status & inl, status)
            Kmax = kp_new.shape[0]
            if not with_detect:
                kp_merged = jnp.where(status[:, None], kp_new, 0.0)
                return (pyr_next, resp_next, kp_merged, status, status,
                        jnp.zeros(Kmax, bool))
            det_kp, det_mask = detect(pyr_next[0], kp_new, status,
                                      response=resp_next)
            # in-graph merge (mirrors the host id bookkeeping rule)
            n_fill = jnp.minimum(jnp.sum(det_mask), Kmax - jnp.sum(status))
            free_idx = jnp.nonzero(~status, size=Kmax, fill_value=Kmax)[0]
            det_idx = jnp.nonzero(det_mask, size=Kmax,
                                  fill_value=Kmax - 1)[0]
            take = jnp.arange(Kmax) < n_fill
            kp_merged = jnp.where(status[:, None], kp_new, 0.0)
            fill_rows = jnp.where(take, free_idx, Kmax)  # OOB rows drop
            kp_merged = kp_merged.at[fill_rows].set(
                det_kp[det_idx], mode="drop")
            mask_merged = status.at[fill_rows].set(True, mode="drop")
            return pyr_next, resp_next, kp_merged, mask_merged, status, det_mask

        self.frame_step = jax.jit(partial(frame_step, with_detect=True))
        self.frame_step_nodetect = jax.jit(
            partial(frame_step, with_detect=False))

        def first_frame_step(img):
            """Fused first-frame frontend: preprocess + detection."""
            pyr = preprocess(img)
            resp = response_of(pyr[0])
            det_kp, det_mask = detect(
                pyr[0], jnp.zeros((1, 2), dtype), jnp.zeros(1, bool),
                response=resp,
            )
            return pyr, resp, det_kp, det_mask

        self.first_frame_step = jax.jit(first_frame_step)

        # gyro-predicted initial flow (frame.cpp:97-103): rotate the
        # bearing by the inter-frame camera rotation
        self.predict_kp = jax.jit(predict_kp_)

        def remove_k(kp):
            return camera.remove_k(kp, K)

        self.remove_k = jax.jit(remove_k)

        def integrate_deltas(ts, ws, accs, mask, t_target, bg_prev, ba_prev):
            """Batched per-frame preintegration (F, N) -> deltas at slot j
            spanning frame j-1 -> j, linearized at frame j-1's bias."""
            return jax.vmap(
                lambda t_, w_, a_, m_, tt, bg, ba_: _preintegrate(
                    t_, w_, a_, m_, tt, bg, ba_, self.noise
                )
            )(ts, ws, accs, mask, t_target, bg_prev, ba_prev)

        self.integrate_deltas = jax.jit(integrate_deltas)

        def attach_deltas(w, ts, ws, accs, mask, t_frames):
            """Re-integrate every frame interval at the *previous* frame's
            current bias (bundle_adjustor.cpp:220-226) and attach the
            deltas to the window. Slot j's delta spans frame j-1 -> j."""
            bg_prev = jnp.concatenate([w.bg[:1], w.bg[:-1]], axis=0)
            ba_prev = jnp.concatenate([w.ba[:1], w.ba[:-1]], axis=0)
            deltas = integrate_deltas(ts, ws, accs, mask, t_frames, bg_prev, ba_prev)
            prev_mask = jnp.concatenate([jnp.zeros(1, bool), w.frame_mask[:-1]])
            valid = jnp.any(mask, axis=-1) & w.frame_mask & prev_mask
            return w._replace(
                delta=deltas, delta_valid=valid, bg_lin=bg_prev, ba_lin=ba_prev
            )

        self.attach_deltas = jax.jit(attach_deltas)

        def predict_state(delta_tree, q, p, v, bg, ba):
            return pre.predict(delta_tree, q, p, v, bg, ba)

        self.predict_state = jax.jit(predict_state)

        def pnp(q0, p0, v0, bg0, ba0, lq, lp, lv, lbg, lba, delta, bg_lin,
                ba_lin, x_world, z_obs, obs_mask, use_inertial):
            c = self.pnp_cfg if use_inertial else self.pnp_cfg_vo
            return pnp_mod.solve_pnp(
                q0, p0, v0, bg0, ba0, lq, lp, lv, lbg, lba,
                delta, bg_lin, ba_lin, x_world, z_obs, obs_mask, extr, c,
            )

        self.pnp_vi = jax.jit(partial(pnp, use_inertial=True))
        self.pnp_vo = jax.jit(partial(pnp, use_inertial=False))

        def solve_vi(w):
            w2, info = ba_mod.solve(w, extr, self.ba_cfg)
            w2 = ba_mod.post_solve_update(w2, extr, K)
            return w2, info

        self.ba_vi = jax.jit(solve_vi)

        def solve_vo(w):
            w2, info = ba_mod.solve(w, extr, self.ba_cfg_vo)
            w2 = ba_mod.post_solve_update(w2, extr, K)
            return w2, info

        self.ba_vo = jax.jit(solve_vo)

        def marginalize0(w):
            w = marg_mod.rebase_tracks(w, extr, removed_slot=0)
            return marg_mod.marginalize_and_remove(w, extr, self.ba_cfg, index=0)

        self.marginalize0 = jax.jit(marginalize0)

        def initial_prior(w):
            return marg_mod.make_initial_prior(w)

        self.initial_prior = jax.jit(initial_prior)

        def triangulate_tracks(w):
            """Multi-view DLT for every track column from current window
            poses (Track::triangulate, track.cpp:61-106). Returns
            (inv_depth (T,), ok (T,))."""
            _, inv_d, ok = win.triangulate_tracks(w, extr)
            return inv_d, ok

        self.triangulate_tracks = jax.jit(triangulate_tracks)

        def landmarks(w):
            return win.landmark_points(w, extr)

        self.landmarks = jax.jit(landmarks)

        def plane_points(w, x_world):
            """Replace plane-track landmarks with their best-plane
            ray-cast points (pnp.cpp:61-88). Device-side, vectorized."""
            from pvio_tpu.estimation.factors import plane_cast_point
            from pvio_tpu.map.window import TF_PLANE

            P = w.plane_mask.shape[0]
            pid = jnp.clip(w.plane_id, 0, P - 1)
            is_plane = ((w.track_flags & TF_PLANE) != 0) & (w.plane_id >= 0)
            q_ref = w.q[w.ref_frame]
            p_ref = w.p[w.ref_frame]
            q_wc = lie.quat_mul(q_ref, jnp.broadcast_to(extr.q_bc, q_ref.shape))
            o = p_ref + lie.quat_rotate(q_ref, jnp.broadcast_to(extr.p_bc, p_ref.shape))
            T = w.kp.shape[1]
            z_ref = jnp.take_along_axis(w.kp, w.ref_frame[None, :, None], axis=0)[0]
            bearing = lie.quat_rotate(
                q_wc, jnp.concatenate([z_ref, jnp.ones((T, 1), z_ref.dtype)], axis=-1)
            )
            n = w.plane_normal[pid]
            cast = plane_cast_point(n, w.plane_distance[pid], o, bearing)
            # is_parallel gate (plane.cpp:132-134, pnp.cpp:71): a
            # near-parallel ray casts to an arbitrarily distant point that
            # would poison PnP as a fixed landmark — keep the inverse-depth
            # landmark instead. Also require positive ray length
            # (cheirality of the cast point).
            denom = jnp.einsum("ti,ti->t", n, bearing)
            not_par = jnp.abs(denom) >= (
                jnp.linalg.norm(bearing, axis=-1)
                * jnp.asarray(np.sin(np.deg2rad(20.0)), denom.dtype))
            s_ray = jnp.einsum("ti,ti->t", cast - o, bearing)
            use_cast = is_plane & not_par & (s_ray > 0)
            return jnp.where(use_cast[:, None], cast, x_world)

        self.plane_points = jax.jit(plane_points)

        def pnp_step(w, tp, wp, ap, mp, t_new, tail_idx, z_obs, pnp_mask,
                     obs_new, kf_idx):
            """Fused per-frame motion step, ONE dispatch: preintegrate the
            tail->new IMU span at the tail's bias, forward-predict, form
            landmark points (plane tracks ray-cast onto their plane), run
            motion-only visual-inertial PnP
            (sliding_window_tracker.cpp:75-79 + pnp.cpp:32-100), then —
            riding the same fetch — triangulate fresh tracks with the new
            frame as a virtual extra view (track.cpp:61-106) and compute
            the rotation-compensated keyframe-decision statistic
            (80th-percentile parallax vs the last keyframe + common-track
            count, sliding_window_tracker.cpp:255-296). Packing these into
            the one PnP fetch removes two per-frame device syncs. Returns
            (q1, p1, v1, bg1, ba1, delta_q, inv_d, tri_ok, p80_px,
            n_common)."""
            tail_q = w.q[tail_idx]
            tail_p = w.p[tail_idx]
            tail_v = w.v[tail_idx]
            tail_bg = w.bg[tail_idx]
            tail_ba = w.ba[tail_idx]
            delta = _preintegrate(tp, wp, ap, mp, t_new, tail_bg, tail_ba,
                                     self.noise)
            q0, p0, v0, bg0, ba0 = pre.predict(
                delta, tail_q, tail_p, tail_v, tail_bg, tail_ba)
            x_world = win.landmark_points(w, extr)
            if cfg.enable_plane_constraint and bool(
                    getattr(cfg, "pnp_use_plane_points", True)):
                x_world = plane_points(w, x_world)
            q1, p1, v1, bg1, ba1 = pnp_mod.solve_pnp(
                q0, p0, v0, bg0, ba0, tail_q, tail_p, tail_v, tail_bg,
                tail_ba, delta, tail_bg, tail_ba, x_world, z_obs, pnp_mask,
                extr, self.pnp_cfg,
            )
            # fresh-track triangulation with the new frame as virtual view
            inv_d, tri_ok = win.triangulate_tracks_virtual(
                w, extr, q1, p1, z_obs, obs_new)
            # keyframe statistic: camera rotation tail->new via extrinsics
            # (qij = (q_bc^-1 q_bi dq q_bi^-1 q_bc)^-1), compensate the
            # last keyframe's bearings, 80th-percentile pixel parallax
            qm, qc = lie.quat_mul, lie.quat_conj
            qij = qc(qm(qm(qm(qc(extr.q_bc), extr.q_bi), delta.q),
                        qm(qc(extr.q_bi), extr.q_bc)))
            zi = w.kp[kf_idx]                       # (T, 2)
            ones = jnp.ones_like(zi[..., :1])
            b2 = lie.quat_rotate(qij[None, :],
                                 jnp.concatenate([zi, ones], axis=-1))
            zsafe = jnp.where(jnp.abs(b2[..., 2:3]) < 1e-6, 1e-6,
                              b2[..., 2:3])
            pi = b2[..., :2] / zsafe
            fx, fy = K[0, 0], K[1, 1]
            dpx = (pi - z_obs) * jnp.asarray([fx, fy], dtype)
            par = jnp.linalg.norm(dpx, axis=-1)
            common = (w.obs_mask[kf_idx] & w.frame_mask[kf_idx] & obs_new
                      & (jnp.abs(b2[..., 2]) >= 1e-6))
            n_common = jnp.sum(common)
            vals = jnp.sort(jnp.where(common, par, jnp.inf))
            idx = jnp.clip(n_common * 4 // 5, 0, par.shape[0] - 1)
            p80 = jnp.where(n_common > 0, vals[idx], jnp.inf)
            return (q1, p1, v1, bg1, ba1, delta.q, inv_d, tri_ok, p80,
                    n_common)

        self.pnp_step = jax.jit(pnp_step)

        def ba_step(w, ts, ws, accs, mask, t_frames, track_life, make_prior):
            """Fused keyframe solve, ONE dispatch: (optionally) create the
            initial marginalization prior, re-integrate every frame
            interval at current biases, run the full visual-inertial BA,
            apply the post-solve plane-track escape, and return the
            landmark cloud for forensics
            (sliding_window_tracker.cpp:90-113 + 138-245)."""
            if make_prior:
                w = w._replace(prior=marg_mod.make_initial_prior(w))
            w = attach_deltas(w, ts, ws, accs, mask, t_frames)
            w2, info = ba_mod.solve(w, extr, self.ba_cfg)
            if cfg.enable_plane_constraint:
                # bad plane adoptions escape back to free points
                # (bundle_adjustor.cpp:251-275)
                gate_k = float(getattr(cfg, "plane_sigma_gate_k", 3.0))
                sigma_px = float(np.sqrt(np.mean(np.diag(
                    np.asarray(cfg.camera_noise_cov)))))
                # host floats, NOT K (a closed-over device array would
                # trace here)
                fx, fy = (float(cfg.camera_intrinsic[0]),
                          float(cfg.camera_intrinsic[1]))
                f_px = 0.5 * (fx + fy)
                w2 = ba_mod.plane_track_escape(
                    w2, extr, track_life,
                    min_life=int(getattr(cfg, "plane_escape_min_life", 10)),
                    escape_dist=float(getattr(cfg, "plane_escape_distance", 0.1)),
                    kp_sigma_px=sigma_px if gate_k > 0 else None,
                    f_px=f_px if gate_k > 0 else None,
                    sigma_k=gate_k,
                    dist_floor=float(getattr(cfg, "plane_sigma_gate_floor",
                                             0.005)),
                )
            w2 = ba_mod.post_solve_update(w2, extr, K)
            # fresh post-solve geometry riding the same fetch: multi-view
            # triangulations + baselines feed the host plane refit
            # (Plane::update_parameter re-triangulates member tracks from
            # current poses, plane.cpp:64-76 — refitting from stale
            # landmark/cast points is self-reinforcing and jolts the
            # solver), landmark cloud feeds forensics
            tri_pts, tri_inv_d, tri_ok = win.triangulate_tracks(w2, extr)
            baseline = win.track_baselines(w2)
            return (w2, info, win.landmark_points(w2, extr),
                    (tri_pts, tri_inv_d, tri_ok, baseline))

        self.ba_step = jax.jit(ba_step, static_argnums=(7,))

        def marg_step(w, ts, ws, accs, mask, t_frames):
            """Fused marginalization, ONE dispatch: attach deltas, rebase
            track references off the victim frame, Schur-eliminate it into
            the prior, compact slots (map.cpp:76-88 +
            bundle_adjustor.cpp:348-599)."""
            w = attach_deltas(w, ts, ws, accs, mask, t_frames)
            return marginalize0(w)

        self.marg_step = jax.jit(marg_step)

        def kf_step(w, ts, ws, accs, mask, t_frames,
                    ts2, ws2, accs2, mask2, t_frames2,
                    nf_q, nf_p, nf_v, nf_bg, nf_ba,
                    nf_kp, nf_obs, tri_depth, tri_mask,
                    track_life, slot, make_prior, do_marg):
            """The WHOLE keyframe as ONE dispatch + ONE fetch
            (Config.fused_keyframe): marginalize the oldest frame,
            splice the new keyframe into the freed slot, adopt the fused
            motion-step triangulations, then the full ba_step body. The
            separate marg_step/ba_step path costs two device round trips
            per keyframe (~28 ms each on the tunnel) plus an
            intermediate host mirror; here the host replays its index
            bookkeeping while the device computes.

            (ts..t_frames): per-frame IMU grids in the PRE-marg slot
            layout (the marginalization factor needs the victim frame's
            delta); (ts2..t_frames2): grids in the POST-append layout
            for the BA. nf_*: the new frame's state (from the motion
            step) and observations. tri_depth/tri_mask: the
            _apply_triangulation adoption, guards host-computed."""
            if do_marg:
                w = attach_deltas(w, ts, ws, accs, mask, t_frames)
                w = marginalize0(w)
            # splice the new keyframe (Map::put_frame role)
            w = w._replace(
                q=w.q.at[slot].set(nf_q), p=w.p.at[slot].set(nf_p),
                v=w.v.at[slot].set(nf_v), bg=w.bg.at[slot].set(nf_bg),
                ba=w.ba.at[slot].set(nf_ba),
                frame_mask=w.frame_mask.at[slot].set(True),
                fix_mask=w.fix_mask.at[slot].set(False),
                kp=w.kp.at[slot].set(
                    jnp.where(nf_obs[:, None], nf_kp, w.kp[slot])),
                obs_mask=w.obs_mask.at[slot].set(nf_obs),
            )
            # fused-fetch triangulation adoption (the sequential path's
            # _apply_triangulation; guards already folded into tri_mask)
            w = w._replace(
                inv_depth=jnp.where(tri_mask, tri_depth, w.inv_depth),
                track_flags=jnp.where(tri_mask,
                                      w.track_flags | win.TF_VALID,
                                      w.track_flags),
            )
            return ba_step(w, ts2, ws2, accs2, mask2, t_frames2,
                           track_life, make_prior)

        self.kf_step = jax.jit(kf_step, static_argnums=(22, 23))

        def kf_step_chained(w, ts, ws, accs, mask, t_frames,
                            ts2, ws2, accs2, mask2, t_frames2,
                            nf_q, nf_p, nf_v, nf_bg, nf_ba,
                            nf_kp, nf_obs, tri_depth, tri_ok,
                            tri_mask_host, track_life, slot,
                            make_prior, do_marg):
            """kf_step chained directly on the motion step's DEVICE
            outputs (Config.chained_keyframe): nf_q..nf_ba and
            tri_depth/tri_ok are the pnp_step return arrays, never
            round-tripped through the host. The triangulation-adoption
            mask is completed in-graph (the host can compute every guard
            except tri_ok at dispatch time), everything else is
            kf_step verbatim — so results are bit-identical to the
            fetch-then-re-upload fused path while the host's only
            synchronization stays the ONE deferred combined fetch."""
            tri_mask = tri_mask_host & tri_ok.astype(bool)
            return kf_step(w, ts, ws, accs, mask, t_frames,
                           ts2, ws2, accs2, mask2, t_frames2,
                           nf_q, nf_p, nf_v, nf_bg, nf_ba,
                           nf_kp, nf_obs, tri_depth, tri_mask,
                           track_life, slot, make_prior, do_marg)

        self.kf_step_chained = jax.jit(kf_step_chained,
                                       static_argnums=(23, 24))

        # keyframe parallax gating is done on host with numpy (tiny math,
        # sliding_window_tracker.cpp:262-283)

    # ------------------------------------------------------------------
    def pad_imu_host(self, ts, ws, accs):
        """Pad raw IMU sample arrays to the static buffer size (numpy —
        callers batch the host->device transfer themselves)."""
        N = self.cfg.imu_buffer_capacity
        npdt = np.float32 if self.dtype == jnp.float32 else np.float64
        n = min(len(ts), N)
        tp = np.zeros(N, npdt)
        wp = np.zeros((N, 3), npdt)
        ap = np.zeros((N, 3), npdt)
        mp = np.zeros(N, bool)
        tp[:n] = ts[:n]
        wp[:n] = ws[:n]
        ap[:n] = accs[:n]
        mp[:n] = True
        return tp, wp, ap, mp

    def pad_imu(self, ts, ws, accs):
        """Pad raw IMU sample arrays to the static buffer size (one
        batched device transfer)."""
        return jax.device_put(self.pad_imu_host(ts, ws, accs))

    def integrate_one(self, ts, ws, accs, t_target, bg, ba):
        """Preintegrate a single interval (unbatched convenience)."""
        tp, wp, ap, mp = self.pad_imu(ts, ws, accs)
        return self._integrate_one(tp, wp, ap, mp,
                                   jnp.asarray(t_target, self.dtype),
                                   jnp.asarray(bg, self.dtype),
                                   jnp.asarray(ba, self.dtype))

    @property
    def _integrate_one(self):
        if not hasattr(self, "_integrate_one_jit"):
            self._integrate_one_jit = jax.jit(
                lambda t_, w_, a_, m_, tt, bg, ba_: _preintegrate(
                    t_, w_, a_, m_, tt, bg, ba_, self.noise
                )
            )
        return self._integrate_one_jit
