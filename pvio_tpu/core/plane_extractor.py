"""Multi-plane detection, extension and merging — the paper's structural
prior subsystem.

Re-design of reference PlaneExtractor (core/plane_extractor.{h,cpp}) and
Plane (map/plane.{h,cpp}) on the masked window arrays:

  * detect: vmapped 3-point RANSAC over well-constrained landmarks
    (VALID, enough baseline, life >= 10, quality < 2.0; inlier threshold
    0.03 m, >= 30 inliers) with PCA normal refinement
    (plane_extractor.cpp:40-81);
  * update_map: promote detections to plane slots + flag member tracks
    TF_PLANE (:83-104);
  * extend_planes: ray-cast each VALID track's reference bearing onto
    candidate planes; adopt when the reprojection error ratio < 1.2 or
    the absolute error < 0.5 px and the cast point lies near the plane's
    current extent (:112-161 — the SectorArea boundary test is realised
    as a distance-to-member-points gate);
  * merge: |n_i . n_j| > 0.95, |d_i - d_j| < 0.25, member overlap > 0.3
    (:163-182);
  * update_parameters: re-fit each plane from its member landmarks with
    RANSAC + PCA (plane.cpp:64-114).

The reference runs this in an async worker thread; here detection is a
jitted kernel invoked synchronously per keyframe (the deterministic
single-thread mode, PVIO_ENABLE_THREADING=OFF).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pvio_tpu.frontend import ransac as ransac_mod
from pvio_tpu.geometry import nplie
from pvio_tpu.map import sector_area as sa
from pvio_tpu.map.window import TF_PLANE, TF_VALID


def _refine_plane_pca_np(points, inlier_mask):
    """Host numpy mirror of ransac.refine_plane_pca
    (plane_extractor.cpp:63-76): normal = smallest-eigenvector of the
    inlier scatter. The result feeds host bookkeeping immediately, so
    computing it on device would cost a dispatch + fetch round trip per
    plane per keyframe. Returns (normal, distance, centroid)."""
    m = inlier_mask.astype(np.float64)[:, None]
    cnt = max(float(m.sum()), 1.0)
    pts = np.asarray(points, np.float64)
    c = (pts * m).sum(axis=0) / cnt
    d = (pts - c) * m
    cov = d.T @ d / cnt
    _, V = np.linalg.eigh(cov)
    n = V[:, 0]
    dist = float(n @ c)
    if dist < 0:
        n, dist = -n, -dist
    return n, dist, c


class PlaneExtractor:
    def __init__(self, config, kernels):
        self.cfg = config
        self.k = kernels
        self._key = jax.random.PRNGKey(config.random_seed + 1)
        self.next_plane_id = 0
        self.areas = {}  # plane slot -> SectorArea (utility/sector_area.h role)
        thr = float(getattr(config, "plane_ransac_threshold", 0.03))
        self.min_inliers = int(getattr(config, "plane_min_inliers", 30))
        self._find_plane = jax.jit(
            lambda key, pts, mask: ransac_mod.find_plane(key, pts, mask, threshold=thr)
        )
        self._pending = None  # in-flight async detection (issue_detection)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    def _landmarks(self, hw):
        """World-space landmark per track column — host numpy mirror of
        map.window.landmark_points (track.cpp:137-147). The plane
        bookkeeping calls this several times per keyframe; doing it on
        host costs microseconds where a device round trip costs ~10 ms
        on tunneled accelerators."""
        q_bc = np.asarray(self.cfg.q_bc)
        p_bc = np.asarray(self.cfg.p_bc)
        T = hw.T
        z_ref = np.take_along_axis(hw.kp, hw.ref_frame[None, :, None], axis=0)[0]
        inv_d = np.where(np.abs(hw.inv_depth) < 1e-12, 1e-12, hw.inv_depth)
        y = np.concatenate([z_ref, np.ones((T, 1), hw.kp.dtype)], axis=-1)
        y = y / inv_d[:, None]
        y_body = nplie.quat_rotate(np.broadcast_to(q_bc, (T, 4)), y) + p_bc
        q_ref = hw.q[hw.ref_frame]
        p_ref = hw.p[hw.ref_frame]
        return nplie.quat_rotate(q_ref, y_body) + p_ref

    def _camera_centers(self, hw):
        q_bc = np.asarray(self.cfg.q_bc)
        p_bc = np.asarray(self.cfg.p_bc)
        return hw.p + nplie.quat_rotate(hw.q, np.tile(p_bc, (hw.F, 1)))

    def _baseline(self, hw, pts):
        """Max camera-center separation over each track's observations
        (Track::compute_baseline, track.cpp:120-135)."""
        centers = self._camera_centers(hw)  # (F, 3)
        obs = hw.obs_mask & hw.frame_mask[:, None]
        first = np.argmax(obs, axis=0)
        rev = np.argmax(obs[::-1], axis=0)
        last = hw.F - 1 - rev
        return np.linalg.norm(centers[last] - centers[first], axis=-1)

    def _rpe(self, hw, col, point):
        """Mean pixel reprojection error of `point` over the track's
        observations (plane_extractor.cpp:184-198)."""
        K = self.cfg.K
        fx, fy = K[0, 0], K[1, 1]
        q_bc = np.asarray(self.cfg.q_bc)
        p_bc = np.asarray(self.cfg.p_bc)
        errs = []
        for f in np.nonzero(hw.obs_mask[:, col] & hw.frame_mask)[0]:
            q_wc = nplie.quat_mul(hw.q[f], q_bc)
            p_wc = hw.p[f] + nplie.quat_to_mat(hw.q[f]) @ p_bc
            y = nplie.quat_to_mat(q_wc).T @ (point - p_wc)
            if y[2] <= 1e-9:
                return np.inf
            z = hw.kp[f, col]
            errs.append(np.hypot((y[0] / y[2] - z[0]) * fx, (y[1] / y[2] - z[1]) * fy))
        return np.mean(errs) if errs else np.inf

    # ------------------------------------------------------------------
    def detect(self, hw):
        """RANSAC plane detection over well-constrained landmarks; returns
        a detection record or None (PlaneExtractor::work)."""
        pts = self._landmarks(hw)
        is_valid = (hw.track_flags & TF_VALID).astype(bool)
        is_plane = (hw.track_flags & TF_PLANE).astype(bool)
        baseline = self._baseline(hw, pts)
        good = (
            hw.track_mask & is_valid & ~is_plane
            & (hw.track_life >= 4) & (hw.quality < 2.0)
            & ((baseline > 0.5)
               | ((hw.inv_depth < 5.0) & (baseline * np.abs(hw.inv_depth) > 0.5)))
        )
        if good.sum() < self.min_inliers:
            return None
        pts_d, good_d = jax.device_put((pts.astype(self.k.dtype), good))
        inl, count = jax.device_get(
            self._find_plane(self._next_key(), pts_d, good_d)[2:])
        if int(count) <= self.min_inliers:
            return None
        inl = np.array(inl) & good
        n2, d2, cog = _refine_plane_pca_np(pts, inl)
        return {
            "normal": n2, "distance": d2,
            "reference_point": cog, "cols": np.nonzero(inl)[0],
        }

    def update_map(self, hw):
        """Detect and promote to a plane slot + flag member tracks
        (plane_extractor.cpp:83-104). Synchronous variant: one detection
        per keyframe."""
        rec = self.detect(hw)
        self._promote(hw, rec)

    def _promote(self, hw, rec):
        if rec is None:
            return
        free = np.nonzero(~hw.plane_mask)[0]
        if len(free) == 0:
            return
        slot = int(free[0])
        hw.plane_mask[slot] = True
        hw.plane_normal[slot] = rec["normal"]
        hw.plane_distance[slot] = rec["distance"]
        hw.plane_ids[slot] = self.next_plane_id
        self.next_plane_id += 1
        for c in rec["cols"]:
            hw.track_flags[c] |= TF_PLANE
            hw.plane_id[c] = slot
        # polar-sector extent of the new plane (update_sector_area role)
        basis = nplie.s2_tangential_basis(rec["normal"])
        pts = self._landmarks(hw)[rec["cols"]]
        self.areas[slot] = sa.insert(
            sa.SectorArea.empty(rec["reference_point"], basis), pts)

    # ------------------------------------------------------------------
    # asynchronous detection (the reference's PlaneExtractor is a worker:
    # issue_extraction schedules RANSAC off the tracking thread,
    # plane_extractor.cpp:106-110; update_map consumes the finished
    # record at a later keyframe). Here: the RANSAC dispatch is issued
    # fire-and-forget at keyframe k, its outputs ride the SOLVER's batched
    # device->host fetch, and the record is promoted at keyframe k+1 —
    # zero extra synchronization points.
    # ------------------------------------------------------------------
    def issue_detection(self, hw):
        """Host gating + device RANSAC dispatch, NO fetch. Returns device
        outputs to fold into the caller's batched fetch (or None)."""
        self._pending = None
        pts = self._landmarks(hw)
        is_valid = (hw.track_flags & TF_VALID).astype(bool)
        is_plane = (hw.track_flags & TF_PLANE).astype(bool)
        baseline = self._baseline(hw, pts)
        good = (
            hw.track_mask & is_valid & ~is_plane
            & (hw.track_life >= 4) & (hw.quality < 2.0)
            & ((baseline > 0.5)
               | ((hw.inv_depth < 5.0) & (baseline * np.abs(hw.inv_depth) > 0.5)))
        )
        if good.sum() < self.min_inliers:
            return None
        pts_d, good_d = jax.device_put((pts.astype(self.k.dtype), good))
        out = self._find_plane(self._next_key(), pts_d, good_d)[2:]
        self._pending = {"pts": pts, "good": good,
                         "track_id": hw.track_id.copy()}
        return out

    def store_pending_result(self, fetched):
        """Record the (inliers, count) fetched by the caller's batched
        device->host round trip."""
        if self._pending is not None and fetched is not None:
            inl, count = fetched
            self._pending["inl"] = np.array(inl)
            self._pending["count"] = int(count)

    def promote_pending(self, hw):
        """Promote the previous keyframe's detection (update_map role).
        Columns recycled to a different track since issue time are
        dropped (the reference's worker snapshot is protected by the map
        lock; here track-id matching provides the same guarantee)."""
        p, self._pending = getattr(self, "_pending", None), None
        if p is None or "inl" not in p or p["count"] <= self.min_inliers:
            return
        inl = (p["inl"] & p["good"] & hw.track_mask
               & (hw.track_id == p["track_id"])
               & ((hw.track_flags & TF_PLANE) == 0))
        if inl.sum() <= self.min_inliers:
            return
        n2, d2, cog = _refine_plane_pca_np(p["pts"], inl)
        self._promote(hw, {
            "normal": n2, "distance": d2,
            "reference_point": cog, "cols": np.nonzero(inl)[0],
        })

    # ------------------------------------------------------------------
    def extend_planes(self, hw, extend_rpe_ratio=1.2):
        """Adopt VALID tracks onto planes by ray-casting
        (plane_extractor.cpp:112-161)."""
        if not hw.plane_mask.any():
            return
        pts = self._landmarks(hw)
        q_bc = np.asarray(self.cfg.q_bc)
        p_bc = np.asarray(self.cfg.p_bc)
        member_pts = {
            s: pts[(hw.plane_id == s) & hw.track_mask]
            for s in np.nonzero(hw.plane_mask)[0]
        }
        for c in np.nonzero(hw.track_mask)[0]:
            if not (hw.track_flags[c] & TF_VALID):
                continue
            if hw.track_flags[c] & TF_PLANE:
                continue
            ref = hw.ref_frame[c]
            q_wc = nplie.quat_mul(hw.q[ref], q_bc)
            o = hw.p[ref] + nplie.quat_to_mat(hw.q[ref]) @ p_bc
            bearing = nplie.quat_to_mat(q_wc) @ np.concatenate([hw.kp[ref, c], [1.0]])
            rpe_before = self._rpe(hw, c, pts[c])
            best_rpe = np.inf
            best_point = None
            best_slot = -1
            adopted = False
            for s in np.nonzero(hw.plane_mask)[0]:
                nrm = hw.plane_normal[s]
                denom = np.dot(nrm, bearing)
                # is_parallel gate: ray within ~20 deg of the plane
                if abs(denom) / np.linalg.norm(bearing) < np.sin(np.deg2rad(20)):
                    continue
                s_len = (hw.plane_distance[s] - np.dot(nrm, o)) / denom
                plane_point = o + s_len * bearing
                y = nplie.quat_to_mat(q_wc).T @ (plane_point - o)
                if y[2] < 0:
                    continue
                rpe_after = self._rpe(hw, c, plane_point)
                if rpe_after < best_rpe:
                    best_rpe = rpe_after
                    best_point = plane_point
                    best_slot = s
                if rpe_after / max(rpe_before, 1e-12) < extend_rpe_ratio or rpe_after < 0.5:
                    # polar-sector near-boundary gate
                    # (plane_extractor.cpp:131-140, sector_area.h:57-118)
                    area = self.areas.get(s)
                    if area is None:
                        continue
                    if sa.is_near_boundary(area, plane_point, True, 1.2, 0.1):
                        adopted = True
            if adopted and best_slot >= 0:
                hw.track_flags[c] |= TF_PLANE
                hw.plane_id[c] = best_slot
                # move the landmark onto the best plane point
                self._set_landmark(hw, c, best_point)
                if best_slot in self.areas:
                    self.areas[best_slot] = sa.insert(
                        self.areas[best_slot], best_point[None])

    def _set_landmark(self, hw, col, point):
        """Re-express a world point as inverse depth in the reference
        frame (Track::set_landmark_point, track.cpp:137-147)."""
        ref = hw.ref_frame[col]
        q_bc = np.asarray(self.cfg.q_bc)
        p_bc = np.asarray(self.cfg.p_bc)
        q_wc = nplie.quat_mul(hw.q[ref], q_bc)
        o = hw.p[ref] + nplie.quat_to_mat(hw.q[ref]) @ p_bc
        y = nplie.quat_to_mat(q_wc).T @ (point - o)
        if y[2] > 1e-6:
            hw.inv_depth[col] = 1.0 / y[2]

    # ------------------------------------------------------------------
    def merge_planes(self, hw):
        """Merge near-coplanar overlapping planes
        (plane_extractor.cpp:163-182)."""
        slots = list(np.nonzero(hw.plane_mask)[0])
        changed = True
        while changed:
            changed = False
            slots = list(np.nonzero(hw.plane_mask)[0])
            for ii in range(len(slots)):
                for jj in range(ii + 1, len(slots)):
                    i, j = slots[ii], slots[jj]
                    if abs(np.dot(hw.plane_normal[i], hw.plane_normal[j])) < 0.95:
                        continue
                    if abs(hw.plane_distance[i] - hw.plane_distance[j]) > 0.25:
                        continue
                    mi = (hw.plane_id == i) & hw.track_mask
                    mj = (hw.plane_id == j) & hw.track_mask
                    pts = self._landmarks(hw)
                    if mi.sum() == 0 or mj.sum() == 0:
                        overlap = 1.0
                    else:
                        # overlap: fraction of j's members within i's extent
                        pi = pts[mi]
                        spread = np.median(np.linalg.norm(pi - pi.mean(0), axis=-1)) + 1e-6
                        dj = np.linalg.norm(
                            pts[mj][:, None, :] - pi[None, :, :], axis=-1
                        ).min(axis=1)
                        overlap = float((dj < 2.0 * spread).mean())
                    if overlap > 0.3:
                        hw.plane_id[mj] = i
                        hw.plane_mask[j] = False
                        if i in self.areas and j in self.areas:
                            self.areas[i] = sa.merge(self.areas[i],
                                                     self.areas.pop(j))
                        else:
                            self.areas.pop(j, None)
                        changed = True
                        break
                if changed:
                    break

    def update_parameters(self, hw):
        """Re-fit each plane from its member landmarks
        (Plane::update_parameter, plane.cpp:64-114)."""
        pts = self._landmarks(hw)
        for s in np.nonzero(hw.plane_mask)[0]:
            m = (hw.plane_id == s) & hw.track_mask
            if m.sum() < 3:
                continue
            if m.sum() >= 50:
                pts_d, m_d = jax.device_put((pts.astype(self.k.dtype), m))
                inl = np.array(jax.device_get(
                    self._find_plane(self._next_key(), pts_d, m_d)[2]))
                fit_mask = inl & m
                if fit_mask.sum() < 3:
                    fit_mask = m
            else:
                fit_mask = m
            n2, d2, cog = _refine_plane_pca_np(pts, fit_mask)
            hw.plane_normal[s] = n2
            hw.plane_distance[s] = d2
            # rebuild + centralize the sector extent
            # (plane->sector_area.centralize(), sliding_window_tracker.cpp:131)
            basis = nplie.s2_tangential_basis(n2)
            # built directly at the member centroid — already centralized
            self.areas[s] = sa.insert(
                sa.SectorArea.empty(np.array(cog), basis), pts[m])

    # ------------------------------------------------------------------
    def plane_track_points(self, w_dev, x_world):
        """For PnP: replace plane-track landmarks with their best-plane
        ray-cast points (pnp.cpp:61-88). Delegates to the shared jitted
        kernel (DeviceKernels.plane_points, also fused into pnp_step)."""
        return self.k.plane_points(w_dev, x_world)
