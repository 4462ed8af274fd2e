"""Feature tracker: per-frame KLT tracking + detection + raw track book.

Re-design of reference FeatureTracker (core/feature_tracker.{h,cpp}) and
the tracking half of Frame (frame.cpp:72-139): maintains a sliding raw
frame window (20 post-init / 60 pre-init frames, config.cpp:52-58) of
keypoint arrays + global track ids on the host, with all pixel work
(CLAHE, pyramids, LK, detection, F-RANSAC gate) in jitted device kernels.
Only the newest frame's pyramid is retained — older raw frames keep just
their keypoint/track-id arrays, which is all the initializer's mirroring
needs.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pvio_tpu.geometry import lie


@dataclass
class RawFrame:
    """Host record of one tracked frame (role of map/frame.h for the
    feature-tracking map)."""

    id: int
    t: float
    kp: np.ndarray          # (K, 2) pixel coords
    kp_mask: np.ndarray     # (K,)
    track_ids: np.ndarray   # (K,) int64, -1 = unassigned
    # IMU samples since the previous frame (exclusive) up to t (inclusive)
    imu_ts: np.ndarray = field(default_factory=lambda: np.zeros(0))
    imu_w: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))
    imu_a: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))


class FeatureTracker:
    def __init__(self, config, kernels, seed=None):
        self.cfg = config
        self.k = kernels
        self.frames: list[RawFrame] = []
        self.prev_pyramid = None
        self.next_track_id = 0
        self.track_len: dict[int, int] = {}
        self.initialized = False  # switches raw window length
        self._key = jax.random.PRNGKey(config.random_seed if seed is None else seed)
        # camera-frame rotation between consecutive frames, from raw gyro
        self._q_bc = np.asarray(config.q_bc)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _interframe_camera_rotation(self, imu_ts, imu_w, t_prev, t_new):
        """Integrate raw gyro over (t_prev, t_new] -> camera-frame dq
        (frame.cpp:97-103 uses the preintegrated dq through extrinsics)."""
        if len(imu_ts) == 0:
            return np.array([1.0, 0, 0, 0])
        q = np.array([1.0, 0, 0, 0])
        ts = np.concatenate([imu_ts, [t_new]])
        for i in range(len(imu_ts)):
            dt = max(ts[i + 1] - ts[i], 0.0)
            q = np.array(lie.quat_mul(jnp.asarray(q), lie.expmap(jnp.asarray(imu_w[i] * dt))))
        q /= np.linalg.norm(q)
        # body dq -> camera dq: q_cam = q_bc^-1 * q * q_bc
        qbc = jnp.asarray(self._q_bc)
        qc = lie.quat_mul(lie.quat_mul(lie.quat_conj(qbc), jnp.asarray(q)), qbc)
        return np.array(qc)

    def track_frame(self, frame_id, t, img, imu_ts, imu_w, imu_a):
        """Process one camera frame; returns the new RawFrame."""
        cfg = self.cfg
        Kmax = cfg.feature_tracker_max_keypoint_detection
        pyr = self.k.preprocess(jnp.asarray(img))

        if not self.frames:
            kp, mask = self.k.detect(pyr[0], jnp.zeros((1, 2), self.k.dtype),
                                     jnp.zeros(1, bool))
            kp = np.array(kp)
            mask = np.array(mask)
            ids = -np.ones(Kmax, np.int64)
            for i in np.nonzero(mask)[0]:
                ids[i] = self._new_track()
            rf = RawFrame(frame_id, t, kp, mask, ids,
                          np.asarray(imu_ts), np.asarray(imu_w), np.asarray(imu_a))
        else:
            prev = self.frames[-1]
            kp_prev = jnp.asarray(prev.kp, self.k.dtype)
            mask_prev = jnp.asarray(prev.kp_mask)
            if cfg.feature_tracker_predict_keypoints:
                dq_cam = self._interframe_camera_rotation(imu_ts, imu_w, prev.t, t)
                guess = self.k.predict_kp(kp_prev, mask_prev, jnp.asarray(dq_cam, self.k.dtype))
            else:
                guess = kp_prev
            kp_new, status = self.k.track(self.prev_pyramid, pyr, kp_prev, guess, mask_prev)
            status_np = np.array(status)
            kp_new_np = np.array(kp_new)
            # fundamental-matrix outlier gate (opencv_image.cpp:121-129)
            if status_np.sum() >= 8:
                inl, count = self.k.fransac(self._next_key(), kp_prev, kp_new, status)
                if int(count) >= 8:
                    status_np &= np.array(inl)
            ids = np.where(status_np, prev.track_ids, -1)
            for tid in prev.track_ids[prev.kp_mask & ~status_np]:
                self.track_len.pop(int(tid), None)

            # detect new keypoints away from surviving tracks
            n_alive = int(status_np.sum())
            det_kp, det_mask = self.k.detect(
                pyr[0], jnp.asarray(kp_new_np, self.k.dtype), jnp.asarray(status_np)
            )
            det_kp = np.array(det_kp)
            det_mask = np.array(det_mask)
            # merge: keep tracked in place, fill free rows with detections
            kp = np.where(status_np[:, None], kp_new_np, 0.0)
            mask = status_np.copy()
            free_rows = np.nonzero(~mask)[0]
            det_rows = np.nonzero(det_mask)[0]
            n_fill = min(len(free_rows), len(det_rows), Kmax - n_alive)
            for r, d in zip(free_rows[:n_fill], det_rows[:n_fill]):
                kp[r] = det_kp[d]
                mask[r] = True
                ids[r] = self._new_track()
            for tid in ids[mask]:
                self.track_len[int(tid)] = self.track_len.get(int(tid), 0) + 1
            rf = RawFrame(frame_id, t, kp, mask, ids,
                          np.asarray(imu_ts), np.asarray(imu_w), np.asarray(imu_a))

        self.frames.append(rf)
        self.prev_pyramid = pyr
        limit = (self.cfg.feature_tracker_max_frames if self.initialized
                 else self.cfg.feature_tracker_max_init_frames)
        while len(self.frames) > limit:
            dead = self.frames.pop(0)
        return rf

    def _new_track(self):
        tid = self.next_track_id
        self.next_track_id += 1
        self.track_len[tid] = 0
        return tid

    def frame_by_id(self, frame_id):
        for f in self.frames:
            if f.id == frame_id:
                return f
        return None

    def keypoints_of_track(self, tid):
        """(frame, kp_index) observations of a track in the raw window."""
        out = []
        for f in self.frames:
            idx = np.nonzero((f.track_ids == tid) & f.kp_mask)[0]
            if len(idx):
                out.append((f, int(idx[0])))
        return out
