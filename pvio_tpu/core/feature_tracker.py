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

from pvio_tpu.utils.forensics import bus as forensics


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

    @staticmethod
    def _np_quat_mul(a, b):
        w = a[0] * b[0] - a[1] * b[1] - a[2] * b[2] - a[3] * b[3]
        x = a[0] * b[1] + a[1] * b[0] + a[2] * b[3] - a[3] * b[2]
        y = a[0] * b[2] - a[1] * b[3] + a[2] * b[0] + a[3] * b[1]
        z = a[0] * b[3] + a[1] * b[2] - a[2] * b[1] + a[3] * b[0]
        return np.array([w, x, y, z])

    def _interframe_camera_rotation(self, imu_ts, imu_w, t_prev, t_new):
        """Integrate raw gyro over (t_prev, t_new] -> camera-frame dq
        (frame.cpp:97-103 uses the preintegrated dq through extrinsics).
        Pure numpy: ~10 samples of 4-vector math per frame must not cost
        device dispatches."""
        if len(imu_ts) == 0:
            return np.array([1.0, 0, 0, 0])
        q = np.array([1.0, 0, 0, 0])
        ts = np.concatenate([imu_ts, [t_new]])
        for i in range(len(imu_ts)):
            dt = max(ts[i + 1] - ts[i], 0.0)
            half = 0.5 * np.asarray(imu_w[i]) * dt
            n = np.linalg.norm(half)
            dq = (np.concatenate([[np.cos(n)], half * (np.sin(n) / n)])
                  if n > 1e-12 else np.array([1.0, half[0], half[1], half[2]]))
            q = self._np_quat_mul(q, dq)
        q /= np.linalg.norm(q)
        # body dq -> camera dq: q_cam = q_bc^-1 * q * q_bc
        qbc = np.asarray(self._q_bc)
        qbc_inv = qbc * np.array([1.0, -1, -1, -1])
        qc = self._np_quat_mul(self._np_quat_mul(qbc_inv, q), qbc)
        return qc / np.linalg.norm(qc)

    def track_frame(self, frame_id, t, img, imu_ts, imu_w, imu_a):
        """Process one camera frame; returns the new RawFrame."""
        cfg = self.cfg
        Kmax = cfg.feature_tracker_max_keypoint_detection

        if not self.frames:
            # fused preprocess + detect: one device dispatch
            pyr, kp, mask = self.k.first_frame_step(jnp.asarray(img))
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
            dq_cam = (self._interframe_camera_rotation(imu_ts, imu_w, prev.t, t)
                      if cfg.feature_tracker_predict_keypoints
                      else np.array([1.0, 0, 0, 0]))
            # fused preprocess + predicted flow + KLT + F-gate + detect:
            # one device dispatch per frame
            pyr, kp_new, status, det_kp, det_mask = self.k.frame_step(
                self.prev_pyramid, jnp.asarray(img), kp_prev, mask_prev,
                jnp.asarray(dq_cam, self.k.dtype), self._next_key(),
            )
            # ONE batched device->host fetch for everything the host
            # bookkeeping needs (per-array pulls each cost a round trip)
            kp_new_np, status_np, det_kp, det_mask = [
                np.array(a) for a in
                jax.device_get((kp_new, status, det_kp, det_mask))
            ]
            ids = np.where(status_np, prev.track_ids, -1)
            for tid in prev.track_ids[prev.kp_mask & ~status_np]:
                self.track_len.pop(int(tid), None)

            n_alive = int(status_np.sum())
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

        if forensics.enabled:
            # painter snapshot (forensics.h:30-38 ForensicsPainter role):
            # enough to draw tracked features + optical-flow segments on
            # the raw image without re-entering the pipeline
            prev_kp = (self.frames[-1].kp if self.frames else None)
            tracked = (status_np if self.frames else np.zeros(Kmax, bool))
            forensics.set("feature_tracker_painter", {
                "frame_id": frame_id, "t": t, "image": np.asarray(img),
                "kp": rf.kp.copy(), "mask": rf.kp_mask.copy(),
                "tracked": tracked.copy(),
                "prev_kp": (None if prev_kp is None else prev_kp.copy()),
            })
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
