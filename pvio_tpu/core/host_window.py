"""Host-side mutable mirror of the solver window.

The reference mutates a pointer-graph Map under a mutex
(map/map.{h,cpp}); here the host keeps a numpy mirror of the fixed-shape
WindowState plus the track-id <-> column bookkeeping (the role of the
track pool's swap-recycling and id map, map.cpp:109-184), and ships it to
the device only around jitted solver calls. Column allocation is a
free-list; "erasing" a track clears its column mask.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pvio_tpu.map import window as win
from pvio_tpu.map.window import TF_PLANE, TF_VALID


class HostWindow:
    def __init__(self, F_cap, T_cap, P_cap, dtype=np.float32):
        self.F = F_cap
        self.T = T_cap
        self.P = P_cap
        self.dtype = dtype
        self.q = np.tile([1.0, 0, 0, 0], (F_cap, 1)).astype(dtype)
        self.p = np.zeros((F_cap, 3), dtype)
        self.v = np.zeros((F_cap, 3), dtype)
        self.bg = np.zeros((F_cap, 3), dtype)
        self.ba = np.zeros((F_cap, 3), dtype)
        self.frame_mask = np.zeros(F_cap, bool)
        self.fix_mask = np.zeros(F_cap, bool)
        self.keyframe = np.zeros(F_cap, bool)   # FF_KEYFRAME flags (host-only)
        self.frame_id = -np.ones(F_cap, np.int64)
        self.frame_t = np.zeros(F_cap, np.float64)
        # per-frame IMU sample buffers (for re-integration at current bias)
        self.imu_ts = [None] * F_cap   # each: (n,) float64
        self.imu_w = [None] * F_cap
        self.imu_a = [None] * F_cap
        self.inv_depth = np.ones(T_cap, dtype)
        self.ref_frame = np.zeros(T_cap, np.int32)
        self.track_mask = np.zeros(T_cap, bool)
        self.track_flags = np.zeros(T_cap, np.int32)
        self.quality = np.zeros(T_cap, dtype)
        self.plane_id = -np.ones(T_cap, np.int32)
        self.track_id = -np.ones(T_cap, np.int64)   # global track id per column
        self.track_life = np.zeros(T_cap, np.int32)  # observation count (Track::life)
        self.kp = np.zeros((F_cap, T_cap, 2), dtype)
        self.obs_mask = np.zeros((F_cap, T_cap), bool)
        self.plane_normal = np.zeros((P_cap, 3), dtype)
        self.plane_normal[:, 2] = 1.0
        self.plane_distance = np.zeros(P_cap, dtype)
        self.plane_mask = np.zeros(P_cap, bool)
        self.plane_ids = -np.ones(P_cap, np.int64)   # global plane ids
        self._col_of_track = {}
        # prior (kept as jnp via last device round-trip; start empty)
        self.prior = win.empty_prior(F_cap, jnp.dtype(dtype).name)
        # host mirror of prior.valid (avoids a device fetch per keyframe)
        self.prior_valid = False

    # ------------------------------------------------------------------
    # frame slots
    # ------------------------------------------------------------------
    @property
    def n_frames(self):
        return int(self.frame_mask.sum())

    def append_frame(self, frame_id, t, q, p, v, bg, ba, imu_ts, imu_w, imu_a,
                     keyframe=False):
        """Append at the first free slot (slots are kept front-packed)."""
        slot = self.n_frames
        assert slot < self.F, "window full — marginalize first"
        self.frame_mask[slot] = True
        self.frame_id[slot] = frame_id
        self.frame_t[slot] = t
        self.q[slot] = q
        self.p[slot] = p
        self.v[slot] = v
        self.bg[slot] = bg
        self.ba[slot] = ba
        self.keyframe[slot] = keyframe
        self.imu_ts[slot] = np.asarray(imu_ts, np.float64)
        self.imu_w[slot] = np.asarray(imu_w)
        self.imu_a[slot] = np.asarray(imu_a)
        self.kp[slot] = 0.0
        self.obs_mask[slot] = False
        return slot

    def drop_tail(self):
        """Erase the newest frame (non-keyframe replacement path,
        sliding_window_tracker.cpp:115-121)."""
        slot = self.n_frames - 1
        self.frame_mask[slot] = False
        self.obs_mask[slot] = False
        self.kp[slot] = 0.0
        self.imu_ts[slot] = None
        # tracks that only lived in the tail lose an observation
        self._refresh_track_columns()
        return slot

    def _refresh_track_columns(self):
        """Recompute ref_frame; release columns with < 1 obs. `track_life`
        is intentionally NOT recomputed: the reference's Track::life is a
        monotonic total-observation counter that never decreases when
        frames leave the map (track.cpp:36 — add_keypoint increments,
        remove_keypoint does not decrement), so it can exceed the window
        length — which is what the life >= 10 plane-maturity gate
        (plane_extractor.cpp:47) relies on with an 8-frame window."""
        obs = self.obs_mask & self.frame_mask[:, None]
        cnt = obs.sum(axis=0)
        dead = self.track_mask & (cnt == 0)
        for c in np.nonzero(dead)[0]:
            self.release_column(int(c))
        alive = self.track_mask & (cnt > 0)
        self.ref_frame[alive] = np.argmax(obs[:, alive], axis=0)

    # ------------------------------------------------------------------
    # track columns
    # ------------------------------------------------------------------
    def column_of(self, track_id):
        return self._col_of_track.get(int(track_id))

    def alloc_column(self, track_id, ref_slot):
        free = np.nonzero(~self.track_mask)[0]
        if len(free) == 0:
            return None
        c = int(free[0])
        self.track_mask[c] = True
        self.track_id[c] = track_id
        self.track_flags[c] = 0
        self.inv_depth[c] = 1.0
        self.quality[c] = 0.0
        self.plane_id[c] = -1
        self.ref_frame[c] = ref_slot
        self.track_life[c] = 0
        self.kp[:, c] = 0.0
        self.obs_mask[:, c] = False
        self._col_of_track[int(track_id)] = c
        return c

    def release_column(self, c):
        tid = int(self.track_id[c])
        self._col_of_track.pop(tid, None)
        self.track_mask[c] = False
        self.track_flags[c] = 0
        self.track_id[c] = -1
        self.obs_mask[:, c] = False
        self.plane_id[c] = -1

    def add_observation(self, col, slot, kp_normalized):
        if not self.obs_mask[:, col].any():
            self.ref_frame[col] = slot
        self.kp[slot, col] = kp_normalized
        self.obs_mask[slot, col] = True
        self.track_life[col] += 1

    # ------------------------------------------------------------------
    # device round-trips
    # ------------------------------------------------------------------
    def to_device(self, extra=None):
        """Build the device WindowState with ONE batched host->device
        transfer (jax.device_put of the whole pytree). Per-array
        jnp.asarray pushes cost a round trip each on remote/tunneled
        devices — the difference between real-time and seconds per frame.

        `extra`: optional pytree of host operands shipped in the SAME
        transfer; returns (window, extra) when given."""
        F, dtype = self.F, self.dtype
        deltas = win.empty_delta(F, jnp.dtype(dtype).name)
        host = win.WindowState(
            q=self.q, p=self.p, v=self.v, bg=self.bg, ba=self.ba,
            frame_mask=self.frame_mask, fix_mask=self.fix_mask,
            delta=deltas, delta_valid=np.zeros(F, bool),
            bg_lin=self.bg, ba_lin=self.ba,
            inv_depth=self.inv_depth, ref_frame=self.ref_frame,
            track_mask=self.track_mask, track_flags=self.track_flags,
            quality=self.quality, plane_id=self.plane_id,
            kp=self.kp, obs_mask=self.obs_mask,
            plane_normal=self.plane_normal,
            plane_distance=self.plane_distance,
            plane_mask=self.plane_mask,
            prior=self.prior,
        )
        if extra is None:
            return jax.device_put(host)
        return jax.device_put((host, extra))

    def from_device(self, w: win.WindowState, extra=None):
        """Pull solver results back (states, depths, flags, quality,
        prior) in ONE batched device->host fetch. Frame/track topology
        stays host-owned (but frame_mask is mirrored: marginalization
        compacts slots device-side).

        `extra`: optional pytree of device values fetched in the SAME
        round trip and returned as host arrays."""
        fetched, extra_h = jax.device_get((self.device_arrays(w), extra))
        return self.apply_fetched(w, fetched, extra_h)

    @staticmethod
    def device_arrays(w: win.WindowState):
        """The device arrays a from_device(w) fetches — exposed so a
        caller can batch them into ONE jax.device_get with other stages'
        results (Config.chained_keyframe: the keyframe harvest rides the
        next frame's combined fetch)."""
        return (w.q, w.p, w.v, w.bg, w.ba, w.inv_depth,
                w.track_flags, w.quality, w.ref_frame,
                w.track_mask, w.kp, w.obs_mask, w.plane_id,
                w.plane_normal, w.plane_distance,
                w.plane_mask, w.frame_mask)

    def apply_fetched(self, w: win.WindowState, fetched, extra_h=None):
        """Apply pre-fetched host values of device_arrays(w) to the host
        mirrors (the second half of from_device)."""
        # np.array: the fetched buffers can be read-only views; the host
        # window mutates them in place
        (self.q, self.p, self.v, self.bg, self.ba, self.inv_depth,
         self.track_flags, self.quality, self.ref_frame, self.track_mask,
         # kp/obs_mask are host-owned topology, but device-side
         # marginalization shifts frame slots — mirror them back so the
         # grids stay aligned with the shifted frame rows; plane_id comes
         # back because the post-BA plane-track escape clears it device-side
         self.kp, self.obs_mask, self.plane_id,
         self.plane_normal, self.plane_distance, self.plane_mask,
         self.frame_mask) = [np.array(a) for a in fetched]
        self.prior = w.prior
        # drop host bookkeeping for columns the device invalidated
        for c in np.nonzero(~self.track_mask & (self.track_id >= 0))[0]:
            self.release_column(int(c))
        return extra_h

    def shift_after_marginalize(self, index=0):
        """Mirror marginalize_and_remove's slot compaction for the
        host-only fields (device fields come via from_device)."""
        sl = list(range(self.F))
        sl.pop(index)
        for name in ["frame_id", "frame_t", "keyframe"]:
            a = getattr(self, name)
            setattr(self, name, np.concatenate([a[sl], np.zeros_like(a[:1])]))
        self.frame_id[-1] = -1
        for name in ["imu_ts", "imu_w", "imu_a"]:
            lst = getattr(self, name)
            setattr(self, name, [lst[i] for i in sl] + [None])
