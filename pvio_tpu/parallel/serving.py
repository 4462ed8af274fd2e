"""Adaptive multi-sequence host serving: N COMPLETE PVIO engines — each
with its own initializer <-> sliding-window state machine, keyframe
gate, plane map, and re-init path — driven by ONE host loop that merges
their per-frame device synchronization points.

The reference serves one sequence per process (pvio-pc/src/main.cpp:
87-130: a single `pvio::PVIO` fed by one DatasetReader). This server
beats that precedent on TPU serving economics: the dominant per-frame
cost on a remote-attached device is the device->host synchronization
(PERF_NOTES: each `jax.device_get` CALL costs a full round trip
regardless of payload), so N engines fetched separately pay N round
trips per frame while this loop pays TWO for the whole fleet — one
combined fetch for every engine's fused frontend step, one for every
engine's fused PnP/motion step. Keyframe solves still run per engine
exactly when that engine's gate fires, so keyframe schedules,
initialization timing, and failure recovery diverge freely across
sequences — unlike parallel/multi_seq.py's fixed-cadence vmapped chain,
nothing here is lockstep.

Per-sequence outputs are BITWISE identical to solo sequential runs: each
engine executes the same kernels on the same inputs in the same order;
only the host blocking pattern changes (the combined `jax.device_get`
returns the same values the per-engine fetches would).
"""

from typing import List, Optional

import numpy as np

import jax

from pvio_tpu.api import PVIO, OutputPose
from pvio_tpu.core import swt as swt_mod
from pvio_tpu.io.config import Config
from pvio_tpu.utils.forensics import bus as forensics


class MultiSequenceServer:
    """Serve N sequences through N independent PVIO engines with shared
    per-tick device fetches.

    Usage:
        srv = MultiSequenceServer([cfg0, cfg1, ...])
        srv.track_gyroscope(i, t, x, y, z)      # queue sensor data
        srv.track_accelerometer(i, t, x, y, z)
        srv.track_camera(i, t, image)           # queue a frame
        srv.pump()                              # process everything ready
        srv.get_trajectory(i)

    Sensor feeds only queue; `pump()` advances every engine whose next
    frame has its IMU span complete, batching the fleet's fetches.
    `track_camera` calls `pump()` itself by default (`auto_pump=True`)
    so single-threaded drivers need no extra calls; a driver interleaving
    many sequences should pass auto_pump=False and pump once per round
    for maximal fetch sharing.
    """

    def __init__(self, configs: List[Config], auto_pump: bool = True):
        self.vios = [PVIO(cfg) for cfg in configs]
        for v in self.vios:
            v.core.defer_frames = True
        self.auto_pump = auto_pump

    @property
    def n_sequences(self) -> int:
        return len(self.vios)

    # -- per-sequence sensor entry points (pvio.h:135-148 facade, with a
    # leading sequence index) --
    def track_gyroscope(self, i, t, x, y, z) -> Optional[OutputPose]:
        return self.vios[i].track_gyroscope(t, x, y, z)

    def track_accelerometer(self, i, t, x, y, z) -> Optional[OutputPose]:
        return self.vios[i].track_accelerometer(t, x, y, z)

    def track_camera(self, i, t, image) -> Optional[OutputPose]:
        out = self.vios[i].track_camera(t, image)
        if self.auto_pump:
            self.pump()
        return out

    # -- the shared host loop --
    def pump(self) -> int:
        """Process every queued frame whose IMU span is complete, across
        all engines, sharing the two per-tick fetches fleet-wide.
        Returns the number of frames processed."""
        processed = 0
        while True:
            batch = []
            for i, v in enumerate(self.vios):
                got = v.core.poll_ready_frame()
                if got is not None:
                    batch.append((i, got))
            if not batch:
                return processed
            self._tick(batch)
            processed += len(batch)

    def _tick(self, batch):
        # Phase A: dispatch every engine's fused frontend step (async)
        handles = []
        for i, (fid, t, image, ts, ws, accs) in batch:
            core = self.vios[i].core
            h = core.feature_tracker.dispatch_frame(fid, t, image, ts, ws, accs)
            core._last_frame_t = t
            handles.append((i, h))
        # Phase B: ONE fetch for the whole fleet's frontend results
        with forensics.timer("serving_frontend_fetch"):
            vals = jax.device_get(
                [self.vios[i].core.feature_tracker.handle_arrays(h)
                 for i, h in handles])
        # Phase C: host association + estimator dispatch per engine
        pends = []
        for (i, h), fv in zip(handles, vals):
            core = self.vios[i].core
            with forensics.timer("feature_tracker_time"):
                rf = core.feature_tracker.finish_frame(h, fetched=fv)
            fw = core.frontend
            if fw.initialized:
                pend = fw.issue_dispatch(rf)
                if pend is not None:
                    pends.append((i, pend))
            else:
                # initializer path (per-engine; synchronous by design —
                # it runs rarely and its two-view search is host-driven)
                state = fw.issue_frame(rf)
                if state is not None:
                    core._emit_output(state)
        # Phase D: ONE fetch for the whole fleet's PnP/motion results
        if pends:
            with forensics.timer("serving_pnp_fetch"):
                vals2 = jax.device_get(
                    [swt_mod.pend_fetch_arrays(p) for _, p in pends])
            # Phase E: keyframe/window bookkeeping per engine (keyframe
            # solves fire independently, only where each gate says so)
            for (i, pend), fv in zip(pends, vals2):
                core = self.vios[i].core
                state = core.frontend.finish_issued(pend, fetched=fv)
                if state is not None:
                    core._emit_output(state)

    # -- per-sequence queries --
    def initialized(self, i) -> bool:
        return self.vios[i].initialized

    def get_trajectory(self, i):
        return list(self.vios[i].core.outputs)

    def get_planes(self, i):
        return self.vios[i].get_planes()

    def get_latest_state(self, i):
        return self.vios[i].get_latest_state()
