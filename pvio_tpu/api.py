"""Public PVIO facade (reference pvio/include/pvio/pvio.h:135-148 and
Output* structs :42-68): three sensor entry points + map/plane queries."""

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from pvio_tpu.core.core import Core
from pvio_tpu.io.config import Config
from pvio_tpu.map.window import TF_PLANE, TF_VALID


@dataclass
class OutputPose:
    t: float
    q: np.ndarray  # (4,) wxyz
    p: np.ndarray  # (3,)


@dataclass
class OutputState:
    t: float
    q: np.ndarray
    p: np.ndarray
    v: np.ndarray
    bg: np.ndarray
    ba: np.ndarray


@dataclass
class OutputMapPoint:
    p: np.ndarray
    reserved: int = 0


@dataclass
class OutputPlane:
    normal: np.ndarray
    distance: float
    reference_point: np.ndarray = field(default_factory=lambda: np.zeros(3))


class PVIO:
    """Monocular visual-inertial odometry engine.

    Usage mirrors the reference facade: feed `track_gyroscope` /
    `track_accelerometer` at sensor rate and `track_camera` per frame;
    each call returns the latest predicted OutputPose (or None before
    initialization completes).
    """

    def __init__(self, config: Config, enable_planes: Optional[bool] = None):
        if enable_planes is not None:
            config.enable_plane_constraint = enable_planes
        self.config = config
        self._build_core()

    def _build_core(self):
        config = self.config
        if config.enable_plane_constraint:
            from pvio_tpu.core.plane_extractor import PlaneExtractor

            factory = lambda: PlaneExtractor(config, self.core.kernels)
        else:
            factory = None
        self.core = Core(config, plane_extractor_factory=factory)

    def reset(self):
        """Drop all estimator state and restart from scratch — the
        reference's recovery path does the same swap to a fresh
        Initializer (frontend_worker.cpp:71-77). Compiled device kernels
        are reused through the DeviceKernels cache, so a reset (or a new
        engine on the same config) costs no recompilation."""
        self._build_core()

    # --- sensor entry points (pvio.cpp:29-39) ---
    def track_gyroscope(self, t, x, y, z) -> Optional[OutputPose]:
        return self._pose(self.core.track_gyroscope(t, x, y, z))

    def track_accelerometer(self, t, x, y, z) -> Optional[OutputPose]:
        return self._pose(self.core.track_accelerometer(t, x, y, z))

    def track_camera(self, t, image) -> Optional[OutputPose]:
        return self._pose(self.core.track_camera(t, image))

    @staticmethod
    def _pose(out):
        if out is None:
            return None
        t, q, p = out
        return OutputPose(t=t, q=np.asarray(q), p=np.asarray(p))

    # --- state / map queries ---
    @property
    def initialized(self) -> bool:
        return self.core.frontend.initialized

    def get_latest_state(self) -> Optional[OutputState]:
        swt = self.core.frontend.swt
        if swt is None:
            return None
        t, q, p, v, bg, ba = swt.latest_state
        return OutputState(t=t, q=q, p=p, v=v, bg=bg, ba=ba)

    def finish(self):
        """Drain any in-flight pipelined stages (end of stream). No-op in
        sequential mode."""
        self.core.flush()

    def get_trajectory(self):
        """Per-frame optimized outputs [(t, q, p)] accumulated so far.
        Drains the host pipeline first so the trajectory reflects every
        fed frame."""
        self.core.flush()
        return list(self.core.outputs)

    def get_map_points(self):
        swt = self.core.frontend.swt
        if swt is None:
            return []
        import jax.numpy as jnp

        hw = swt.hw
        pts = np.array(self.core.kernels.landmarks(hw.to_device()))
        out = []
        for c in np.nonzero(hw.track_mask)[0]:
            if hw.track_flags[c] & (TF_VALID | TF_PLANE):
                out.append(OutputMapPoint(p=pts[c]))
        return out

    def get_planes(self):
        swt = self.core.frontend.swt
        if swt is None:
            return []
        hw = swt.hw
        out = []
        for i in np.nonzero(hw.plane_mask)[0]:
            out.append(OutputPlane(normal=hw.plane_normal[i].copy(),
                                   distance=float(hw.plane_distance[i])))
        return out
