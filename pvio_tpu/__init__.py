"""pvio_tpu — a TPU-native visual-inertial odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of PVIO
(zju3dv, PRCV 2019; reference layout surveyed in SURVEY.md): monocular KLT
feature tracking, on-manifold IMU preintegration, visual-inertial
initialization, sliding-window bundle adjustment with reprojection +
preintegration + multi-plane-prior factors, frame marginalization, and plane
detection/extension/merging — expressed as batched, masked array programs
that scale over TPU meshes.

Public API (mirrors the facade of reference pvio/include/pvio/pvio.h:135-148):

    from pvio_tpu import PVIO, Config
    vio = PVIO(config)
    vio.track_gyroscope(t, x, y, z)
    vio.track_accelerometer(t, x, y, z)
    pose = vio.track_camera(t, image)
"""

from pvio_tpu.version import __version__, version_info

__all__ = [
    "__version__",
    "version_info",
    "Config",
    "PVIO",
    "OutputPose",
    "OutputState",
    "OutputMapPoint",
    "OutputPlane",
]

_LAZY = {
    "Config": ("pvio_tpu.io.config", "Config"),
    "PVIO": ("pvio_tpu.api", "PVIO"),
    "OutputPose": ("pvio_tpu.api", "OutputPose"),
    "OutputState": ("pvio_tpu.api", "OutputState"),
    "OutputMapPoint": ("pvio_tpu.api", "OutputMapPoint"),
    "OutputPlane": ("pvio_tpu.api", "OutputPlane"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'pvio_tpu' has no attribute {name!r}")
