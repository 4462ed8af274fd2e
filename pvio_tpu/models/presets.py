"""Model presets: ready-to-run engine configurations.

The reference ships per-dataset YAMLs (config/euroc.yaml,
config/tum-vi.yaml, pvio-pc/config/*.yaml) that a user copies and tweaks;
this module is the programmatic equivalent — each preset returns a fully
populated `Config` for one deployment shape of the framework:

  * ``euroc``          — EuRoC MAV mono+IMU with plane priors (the
                         paper's headline configuration, config/euroc.yaml:1-67)
  * ``tum_vi``         — TUM-VI 512 fisheye (equidistant undistortion +
                         TUM-VI IMU noise, config/tum-vi.yaml:1-67)
  * ``vio_no_planes``  — plane constraint disabled
                         (PVIO_ENABLE_PLANE_CONSTRAINT=OFF analog)
  * ``fast``           — reduced budgets for latency-critical serving
                         (smaller window/track caps, fewer LM iterations)

``build(name)`` returns a live `PVIO` engine; `batched_solver` /
`sharded_solver` expose the fleet-scale deployment models (vmapped
multi-sequence and mesh-sharded enlarged-window BA).
"""

import os

import numpy as np

from pvio_tpu.io.config import Config

_CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "config",
)


def euroc() -> Config:
    """EuRoC MAV (ASL format), mono + IMU, plane priors ON."""
    path = os.path.join(_CONFIG_DIR, "euroc.yaml")
    return Config.from_yaml(path) if os.path.exists(path) else Config()


def tum_vi() -> Config:
    """TUM-VI 512_16 fisheye (equidistant model) + TUM-VI IMU noise.

    The reference hardcodes the 512x512 geometry in its dataset reader
    (tum_dataset_reader.cpp:73-81) rather than the YAML; mirror that here
    so the preset is complete on its own."""
    path = os.path.join(_CONFIG_DIR, "tum-vi.yaml")
    cfg = Config.from_yaml(path) if os.path.exists(path) else Config()
    cfg.image_size = (512, 512)
    if cfg.camera_distortion_model == "none":
        cfg.camera_distortion_model = "equidistant"
    return cfg


def vio_no_planes() -> Config:
    cfg = euroc()
    cfg.enable_plane_constraint = False
    return cfg


def fast() -> Config:
    """Latency-lean preset: smaller fixed shapes compile to smaller device
    programs (half the tracks, 6-frame window, 6 LM iterations)."""
    cfg = euroc()
    cfg.sliding_window_size = 6
    cfg.window_frame_capacity = 7
    cfg.track_capacity = 128
    cfg.feature_tracker_max_keypoint_detection = 100
    cfg.solver_iteration_limit = 6
    return cfg


PRESETS = {
    "euroc": euroc,
    "tum_vi": tum_vi,
    "vio_no_planes": vio_no_planes,
    "fast": fast,
}


def config(name: str) -> Config:
    try:
        return PRESETS[name]()
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")


def build(name: str):
    """Construct a live PVIO engine from a preset name."""
    from pvio_tpu.api import PVIO

    return PVIO(config(name))


def batched_solver(cfg: Config = None):
    """Deployment model: one jitted keyframe-BA step vmapped over a batch
    of sequences (BASELINE.json config 4). Returns (step_fn, ba_config)."""
    import jax.numpy as jnp

    from pvio_tpu.estimation import ba as ba_mod
    from pvio_tpu.map.window import Extrinsics
    from pvio_tpu.parallel import batch as batch_mod

    cfg = cfg or euroc()
    dtype = jnp.float32 if cfg.dtype == "float32" else jnp.float64
    extr = Extrinsics(
        q_bc=jnp.asarray(cfg.q_bc, dtype), p_bc=jnp.asarray(cfg.p_bc, dtype),
        q_bi=jnp.asarray(cfg.q_bi, dtype), p_bi=jnp.asarray(cfg.p_bi, dtype),
    )
    ba_cfg = ba_mod.BAConfig(
        iterations=cfg.solver_iteration_limit,
        kp_sqrt_inv_cov=cfg.kp_sqrt_inv_cov,
        use_planes=cfg.enable_plane_constraint,
    )
    return batch_mod.make_batched_keyframe_step(extr, ba_cfg), ba_cfg


def sharded_solver(mesh, cfg: Config = None):
    """Deployment model: distributed BA over a dp×tp device mesh
    (BASELINE.json config 5). Returns the sharded solver callable."""
    import jax.numpy as jnp

    from pvio_tpu.estimation import ba as ba_mod
    from pvio_tpu.map.window import Extrinsics
    from pvio_tpu.parallel import sharded_ba

    cfg = cfg or euroc()
    dtype = jnp.float32 if cfg.dtype == "float32" else jnp.float64
    extr = Extrinsics(
        q_bc=jnp.asarray(cfg.q_bc, dtype), p_bc=jnp.asarray(cfg.p_bc, dtype),
        q_bi=jnp.asarray(cfg.q_bi, dtype), p_bi=jnp.asarray(cfg.p_bi, dtype),
    )
    ba_cfg = ba_mod.BAConfig(
        iterations=cfg.solver_iteration_limit,
        kp_sqrt_inv_cov=cfg.kp_sqrt_inv_cov,
        use_planes=cfg.enable_plane_constraint,
    )
    return sharded_ba.make_sharded_solver(mesh, extr, ba_cfg)
