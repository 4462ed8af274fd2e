"""Model presets and deployment-shape factories (see presets.py)."""

from pvio_tpu.models.presets import (  # noqa: F401
    PRESETS, batched_solver, build, config, euroc, fast, sharded_solver,
    tum_vi, vio_no_planes,
)
