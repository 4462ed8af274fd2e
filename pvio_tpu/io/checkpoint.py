"""Engine state checkpointing.

The reference has NO persistence — state lives only in RAM and "resume"
means re-initializing from scratch (SURVEY §5). This module adds window
snapshotting as a framework feature: the solver window (device pytree or
host mirror) round-trips through a single .npz file.

SCOPE (be precise about what "resume" means here): the snapshot covers
the SOLVER WINDOW only — frame states, track columns, observation grid,
planes, marginalization prior. It does NOT capture the feature tracker's
raw frame window, device-resident keypoint/pyramid/response state, plane
SectorAreas, or host id counters, so a restored window supports solver
post-mortems, regression goldens, and warm-starting a NEW tracking
session from a known state — it cannot splice into a live sequence
mid-stream and continue tracking as if nothing happened.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pvio_tpu.imu.preintegration import PreintDelta
from pvio_tpu.map import window as win
from pvio_tpu.map.window import MargPrior, WindowState


def save_window(path, w: WindowState):
    flat, treedef = jax.tree.flatten(w)
    np.savez_compressed(
        path, __n=len(flat), **{f"a{i}": np.asarray(x) for i, x in enumerate(flat)}
    )


def load_window(path, dtype=None) -> WindowState:
    data = np.load(path)
    n = int(data["__n"])
    flat = [jnp.asarray(data[f"a{i}"]) for i in range(n)]
    # rebuild treedef from a template with matching capacities
    F = flat[0].shape[0]
    T = flat[11].shape[0]   # inv_depth
    P = flat[-9].shape[0]   # plane_normal (before prior's 8 leaves)
    template = win.empty_window(F, T, P, flat[1].dtype)
    _, treedef = jax.tree.flatten(template)
    w = jax.tree.unflatten(treedef, flat)
    if dtype is not None:
        w = jax.tree.map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            w,
        )
    return w
