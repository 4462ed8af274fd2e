"""Batched multi-sequence solving on a single chip or data-parallel mesh.

BASELINE.json config 4 ("all 11 EuRoC sequences vmapped/sharded across
chips"): independent VIO windows stacked on a leading batch axis. On one
chip the whole batch vmaps into one program (the dense fixed-shape design
makes every sequence's solve identical work); across chips the same
batched pytree shards over the `dp` axis of `sharded_ba.make_sharded_solver`.
"""

import jax
import jax.numpy as jnp

from pvio_tpu.estimation import ba as ba_mod
from pvio_tpu.map.window import Extrinsics, WindowState


def stack_windows(windows):
    """List of WindowState (same capacities) -> batched WindowState."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *windows)


def unstack_windows(wb, n):
    return [jax.tree.map(lambda a: a[i], wb) for i in range(n)]


def make_batched_solver(extr: Extrinsics, cfg: ba_mod.BAConfig):
    """jitted (batched windows) -> (batched windows, final costs)."""

    def solve_one(w):
        w2, info = ba_mod.solve(w, extr, cfg)
        return w2, info["final_cost"]

    return jax.jit(jax.vmap(solve_one))


def make_batched_keyframe_step(extr: Extrinsics, cfg: ba_mod.BAConfig, K=None):
    """Full keyframe step (BA + post-solve gates) vmapped over sequences;
    pass camera matrix K to include the post-solve depth/quality update."""

    def step(w):
        w2, info = ba_mod.solve(w, extr, cfg)
        if K is not None:
            w2 = ba_mod.post_solve_update(w2, extr, K)
        return w2, info["final_cost"]

    return jax.jit(jax.vmap(step))
