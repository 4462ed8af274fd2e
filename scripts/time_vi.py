"""Targeted timing: vision-only vs visual-inertial 10-iter LM solve on TPU.

Chained in-graph repetition (see bench.py docstring for why).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

from pvio_tpu.estimation import ba
from pvio_tpu.io import synthetic


def time_cfg(w, extr, cfg, reps=30, tag=""):
    @jax.jit
    def steps(window):
        def body(wc, i):
            wp = wc._replace(p=wc.p + 1e-6 * jnp.float32(i))
            w2, out = ba.solve(wp, extr, cfg)
            return w2, out["final_cost"]
        return jax.lax.scan(body, window, jnp.arange(reps))

    t0 = time.perf_counter()
    wf, costs = steps(w)
    jax.block_until_ready(costs)
    print(f"[{tag}] compile+run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    wf, costs = steps(w._replace(p=w.p + 1e-5))
    jax.block_until_ready(costs)
    dt = time.perf_counter() - t0
    print(f"[{tag}] {reps} solves in {dt:.3f}s -> {1e3*dt/reps:.2f} ms/solve, "
          f"cost {float(costs[-1]):.3e}")


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    scene = synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                                 n_points=400, seed=648)
    kf = list(range(0, 8 * 4, 4))
    w, extr, info = synthetic.solver_window_from_scene(
        scene, kf, F_cap=9, T_cap=256, dtype=jnp.float32, kp_noise=0.002)
    print(f"window: {info['n_frames']} frames, {info['n_tracks']} tracks",
          file=sys.stderr)

    for tag, cfg in [
        ("vo", ba.BAConfig(iterations=10, kp_sqrt_inv_cov=283.0,
                           use_planes=False, use_inertial=False)),
        ("vi", ba.BAConfig(iterations=10, kp_sqrt_inv_cov=283.0,
                           use_planes=False, use_inertial=True)),
    ]:
        time_cfg(w, extr, cfg, tag=tag)


if __name__ == "__main__":
    main()
