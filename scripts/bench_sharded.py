"""Scaling benchmark for the distributed BA (BASELINE.json configs 4-5).

Measures:
  * dp weak scaling: batch of B sequences, B = devices — throughput per
    device should stay ~flat vs the 1-device run;
  * tp strong scaling: ONE enlarged window (16 kf x T tracks) with the
    track axis sharded — time per solve should drop with devices.

CAVEAT: on a virtual CPU mesh (xla_force_host_platform_device_count) all
"devices" share the host's physical cores, so wall-clock efficiency
numbers measure CPU saturation, not the sharding design (on this 2-core
box dp=8 runs 8x the FLOPs on the same silicon and times exactly ~8x
slower). Virtual-mesh runs validate CORRECTNESS of the collective
structure (identical costs across tp widths); efficiency claims require
real chips — run this unchanged on a pod slice.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_sharded.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pvio_tpu.estimation import ba
    from pvio_tpu.io import synthetic
    from pvio_tpu.parallel import sharded_ba

    devs = jax.devices()
    n = len(devs)
    print(f"{n} devices: {devs[0].platform}", file=sys.stderr)

    scene = synthetic.make_scene(duration=6.0, fps=20.0, imu_rate=200.0,
                                 n_points=700, seed=648)
    kf = list(range(0, 16 * 4, 4))
    T_cap = 512
    w, extr, info = synthetic.solver_window_from_scene(
        scene, kf, F_cap=17, T_cap=T_cap, dtype=jnp.float32, kp_noise=0.002)
    cfg = ba.BAConfig(iterations=10, kp_sqrt_inv_cov=283.0, use_planes=False)
    print(f"enlarged window: {info['n_frames']} kf x {info['n_tracks']} tracks",
          file=sys.stderr)
    reps = 3

    def timed(solver, wb, mesh):
        with mesh:
            out, costs = solver(wb)
            jax.block_until_ready(costs)
            ds = []
            for k in range(reps):
                wb2 = jax.tree.map(
                    lambda a: a, wb)._replace(p=wb.p + 1e-5 * (k + 1))
                t0 = time.perf_counter()
                out, costs = solver(wb2)
                jax.block_until_ready(costs)
                ds.append(time.perf_counter() - t0)
        return min(ds), np.asarray(costs)

    # --- tp strong scaling: one window, tracks sharded ---
    print("\n== tp strong scaling (1 window, 16 kf x 512 tracks) ==")
    base = None
    for tp_n in [d for d in (1, 2, 4, 8) if d <= n]:
        mesh = Mesh(np.array(devs[:tp_n]).reshape(1, tp_n), ("dp", "tp"))
        solver = sharded_ba.make_sharded_solver(mesh, extr, cfg)
        wb = sharded_ba.replicate_window_batch(w, 1)
        dt, costs = timed(solver, wb, mesh)
        base = base or dt
        print(f"tp={tp_n}: {1e3*dt:8.1f} ms/solve  speedup {base/dt:5.2f}x  "
              f"eff {100*base/dt/tp_n:5.1f}%  cost {costs[0]:.3e}")

    # --- dp weak scaling: B = devices sequences ---
    print("\n== dp weak scaling (B windows = devices, tp=1) ==")
    base = None
    for dp_n in [d for d in (1, 2, 4, 8) if d <= n]:
        mesh = Mesh(np.array(devs[:dp_n]).reshape(dp_n, 1), ("dp", "tp"))
        solver = sharded_ba.make_sharded_solver(mesh, extr, cfg)
        wb = sharded_ba.replicate_window_batch(w, dp_n)
        dt, costs = timed(solver, wb, mesh)
        thru = dp_n / dt
        base = base or thru
        print(f"dp={dp_n}: {1e3*dt:8.1f} ms/batch  {thru:6.1f} solves/s  "
              f"weak eff {100*thru/(base*dp_n):5.1f}%")


if __name__ == "__main__":
    main()
