"""Disambiguate timing: same VI solve, scan lengths 5/30/60, 3 fresh-input
calls each — exposes dispatch caching vs contention vs real per-step time."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

from pvio_tpu.estimation import ba
from pvio_tpu.io import synthetic


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    scene = synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                                 n_points=400, seed=648)
    kf = list(range(0, 8 * 4, 4))
    w, extr, _ = synthetic.solver_window_from_scene(
        scene, kf, F_cap=9, T_cap=256, dtype=jnp.float32, kp_noise=0.002)
    cfg = ba.BAConfig(iterations=10, kp_sqrt_inv_cov=283.0, use_planes=False)

    for reps in (5, 30, 60):
        @jax.jit
        def steps(window, reps=reps):
            def body(wc, i):
                wp = wc._replace(p=wc.p + 1e-6 * jnp.float32(i))
                w2, out = ba.solve(wp, extr, cfg)
                return w2, out["final_cost"]
            return jax.lax.scan(body, window, jnp.arange(reps))

        t0 = time.perf_counter()
        _, c = steps(w)
        jax.block_until_ready(c)
        print(f"reps={reps} compile+first: {time.perf_counter()-t0:.2f}s")
        for k in range(3):
            wi = w._replace(p=w.p + 1e-5 * (k + 1))
            t0 = time.perf_counter()
            _, c = steps(wi)
            jax.block_until_ready(c)
            dt = time.perf_counter() - t0
            print(f"reps={reps} call{k}: total {dt*1e3:7.1f} ms  "
                  f"-> {dt/reps*1e3:6.2f} ms/solve  cost {float(c[-1]):.4e}")


if __name__ == "__main__":
    main()
