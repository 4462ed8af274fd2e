"""Benchmark: sliding-window visual-inertial BA keyframe steps per second
on the attached accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured unit of work is the per-keyframe solver step — one full
10-iteration LM bundle adjustment (linearize + landmark Schur elimination
+ reduced solve) over an 8-keyframe window with up to 256 tracks, the
dominant compute of the VIO pipeline (reference: Ceres SPARSE_SCHUR x10
dogleg iterations per keyframe, solver_options.h:26-33). The baseline is
the reference's real-time budget of 30 keyframe solves/s (pvio-pc
main.cpp:30 TARGET_FPS) — vs_baseline = value / 30.

Secondary diagnostics go to stderr.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer timed reps")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pvio_tpu.estimation import ba
    from pvio_tpu.io import synthetic

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    scene = synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                                 n_points=400, seed=648)
    kf = list(range(0, 8 * 4, 4))
    w, extr, info = synthetic.solver_window_from_scene(
        scene, kf, F_cap=9, T_cap=256, dtype=jnp.float32, kp_noise=0.002
    )
    print(f"window: {info['n_frames']} frames, {info['n_tracks']} tracks",
          file=sys.stderr)

    cfg = ba.BAConfig(iterations=10, kp_sqrt_inv_cov=283.0, use_planes=False)
    reps = 30 if args.quick else 100

    # Time with IN-GRAPH repetition: the serving environment may cache
    # whole dispatches by input hash, so per-call host timing can measure
    # RTT instead of compute. A lax.scan of `reps` chained solves inside
    # one jit gives compute-only numbers.
    @jax.jit
    def keyframe_steps(window):
        def body(wc, i):
            # small input perturbation each rep: no two solves identical
            wp = wc._replace(p=wc.p + 1e-6 * jnp.float32(i))
            w2, out = ba.solve(wp, extr, cfg)
            return w2, out["final_cost"]

        wf, costs = jax.lax.scan(body, window, jnp.arange(reps))
        return wf, costs

    t0 = time.perf_counter()
    w2, costs = keyframe_steps(w)
    jax.block_until_ready(costs)
    print(f"compile+first({reps} chained solves): {time.perf_counter() - t0:.1f}s, "
          f"final cost {float(costs[-1]):.3e}", file=sys.stderr)

    # 3 timed calls with fresh inputs; take the fastest (the tunnel is
    # multi-tenant — measured fixed dispatch overhead ~27 ms + ~1.2 ms/solve,
    # but contended calls can be several times slower)
    dts = []
    for k in range(3):
        t0 = time.perf_counter()
        w2, costs = keyframe_steps(w._replace(p=w.p + 1e-5 * (k + 1)))
        jax.block_until_ready(costs)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    value = reps / dt
    print(f"{reps} chained keyframe BA steps: "
          f"{['%.3fs' % d for d in dts]} (best {1e3 * dt / reps:.2f} ms/step)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "keyframe_ba_steps_per_s",
        "value": round(value, 3),
        "unit": "solves/s (10-iter LM, 8 kf x 256 tracks, f32)",
        "vs_baseline": round(value / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
