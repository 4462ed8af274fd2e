"""Multi-sequence serving throughput on the real TPU chip.

Measures the aggregate host-loop frames/s of parallel/serving.py's
MultiSequenceServer for N sequences against a solo engine, on the same
synthetic streams. On a remote-attached device the per-frame cost is the
device->host synchronization (PERF_NOTES round 1); the server pays TWO
combined fetches per tick for the WHOLE fleet, so aggregate fps should
approach N x the solo rate until uploads/host bookkeeping dominate.

    python scripts/bench_serving.py [--n 4] [--duration 6] [--res 480x752]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--duration", type=float, default=6.0)
    ap.add_argument("--res", default="480x752")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pvio_tpu.io import synthetic
    from pvio_tpu.parallel.serving import MultiSequenceServer

    H, W = (int(v) for v in args.res.split("x"))

    def make_cfg():
        cfg = synthetic.pipeline_config()
        cfg.image_size = (W, H)
        cfg.camera_intrinsic = np.array(
            [0.55 * W, 0.55 * W, W / 2 - 0.5, H / 2 - 0.5])
        cfg.enable_plane_constraint = False
        return cfg

    seeds = [648, 1234, 777, 42, 9, 100, 55, 31][: args.n]
    scenes = [synthetic.make_scene(duration=args.duration, fps=20.0,
                                   imu_rate=200.0, n_points=320, seed=s)
              for s in seeds]
    cfg0 = make_cfg()
    print(f"pre-rendering {args.n} x {len(scenes[0].frame_t)} frames "
          f"at {W}x{H}...", file=sys.stderr)
    images = [[synthetic.render_frame(sc, fi, cfg0.K, cfg0.image_size)
               for fi in range(len(sc.frame_t))] for sc in scenes]

    def drive(n_engines):
        srv = MultiSequenceServer([make_cfg() for _ in range(n_engines)],
                                  auto_pump=False)
        fis = [0] * n_engines
        n_frames = 0
        t_half = None  # timing starts at half-stream (init transient over)
        n_half = 0
        n_imu = len(scenes[0].imu_t)
        t0 = time.perf_counter()
        for k in range(n_imu):
            if k == n_imu // 2:
                t_half, n_half = time.perf_counter(), n_frames
            for i in range(n_engines):
                sc = scenes[i]
                t = sc.imu_t[k]
                srv.track_gyroscope(i, t, *sc.gyro[k])
                srv.track_accelerometer(i, t, *sc.accel[k])
                while (fis[i] < len(sc.frame_t)
                       and sc.frame_t[fis[i]] <= t):
                    srv.track_camera(i, sc.frame_t[fis[i]],
                                     images[i][fis[i]])
                    fis[i] += 1
                    n_frames += 1
            srv.pump()
        srv.pump()
        wall = time.perf_counter() - t0
        steady = (n_frames - n_half) / (time.perf_counter() - t_half)
        inits = sum(srv.initialized(i) for i in range(n_engines))
        kfs = [srv.vios[i].core.frontend.swt.n_keyframes
               if srv.vios[i].core.frontend.swt else 0
               for i in range(n_engines)]
        print(f"  {n_engines} engines: {n_frames} frames in {wall:.1f}s "
              f"({n_frames / wall:.1f} fps incl. compile/init; steady "
              f"{steady:.1f} fps), {inits} initialized, keyframes {kfs}",
              file=sys.stderr)
        return steady

    print("warm-up + solo baseline:", file=sys.stderr)
    fps1 = drive(1)
    fps1 = drive(1)  # second run: kernels compiled, honest steady rate
    fpsN = drive(args.n)
    import json

    print(json.dumps({
        "metric": "serving_aggregate_fps",
        "n_sequences": args.n,
        "solo_fps": round(fps1, 2),
        "aggregate_fps": round(fpsN, 2),
        "scaling": round(fpsN / fps1, 2) if fps1 > 0 else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
