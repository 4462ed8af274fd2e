"""Steady-state end-to-end pipeline timing.

The reference's real-time contract is ~20-30 camera fps on a desktop CPU
(pvio-pc/src/main.cpp:30). This script measures OUR full host pipeline
(IMU pairing -> fused frontend step -> PnP -> keyframe BA/marginalization
-> plane upkeep) at steady state: the synthetic scene is run once to
compile every device program, then the engine is reset (DeviceKernels are
cached, so nothing recompiles) and the second run is timed per frame.

Usage: python scripts/time_pipeline.py [--cpu] [--no-planes] [--duration S]
"""

import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys
import time


def run_scene(vio, scene, frame_times=None):
    import numpy as np

    from pvio_tpu.io import synthetic

    cfg = vio.config
    n_poses = 0
    fi = 0
    init_mark = [None]
    for k in range(len(scene.imu_t)):
        t = scene.imu_t[k]
        vio.track_gyroscope(t, *scene.gyro[k])
        vio.track_accelerometer(t, *scene.accel[k])
        while fi < len(scene.frame_t) and scene.frame_t[fi] <= t:
            img = synthetic.render_frame(scene, fi, cfg.K, cfg.image_size)
            # feed 8-bit grayscale like a real camera (and like the
            # reference's Image ABC) — 4x less host->device traffic
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
            t0 = time.perf_counter()
            pose = vio.track_camera(scene.frame_t[fi], img)
            if frame_times is not None:
                frame_times.append(time.perf_counter() - t0)
            if pose is not None:
                n_poses += 1
            if init_mark[0] is None and vio.initialized:
                init_mark[0] = fi
            fi += 1
    return n_poses, fi, init_mark[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-planes", action="store_true")
    ap.add_argument("--sequential", action="store_true",
                    help="disable the pipelined host loop")
    ap.add_argument("--fused-kf", action="store_true",
                    help="fuse marginalize+append+BA into one keyframe dispatch")
    ap.add_argument("--chained-kf", action="store_true",
                    help="chain the fused keyframe on the motion step's "
                         "device outputs (implies --fused-kf): one combined "
                         "deferred fetch per frame, keyframes included")
    ap.add_argument("--duration", type=float, default=6.0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pvio_tpu import PVIO
    from pvio_tpu.io import synthetic
    from pvio_tpu.utils.forensics import bus

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = synthetic.pipeline_config()
    cfg.pipelined_host = not args.sequential
    cfg.fused_keyframe = bool(args.fused_kf or args.chained_kf)
    cfg.chained_keyframe = bool(args.chained_kf)
    if args.no_planes:
        cfg.enable_plane_constraint = False
    scene = synthetic.make_scene(duration=args.duration, n_points=320)
    vio = PVIO(cfg)

    t0 = time.perf_counter()
    n_poses, n_frames, _ = run_scene(vio, scene)
    vio.finish()
    warm = time.perf_counter() - t0
    print(f"warm-up run: {n_frames} frames, {n_poses} poses, {warm:.1f}s "
          f"(includes every compile)", file=sys.stderr)

    vio.reset()
    ft = []
    t0 = time.perf_counter()
    n_poses, n_frames, init_fi = run_scene(vio, scene, frame_times=ft)
    vio.finish()
    wall = time.perf_counter() - t0
    ft = np.array(ft)
    fps = n_frames / wall
    print(f"steady-state: {n_frames} frames in {wall:.2f}s -> {fps:.1f} fps "
          f"({n_poses} poses)")
    print(f"track_camera per-frame ms: p50 {np.percentile(ft, 50)*1e3:.1f}  "
          f"p90 {np.percentile(ft, 90)*1e3:.1f}  max {ft.max()*1e3:.1f}")
    if init_fi is not None and init_fi + 5 < len(ft):
        post = ft[init_fi + 1:]
        print(f"post-init steady state ({len(post)} frames, after frame "
              f"{init_fi}): {1.0/post.mean():.1f} fps, p50 "
              f"{np.percentile(post, 50)*1e3:.1f} ms, p90 "
              f"{np.percentile(post, 90)*1e3:.1f} ms")
    print("forensics (rolling avg):",
          {k: round(v, 4) for k, v in bus.summary().items()
           if isinstance(v, float)})


if __name__ == "__main__":
    main()
