"""Golden-run harness: rendered textured-room imagery (with real lens
distortion) -> io/undistort -> full PVIO pipeline -> ATE vs ground truth.

This is the stand-in for the reference's EuRoC/TUM-VI dataset validation
(pvio-pc main.cpp:214-257 + trajectory.tum vs ground truth) while no real
datasets exist in this environment: production resolution, production
config (loaded from the same YAML schema), KLT-tracked dense imagery.

    python scripts/golden_run.py config/euroc.yaml [--duration 12] \
        [--cpu] [--dtype float64] [--no-planes] [--seed 648]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--duration", type=float, default=12.0)
    ap.add_argument("--fps", type=float, default=20.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--no-planes", action="store_true")
    ap.add_argument("--supplement", action="store_true",
                    help="keep member reprojection factors alongside the "
                         "plane factor (Config.plane_supplement)")
    ap.add_argument("--seed", type=int, default=648)
    ap.add_argument("--traj-scale", type=float, default=1.0,
                    help="spatial sweep scale; <= 0.6 keeps the init "
                         "baseline under the reference scale gate")
    ap.add_argument("--init-ramp", type=float, default=0.0,
                    help="smooth spatial-sweep ramp floor (>0 keeps the "
                         "init baseline under the production scale gate "
                         "without shrinking the rest of the trajectory)")
    ap.add_argument("--long-profile", action="store_true",
                    help="60+ s profile: drifting loops + aggressive "
                         "yaw/pitch burst at t=25-35 s")
    ap.add_argument("--blackout", nargs=2, type=float, default=None,
                    metavar=("T0", "T1"),
                    help="feed black frames for t in [T0, T1) (forces "
                         "tracking loss + re-init mid-run)")
    ap.add_argument("--cache-images", default=None,
                    help=".npz path: render once, reuse across runs "
                         "(uint8, post-undistortion, pre-blackout)")
    ap.add_argument("--max-scale", type=float, default=5.0,
                    help="initializer_max_scale override (1.0 = the "
                         "reference production gate, initializer.cpp:216)")
    ap.add_argument("--imu-noise", type=float, default=0.0,
                    help="gyro/accel noise scale (0 = ideal IMU)")
    ap.add_argument("--cauchy", type=float, default=None,
                    help="override Config.cauchy_scale")
    ap.add_argument("--fb", type=float, default=None,
                    help="override forward-backward KLT gate (px, 0=off)")
    ap.add_argument("--pixel-noise", type=float, default=0.0,
                    help="additive Gaussian image noise sigma in 8-bit counts "
                         "(hard mode: degrades KLT so structural priors matter)")
    ap.add_argument("--max-kp", type=int, default=None,
                    help="override keypoint detection budget (hard mode)")
    ap.add_argument("--noise-after", type=float, default=0.0,
                    help="apply --pixel-noise only after this time (s): "
                         "clean initialization, then degraded tracking")
    ap.add_argument("--escape-dist", type=float, default=None,
                    help="override plane_escape_distance (m): the 0.1 m "
                         "reference gate is too coarse to shed mm-regime "
                         "bad adoptions")
    ap.add_argument("--kp-sigma", type=float, default=None,
                    help="declared keypoint noise sigma in px (reference "
                         "camera.noise config) — raise for noisy imagery")
    ap.add_argument("--texture-seed", type=int, default=7,
                    help="room texture seed — the engine's RANSAC seeds are "
                         "fixed (seed 648, config.cpp:91-93), so run-to-run "
                         "variation must come from the imagery itself")
    ap.add_argument("--save-frames", default=None,
                    help="directory to dump a few rendered+undistorted PNGs")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from pvio_tpu import PVIO, Config
    from pvio_tpu.geometry import wahba
    from pvio_tpu.io import synthetic
    from pvio_tpu.io.undistort import ImageUndistorter

    cfg = Config.from_yaml(args.config)
    cfg.dtype = args.dtype
    cfg.initializer_max_scale = args.max_scale
    if "tum" in args.config:
        cfg.image_size = (512, 512)
    if args.no_planes:
        cfg.enable_plane_constraint = False
    if args.supplement:
        cfg.plane_supplement = True
    if args.cauchy is not None:
        cfg.cauchy_scale = args.cauchy
    if args.fb is not None:
        cfg.feature_tracker_fb_threshold = args.fb
    if args.max_kp is not None:
        cfg.feature_tracker_max_keypoint_detection = args.max_kp
    if args.kp_sigma is not None:
        import numpy as _np
        cfg.camera_noise_cov = _np.eye(2) * args.kp_sigma ** 2
    if args.escape_dist is not None:
        cfg.plane_escape_distance = args.escape_dist

    scene = synthetic.make_scene(
        duration=args.duration, fps=args.fps, imu_rate=200.0,
        n_points=8, seed=args.seed, traj_scale=args.traj_scale,
        init_ramp=args.init_ramp, long_profile=args.long_profile,
        gyro_noise=1e-3 * args.imu_noise, accel_noise=1e-2 * args.imu_noise,
    )
    und = ImageUndistorter(cfg.K, cfg.camera_distortion,
                           cfg.camera_distortion_model, cfg.image_size)

    q_bc = np.asarray(cfg.q_bc)
    p_bc = np.asarray(cfg.p_bc)

    noise_rng = np.random.default_rng(args.seed + 1)

    cached = None
    if args.cache_images and os.path.exists(args.cache_images):
        cached = np.load(args.cache_images)["images"]
        assert len(cached) == len(scene.frame_t), (
            f"cache has {len(cached)} frames, scene {len(scene.frame_t)} — "
            "delete the stale cache")
        print(f"loaded {len(cached)} cached frames from {args.cache_images}",
              file=sys.stderr)

    def render_image(fi):
        if cached is not None:
            return cached[fi]
        img = synthetic.render_frame_room(
            scene, fi, cfg.K, cfg.image_size, q_bc=q_bc, p_bc=p_bc,
            distortion=cfg.camera_distortion,
            distortion_model=cfg.camera_distortion_model,
            seed=args.texture_seed)
        u8f = img * 255.0
        if args.pixel_noise > 0 and scene.frame_t[fi] >= args.noise_after:
            u8f = u8f + noise_rng.normal(size=u8f.shape) * args.pixel_noise
        u8 = np.clip(u8f + 0.5, 0, 255).astype(np.uint8)
        return np.asarray(und.apply(u8))

    if args.cache_images and cached is None:
        t0 = time.perf_counter()
        stack = np.stack([render_image(fi) for fi in range(len(scene.frame_t))])
        np.savez_compressed(args.cache_images, images=stack)
        cached = stack
        print(f"rendered+cached {len(stack)} frames in "
              f"{time.perf_counter() - t0:.0f}s -> {args.cache_images}",
              file=sys.stderr)

    def make_image(fi):
        if args.blackout is not None and \
                args.blackout[0] <= scene.frame_t[fi] < args.blackout[1]:
            H, W = cfg.image_size[1], cfg.image_size[0]
            return np.zeros((H, W), np.uint8)
        return render_image(fi)

    if args.save_frames:
        os.makedirs(args.save_frames, exist_ok=True)
        for fi in [0, 1]:
            raw = synthetic.render_frame_room(
                scene, fi, cfg.K, cfg.image_size, q_bc=q_bc, p_bc=p_bc,
                distortion=cfg.camera_distortion,
                distortion_model=cfg.camera_distortion_model)
            try:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                plt.imsave(f"{args.save_frames}/raw_{fi}.png", raw, cmap="gray")
                plt.imsave(f"{args.save_frames}/und_{fi}.png", make_image(fi),
                           cmap="gray")
            except Exception as e:
                print("save failed:", e)

    vio = PVIO(cfg)
    n_frames = len(scene.frame_t)
    fi = 0
    t_render = t_pipe = 0.0
    t_start = time.perf_counter()
    for k in range(len(scene.imu_t)):
        t = scene.imu_t[k]
        vio.track_gyroscope(t, *scene.gyro[k])
        vio.track_accelerometer(t, *scene.accel[k])
        while fi < n_frames and scene.frame_t[fi] <= t:
            t0 = time.perf_counter()
            img = make_image(fi)
            t1 = time.perf_counter()
            vio.track_camera(scene.frame_t[fi], img)
            t_render += t1 - t0
            t_pipe += time.perf_counter() - t1
            fi += 1
            if fi % 20 == 0:
                print(f"  frame {fi}/{n_frames} init={vio.initialized} "
                      f"reinits={vio.core.frontend.n_reinits} "
                      f"render {t_render / fi * 1e3:.0f}ms/f "
                      f"pipe {t_pipe / fi * 1e3:.0f}ms/f", file=sys.stderr)

    traj = vio.get_trajectory()
    print(f"total {time.perf_counter() - t_start:.1f}s "
          f"(render {t_render:.1f}s, pipeline {t_pipe:.1f}s), "
          f"{len(traj)} poses, init={vio.initialized}, "
          f"reinits={vio.core.frontend.n_reinits}")
    if not traj:
        print("NO TRAJECTORY")
        return 1

    import jax.numpy as jnp

    t2idx = {round(tt, 6): i for i, tt in enumerate(scene.frame_t)}
    est, gt = [], []
    for (tt, q, p) in traj:
        i = t2idx.get(round(tt, 6))
        if i is not None:
            est.append(p)
            gt.append(scene.p_wb[i])
    est = jnp.asarray(np.array(est))
    gt = jnp.asarray(np.array(gt))
    s, _, _ = wahba.find_srt(est, gt)
    ate = float(wahba.ate_rmse(est, gt, with_scale=False))
    print(f"ATE {ate:.4f} m over {len(est)} poses, scale {float(s):.4f}, "
          f"planes={len(vio.get_planes())}, "
          f"map_points={len(vio.get_map_points())}")
    # drift profile: ATE of each trajectory quarter (aligned per segment)
    nq = len(est) // 4
    for k in range(4):
        seg = slice(k * nq, (k + 1) * nq if k < 3 else len(est))
        if seg.stop - seg.start < 5:
            continue
        a = float(wahba.ate_rmse(est[seg], gt[seg], with_scale=False))
        print(f"  quarter {k}: ATE {a:.4f} m over {seg.stop - seg.start}")
    if args.blackout is not None:
        # separate gauges before/after the forced re-init
        ts = np.array([tt for (tt, q, p) in traj
                       if t2idx.get(round(tt, 6)) is not None])
        pre = ts < args.blackout[0]
        post = ts >= args.blackout[1]
        for name, m in (("pre-blackout", pre), ("post-recovery", post)):
            if m.sum() < 10:
                print(f"  {name}: only {int(m.sum())} poses")
                continue
            e, g = est[np.nonzero(m)[0]], gt[np.nonzero(m)[0]]
            s_seg, _, _ = wahba.find_srt(e, g)
            a = float(wahba.ate_rmse(e, g, with_scale=False))
            print(f"  {name}: ATE {a:.4f} m over {int(m.sum())} poses, "
                  f"scale {float(s_seg):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
