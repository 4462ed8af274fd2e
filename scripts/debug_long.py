"""Instrumented long-horizon golden run: drives the cached 60 s image
stack through PVIO and logs per-keyframe estimator health — position
error vs ground truth (gauge-aligned on the clean first 5 s), window
bias norms, track/plane populations, keyframe cadence — to localize
where and why a long run departs (the round-5 quarter-3 divergence).

    python scripts/debug_long.py [--no-planes] [--duration 60]
        [--cache .artifacts/golden60.npz] [--until 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-planes", action="store_true")
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--cache", default=".artifacts/golden60.npz")
    ap.add_argument("--until", type=float, default=None,
                    help="stop the drive at this time (s)")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VAL", help="config overrides")
    args = ap.parse_args()

    from pvio_tpu import PVIO, Config
    from pvio_tpu.geometry import nplie, wahba
    from pvio_tpu.io import synthetic
    from pvio_tpu.map.window import TF_PLANE, TF_VALID

    cfg = Config.from_yaml("config/euroc.yaml")
    cfg.dtype = "float64"
    if args.no_planes:
        cfg.enable_plane_constraint = False
    for kv in args.set:
        k, v = kv.split("=", 1)
        cur = getattr(cfg, k)
        setattr(cfg, k, type(cur)(eval(v)) if cur is not None else eval(v))
        print(f"override {k} = {getattr(cfg, k)}")

    scene = synthetic.make_scene(duration=args.duration, fps=20.0,
                                 imu_rate=200.0, n_points=8, seed=648,
                                 init_ramp=0.3, long_profile=True)
    images = np.load(args.cache)["images"]
    assert len(images) == len(scene.frame_t)

    vio = PVIO(cfg)
    core = vio.core

    # per-keyframe probe: wrap track_finish's keyframe bookkeeping
    from pvio_tpu.core import swt as swt_mod

    orig_finish = swt_mod.SlidingWindowTracker.track_finish
    state = {"last_kf": -1}

    def traced_finish(self, pend, fetched=None):
        ok = orig_finish(self, pend, fetched=fetched)
        hw = self.hw
        if ok and self.n_keyframes != state["last_kf"]:
            state["last_kf"] = self.n_keyframes
            t = float(hw.frame_t[hw.n_frames - 1])
            fi = int(round(t * 20.0))
            gt_p = scene.p_wb[min(fi, len(scene.p_wb) - 1)]
            est_p = hw.p[hw.n_frames - 1]
            valid = hw.track_mask & ((hw.track_flags & TF_VALID) != 0)
            plane_m = hw.track_mask & ((hw.track_flags & TF_PLANE) != 0)
            bg = np.linalg.norm(hw.bg[hw.n_frames - 1])
            ba = np.linalg.norm(hw.ba[hw.n_frames - 1])
            # window-median inverse depth of valid tracks (scale canary)
            invd = hw.inv_depth[valid | plane_m]
            invd_med = float(np.median(invd)) if len(invd) else np.nan
            print(f"kf {self.n_keyframes:4d} t={t:6.2f} "
                  f"|dp|={np.linalg.norm(est_p - gt_p):7.3f} "
                  f"valid={int(valid.sum()):3d} plane_tr={int(plane_m.sum()):3d} "
                  f"planes={int(hw.plane_mask.sum())} "
                  f"bg={bg:.4f} ba={ba:.3f} invd_med={invd_med:.3f}",
                  flush=True)
        return ok

    swt_mod.SlidingWindowTracker.track_finish = traced_finish

    fi = 0
    for k in range(len(scene.imu_t)):
        t = scene.imu_t[k]
        if args.until is not None and t > args.until:
            break
        vio.track_gyroscope(t, *scene.gyro[k])
        vio.track_accelerometer(t, *scene.accel[k])
        while fi < len(scene.frame_t) and scene.frame_t[fi] <= t:
            vio.track_camera(scene.frame_t[fi], images[fi])
            fi += 1

    traj = vio.get_trajectory()
    print(f"poses={len(traj)} reinits={core.frontend.n_reinits}")
    if traj:
        t2idx = {round(tt, 6): i for i, tt in enumerate(scene.frame_t)}
        import jax.numpy as jnp
        est, gt = [], []
        for (tt, q, p) in traj:
            i = t2idx.get(round(tt, 6))
            if i is not None:
                est.append(p)
                gt.append(scene.p_wb[i])
        est, gt = jnp.asarray(np.array(est)), jnp.asarray(np.array(gt))
        s, _, _ = wahba.find_srt(est, gt)
        print(f"ATE {float(wahba.ate_rmse(est, gt, with_scale=False)):.4f} "
              f"scale {float(s):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
