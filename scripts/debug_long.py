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
    ap.add_argument("--churn-from", type=float, default=1e9)
    ap.add_argument("--churn-to", type=float, default=1e9)
    ap.add_argument("--gt-imu-check", action="store_true",
                    help="each keyframe, preintegrate the ENGINE's window "
                         "spans at zero bias and report the worst residual "
                         "vs ground truth (nonzero = span plumbing bug)")
    ap.add_argument("--agg-scale", type=float, default=1.0,
                    help="burst amplitude (0 = no aggressive segment)")
    ap.add_argument("--pinhole", action="store_true",
                    help="with --render: render UNDISTORTED pinhole frames "
                         "directly (no distort->undistort resampling chain)")
    ap.add_argument("--render", action="store_true",
                    help="render frames instead of using --cache (for "
                         "scene variants with no cache)")
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
                                 init_ramp=0.3, long_profile=True,
                                 agg_scale=args.agg_scale)
    if args.render:
        from pvio_tpu.io.undistort import ImageUndistorter
        und = ImageUndistorter(cfg.K, cfg.camera_distortion,
                               cfg.camera_distortion_model, cfg.image_size)
        q_bc, p_bc = np.asarray(cfg.q_bc), np.asarray(cfg.p_bc)
        n_render = sum(scene.frame_t <= (args.until or args.duration))
        images = []
        for fi in range(n_render + 1 if n_render < len(scene.frame_t)
                        else n_render):
            if args.pinhole:
                img = synthetic.render_frame_room(
                    scene, fi, cfg.K, cfg.image_size, q_bc=q_bc, p_bc=p_bc)
                images.append((img * 255.0 + 0.5).astype(np.uint8))
            else:
                img = synthetic.render_frame_room(
                    scene, fi, cfg.K, cfg.image_size, q_bc=q_bc, p_bc=p_bc,
                    distortion=cfg.camera_distortion,
                    distortion_model=cfg.camera_distortion_model)
                images.append(und.apply((img * 255.0 + 0.5).astype(np.uint8)))
            if (fi + 1) % 100 == 0:
                print(f"  rendered {fi + 1}/{n_render}", flush=True)
    else:
        images = np.load(args.cache)["images"]
        assert len(images) == len(scene.frame_t)

    vio = PVIO(cfg)
    core = vio.core

    # per-keyframe probe: wrap track_finish's keyframe bookkeeping
    from pvio_tpu.core import swt as swt_mod
    from pvio_tpu.utils.forensics import bus as forensics_bus

    orig_finish = swt_mod.SlidingWindowTracker.track_finish
    state = {"last_kf": -1, "R": None, "tr": None, "s": 1.0, "est": [],
             "gt": []}

    def traced_finish(self, pend, fetched=None):
        ok = orig_finish(self, pend, fetched=fetched)
        hw = self.hw
        if ok and self.n_keyframes != state["last_kf"]:
            state["last_kf"] = self.n_keyframes
            t = float(hw.frame_t[hw.n_frames - 1])
            fi = int(round(t * 20.0))
            gt_p = scene.p_wb[min(fi, len(scene.p_wb) - 1)]
            est_p = np.asarray(hw.p[hw.n_frames - 1], float)
            state["est"].append(est_p)
            state["gt"].append(np.asarray(gt_p, float))
            # fit the VIO->world gauge on the clean early segment once
            if state["R"] is None and t >= 8.0:
                import jax.numpy as jnp
                E = jnp.asarray(np.array(state["est"]))
                G = jnp.asarray(np.array(state["gt"]))
                s_, R_, tr_ = wahba.find_srt(E, G)
                state["s"], state["R"], state["tr"] = \
                    float(s_), np.asarray(R_, float), np.asarray(tr_, float)
                print(f"  [gauge] fit at t={t:.2f}: scale {state['s']:.4f}")
            valid = hw.track_mask & ((hw.track_flags & TF_VALID) != 0)
            plane_m = hw.track_mask & ((hw.track_flags & TF_PLANE) != 0)
            bg = np.linalg.norm(hw.bg[hw.n_frames - 1])
            ba = np.linalg.norm(hw.ba[hw.n_frames - 1])
            invd = hw.inv_depth[valid | plane_m]
            invd_med = float(np.median(invd)) if len(invd) else np.nan
            if state["R"] is not None:
                pw = state["s"] * state["R"] @ est_p + state["tr"]
                vw = state["s"] * state["R"] @ np.asarray(
                    hw.v[hw.n_frames - 1], float)
                gt_v = scene.v_wb[min(fi, len(scene.v_wb) - 1)]
                dp = np.linalg.norm(pw - gt_p)
                dv = np.linalg.norm(vw - gt_v)
            else:
                dp = dv = np.nan
            gt_res = ""
            if args.gt_imu_check:
                from pvio_tpu.imu import preintegration as pre
                import jax.numpy as jnp
                noise = pre.ImuNoise(
                    cov_w=jnp.asarray(cfg.imu_cov_g), cov_a=jnp.asarray(cfg.imu_cov_a),
                    cov_bg=jnp.asarray(cfg.imu_cov_bg), cov_ba=jnp.asarray(cfg.imu_cov_ba))
                Gv = np.array([0.0, 0.0, -pre.GRAVITY_NOMINAL])
                worst = 0.0
                z3 = jnp.zeros(3)
                for j in range(1, hw.n_frames):
                    tsj = hw.imu_ts[j]
                    if tsj is None or len(tsj) == 0:
                        continue
                    d = pre.preintegrate(
                        jnp.asarray(tsj), jnp.asarray(hw.imu_w[j]),
                        jnp.asarray(hw.imu_a[j]),
                        jnp.ones(len(tsj), bool),
                        jnp.asarray(float(hw.frame_t[j])), z3, z3, noise,
                        compute_covariance=False)
                    f0 = int(round(float(hw.frame_t[j - 1]) * 20.0))
                    f1 = int(round(float(hw.frame_t[j]) * 20.0))
                    q0, p0, v0 = scene.q_wb[f0], scene.p_wb[f0], scene.v_wb[f0]
                    p1c, v1c = scene.p_wb[f1], scene.v_wb[f1]
                    dtj = float(hw.frame_t[j]) - float(hw.frame_t[j - 1])
                    R0T = nplie.quat_to_mat(q0).T
                    pres = R0T @ (p1c - p0 - v0 * dtj - 0.5 * Gv * dtj * dtj)                         - np.asarray(d.p)
                    vres = R0T @ (v1c - v0 - Gv * dtj) - np.asarray(d.v)
                    worst = max(worst, np.linalg.norm(pres), np.linalg.norm(vres))
                gt_res = f" gtres={worst:.2e}"
            info = forensics_bus.get("solver_info") or {}
            print(f"kf {self.n_keyframes:4d} t={t:6.2f} "
                  f"dp={dp:7.3f} dv={dv:6.3f} "
                  f"valid={int(valid.sum()):3d} plane_tr={int(plane_m.sum()):3d} "
                  f"planes={int(hw.plane_mask.sum())} "
                  f"bg={bg:.4f} ba={ba:.3f} invd_med={invd_med:.3f} "
                  f"cost {info.get('initial_cost', -1):9.1f} -> "
                  f"{info.get('final_cost', -1):9.1f} "
                  f"it={int(info.get('iterations', -1))}" + gt_res,
                  flush=True)
        return ok

    swt_mod.SlidingWindowTracker.track_finish = traced_finish

    # per-frame churn attribution inside [--churn-from, --churn-to)
    from pvio_tpu.core import host_window as hwmod

    _rel_by = {}
    _orig_release = hwmod.HostWindow.release_column

    def traced_release(self, c):
        caller = sys._getframe(1).f_code.co_name
        nobs = int((self.obs_mask[:, c] & self.frame_mask).sum())
        q = self.quality[c]
        key = (caller, int(self.track_flags[c]) & 3, nobs,
               "inf" if not np.isfinite(q) else round(float(q), 1))
        _rel_by[key] = _rel_by.get(key, 0) + 1
        return _orig_release(self, c)

    hwmod.HostWindow.release_column = traced_release

    _orig_tf2 = swt_mod.SlidingWindowTracker.track_finish

    def churn_finish(self, pend, fetched=None):
        hw = self.hw
        t = pend["raw_new"].t
        on = args.churn_from <= t < args.churn_to
        if on:
            vb = (hw.track_mask
                  & ((hw.track_flags & (TF_VALID | TF_PLANE)) != 0)).copy()
            _rel_by.clear()
        ok = _orig_tf2(self, pend, fetched=fetched)
        if on:
            va = hw.track_mask & ((hw.track_flags & (TF_VALID | TF_PLANE)) != 0)
            lost = vb & ~va
            qv = hw.quality[va] if va.any() else np.array([np.nan])
            ninf = int(np.isinf(hw.quality[vb & hw.track_mask]).sum())                 if vb.any() else 0
            print(f"  [churn] t={t:.2f} valid {int(vb.sum())}->{int(va.sum())}"
                  f" lost={int(lost.sum())} q_p50={np.nanmedian(qv):.2f}"
                  f" q_p90={np.nanpercentile(qv, 90):.2f} q_inf(before)={ninf}",
                  flush=True)
            for k, v in sorted(_rel_by.items(), key=lambda kv: -kv[1])[:5]:
                print(f"      release {v:3d} x (caller={k[0]}, flags={k[1]}, "
                      f"nobs={k[2]}, qual={k[3]})", flush=True)
        return ok

    swt_mod.SlidingWindowTracker.track_finish = churn_finish

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
