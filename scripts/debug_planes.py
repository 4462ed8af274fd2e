"""Instrument plane-detection gating during a golden-run sequence: prints
per-keyframe counts for each gate of PlaneExtractor.issue_detection, to
diagnose why no plane is detected on a given scene/config."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pvio_tpu import PVIO, Config
from pvio_tpu.core import plane_extractor as pe_mod
from pvio_tpu.io import synthetic
from pvio_tpu.io.undistort import ImageUndistorter
from pvio_tpu.map.window import TF_PLANE, TF_VALID

cfg = Config.from_yaml(sys.argv[1] if len(sys.argv) > 1 else "config/euroc.yaml")
cfg.dtype = "float64"
cfg.initializer_max_scale = 5.0
duration = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0

orig_issue = pe_mod.PlaneExtractor.issue_detection


def traced_issue(self, hw):
    m1_ = (hw.track_mask & (hw.track_flags & TF_VALID).astype(bool)
           & ~(hw.track_flags & TF_PLANE).astype(bool))
    if m1_.any():
        lp = np.percentile(hw.track_life[m1_], [50, 90, 100])
        print(f"  [life dist] valid tracks life p50/p90/max = {lp}", flush=True)
    pts = self._landmarks(hw)
    is_valid = (hw.track_flags & TF_VALID).astype(bool)
    is_plane = (hw.track_flags & TF_PLANE).astype(bool)
    baseline = self._baseline(hw, pts)
    m0 = hw.track_mask
    m1 = m0 & is_valid & ~is_plane
    m2 = m1 & (hw.track_life >= self.min_track_life)
    m3 = m2 & (hw.quality < 2.0)
    bl_ok = ((baseline > 0.5)
             | ((hw.inv_depth < 5.0) & (baseline * np.abs(hw.inv_depth) > 0.5)))
    m4 = m3 & bl_ok
    print(f"  [plane gate] mask={m0.sum()} valid&free={m1.sum()} "
          f"life>={self.min_track_life}:{m2.sum()} qual:{m3.sum()} "
          f"baseline:{m4.sum()} (need {self.min_inliers}) "
          f"bl p50={np.median(baseline[m3]) if m3.any() else -1:.2f} "
          f"life p50={np.median(hw.track_life[m1]) if m1.any() else -1:.0f} "
          f"qual p50={np.median(hw.quality[m1]) if m1.any() else -1:.2f}",
          flush=True)
    out = orig_issue(self, hw)
    return out


def traced_promote(self, hw):
    p = getattr(self, "_pending", None)
    if p is not None and "count" in p:
        print(f"  [plane ransac] inliers={p['count']} "
              f"(need > {self.min_inliers})", flush=True)
    return orig_promote(self, hw)


orig_promote = pe_mod.PlaneExtractor.promote_pending
pe_mod.PlaneExtractor.issue_detection = traced_issue
pe_mod.PlaneExtractor.promote_pending = traced_promote

# count column releases + invalidation events per frame
from pvio_tpu.core import host_window as hwmod
from pvio_tpu.core import swt as swt_mod

_rel_count = [0]
_rel_by = {}
_orig_release = hwmod.HostWindow.release_column


def traced_release(self, c):
    _rel_count[0] += 1
    caller = sys._getframe(1).f_code.co_name
    nobs = int((self.obs_mask[:, c] & self.frame_mask).sum())
    slots = np.nonzero(self.obs_mask[:, c] & self.frame_mask)[0]
    key = (caller, int(self.track_flags[c]) & 3, nobs,
           tuple(slots[:2]) if nobs <= 2 else ("3+",))
    _rel_by[key] = _rel_by.get(key, 0) + 1
    return _orig_release(self, c)


hwmod.HostWindow.release_column = traced_release

_orig_kfc = swt_mod.SlidingWindowTracker._keyframe_check


def traced_kfc(self, no_kf, p80, n_common):
    r = _orig_kfc(self, no_kf, p80, n_common)
    print(f"  [kf check] p80={p80:.1f}px n_common={n_common} "
          f"skipped={self.skipped_frames} -> keyframe={r}", flush=True)
    return r


swt_mod.SlidingWindowTracker._keyframe_check = traced_kfc

_orig_track = swt_mod.SlidingWindowTracker.track


def traced_track(self, raw_new):
    hw = self.hw
    valid_before = (hw.track_mask
                    & ((hw.track_flags & (TF_VALID | TF_PLANE)) != 0)).copy()
    life_before = hw.track_life.copy()
    _rel_count[0] = 0
    okr = _orig_track(self, raw_new)
    valid_after = hw.track_mask & ((hw.track_flags & (TF_VALID | TF_PLANE)) != 0)
    # columns that WERE valid and are now gone or invalid
    lost = valid_before & ~valid_after
    if lost.sum() > 5 or _rel_count[0] > 40:
        kf_slots_ = np.nonzero(hw.keyframe & hw.frame_mask)[0]
        top = sorted(_rel_by.items(), key=lambda kv: -kv[1])[:6]
        print(f"  [churn] frame {raw_new.id}: lost_valid={int(lost.sum())} "
              f"released={_rel_count[0]} "
              f"n_valid {int(valid_before.sum())}->{int(valid_after.sum())} "
              f"kf_slots={list(kf_slots_)} n_frames={hw.n_frames}", flush=True)
        for k, v in top:
            print(f"      release {v:4d} x (caller={k[0]}, flags={k[1]}, "
                  f"nobs={k[2]}, slots={k[3]})", flush=True)
    _rel_by.clear()
    return okr


swt_mod.SlidingWindowTracker.track = traced_track

scene = synthetic.make_scene(duration=duration, fps=20.0, imu_rate=200.0,
                             n_points=8, seed=648)
und = ImageUndistorter(cfg.K, cfg.camera_distortion,
                       cfg.camera_distortion_model, cfg.image_size)
q_bc, p_bc = np.asarray(cfg.q_bc), np.asarray(cfg.p_bc)
vio = PVIO(cfg)

# wrap the fused keyframe solve: report what the post-solve gates did
kern = vio.core.kernels
_orig_ba_step = kern.ba_step


def traced_ba_step(w_in, *args):
    w_out, info, xw, tri = _orig_ba_step(w_in, *args)
    fi_ = np.array(w_in.track_flags)
    fo = np.array(w_out.track_flags)
    tm = np.array(w_in.track_mask)
    vi = tm & ((fi_ & 1) != 0)
    vo = tm & ((fo & 1) != 0)
    qual = np.array(w_out.quality)
    invd_i = np.array(w_in.inv_depth)
    invd_o = np.array(w_out.inv_depth)
    lost = vi & ~vo
    if lost.sum() > 3:
        print(f"  [ba gates] lost {int(lost.sum())}/{int(vi.sum())} valid: "
              f"inv_d in p10/50/90 of lost = "
              f"{np.percentile(invd_i[lost], [10, 50, 90]).round(3)} "
              f"-> out {np.percentile(invd_o[lost], [10, 50, 90]).round(3)}, "
              f"qual of lost p50={np.median(qual[lost]):.2f} "
              f"cost {float(info['initial_cost']):.3g}->"
              f"{float(info['final_cost']):.3g}", flush=True)
    if vo.any():
        life = args[-2] if len(args) >= 2 else None
        life = np.asarray(life) if life is not None else np.zeros_like(qual)
        young = vo & (life <= 4)
        old = vo & (life > 4)
        nobs = (np.array(w_in.obs_mask)
                & np.array(w_in.frame_mask)[:, None]).sum(axis=0)
        print(f"  [ba qual] valid_out={int(vo.sum())} "
              f"young({int(young.sum())}) p50="
              f"{np.median(qual[young]) if young.any() else -1:.2f} "
              f"old({int(old.sum())}) p50="
              f"{np.median(qual[old]) if old.any() else -1:.2f} "
              f"old>3px={int((qual[old] > 3).sum())} "
              f"acc={int(info['accepted'])} lam={float(info['lambda']):.2e} "
              f"cost {float(info['initial_cost']):.3g}->"
              f"{float(info['final_cost']):.3g}", flush=True)
    # dump 3 worst young tracks: per-obs pixel residuals from w_out
    life = np.asarray(args[-2])
    young_bad = vo & (life <= 4) & (qual > 4.0)
    if young_bad.sum() >= 3:
        from pvio_tpu.geometry import nplie

        q = np.array(w_out.q)
        p = np.array(w_out.p)
        fmask = np.array(w_out.frame_mask)
        obs = np.array(w_out.obs_mask) & fmask[:, None]
        kp = np.array(w_out.kp)
        ref = np.array(w_out.ref_frame)
        invd = np.array(w_out.inv_depth)
        q_bc = np.asarray(cfg.q_bc)
        p_bc = np.asarray(cfg.p_bc)
        fx = cfg.K[0, 0]
        for c in np.nonzero(young_bad)[0][:3]:
            r = ref[c]
            q_wc = nplie.quat_mul(q[r], q_bc)
            o = p[r] + nplie.quat_to_mat(q[r]) @ p_bc
            bear = nplie.quat_to_mat(q_wc) @ np.array([kp[r, c, 0],
                                                       kp[r, c, 1], 1.0])
            x = o + bear / invd[c]
            errs = []
            for f in np.nonzero(obs[:, c])[0]:
                q_f = nplie.quat_mul(q[f], q_bc)
                of = p[f] + nplie.quat_to_mat(q[f]) @ p_bc
                y = nplie.quat_to_mat(q_f).T @ (x - of)
                e = np.hypot(y[0] / y[2] - kp[f, c, 0],
                             y[1] / y[2] - kp[f, c, 1]) * fx
                errs.append((int(f), round(float(e), 2)))
            # same residuals under GROUND-TRUTH poses (obs vs geometry):
            # triangulate from the track's own obs at true poses via DLT
            t2i = {round(tt, 6): i for i, tt in enumerate(scene.frame_t)}
            t_frames = np.asarray(args[4])
            slots = np.nonzero(obs[:, c])[0]
            Ps, zs = [], []
            okgt = True
            for f in slots:
                i = t2i.get(round(float(t_frames[f]), 6))
                if i is None:
                    okgt = False
                    break
                qt = nplie.quat_mul(scene.q_wb[i], q_bc)
                pt = scene.p_wb[i] + nplie.quat_to_mat(scene.q_wb[i]) @ p_bc
                R = nplie.quat_to_mat(qt).T
                Ps.append(np.hstack([R, (-R @ pt)[:, None]]))
                zs.append(kp[f, c])
            gterrs = []
            if okgt and len(Ps) >= 2:
                A = np.vstack([
                    np.vstack([z[0] * P[2] - P[0], z[1] * P[2] - P[1]])
                    for P, z in zip(Ps, zs)])
                _, _, Vt = np.linalg.svd(A)
                X = Vt[-1]
                X = X[:3] / X[3]
                for P, z, f in zip(Ps, zs, slots):
                    y = P @ np.concatenate([X, [1.0]])
                    gterrs.append((int(f), round(float(np.hypot(
                        y[0] / y[2] - z[0], y[1] / y[2] - z[1]) * fx), 2)))
            print(f"      young col {c}: ref={r} inv_d={invd[c]:.3f} "
                  f"life={life[c]} obs_err_px={errs} GT_err={gterrs}",
                  flush=True)
    return w_out, info, xw, tri


kern.ba_step = traced_ba_step

_orig_marg = kern.marg_step


def traced_marg(w_in, *args):
    w_out = _orig_marg(w_in, *args)
    tm = np.array(w_in.track_mask)
    vi = tm & ((np.array(w_in.track_flags) & 3) != 0)
    vo = tm & ((np.array(w_out.track_flags) & 3) != 0)
    lost = vi & ~vo
    if lost.sum() > 3:
        ref = np.array(w_in.ref_frame)
        nobs = (np.array(w_in.obs_mask)
                & np.array(w_in.frame_mask)[:, None]).sum(axis=0)
        print(f"  [marg] lost {int(lost.sum())}/{int(vi.sum())} valid, "
              f"ref of lost: {np.bincount(ref[lost])}, "
              f"nobs of lost p50={np.median(nobs[lost]):.0f}", flush=True)
    return w_out


kern.marg_step = traced_marg

_orig_pnp = kern.pnp_step
_t2i = {}


def traced_pnp(w, tp, wp, ap, mp, t_new, tail_idx, z_obs, pnp_mask,
               obs_new, kf_idx):
    out = _orig_pnp(w, tp, wp, ap, mp, t_new, tail_idx, z_obs, pnp_mask,
                    obs_new, kf_idx)
    q1, p1 = np.array(out[0]), np.array(out[1])
    ti = int(tail_idx)
    q_t = np.array(w.q[ti])
    p_t = np.array(w.p[ti])
    v_t = np.array(w.v[ti])
    # GT relative motion tail->new
    tn = float(t_new)
    i_new = _t2i.get(round(tn, 6))
    i_tail = None
    # find tail frame time among scene frames by nearest
    # (tail state time == its frame time)
    tt = None
    for k2, v2 in _t2i.items():
        pass
    from pvio_tpu.geometry import nplie as _nl

    if i_new is not None and i_new >= 1:
        i_tail = i_new - 1
        dp_gt = scene.p_wb[i_new] - scene.p_wb[i_tail]
        dp_est = p1 - p_t
        v_gt = scene.v_wb[i_tail]
        dq_gt = _nl.quat_mul(_nl.quat_conj(scene.q_wb[i_tail]),
                             scene.q_wb[i_new])
        dq_est = _nl.quat_mul(_nl.quat_conj(q_t), q1)
        ang = 2 * np.arccos(np.clip(abs(np.dot(dq_gt, dq_est)), -1, 1))
        nv = int(np.array(pnp_mask).sum())
        bg_t = np.array(w.bg[ti])
        ba_t = np.array(w.ba[ti])
        print(f"  [pnp] t={tn:.2f} "
              f"|dp|_est/gt={np.linalg.norm(dp_est) * 1e3:.0f}/"
              f"{np.linalg.norm(dp_gt) * 1e3:.0f}mm "
              f"dq_err={np.degrees(ang):.3f}deg "
              f"bg={bg_t.round(4)} ba={ba_t.round(3)} n_pnp={nv}", flush=True)
    return out


kern.pnp_step = traced_pnp

for _i, _t in enumerate(scene.frame_t):
    _t2i[round(float(_t), 6)] = _i

# instrument the initializer: SfM rotation accuracy + imu-init outputs
from pvio_tpu.core import initializer as init_mod
from pvio_tpu.geometry import nplie as _nl2

_orig_sfm = init_mod.Initializer._init_sfm
_orig_imu_init = init_mod.Initializer._init_imu


def traced_sfm(self, hw):
    ok = _orig_sfm(self, hw)
    if ok:
        n = hw.n_frames
        errs = []
        for j in range(1, n):
            i0 = _t2i.get(round(float(hw.frame_t[j - 1]), 6))
            i1 = _t2i.get(round(float(hw.frame_t[j]), 6))
            if i0 is None or i1 is None:
                continue
            dq_gt = _nl2.quat_mul(_nl2.quat_conj(scene.q_wb[i0]),
                                  scene.q_wb[i1])
            dq_est = _nl2.quat_mul(_nl2.quat_conj(hw.q[j - 1]), hw.q[j])
            ang = 2 * np.arccos(np.clip(abs(np.dot(dq_gt, dq_est)), -1, 1))
            errs.append(np.degrees(ang))
        nval = int(((hw.track_flags & TF_VALID) != 0).sum())
        print(f"  [init sfm] ok, rel-rot err deg per pair = "
              f"{np.array(errs).round(3)} valid={nval} "
              f"qual p50={np.median(hw.quality[(hw.track_flags & 1) != 0]):.2f}",
              flush=True)
    else:
        print("  [init sfm] FAILED gate", flush=True)
    return ok


def traced_imu_init(self, hw):
    ok = _orig_imu_init(self, hw)
    print(f"  [init imu] ok={ok} bg={hw.bg[0].round(4)} "
          f"v0={hw.v[0].round(3)}", flush=True)
    return ok


init_mod.Initializer._init_sfm = traced_sfm
init_mod.Initializer._init_imu = traced_imu_init

fi = 0
for k in range(len(scene.imu_t)):
    t = scene.imu_t[k]
    vio.track_gyroscope(t, *scene.gyro[k])
    vio.track_accelerometer(t, *scene.accel[k])
    while fi < len(scene.frame_t) and scene.frame_t[fi] <= t:
        img = synthetic.render_frame_room(
            scene, fi, cfg.K, cfg.image_size, q_bc=q_bc, p_bc=p_bc,
            distortion=cfg.camera_distortion,
            distortion_model=cfg.camera_distortion_model)
        u8 = (img * 255.0 + 0.5).astype(np.uint8)
        vio.track_camera(scene.frame_t[fi], und.apply(u8))
        fi += 1
print("planes:", len(vio.get_planes()), "init:", vio.initialized)
