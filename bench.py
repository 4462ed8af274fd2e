"""Benchmark: steady-state VIO pipeline frames per second on the attached
accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured unit of work is one pipeline FRAME at the production shape —
fused frontend step (CLAHE + pyramid + pyramidal KLT + F-RANSAC gate +
Shi-Tomasi/Poisson-disk detect on a 480x752 image), fused motion step
(IMU preintegration + predict + visual-inertial PnP), and, every 4th
frame (the keyframe cadence), the fused keyframe step (delta attach +
10-iteration plane-augmented visual-inertial bundle adjustment over an
8-keyframe window with 256 tracks + plane-track escape) plus the fused
marginalization step (Schur elimination of the oldest frame). That is the
whole per-frame compute of the reference pipeline
(feature_tracker.cpp:37-141, pnp.cpp:32-100, bundle_adjustor.cpp:63-599).
The baseline is the reference's real-time budget of 30 fps (pvio-pc
main.cpp:30 TARGET_FPS) — vs_baseline = value / 30.

The chain is COUPLED: PnP consumes the KLT-tracked keypoints through a
static detector-slot -> window-column association (the frontend keeps
keypoint state in stable device slots), normalized in-graph — not an
oracle observation ring. Associations whose slot dies are dropped for
the rest of the chain, as host track-id association would.

All stages are chained IN-GRAPH (lax.scan over frame groups inside one
jit): the serving environment caches whole dispatches by input hash, so
per-call host timing measures RTT, not compute. Every kernel is
fixed-shape / fixed-iteration, so timing is data-independent.

KF_EVERY=4 models the keyframe cadence: the real gate is a host decision
(rotation-compensated parallax, computed in-graph but thresholded on
host) and cannot branch inside one jitted chain; measured cadence on the
golden runs is a keyframe every 2-6 frames, so every-4th is
representative, and detection runs EVERY frame here (the pipeline's
detect-skip would only make this number better).

Secondary diagnostics (solver-only rates, per-stage times) go to stderr.
"""

import argparse
import json
import sys
import time


def _build_pipeline_inputs(cfg, dtype, n_chain_frames):
    """Host-side: rendered image sequence + a plane-flagged flagship
    window with per-frame IMU spans.

    The images are gaussian-splat renders of the SCENE LANDMARKS at
    production resolution, so the frontend's detected corners ARE the
    window's tracks — the KLT-tracked keypoints can then feed PnP
    directly through a static slot->column association (VERDICT round 3
    item 3: the bench must time the COUPLED pipeline, not
    frontend-compute + estimator-compute on oracle observations)."""
    import jax.numpy as jnp
    import numpy as np

    from pvio_tpu.io import synthetic

    n_kf = cfg.window_frame_capacity - 1
    gap = 4
    scene = synthetic.make_scene(duration=6.0, fps=20.0, imu_rate=200.0,
                                 n_points=280, n_plane_points=160, seed=648)
    kf = list(range(0, n_kf * gap, gap))
    w, extr, info = synthetic.solver_window_from_scene(
        scene, kf, F_cap=cfg.window_frame_capacity, T_cap=cfg.track_capacity,
        dtype=dtype, kp_noise=0.002)
    w, n_members = synthetic.flag_plane_tracks(w, scene, info)
    assert n_members >= cfg.plane_min_tracks, n_members

    # consecutive rendered frames from the window's tail keyframe, one
    # per chained pipeline frame (no ring wrap: a wrap teleports the
    # camera and the fb-gate would kill every association)
    NSEQ = n_chain_frames + 1
    base = kf[-1]
    assert base + NSEQ <= len(scene.frame_t), (base, NSEQ)
    images = np.stack([
        (synthetic.render_frame(scene, base + fi, cfg.K, cfg.image_size)
         * 255 + 0.5).astype(np.uint8)
        for fi in range(NSEQ)
    ])

    # pixel projections of the window's tracks at the sequence start, for
    # the one-time detector-slot -> window-column association
    kp, vis = synthetic.project_points(scene, np.array([base]))
    chosen = np.asarray(info["chosen"])
    fx, fy, cx, cy = cfg.K[0, 0], cfg.K[1, 1], cfg.K[0, 2], cfg.K[1, 2]
    col_px = np.stack([kp[0, chosen, 0] * fx + cx,
                       kp[0, chosen, 1] * fy + cy], axis=-1)  # (L, 2)
    col_vis = vis[0, chosen]

    # per-frame padded IMU spans for delta re-integration in ba/marg steps
    F = cfg.window_frame_capacity
    N = cfg.imu_buffer_capacity
    ts = np.zeros((F, N))
    ws_ = np.zeros((F, N, 3))
    accs = np.zeros((F, N, 3))
    mask = np.zeros((F, N), bool)
    t_frames = np.zeros(F)
    for j in range(F):
        if 1 <= j <= len(kf) - 1:
            t0, t1 = scene.frame_t[kf[j - 1]], scene.frame_t[kf[j]]
            sel = (scene.imu_t >= t0) & (scene.imu_t < t1)
            n = min(int(sel.sum()), N)
            ts[j, :n] = scene.imu_t[sel][:n]
            ws_[j, :n] = scene.gyro[sel][:n]
            accs[j, :n] = scene.accel[sel][:n]
            mask[j, :n] = True
        if j < len(kf):
            t_frames[j] = scene.frame_t[kf[j]]

    # one inter-frame IMU span for the pnp step (~10 samples @ 200 Hz)
    sel = ((scene.imu_t >= scene.frame_t[base])
           & (scene.imu_t < scene.frame_t[base + 1]))
    pnp_imu = (scene.imu_t[sel], scene.gyro[sel], scene.accel[sel])

    npdt = np.float32 if dtype == jnp.float32 else np.float64
    T = cfg.track_capacity
    host = dict(
        images=images,
        col_px=col_px, col_vis=col_vis,
        imu_ops=(ts.astype(npdt), ws_.astype(npdt), accs.astype(npdt), mask,
                 t_frames.astype(npdt)),
        pnp_imu=pnp_imu,
        track_life=np.full(T, 20, np.int32),
        t_new=np.asarray(scene.frame_t[base + 1], npdt),
    )
    return w, host


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer timed reps")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--kf-every", type=int, default=4,
                    help="keyframe cadence of the modeled steady state "
                         "(golden runs measure every 2-6 frames)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pvio_tpu.core.kernels import DeviceKernels
    from pvio_tpu.estimation import ba as ba_mod
    from pvio_tpu.io.config import Config

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    cfg = Config()           # production EuRoC-shaped defaults, 752x480
    cfg.dtype = "float32"
    cfg.enable_plane_constraint = True
    kern = DeviceKernels.get(cfg)
    dtype = kern.dtype

    KF_EVERY = args.kf_every
    groups = 3 if args.quick else 48 // KF_EVERY  # ~48 frames per call
    n_chain = groups * KF_EVERY

    w, host = _build_pipeline_inputs(cfg, dtype, n_chain)
    print(f"window: {int(np.asarray(w.frame_mask).sum())} frames, "
          f"{int(np.asarray(w.track_mask).sum())} tracks, planes armed",
          file=sys.stderr)

    images_d = jax.device_put(jnp.asarray(host["images"]))
    imu_ops_d = jax.device_put(host["imu_ops"])
    track_life_d = jax.device_put(host["track_life"])
    tp_, wp_, ap_, mp_ = kern.pad_imu_host(*host["pnp_imu"])
    pnp_imu_d = jax.device_put((tp_, wp_, ap_, mp_))
    t_new_d = jax.device_put(host["t_new"])
    w_d = jax.device_put(w)
    tail_idx = int(np.asarray(w.frame_mask).sum()) - 1

    dq_id = jnp.asarray([1.0, 0, 0, 0], dtype)
    key0 = jnp.asarray([648, 1], jnp.uint32)

    # ---- one-time detector-slot -> window-column association --------
    # The frontend keeps keypoint state in STABLE device slots, so a
    # static map from detection slots to window track columns couples
    # KLT output to PnP input in-graph: per frame, z_obs[col] =
    # normalized(kp_tracked[slot_of_col[col]]), masked by the slot's
    # alive bit latched from the start of the chain (a dead slot may be
    # refilled by a NEW detection — a different track — so its
    # association is dropped permanently, exactly like host track-id
    # association would).
    _pyr0, _resp0, kp0_d, mask0_d = kern.first_frame_step(images_d[0])
    kp0_h, mask0_h = np.asarray(kp0_d), np.asarray(mask0_d)
    T_cap = w.kp.shape[1]
    slot_of_col = np.full(T_cap, -1, np.int32)
    col_px, col_vis = host["col_px"], host["col_vis"]
    live_slots = np.nonzero(mask0_h)[0]
    if len(live_slots):
        d2 = ((kp0_h[live_slots][:, None, :] - col_px[None, :, :]) ** 2
              ).sum(-1)                       # (S, L)
        d2[:, ~col_vis] = np.inf
        order = np.argsort(d2.min(axis=1))    # greedy nearest-first
        used_cols = set()
        for si in order:
            ci = int(np.argmin(d2[si]))
            if d2[si, ci] < 3.0 ** 2 and ci not in used_cols:
                slot_of_col[ci] = live_slots[si]
                used_cols.add(ci)
    n_assoc = int((slot_of_col >= 0).sum())
    print(f"KLT->PnP association: {n_assoc} of {len(col_px)} window tracks "
          f"matched to detector slots", file=sys.stderr)
    assert n_assoc >= 50, "coupled bench needs a populated association"
    slot_of_col_d = jax.device_put(jnp.asarray(slot_of_col))
    fx, fy = cfg.K[0, 0], cfg.K[1, 1]
    cx, cy = cfg.K[0, 2], cfg.K[1, 2]
    kinv_scale = jnp.asarray([1.0 / fx, 1.0 / fy], dtype)
    kinv_off = jnp.asarray([cx, cy], dtype)

    def one_frame(pyr, resp, kp, mask, wst, alive, stir, i):
        img = images_d[i + 1]
        pyr2, resp2, kp2, mask2, status, det = kern.frame_step(
            pyr, resp, img, kp, mask, dq_id, key0 + jnp.uint32(i))
        tp, wp, ap2, mp = pnp_imu_d
        # slot-indexed association: tracked keypoints -> window columns
        sc = jnp.clip(slot_of_col_d, 0, kp2.shape[0] - 1)
        alive = alive & mask2[sc] & (slot_of_col_d >= 0)
        z = (kp2[sc] - kinv_off) * kinv_scale + stir
        q1, p1, v1, bg1, ba1, dq = kern.pnp_step(
            wst, tp, wp, ap2, mp, t_new_d, tail_idx, z, alive, alive,
            jnp.int32(0))[:6]
        # connect the chain: the next frame sees the PnP-updated tail pose
        wst = wst._replace(q=wst.q.at[tail_idx].set(q1),
                           p=wst.p.at[tail_idx].set(p1))
        stir = stir + 1e-30 * (kp2[0, 0] + p1[0])
        return pyr2, resp2, kp2, mask2, wst, alive, stir

    def group(carry, g):
        pyr, resp, kp, mask, wst, alive, stir = carry
        i0 = g * KF_EVERY
        for i in range(KF_EVERY):
            pyr, resp, kp, mask, wst, alive, stir = one_frame(
                pyr, resp, kp, mask, wst, alive, stir, i0 + i)
        # keyframe: fused BA step (planes ON) + fused marginalization
        wst2, info, xw, _tri = kern.ba_step(wst, *imu_ops_d, track_life_d, False)
        wm = kern.marg_step(wst2, *imu_ops_d)
        # chain the groups through a tiny data dependency WITHOUT carrying
        # the evolved window (the fake steady state has no host topology
        # maintenance, so repeated solves on it eventually diverge; the
        # timing is shape/iteration-bound either way)
        stir = stir + 1e-30 * jnp.nan_to_num(
            info["final_cost"] + wm.p[0, 0] + xw[0, 0])
        wst = jax.tree.map(lambda a, b: a, w_d, wst)  # reset to base
        wst = wst._replace(p=wst.p + stir)
        return (pyr, resp, kp, mask, wst, alive, stir), info["final_cost"]

    @jax.jit
    def pipeline_chain(w0, stir0):
        pyr0, resp0, kp0, mask0 = kern.first_frame_step(images_d[0])
        alive0 = slot_of_col_d >= 0
        carry = (pyr0, resp0, kp0, mask0, w0, alive0, stir0)
        carry, costs = jax.lax.scan(group, carry, jnp.arange(groups))
        return costs, carry[4]

    n_frames = groups * KF_EVERY
    t0 = time.perf_counter()
    costs, stir = pipeline_chain(w_d, jnp.asarray(0.0, dtype))
    jax.block_until_ready(stir)
    print(f"compile+first ({n_frames} chained frames): "
          f"{time.perf_counter() - t0:.1f}s, final cost "
          f"{float(np.asarray(costs)[-1]):.3e}", file=sys.stderr)

    dts = []
    for k in range(3):
        t0 = time.perf_counter()
        costs, stir = pipeline_chain(w_d, jnp.asarray(1e-9 * (k + 1), dtype))
        jax.block_until_ready(stir)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)   # multi-tenant tunnel: contended calls run slower
    fps = n_frames / dt
    print(f"{n_frames} chained pipeline frames: "
          f"{['%.3fs' % d for d in dts]} (best {1e3 * dt / n_frames:.2f} "
          f"ms/frame, {fps:.1f} fps)", file=sys.stderr)

    # secondary: plane-enabled keyframe solver rate (chained solves only)
    reps = 10 if args.quick else 50
    ba_cfg = kern.ba_cfg  # inertial + planes ON, 10 iters

    @jax.jit
    def solver_chain(window):
        def body(wc, i):
            wp2 = wc._replace(p=wc.p + 1e-6 * jnp.asarray(i, dtype))
            w2, out = ba_mod.solve(wp2, kern.extr, ba_cfg)
            return w2, out["final_cost"]

        wf, cs = jax.lax.scan(body, window, jnp.arange(reps))
        return wf, cs

    t0 = time.perf_counter()
    _, cs = solver_chain(w_d)
    jax.block_until_ready(cs)
    print(f"solver compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    sdts = []
    for k in range(3):
        t0 = time.perf_counter()
        _, cs = solver_chain(w_d._replace(p=w_d.p + 1e-5 * (k + 1)))
        jax.block_until_ready(cs)
        sdts.append(time.perf_counter() - t0)
    sdt = min(sdts)
    print(f"plane-enabled VI keyframe solves: {1e3 * sdt / reps:.2f} ms/solve "
          f"({reps / sdt:.1f} solves/s)", file=sys.stderr)

    print(json.dumps({
        "metric": "pipeline_frames_per_s",
        "value": round(fps, 3),
        "unit": ("frames/s, 1 chip (480x752 CLAHE+KLT+detect frontend "
                 "feeding VI PnP its tracked keypoints per frame; "
                 "plane-augmented 10-iter VI BA + marginalization every "
                 "4th frame; f32)"),
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
