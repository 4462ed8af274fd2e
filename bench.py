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


def _build_pipeline_inputs(cfg, dtype):
    """Host-side: rendered image ring + oracle observation grids + a
    plane-flagged flagship window with per-frame IMU spans."""
    import jax.numpy as jnp
    import numpy as np

    from pvio_tpu.io import synthetic

    n_kf = cfg.window_frame_capacity - 1
    gap = 4
    scene = synthetic.make_scene(duration=3.0, fps=20.0, imu_rate=200.0,
                                 n_points=280, n_plane_points=160, seed=648)
    kf = list(range(0, n_kf * gap, gap))
    w, extr, info = synthetic.solver_window_from_scene(
        scene, kf, F_cap=cfg.window_frame_capacity, T_cap=cfg.track_capacity,
        dtype=dtype, kp_noise=0.002)
    w, n_members = synthetic.flag_plane_tracks(w, scene, info)
    assert n_members >= cfg.plane_min_tracks, n_members

    # image ring: 8 rendered frames of the textured room at production
    # res, CONSECUTIVE from the window's tail keyframe so the chained PnP
    # observations stay consistent with the window state
    NRING = 8
    base = kf[-1]
    images = np.stack([
        (synthetic.render_frame_room(scene, base + fi, cfg.K, cfg.image_size)
         * 255 + 0.5).astype(np.uint8)
        for fi in range(NRING)
    ])

    # oracle per-frame PnP observations for the ring frames
    kp, vis = synthetic.project_points(scene, base + np.arange(NRING))
    T = cfg.track_capacity
    chosen = np.asarray(info["chosen"])
    z_ring = np.zeros((NRING, T, 2))
    m_ring = np.zeros((NRING, T), bool)
    L = len(chosen)
    z_ring[:, :L] = kp[:, chosen]
    m_ring[:, :L] = vis[:, chosen]

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
    host = dict(
        images=images,
        z_ring=z_ring.astype(npdt), m_ring=m_ring,
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

    w, host = _build_pipeline_inputs(cfg, dtype)
    print(f"window: {int(np.asarray(w.frame_mask).sum())} frames, "
          f"{int(np.asarray(w.track_mask).sum())} tracks, planes armed",
          file=sys.stderr)

    groups = 3 if args.quick else 12      # frames = 4 * groups per call
    KF_EVERY = 4

    images_d = jax.device_put(jnp.asarray(host["images"]))
    z_ring_d, m_ring_d = jax.device_put((host["z_ring"], host["m_ring"]))
    imu_ops_d = jax.device_put(host["imu_ops"])
    track_life_d = jax.device_put(host["track_life"])
    tp_, wp_, ap_, mp_ = kern.pad_imu_host(*host["pnp_imu"])
    pnp_imu_d = jax.device_put((tp_, wp_, ap_, mp_))
    t_new_d = jax.device_put(host["t_new"])
    w_d = jax.device_put(w)
    tail_idx = int(np.asarray(w.frame_mask).sum()) - 1

    dq_id = jnp.asarray([1.0, 0, 0, 0], dtype)
    key0 = jnp.asarray([648, 1], jnp.uint32)

    def one_frame(pyr, resp, kp, mask, wst, stir, i):
        img = images_d[i % 8]
        pyr2, resp2, kp2, mask2, status, det = kern.frame_step(
            pyr, resp, img, kp, mask, dq_id, key0 + jnp.uint32(i))
        tp, wp, ap2, mp = pnp_imu_d
        z = z_ring_d[i % 8] + stir
        pm = m_ring_d[i % 8]
        q1, p1, v1, bg1, ba1, dq = kern.pnp_step(
            wst, tp, wp, ap2, mp, t_new_d, tail_idx, z, pm, pm,
            jnp.int32(0))[:6]
        # connect the chain: the next frame sees the PnP-updated tail pose
        wst = wst._replace(q=wst.q.at[tail_idx].set(q1),
                           p=wst.p.at[tail_idx].set(p1))
        stir = stir + 1e-30 * (kp2[0, 0] + p1[0])
        return pyr2, resp2, kp2, mask2, wst, stir

    def group(carry, g):
        pyr, resp, kp, mask, wst, stir = carry
        i0 = g * KF_EVERY
        for i in range(KF_EVERY):
            pyr, resp, kp, mask, wst, stir = one_frame(
                pyr, resp, kp, mask, wst, stir, i0 + i)
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
        return (pyr, resp, kp, mask, wst, stir), info["final_cost"]

    @jax.jit
    def pipeline_chain(w0, stir0):
        pyr0, resp0, kp0, mask0 = kern.first_frame_step(images_d[0])
        carry = (pyr0, resp0, kp0, mask0, w0, stir0)
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
        "unit": ("frames/s, 1 chip (480x752 CLAHE+KLT+detect frontend + VI "
                 "PnP per frame; plane-augmented 10-iter VI BA + "
                 "marginalization every 4th frame; f32)"),
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
