"""Multi-sequence coupled-chain pipeline batching (BASELINE config 4).

The reference processes one sequence per process (pvio-pc main.cpp); the
TPU-native scale-out serves N sequences per chip by BATCHING the fused
per-frame device programs — frontend (CLAHE + pyramid + KLT + F-gate +
detect), motion step (preintegrate + predict + VI PnP), and the periodic
keyframe step (plane-augmented VI BA + marginalization) — via jax.vmap,
and across chips by sharding the batch axis over the mesh ("dp" in
SURVEY §2.4). Every kernel is fixed-shape, so one compiled batched
program serves any sequence set.

Scope (honest): this is a coupled-chain THROUGHPUT batch with a FIXED
keyframe cadence — the per-group BA result (states, biases, depths,
planes) carries across groups, but the window TOPOLOGY is static: no
keyframe append, no adaptive keyframe decisions. N full adaptive host
state machines with divergent keyframe/init schedules sharing batched
device dispatches live in parallel/serving.py (MultiPVIO); this module
is the fixed-shape in-graph batch that bench.py's single-sequence
driver metric also uses.

The chain here is the COUPLED pipeline (KLT-tracked keypoints feed PnP
through a static detector-slot -> window-column association).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def build_sequence_inputs(cfg, kern, n_chain_frames, seed=648):
    """Host-side inputs for one sequence's coupled pipeline chain:
    rendered image stack, plane-flagged solver window, per-frame IMU
    grids, and the detector-slot -> window-column association.

    Returns (w, arrays) where `arrays` is a dict of per-sequence arrays
    suitable for stacking along a leading batch axis."""
    from pvio_tpu.io import synthetic

    dtype = kern.dtype
    n_kf = cfg.window_frame_capacity - 1
    gap = 4
    scene = synthetic.make_scene(duration=6.0, fps=20.0, imu_rate=200.0,
                                 n_points=280, n_plane_points=160, seed=seed)
    kf = list(range(0, n_kf * gap, gap))
    w, extr, info = synthetic.solver_window_from_scene(
        scene, kf, F_cap=cfg.window_frame_capacity, T_cap=cfg.track_capacity,
        dtype=dtype, kp_noise=0.002)
    w, n_members = synthetic.flag_plane_tracks(w, scene, info)
    assert n_members >= cfg.plane_min_tracks, n_members

    NSEQ = n_chain_frames + 1
    base = kf[-1]
    assert base + NSEQ <= len(scene.frame_t), (base, NSEQ)
    images = np.stack([
        (synthetic.render_frame(scene, base + fi, cfg.K, cfg.image_size)
         * 255 + 0.5).astype(np.uint8)
        for fi in range(NSEQ)
    ])

    # pixel projections of the window's tracks at the sequence start
    kp, vis = synthetic.project_points(scene, np.array([base]))
    chosen = np.asarray(info["chosen"])
    fx, fy, cx, cy = cfg.K[0, 0], cfg.K[1, 1], cfg.K[0, 2], cfg.K[1, 2]
    col_px = np.stack([kp[0, chosen, 0] * fx + cx,
                       kp[0, chosen, 1] * fy + cy], axis=-1)
    col_vis = vis[0, chosen]

    # one-time detector-slot -> window-column association from a host
    # run of the first-frame detector
    _p, _r, kp0_d, mask0_d = kern.first_frame_step(jnp.asarray(images[0]))
    kp0_h, mask0_h = np.asarray(kp0_d), np.asarray(mask0_d)
    T_cap = w.kp.shape[1]
    slot_of_col = np.full(T_cap, -1, np.int32)
    live = np.nonzero(mask0_h)[0]
    if len(live):
        d2 = ((kp0_h[live][:, None, :] - col_px[None, :, :]) ** 2).sum(-1)
        d2[:, ~col_vis] = np.inf
        used = set()
        for si in np.argsort(d2.min(axis=1)):
            ci = int(np.argmin(d2[si]))
            if d2[si, ci] < 9.0 and ci not in used:
                slot_of_col[ci] = live[si]
                used.add(ci)

    # per-frame padded IMU grids for the keyframe BA/marg steps
    F = cfg.window_frame_capacity
    N = cfg.imu_buffer_capacity
    npdt = np.float32 if dtype == jnp.float32 else np.float64
    ts = np.zeros((F, N)); ws_ = np.zeros((F, N, 3))
    accs = np.zeros((F, N, 3)); mask = np.zeros((F, N), bool)
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

    sel = ((scene.imu_t >= scene.frame_t[base])
           & (scene.imu_t < scene.frame_t[base + 1]))
    tp_, wp_, ap_, mp_ = kern.pad_imu_host(
        scene.imu_t[sel], scene.gyro[sel], scene.accel[sel])

    arrays = dict(
        images=images,
        slot_of_col=slot_of_col,
        imu_ts=ts.astype(npdt), imu_w=ws_.astype(npdt),
        imu_a=accs.astype(npdt), imu_mask=mask,
        frame_ts=t_frames.astype(npdt),
        pnp_tp=np.asarray(tp_), pnp_wp=np.asarray(wp_),
        pnp_ap=np.asarray(ap_), pnp_mp=np.asarray(mp_),
        track_life=np.full(T_cap, 20, np.int32),
        t_new=np.asarray(scene.frame_t[base + 1], npdt),
    )
    return w, arrays


def make_chain(kern, cfg, groups, kf_every=4):
    """The jittable coupled pipeline chain for ONE sequence:

        chain(w_base, arrays_pytree, stir0) -> (costs (groups,), w_final)

    groups * kf_every frames: fused frontend + slot-associated VI PnP
    per frame, plane-augmented VI BA + marginalization every kf_every-th
    frame. Pure function of its inputs — vmap/shard_map it for the
    multi-sequence batch."""
    dtype = kern.dtype
    fx, fy = cfg.K[0, 0], cfg.K[1, 1]
    cx, cy = cfg.K[0, 2], cfg.K[1, 2]
    kinv_scale = jnp.asarray([1.0 / fx, 1.0 / fy], dtype)
    kinv_off = jnp.asarray([cx, cy], dtype)
    dq_id = jnp.asarray([1.0, 0, 0, 0], dtype)
    key0 = jnp.asarray([648, 1], jnp.uint32)

    def chain(w_base, a, stir0):
        images = a["images"]
        slot_of_col = a["slot_of_col"]
        imu_ops = (a["imu_ts"], a["imu_w"], a["imu_a"], a["imu_mask"],
                   a["frame_ts"])
        pnp_imu = (a["pnp_tp"], a["pnp_wp"], a["pnp_ap"], a["pnp_mp"])
        tail_idx = jnp.sum(w_base.frame_mask) - 1

        def one_frame(pyr, resp, kp, mask, wst, alive, stir, i):
            pyr2, resp2, kp2, mask2, status, det = kern.frame_step(
                pyr, resp, images[i + 1], kp, mask, dq_id,
                key0 + jnp.uint32(i))
            sc = jnp.clip(slot_of_col, 0, kp2.shape[0] - 1)
            alive = alive & mask2[sc] & (slot_of_col >= 0)
            z = (kp2[sc] - kinv_off) * kinv_scale + stir
            q1, p1 = kern.pnp_step(
                wst, *pnp_imu, a["t_new"], tail_idx, z, alive, alive,
                jnp.int32(0))[:2]
            wst = wst._replace(q=wst.q.at[tail_idx].set(q1),
                               p=wst.p.at[tail_idx].set(p1))
            stir = stir + 1e-30 * (kp2[0, 0] + p1[0])
            return pyr2, resp2, kp2, mask2, wst, alive, stir

        def group(carry, g):
            pyr, resp, kp, mask, wst, alive, stir = carry
            i0 = g * kf_every
            for i in range(kf_every):
                pyr, resp, kp, mask, wst, alive, stir = one_frame(
                    pyr, resp, kp, mask, wst, alive, stir, i0 + i)
            # the post-BA window CARRIES across groups: refined states,
            # biases, depths and planes feed the next group's PnP/BA (the
            # topology stays static — see the module docstring). The
            # marginalization product is computed for its cost (and kept
            # live through the stir term) but the un-compacted window is
            # what the static-shape chain continues from.
            wst2, info, xw, _tri = kern.ba_step(
                wst, *imu_ops, a["track_life"], False)
            wm = kern.marg_step(wst2, *imu_ops)
            stir = stir + 1e-30 * jnp.nan_to_num(
                info["final_cost"] + wm.p[0, 0] + xw[0, 0])
            wst = wst2._replace(p=wst2.p + stir)
            return (pyr, resp, kp, mask, wst, alive, stir), info["final_cost"]

        pyr0, resp0, kp0, mask0 = kern.first_frame_step(images[0])
        alive0 = slot_of_col >= 0
        carry = (pyr0, resp0, kp0, mask0, w_base, alive0, stir0)
        carry, costs = jax.lax.scan(group, carry, jnp.arange(groups))
        return costs, carry[4]

    return chain


def run_batched(kern, cfg, ws, arrays_list, groups, kf_every=4, mesh=None):
    """Run N sequences end-to-end batched on one device (vmap), or
    dp-sharded over `mesh` (batch axis split across its 'dp' axis).
    Returns (costs (N, groups), windows list)."""
    from pvio_tpu.parallel import batch as pbatch

    chain = make_chain(kern, cfg, groups, kf_every)
    wb = pbatch.stack_windows(ws)
    ab = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                      *arrays_list)
    stir = jnp.zeros(len(ws), kern.dtype)
    vchain = jax.vmap(chain)
    if mesh is None:
        costs, wf = jax.jit(vchain)(wb, ab, stir)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard(leaf):
            spec = P("dp") if leaf.ndim >= 1 else P()
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        wb = jax.tree.map(shard, wb)
        ab = jax.tree.map(shard, ab)
        stir = shard(stir)
        with mesh:
            costs, wf = jax.jit(vchain)(wb, ab, stir)
    jax.block_until_ready(costs)
    return np.asarray(costs), pbatch.unstack_windows(wf, len(ws))
