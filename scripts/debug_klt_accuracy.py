"""Measure KLT tracking accuracy on rendered room imagery against the
geometric ground truth (wall ray-cast): isolates frontend pixel error
from the estimation chain. Also isolates CLAHE and the distortion
round-trip as error sources."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from pvio_tpu.io import synthetic
from pvio_tpu.io.undistort import ImageUndistorter
from pvio_tpu.io.synthetic import (_np_quat_mul, _np_quat_rotate,
                                   _np_quat_to_mat)

BOX = ((-4.0, 4.0), (-3.0, 3.0), (-2.5, 6.0))


def cam_pose(scene, fi, q_bc, p_bc):
    q = scene.q_wb[fi]
    p = scene.p_wb[fi]
    return _np_quat_mul(q, q_bc), p + _np_quat_rotate(q, p_bc)


def gt_flow(scene, fa, fb, kp_a, K, q_bc, p_bc):
    """Ground-truth corresponding pixels in frame b for pixels kp_a in
    frame a (pinhole coords), via exact wall ray-cast."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    qa, pa = cam_pose(scene, fa, q_bc, p_bc)
    qb, pb = cam_pose(scene, fb, q_bc, p_bc)
    Ra = _np_quat_to_mat(qa)
    x = (kp_a[:, 0] - cx) / fx
    y = (kp_a[:, 1] - cy) / fy
    dirs = np.stack([x, y, np.ones_like(x)], -1) @ Ra.T
    eps = 1e-12
    t_ax = np.full((len(x), 3), np.inf)
    for a in range(3):
        lo, hi = BOX[a]
        d = dirs[:, a]
        t_ax[:, a] = np.where(d > eps, (hi - pa[a]) / np.where(d > eps, d, 1),
                              np.where(d < -eps, (lo - pa[a]) / np.where(d < -eps, d, 1),
                                       np.inf))
    t = t_ax.min(axis=1)
    hit = pa + t[:, None] * dirs
    Rb = _np_quat_to_mat(qb)
    yb = (hit - pb) @ Rb  # R_b^T (x - p_b)
    zb = yb[:, 2]
    u = yb[:, 0] / zb * fx + cx
    v = yb[:, 1] / zb * fy + cy
    return np.stack([u, v], -1), zb > 0.1


def main():
    from pvio_tpu.io.config import Config
    from pvio_tpu.core.kernels import DeviceKernels

    cfg = Config.from_yaml("config/euroc.yaml")
    cfg.dtype = "float64"
    K = cfg.K
    q_bc, p_bc = np.asarray(cfg.q_bc), np.asarray(cfg.p_bc)
    scene = synthetic.make_scene(duration=2.0, fps=20.0, imu_rate=200.0,
                                 n_points=8, seed=648)
    und = ImageUndistorter(K, cfg.camera_distortion,
                           cfg.camera_distortion_model, cfg.image_size)

    for mode in ["plain", "distort-roundtrip", "no-clahe"]:
        cfg2 = Config.from_yaml("config/euroc.yaml")
        cfg2.dtype = "float64"
        if mode == "no-clahe":
            cfg2.feature_tracker_clahe = False
        kern = DeviceKernels(cfg2)

        def get_img(fi):
            if mode == "plain" or mode == "no-clahe":
                return synthetic.render_frame_room(scene, fi, K,
                                                   cfg.image_size,
                                                   q_bc=q_bc, p_bc=p_bc)
            img = synthetic.render_frame_room(
                scene, fi, K, cfg.image_size, q_bc=q_bc, p_bc=p_bc,
                distortion=cfg.camera_distortion,
                distortion_model=cfg.camera_distortion_model)
            u8 = (img * 255 + 0.5).astype(np.uint8)
            return und.apply(u8).astype(np.float64) / 255.0

        img0 = get_img(0)
        pyr0, resp0, kp_dev, mask_dev = kern.first_frame_step(jnp.asarray(img0))
        kp0 = np.array(kp_dev)
        m0 = np.array(mask_dev)
        pyr = pyr0
        kp_cur = kp_dev
        mask_cur = mask_dev
        alive = m0.copy()
        for step, fb in enumerate([1, 2, 3, 4, 5]):
            imgb = get_img(fb)
            pyrb = kern.preprocess(jnp.asarray(imgb))
            kp_new, status = kern.track(pyr, pyrb, kp_cur,
                                        kp_cur, mask_cur)
            pyr = pyrb
            kp_cur, mask_cur = kp_new, status
            alive = alive & np.array(status)
            gt, vis = gt_flow(scene, 0, fb, kp0, K, q_bc, p_bc)
            ok = alive & vis
            err = np.linalg.norm(np.array(kp_new) - gt, axis=-1)[ok]
            print(f"{mode:18s} frame0->{fb}: tracked={int(ok.sum())} "
                  f"err px p50/p90/max = "
                  f"{np.percentile(err, [50, 90, 100]).round(2)}",
                  flush=True)


main()
