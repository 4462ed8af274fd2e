"""Pyramidal Lucas-Kanade tracking, batched over keypoints.

Re-design of reference OpenCvImage::track_keypoints
(opencv_image.cpp:88-136: cv::calcOpticalFlowPyrLK 21x21, 3 levels, with
gyro-predicted initial flow from frame.cpp:97-103): every keypoint's patch
solve is a tiny Gauss-Newton over (dx, dy) with a fixed iteration count,
vmapped over keypoints and unrolled coarse-to-fine over pyramid levels —
one fused XLA program, no per-keypoint host loop. Patch sampling is
bilinear gather (the Pallas kernel in pvio_tpu/ops provides the fused
production path; this module is the reference implementation and CPU
fallback).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(img, xy):
    """Sample img (H, W) at xy (..., 2) pixel coords, clamped borders."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - fy) * (1 - fx)
        + i01 * (1 - fy) * fx
        + i10 * fy * (1 - fx)
        + i11 * fy * fx
    )


def _patch_offsets(half, dtype):
    r = jnp.arange(-half, half + 1, dtype=dtype)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([ox, oy], axis=-1)  # (P, P, 2)


def _track_level(img_prev, img_next, kp_prev, guess, iters, half, dtype):
    """One pyramid level of LK for all keypoints.

    kp_prev (K, 2) positions in this level's coords; guess (K, 2) current
    flow estimate. Returns (flow (K, 2), residual_err (K,)).
    """
    offs = _patch_offsets(half, dtype)  # (P, P, 2)

    def one(kp, g):
        coords = kp[None, None, :] + offs  # (P, P, 2)
        t = _bilinear(img_prev, coords)
        # spatial gradients of the template (central differences on samples)
        gx = (_bilinear(img_prev, coords + jnp.array([0.5, 0.0], dtype)) -
              _bilinear(img_prev, coords + jnp.array([-0.5, 0.0], dtype)))
        gy = (_bilinear(img_prev, coords + jnp.array([0.0, 0.5], dtype)) -
              _bilinear(img_prev, coords + jnp.array([0.0, -0.5], dtype)))
        a = jnp.sum(gx * gx)
        b = jnp.sum(gx * gy)
        c = jnp.sum(gy * gy)
        det = a * c - b * b
        det_s = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

        def step(_, gflow):
            w = _bilinear(img_next, (kp + gflow)[None, None, :] + offs)
            e = w - t
            bx = jnp.sum(e * gx)
            by = jnp.sum(e * gy)
            dx = (c * bx - b * by) / det_s
            dy = (a * by - b * bx) / det_s
            return gflow - jnp.stack([dx, dy])

        g1 = jax.lax.fori_loop(0, iters, step, g)
        w = _bilinear(img_next, (kp + g1)[None, None, :] + offs)
        err = jnp.mean(jnp.abs(w - t))
        return g1, err

    return jax.vmap(one)(kp_prev, guess)


def track_keypoints(
    pyr_prev, pyr_next, kp_prev, kp_init, mask,
    patch=21, iters=10, max_error=0.08, border=20.0,
):
    """Track keypoints from the previous to the next image.

    pyr_prev/pyr_next: pyramid lists (level 0 = full res) from
    image.build_pyramid. kp_prev (K, 2) pixel coords in level 0;
    kp_init (K, 2) initial guesses (gyro-predicted, frame.cpp:97-103);
    mask (K,) input validity.

    Returns (kp_next (K, 2), status (K,) bool). Status clears on
    divergence (residual > max_error) or leaving the border margin
    (opencv_image.cpp:110-120).
    """
    dtype = kp_prev.dtype
    half = patch // 2
    levels = len(pyr_prev)
    scale = 2.0 ** (levels - 1)
    flow = (kp_init - kp_prev) / scale

    for lv in range(levels - 1, -1, -1):
        s = 2.0**lv
        kp_l = kp_prev / s
        flow, err = _track_level(
            pyr_prev[lv], pyr_next[lv], kp_l, flow, iters, half, dtype
        )
        if lv > 0:
            flow = flow * 2.0

    kp_next = kp_prev + flow
    H, W = pyr_prev[0].shape
    inb = (
        (kp_next[:, 0] >= border)
        & (kp_next[:, 0] < W - border)
        & (kp_next[:, 1] >= border)
        & (kp_next[:, 1] < H - border)
    )
    status = mask & inb & (err < max_error) & jnp.all(jnp.isfinite(kp_next), axis=-1)
    return kp_next, status
