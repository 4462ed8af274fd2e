"""Pallas TPU kernel for pyramidal Lucas-Kanade patch tracking.

The production hot path of the frontend (OpenCvImage::track_keypoints,
opencv_image.cpp:88-136): for each keypoint, iterate a 2x2 Gauss-Newton
flow update over a 21x21 template patch. The pure-JAX version
(pvio_tpu/frontend/klt.py) expresses bilinear sampling as XLA gathers,
which lower poorly on TPU.

TPU-native design: Mosaic cannot issue unaligned dynamic vector loads
from VMEM (lane offsets must be 128-aligned), so the kernel uses the
canonical DMA + register-roll pattern:

  * the images stay in ANY/HBM; each program DMAs one aligned-free
    *search window* (64 x 128) per image around its keypoint into VMEM
    scratch — DMA engines handle arbitrary offsets;
  * every Gauss-Newton iteration then samples the 21x21 patch at a
    fractional position entirely in registers: a dynamic `pltpu.roll`
    moves the integer window offset to the origin and four statically
    shaped shifted slices blend the bilinear fraction (VPU work, no
    gathers);
  * per-keypoint scalars (keypoints in, flow/error/status out) live in
    SMEM.

Grid: one program per keypoint; scalar results are written to disjoint
rows of full-array SMEM outputs. Validated against the jnp reference in
interpret mode (tests/test_ops.py) and compiled on TPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 21
HALF = PATCH // 2
SW_H = 64    # search window rows (8-row tile multiple)
SW_W = 256   # search window cols (two 128-lane tiles)
# flow clip range around the initial guess; samples outside the window are
# flagged invalid regardless (the F-gate would kill such tracks anyway)
FCAP_X = 48.0
FCAP_Y = 20.0


def _sample_patch(win, lx, ly):
    """Bilinearly sample a (PATCH+1, PATCH+1) region whose top-left patch
    pixel sits at fractional window coords (lx, ly). win (SW_H, SW_W).
    Returns (patch (PATCH, PATCH), in_range)."""
    ix = jnp.floor(lx).astype(jnp.int32)
    iy = jnp.floor(ly).astype(jnp.int32)
    fx = lx - ix.astype(lx.dtype)
    fy = ly - iy.astype(ly.dtype)
    ok = (ix >= 0) & (iy >= 0) & (ix + PATCH + 1 < SW_W) & (iy + PATCH + 1 < SW_H)
    ixc = jnp.clip(ix, 0, SW_W - PATCH - 2)
    iyc = jnp.clip(iy, 0, SW_H - PATCH - 2)
    # dynamic integer offset -> origin via cyclic roll (register shuffle)
    r = pltpu.roll(win, -iyc, 0)
    r = pltpu.roll(r, -ixc, 1)
    a = r[0 : PATCH + 1, 0 : PATCH + 1]
    rows = a[0:PATCH, :] * (1.0 - fy) + a[1 : PATCH + 1, :] * fy
    patch = rows[:, 0:PATCH] * (1.0 - fx) + rows[:, 1 : PATCH + 1] * fx
    return patch, ok


def _klt_kernel(kp_ref, guess_ref, mask_ref, prev_hbm, next_hbm,
                flow_ref, err_ref, status_ref,
                sw_prev, sw_next, sems, *, iters, H, W):
    i = pl.program_id(0)
    dtype = sw_prev.dtype
    cx = kp_ref[i, 0]
    cy = kp_ref[i, 1]
    gx0 = guess_ref[i, 0]
    gy0 = guess_ref[i, 1]

    # tile-aligned window origins (HBM arrays are (8, 128)-tiled; DMA
    # slice starts must respect the tiling) with >= 24-px margins
    def origin(px, py):
        xi = jnp.floor(px).astype(jnp.int32)
        yi = jnp.floor(py).astype(jnp.int32)
        xs = jnp.clip(((xi - 64) // 128) * 128, 0, max(W - SW_W, 0))
        ys = jnp.clip(((yi - 24) // 8) * 8, 0, max(H - SW_H, 0))
        # W/H are tile multiples, so the clip preserves alignment; tell
        # Mosaic (it cannot prove it through the clip)
        return pl.multiple_of(xs, 128), pl.multiple_of(ys, 8)

    xs_p, ys_p = origin(cx, cy)
    xs_n, ys_n = origin(gx0, gy0)

    cp = pltpu.make_async_copy(
        prev_hbm.at[pl.ds(ys_p, SW_H), pl.ds(xs_p, SW_W)], sw_prev, sems.at[0]
    )
    cn = pltpu.make_async_copy(
        next_hbm.at[pl.ds(ys_n, SW_H), pl.ds(xs_n, SW_W)], sw_next, sems.at[1]
    )
    cp.start()
    cn.start()
    cp.wait()
    cn.wait()

    # template patch + gradients (sampled once, inverse-compositional)
    lx = cx - HALF - xs_p.astype(dtype)
    ly = cy - HALF - ys_p.astype(dtype)
    t, ok0 = _sample_patch(sw_prev[:, :], lx, ly)
    txp, _ = _sample_patch(sw_prev[:, :], lx + 0.5, ly)
    txm, _ = _sample_patch(sw_prev[:, :], lx - 0.5, ly)
    typ, _ = _sample_patch(sw_prev[:, :], lx, ly + 0.5)
    tym, _ = _sample_patch(sw_prev[:, :], lx, ly - 0.5)
    gx = txp - txm
    gy = typ - tym

    a = jnp.sum(gx * gx)
    b = jnp.sum(gx * gy)
    c = jnp.sum(gy * gy)
    det = a * c - b * b
    det_s = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    u0 = gx0 - cx
    v0 = gy0 - cy
    step_cap = jnp.asarray(float(PATCH), dtype)
    fcapx = jnp.asarray(FCAP_X, dtype)
    fcapy = jnp.asarray(FCAP_Y, dtype)

    def body(_, carry):
        u, v, ok = carry
        nlx = cx + u - HALF - xs_n.astype(dtype)
        nly = cy + v - HALF - ys_n.astype(dtype)
        wn, vv = _sample_patch(sw_next[:, :], nlx, nly)
        e = wn - t
        bx = jnp.sum(e * gx)
        by = jnp.sum(e * gy)
        du = jnp.clip((c * bx - b * by) / det_s, -step_cap, step_cap)
        dv = jnp.clip((a * by - b * bx) / det_s, -step_cap, step_cap)
        u = jnp.clip(u - du, u0 - fcapx, u0 + fcapx)
        v = jnp.clip(v - dv, v0 - fcapy, v0 + fcapy)
        return u, v, ok & vv

    u, v, ok = jax.lax.fori_loop(0, iters, body, (u0, v0, ok0))

    wn, vv = _sample_patch(
        sw_next[:, :], cx + u - HALF - xs_n.astype(dtype),
        cy + v - HALF - ys_n.astype(dtype)
    )
    err = jnp.mean(jnp.abs(wn - t))

    flow_ref[i, 0] = u
    flow_ref[i, 1] = v
    err_ref[i, 0] = err
    status_ref[i, 0] = (ok & vv & (mask_ref[i] > 0)).astype(jnp.int32)


def track_level(img_prev, img_next, kp, guess, mask, iters=10, interpret=False):
    """One pyramid level of LK for all keypoints via the Pallas kernel.

    img_prev/img_next (H, W) float32; kp (K, 2) pixel positions in this
    level; guess (K, 2) predicted absolute positions; mask (K,) bool.
    Returns (flow (K, 2), err (K,), status (K,) bool).
    """
    H0, W0 = img_prev.shape
    K = kp.shape[0]
    dtype = img_prev.dtype
    # pad to HBM tile multiples so every aligned window stays in bounds
    H = -(-H0 // 8) * 8
    W = -(-W0 // 128) * 128
    if (H, W) != (H0, W0):
        pad = ((0, H - H0), (0, W - W0))
        img_prev = jnp.pad(img_prev, pad, mode="edge")
        img_next = jnp.pad(img_next, pad, mode="edge")
    kernel = partial(_klt_kernel, iters=iters, H=H, W=W)
    flow, err, status = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # kp
            pl.BlockSpec(memory_space=pltpu.SMEM),  # guess
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.ANY),   # prev image (DMA source)
            pl.BlockSpec(memory_space=pltpu.ANY),   # next image
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K, 2), dtype),
            jax.ShapeDtypeStruct((K, 1), dtype),
            jax.ShapeDtypeStruct((K, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SW_H, SW_W), dtype),
            pltpu.VMEM((SW_H, SW_W), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(kp.astype(dtype), guess.astype(dtype), mask.astype(jnp.int32),
      img_prev, img_next)
    return flow, err[:, 0], status[:, 0].astype(bool)


def track_keypoints(pyr_prev, pyr_next, kp_prev, kp_init, mask,
                    iters=10, max_error=0.08, border=20.0, interpret=False):
    """Pyramidal LK with the Pallas level kernel — drop-in replacement for
    pvio_tpu.frontend.klt.track_keypoints.

    Levels smaller than the search window fall back to the jnp reference
    implementation (coarse levels are tiny; the kernel's value is at full
    resolution)."""
    from pvio_tpu.frontend import klt as klt_ref

    dtype = pyr_prev[0].dtype
    levels = len(pyr_prev)
    scale = 2.0 ** (levels - 1)
    flow = (kp_init - kp_prev) / scale

    err = jnp.zeros(kp_prev.shape[0], dtype)
    ok = mask
    for lv in range(levels - 1, -1, -1):
        s = 2.0**lv
        kp_l = kp_prev / s
        Hl, Wl = pyr_prev[lv].shape
        if Hl < SW_H or Wl < SW_W:
            f, err_l = klt_ref._track_level(
                pyr_prev[lv], pyr_next[lv], kp_l, flow, iters, HALF, dtype
            )
            flow = f
            err = err_l
        else:
            f, err, ok_l = track_level(
                pyr_prev[lv], pyr_next[lv], kp_l, kp_l + flow, mask,
                iters=iters, interpret=interpret,
            )
            flow = f
            if lv == 0:
                ok = ok & ok_l
        if lv > 0:
            flow = flow * 2.0

    kp_next = kp_prev + flow
    H, W = pyr_prev[0].shape
    inb = (
        (kp_next[:, 0] >= border) & (kp_next[:, 0] < W - border)
        & (kp_next[:, 1] >= border) & (kp_next[:, 1] < H - border)
    )
    finite = jnp.all(jnp.isfinite(kp_next), axis=-1)
    lam_p = klt_ref.min_eig_response(pyr_prev[0], kp_prev, HALF)
    kp_n = jnp.where(finite[:, None], kp_next, kp_prev)
    lam_n = klt_ref.min_eig_response(pyr_next[0], kp_n, HALF)
    status = (ok & inb & (err < max_error) & finite
              & (lam_p > 1e-6) & (lam_n > 1e-6))
    return kp_next, status
