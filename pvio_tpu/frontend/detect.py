"""Keypoint detection: Shi-Tomasi response + Poisson-disk-spaced top-K.

Re-design of reference OpenCvImage::detect_keypoints
(opencv_image.cpp:54-86: cv::GFTT(1000, 1e-3, 20) sorted by response, then
PoissonDiskFilter against existing keypoints, 20 px border cull) and
Frame::detect_keypoints (frame.cpp:72-87). Fixed shapes throughout: the
greedy minimum-distance selection runs a static K-step loop over a static
C-candidate pool — the jit-friendly equivalent of the reference's
response-sorted greedy sweep with a sparse-grid distance filter
(utility/poisson_disk_filter.h:25-130).
"""

from functools import partial

import jax
import jax.numpy as jnp

from pvio_tpu.frontend import image as img_ops


def shi_tomasi_response(img, window=3):
    """Min-eigenvalue corner response (GFTT's score), same shape as img."""
    Ix, Iy = img_ops.gradients(img)
    k = jnp.ones((window, window), img.dtype) / (window * window)
    a = img_ops._conv2(Ix * Ix, k)
    b = img_ops._conv2(Ix * Iy, k)
    c = img_ops._conv2(Iy * Iy, k)
    tr = 0.5 * (a + c)
    det = jnp.sqrt(jnp.maximum((0.5 * (a - c)) ** 2 + b * b, 0.0))
    return tr - det  # lambda_min


def _nms(resp, radius=1):
    """3x3 (default) non-maximum suppression mask."""
    m = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max,
        (2 * radius + 1, 2 * radius + 1), (1, 1), "SAME",
    )
    return resp >= m


def detect_keypoints(
    img,
    max_keypoints=150,
    min_distance=20.0,
    existing_xy=None,
    existing_mask=None,
    border=20,
    quality_level=1e-3,
    min_response=1e-8,
    num_candidates=1024,
    use_pallas_response=False,
    response=None,
):
    """Detect up to `max_keypoints` corners with Poisson-disk spacing.

    img (H, W) in [0, 1]. existing_xy (E, 2)/existing_mask: already-tracked
    keypoints that suppress nearby detections (frame.cpp:72-87 passes the
    current keypoint set). Returns (xy (K, 2) pixel coords, mask (K,)).
    """
    H, W = img.shape
    dtype = img.dtype
    if response is not None:
        resp = response          # caller-precomputed (shared with the KLT gate)
    elif use_pallas_response:
        # fused single-pass TPU kernel (ops/stencil.py): exact on the
        # interior; its 2 px circular-shift halo is inside the >= 20 px
        # detection border cull
        from pvio_tpu.ops.stencil import shi_tomasi_response_tpu

        resp = shi_tomasi_response_tpu(img)
    else:
        resp = shi_tomasi_response(img)
    keep = _nms(resp)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (xx >= border) & (xx < W - border) & (yy >= border) & (yy < H - border)
    resp_m = jnp.where(keep & inb, resp, -jnp.inf)

    flat = resp_m.reshape(-1)
    C = min(num_candidates, flat.shape[0])
    scores, idx = jax.lax.top_k(flat, C)
    ix = idx % W
    iy = idx // W
    # sub-pixel localization: 1-D quadratic fit through the response peak
    ixc = jnp.clip(ix, 1, W - 2)
    iyc = jnp.clip(iy, 1, H - 2)
    r0 = resp[iyc, ixc]
    rl = resp[iyc, ixc - 1]
    rr = resp[iyc, ixc + 1]
    ru = resp[iyc - 1, ixc]
    rd = resp[iyc + 1, ixc]
    denx = rl - 2 * r0 + rr
    deny = ru - 2 * r0 + rd
    dx = jnp.where(jnp.abs(denx) > 1e-12, 0.5 * (rl - rr) / denx, 0.0)
    dy = jnp.where(jnp.abs(deny) > 1e-12, 0.5 * (ru - rd) / deny, 0.0)
    dx = jnp.clip(dx, -0.5, 0.5)
    dy = jnp.clip(dy, -0.5, 0.5)
    cand = jnp.stack([ix.astype(dtype) + dx, iy.astype(dtype) + dy], axis=-1)  # (C, 2)
    # GFTT quality gate relative to best response, with an absolute floor:
    # on a (near-)uniform image the best response is float noise (~1e-17),
    # and a purely relative gate would admit arbitrary non-corners
    alive = scores > jnp.maximum(scores[0] * quality_level, min_response)
    alive = alive & jnp.isfinite(scores)

    d2 = min_distance * min_distance
    if existing_xy is not None:
        dist2 = jnp.sum((cand[:, None, :] - existing_xy[None, :, :]) ** 2, axis=-1)
        if existing_mask is not None:
            dist2 = jnp.where(existing_mask[None, :], dist2, jnp.inf)
        alive = alive & jnp.all(dist2 >= d2, axis=1)

    K = max_keypoints

    # Exact greedy Poisson-disk selection, parallelized: candidates are
    # already response-sorted (top_k), so greedy = "take every alive
    # candidate with no alive higher-priority neighbor, kill its
    # neighbors, repeat". Each round selects a whole antichain of the
    # greedy sequence at once — the fixed round count replaces a K-step
    # sequential argmax loop (K=150 tiny latency-bound steps, ~7 ms on
    # TPU) with ~a dozen (C, C) masked reductions (<1 ms). Result is
    # IDENTICAL to sequential greedy whenever the priority-chain depth
    # fits in the round budget (index order breaks score ties).
    dist2 = jnp.sum((cand[:, None, :] - cand[None, :, :]) ** 2, axis=-1)
    near = dist2 < d2                                   # symmetric, incl. self
    C_ = scores.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (C_, C_), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (C_, C_), 1)
    dominates = near & (jj < ii)                        # j earlier-sorted & near i

    def round_(carry):
        alive, selected, n = carry
        dominated = jnp.any(dominates & alive[None, :], axis=1)
        winners = alive & ~dominated
        selected = selected | winners
        killed = jnp.any(near & winners[None, :], axis=1) & ~winners
        alive = alive & ~winners & ~killed
        return alive, selected, n + 1

    def not_done(carry):
        alive, selected, n = carry
        # run to exhaustion: an early "enough selected" exit would break
        # the score-order prefix property (pending low-index candidates
        # can still join the set); each round retires >= 1 candidate while
        # any is alive, so n < C_ is a safety bound, and the typical
        # round count is the priority-chain depth (a handful)
        return jnp.any(alive) & (n < C_)

    _, selected, _ = jax.lax.while_loop(
        not_done, round_,
        (alive, jnp.zeros_like(alive), jnp.int32(0)))

    # first K selected in response order
    Kc = min(K, C_)
    key = jnp.where(selected, -jnp.arange(C_, dtype=jnp.int32), jnp.int32(-C_ - 1))
    topv, topi = jax.lax.top_k(key, Kc)
    sel_mask = topv > -C_ - 1
    sel_xy = jnp.where(sel_mask[:, None], cand[topi], 0.0)
    if Kc < K:
        sel_xy = jnp.concatenate(
            [sel_xy, jnp.zeros((K - Kc, 2), dtype)], axis=0)
        sel_mask = jnp.concatenate([sel_mask, jnp.zeros(K - Kc, bool)])
    return sel_xy, sel_mask


def poisson_disk_filter(xy, score, mask, min_distance, max_out):
    """Standalone Poisson-disk culling of a point set, priority by score
    (role of PoissonDiskFilter + the track-length-prioritized culling in
    frame.cpp:109-130). Returns (indices (max_out,), keep_mask)."""
    N = xy.shape[0]
    d2 = min_distance * min_distance

    def body(k, carry):
        alive, sel_idx, sel_mask = carry
        s = jnp.where(alive & mask, score, -jnp.inf)
        i = jnp.argmax(s)
        ok = s[i] > -jnp.inf
        sel_idx = sel_idx.at[k].set(jnp.where(ok, i, 0))
        sel_mask = sel_mask.at[k].set(ok)
        dist2 = jnp.sum((xy - xy[i]) ** 2, axis=-1)
        alive = alive & jnp.where(ok, dist2 >= d2, True)
        return alive, sel_idx, sel_mask

    alive = jnp.ones(N, bool)
    sel_idx = jnp.zeros(max_out, jnp.int32)
    sel_mask = jnp.zeros(max_out, bool)
    _, sel_idx, sel_mask = jax.lax.fori_loop(0, max_out, body, (alive, sel_idx, sel_mask))
    return sel_idx, sel_mask
