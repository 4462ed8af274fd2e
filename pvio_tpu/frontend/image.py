"""Image preprocessing: pyramid, gradients, contrast normalization.

Re-designs the role of reference pvio-extra OpenCvImage::preprocess
(opencv_image.cpp:138-160: CLAHE(6.0, 8x8) + 3-level LK pyramid): here the
pyramid is built with a 2x2 box downsample and gradients with Scharr
filters, all as XLA convolutions (fused, MXU/VPU-friendly). CLAHE is
implemented as tile-histogram equalization with bilinear tile blending
(clahe()); the cheap default is a global min-max normalize.

Images are (H, W) float arrays in [0, 1].
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def normalize(img):
    lo = jnp.min(img)
    hi = jnp.max(img)
    return (img - lo) / jnp.maximum(hi - lo, 1e-6)


def _conv2(img, k):
    """Same-padded 2D correlation of (H, W) with kernel (kh, kw).

    Small static kernels are expanded into shifted adds: a single-channel
    spatial conv lowers onto the TPU's MXU with 1/128th channel occupancy
    (measured ~1.2 ms per 3x3 conv at 480x752), while the equivalent 9
    shifted multiply-adds fuse into one VPU pass (~0.1 ms)."""
    kh, kw = k.shape
    karr = np.asarray(k) if not isinstance(k, jax.core.Tracer) else None
    if karr is not None and kh * kw <= 25:
        ph, pw = kh // 2, kw // 2
        H, W = img.shape
        pad = jnp.pad(img, ((ph, ph), (pw, pw)))
        out = None
        for dy in range(kh):
            for dx in range(kw):
                w = float(karr[dy, dx])
                if w == 0.0:
                    continue
                term = w * pad[dy:dy + H, dx:dx + W]
                out = term if out is None else out + term
        return out if out is not None else jnp.zeros_like(img)
    return jax.lax.conv_general_dilated(
        img[None, None], k[None, None].astype(img.dtype),
        window_strides=(1, 1), padding="SAME",
    )[0, 0]


_SCHARR_X = jnp.array([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]]) / 32.0
_SCHARR_Y = jnp.array([[-3.0, -10, -3], [0, 0, 0], [3, 10, 3]]) / 32.0


def gradients(img):
    """Scharr image gradients (Ix, Iy), same shape as img."""
    return _conv2(img, _SCHARR_X), _conv2(img, _SCHARR_Y)


def downsample2(img):
    """2x2 average-pool downsample (H, W) -> (H//2, W//2)."""
    H, W = img.shape
    return img[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))


def build_pyramid(img, levels=3):
    """List of `levels + 1` images, level 0 = full resolution (the
    reference builds a 3-level LK pyramid, opencv_image.cpp:151-155)."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(downsample2(pyr[-1]))
    return pyr


def clahe(img, clip_limit=6.0, grid=8, n_bins=64):
    """Contrast-limited adaptive histogram equalization
    (OpenCvImage::preprocess uses cv::CLAHE(6.0, 8x8)).

    Fixed-shape implementation: per-tile soft histograms -> clipped &
    redistributed -> per-tile CDF lookup -> bilinear blend between the
    four surrounding tile CDFs. img in [0, 1]; returns [0, 1].

    TPU formulation: within any *half-tile* block the four contributing
    tiles are the same, so the image is processed as a (2·grid, 2·grid)
    grid of half-tile blocks with STATIC tile indexing — no per-pixel
    gathers of CDF rows (a gather-based variant measured 52 ms/frame at
    480x752; this one ~2 ms). The per-pixel CDF value lookup is a one-hot
    (pixels, bins) operand contracted against the per-block (bins, 8) LUT
    stack on the MXU.
    """
    H, W = img.shape
    gh = gw = grid
    th, tw = -(-H // gh), -(-W // gw)  # ceil tile size
    th += th % 2
    tw += tw % 2                       # even tiles => clean half-tile blocks
    Hp, Wp = th * gh, tw * gw
    pad = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
    tiles = pad.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(gh, gw, th * tw)

    # soft histogram per tile
    bins = jnp.linspace(0.0, 1.0, n_bins, dtype=img.dtype)
    x = tiles[..., None]  # (gh, gw, n, 1)
    onehot = (jnp.abs(x - bins) <= (0.5 / (n_bins - 1))).astype(img.dtype)
    hist = onehot.sum(axis=2)  # (gh, gw, n_bins)

    # clip + redistribute
    npix = th * tw
    clip = clip_limit * npix / n_bins
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / n_bins

    cdf = jnp.cumsum(hist, axis=-1)
    cdf = cdf / cdf[..., -1:]

    # edge-replicated tile grid: border blocks clamp to the edge tiles
    cdfp = jnp.pad(cdf, ((1, 1), (1, 1), (0, 0)), mode="edge")

    # static 4-neighbor tile indices per half-tile block (2gh, 2gw)
    a = np.arange(2 * gh)
    b = np.arange(2 * gw)
    ty0 = (a - 1) // 2 + 1             # in padded-grid coords
    tx0 = (b - 1) // 2 + 1
    l00 = cdfp[ty0[:, None], tx0[None, :]]          # (2gh, 2gw, n_bins)
    l01 = cdfp[ty0[:, None], tx0[None, :] + 1]
    l10 = cdfp[ty0[:, None] + 1, tx0[None, :]]
    l11 = cdfp[ty0[:, None] + 1, tx0[None, :] + 1]
    # shifted LUTs give lut[vi + 1] through the same one-hot
    Ls = jnp.stack([l00, l01, l10, l11], axis=-1)   # (2gh, 2gw, nb, 4)
    Lsh = jnp.concatenate([Ls[:, :, 1:, :], Ls[:, :, -1:, :]], axis=2)
    L = jnp.concatenate([Ls, Lsh], axis=-1)         # (2gh, 2gw, nb, 8)

    # per-pixel bin one-hot, blocked (2gh, 2gw, hh*hw, n_bins)
    hh, hw = th // 2, tw // 2
    blk = pad.reshape(2 * gh, hh, 2 * gw, hw).transpose(0, 2, 1, 3)
    v = blk.reshape(2 * gh, 2 * gw, hh * hw) * (n_bins - 1)
    vi = jnp.clip(jnp.floor(v), 0, n_bins - 2)
    vf = v - vi
    iota = jax.lax.broadcasted_iota(img.dtype, (1, 1, 1, n_bins), 3)
    E = (iota == vi[..., None]).astype(img.dtype)

    # all 8 lookups in ONE batched matmul: (blk, pix, nb) @ (blk, nb, 8).
    # HIGHEST precision: the one-hot contraction must reproduce the CDF
    # values exactly (default MXU precision quantizes operands to bf16,
    # ~0.5 graylevel error)
    C = jnp.einsum("ghpn,ghnc->ghpc", E, L,
                   preferred_element_type=img.dtype,
                   precision=jax.lax.Precision.HIGHEST)  # (2gh, 2gw, pix, 8)

    # bilinear blend weights: fy/fx are static ramps per block parity
    yy = (np.arange(Hp) + 0.5) / th - 0.5
    xx = (np.arange(Wp) + 0.5) / tw - 0.5
    fy = jnp.asarray(np.clip(yy - np.floor(yy) if gh > 1 else yy * 0.0, 0.0, 1.0)
                     .reshape(2 * gh, hh), img.dtype)
    fx = jnp.asarray(np.clip(xx - np.floor(xx) if gw > 1 else xx * 0.0, 0.0, 1.0)
                     .reshape(2 * gw, hw), img.dtype)
    # border clamp (y0 was clipped in the gather variant; replicate-pad of
    # cdf makes l0 == l1 there, so any weight works — keep the exact ramp)
    wy = fy[:, None, :, None]                        # (2gh, 1, hh, 1)
    wx = fx[None, :, None, :]                        # (1, 2gw, 1, hw)
    Cb = C.reshape(2 * gh, 2 * gw, hh, hw, 8)
    vfb = vf.reshape(2 * gh, 2 * gw, hh, hw)

    def pick(i):
        return Cb[..., i] * (1 - vfb) + Cb[..., i + 4] * vfb

    out = (pick(0) * (1 - wy) * (1 - wx) + pick(1) * (1 - wy) * wx
           + pick(2) * wy * (1 - wx) + pick(3) * wy * wx)
    out = out.transpose(0, 2, 1, 3).reshape(Hp, Wp)
    return out[:H, :W]
