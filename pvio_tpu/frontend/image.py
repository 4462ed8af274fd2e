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


def normalize(img):
    lo = jnp.min(img)
    hi = jnp.max(img)
    return (img - lo) / jnp.maximum(hi - lo, 1e-6)


def _conv2(img, k):
    """Same-padded 2D correlation of (H, W) with kernel (kh, kw)."""
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
    redistributed -> per-tile CDF lookup -> bilinear blend between the four
    surrounding tile CDFs. img in [0, 1]; returns [0, 1].
    """
    H, W = img.shape
    gh = gw = grid
    th, tw = -(-H // gh), -(-W // gw)  # ceil tile size
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

    # per-pixel: bilinear interpolation of the 4 neighboring tile CDFs
    yy = (jnp.arange(Hp, dtype=img.dtype) + 0.5) / th - 0.5
    xx = (jnp.arange(Wp, dtype=img.dtype) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, gh - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, gw - 1)
    y1 = jnp.clip(y0 + 1, 0, gh - 1)
    x1 = jnp.clip(x0 + 1, 0, gw - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    # lookup value in each tile's CDF via linear interp over bins
    v = pad * (n_bins - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, n_bins - 2)
    vf = v - vi

    def lut(ty, tx):
        c = cdf[ty, tx]  # (Hp, Wp, n_bins) after gather
        c0 = jnp.take_along_axis(c, vi[..., None], axis=-1)[..., 0]
        c1 = jnp.take_along_axis(c, (vi + 1)[..., None], axis=-1)[..., 0]
        return c0 * (1 - vf) + c1 * vf

    ty0 = jnp.broadcast_to(y0[:, None], (Hp, Wp))
    ty1 = jnp.broadcast_to(y1[:, None], (Hp, Wp))
    tx0 = jnp.broadcast_to(x0[None, :], (Hp, Wp))
    tx1 = jnp.broadcast_to(x1[None, :], (Hp, Wp))
    out = (
        lut(ty0, tx0) * (1 - fy) * (1 - fx)
        + lut(ty0, tx1) * (1 - fy) * fx
        + lut(ty1, tx0) * fy * (1 - fx)
        + lut(ty1, tx1) * fy * fx
    )
    return out[:H, :W]
