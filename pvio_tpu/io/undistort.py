"""Image undistortion with precomputed remap tables.

Re-design of reference pvio-extra ImageUndistorter
(image_undistorter.h:26-105): supports the radial-tangential (radtan)
and equidistant (fisheye, TUM-VI) models. The remap table is built once on
host; per-image remapping is a bilinear gather that runs as a jitted
device kernel.
"""

import numpy as np

import jax
import jax.numpy as jnp


def _distort_radtan(x, y, k1, k2, p1, p2):
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return xd, yd


def _distort_equidistant(x, y, k1, k2, k3, k4):
    r = np.sqrt(x * x + y * y)
    r = np.where(r < 1e-12, 1e-12, r)
    theta = np.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = theta_d / r
    return x * scale, y * scale


class ImageUndistorter:
    """Precomputes the map from undistorted pixels to distorted source
    pixels; apply() remaps an image so the pinhole model K holds."""

    def __init__(self, K, distortion, model, image_size):
        W, H = image_size
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        xs = (np.arange(W) - cx) / fx
        ys = (np.arange(H) - cy) / fy
        X, Y = np.meshgrid(xs, ys)
        if model == "radtan":
            k1, k2, p1, p2 = (list(distortion) + [0.0] * 4)[:4]
            Xd, Yd = _distort_radtan(X, Y, k1, k2, p1, p2)
        elif model == "equidistant":
            k1, k2, k3, k4 = (list(distortion) + [0.0] * 4)[:4]
            Xd, Yd = _distort_equidistant(X, Y, k1, k2, k3, k4)
        elif model in (None, "none"):
            Xd, Yd = X, Y
        else:
            raise ValueError(f"unknown distortion model {model!r}")
        self.map_x = jnp.asarray(Xd * fx + cx, jnp.float32)
        self.map_y = jnp.asarray(Yd * fy + cy, jnp.float32)

        def remap(img):
            Hh, Ww = img.shape
            x = jnp.clip(self.map_x, 0.0, Ww - 1.001)
            y = jnp.clip(self.map_y, 0.0, Hh - 1.001)
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            fx_ = x - x0
            fy_ = y - y0
            i00 = img[y0, x0]
            i01 = img[y0, x0 + 1]
            i10 = img[y0 + 1, x0]
            i11 = img[y0 + 1, x0 + 1]
            return (i00 * (1 - fy_) * (1 - fx_) + i01 * (1 - fy_) * fx_
                    + i10 * fy_ * (1 - fx_) + i11 * fy_ * fx_)

        self._remap = jax.jit(remap)

    def apply(self, img):
        return self._remap(jnp.asarray(img, jnp.float32))
