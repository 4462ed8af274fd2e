"""Pinhole camera helpers (reference: pvio/src/pvio/geometry/stereo.h:25-37).

Points live in K-normalized image coordinates throughout the pipeline (the
reference stores keypoints normalized, frame.cpp:72-87); `apply_k`/`remove_k`
convert to/from pixels. All functions broadcast over leading batch dims.
"""

import jax.numpy as jnp


def apply_k(p, K):
    """Normalized (..., 2) -> pixel coords, K (..., 3, 3)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack([p[..., 0] * fx + cx, p[..., 1] * fy + cy], axis=-1)


def remove_k(p, K):
    """Pixel (..., 2) -> normalized coords."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack([(p[..., 0] - cx) / fx, (p[..., 1] - cy) / fy], axis=-1)


def project(p):
    """Camera-frame 3D point (..., 3) -> normalized image point (..., 2).

    Safe at z == 0 (returns large values, no NaN/Inf in gradients when the
    caller masks such observations out).
    """
    z = p[..., 2:3]
    zs = jnp.where(jnp.abs(z) < 1e-12, jnp.where(z < 0, -1e-12, 1e-12), z)
    return p[..., :2] / zs


def dproj_dp(p):
    """Jacobian of `project` w.r.t. the 3D point: (..., 3) -> (..., 2, 3)
    (reference stereo.h:34-37)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    iz = 1.0 / z
    iz2 = iz * iz
    zr = jnp.zeros_like(z)
    return jnp.stack(
        [
            jnp.stack([iz, zr, -x * iz2], axis=-1),
            jnp.stack([zr, iz, -y * iz2], axis=-1),
        ],
        axis=-2,
    )
