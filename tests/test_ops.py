"""Pallas kernel validation (interpret mode on CPU) against the pure-JAX
reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvio_tpu.frontend import detect, image as img_ops, klt
from pvio_tpu.ops import klt_pallas


def render_blobs(rng, H=240, W=320, n=60, sigma=2.0, shift=(0.0, 0.0)):
    cx = rng.uniform(25, W - 25, size=n) + shift[0]
    cy = rng.uniform(25, H - 25, size=n) + shift[1]
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W))
    for x, y in zip(cx, cy):
        img += np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * sigma**2))
    return jnp.asarray(np.clip(img, 0, 1), jnp.float32)


def test_pallas_klt_matches_reference(rng):
    shift = (5.2, -3.7)
    img1 = render_blobs(rng)
    rng2 = np.random.default_rng(648)
    img2 = render_blobs(rng2, shift=shift)
    pyr1 = [im.astype(jnp.float32) for im in img_ops.build_pyramid(img1, 3)]
    pyr2 = [im.astype(jnp.float32) for im in img_ops.build_pyramid(img2, 3)]
    kp, mask = detect.detect_keypoints(img1, max_keypoints=30, min_distance=15.0)
    kp = kp.astype(jnp.float32)

    kp_ref, st_ref = klt.track_keypoints(pyr1, pyr2, kp, kp, mask)
    kp_pl, st_pl = klt_pallas.track_keypoints(pyr1, pyr2, kp, kp, mask,
                                              interpret=True)
    ok = np.asarray(st_ref) & np.asarray(st_pl)
    assert ok.sum() >= 15
    d = np.linalg.norm(np.asarray(kp_ref - kp_pl)[ok], axis=-1)
    assert np.median(d) < 0.05, d
    flow = np.asarray(kp_pl - kp)[ok]
    err = np.linalg.norm(flow - np.asarray(shift), axis=-1)
    assert np.median(err) < 0.3


def test_pallas_klt_rejects_border(rng):
    img1 = render_blobs(rng)
    img2 = render_blobs(np.random.default_rng(648))
    pyr1 = [im.astype(jnp.float32) for im in img_ops.build_pyramid(img1, 3)]
    pyr2 = [im.astype(jnp.float32) for im in img_ops.build_pyramid(img2, 3)]
    kp = jnp.asarray([[2.0, 2.0], [100.0, 100.0]], jnp.float32)
    mask = jnp.ones(2, bool)
    kp2, st = klt_pallas.track_keypoints(pyr1, pyr2, kp, kp, mask, interpret=True)
    assert not bool(st[0])  # too close to the border
    assert np.isfinite(np.asarray(kp2)).all()
