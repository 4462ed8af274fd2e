"""Frontend kernel tests: pyramid/CLAHE, Shi-Tomasi detection with
Poisson-disk spacing, pyramidal LK tracking, RANSAC estimators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvio_tpu.frontend import detect, image as img_ops, klt, ransac
from pvio_tpu.geometry import essential as ess, lie


def render_blobs(rng, H=240, W=320, n=80, sigma=2.0, shift=(0.0, 0.0)):
    """Image of gaussian blobs at random positions (+ optional shift)."""
    cx = rng.uniform(20, W - 20, size=n) + shift[0]
    cy = rng.uniform(20, H - 20, size=n) + shift[1]
    amp = rng.uniform(0.4, 1.0, size=n)
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W))
    for x, y, a in zip(cx, cy, amp):
        img += a * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * sigma**2))
    return jnp.asarray(np.clip(img, 0, 1)), np.stack([cx, cy], axis=-1)


def test_pyramid_shapes(rng):
    img, _ = render_blobs(rng)
    pyr = img_ops.build_pyramid(img, levels=3)
    assert [p.shape for p in pyr] == [(240, 320), (120, 160), (60, 80), (30, 40)]


def test_clahe_improves_local_contrast(rng):
    # low-contrast image with a bright corner
    img, _ = render_blobs(rng)
    img = img * 0.2 + 0.4
    out = img_ops.clahe(img)
    assert out.shape == img.shape
    assert float(jnp.std(out)) > float(jnp.std(img))
    assert np.all(np.isfinite(np.asarray(out)))


def test_detect_finds_blob_centers(rng):
    img, centers = render_blobs(rng, n=40)
    xy, mask = detect.detect_keypoints(img, max_keypoints=60, min_distance=10.0)
    n_det = int(mask.sum())
    assert n_det >= 25
    xy_np = np.asarray(xy)[np.asarray(mask)]
    # every detection near some true blob center
    d = np.linalg.norm(xy_np[:, None, :] - centers[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 2.0


def test_detect_min_distance_respected(rng):
    img, _ = render_blobs(rng, n=60)
    xy, mask = detect.detect_keypoints(img, max_keypoints=80, min_distance=25.0)
    pts = np.asarray(xy)[np.asarray(mask)]
    if len(pts) > 1:
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() >= 25.0 - 1e-6


def test_detect_avoids_existing(rng):
    img, centers = render_blobs(rng, n=40)
    existing = jnp.asarray(centers[:10])
    emask = jnp.ones(10, bool)
    xy, mask = detect.detect_keypoints(
        img, max_keypoints=40, min_distance=15.0, existing_xy=existing, existing_mask=emask
    )
    pts = np.asarray(xy)[np.asarray(mask)]
    d = np.linalg.norm(pts[:, None] - centers[None, :10], axis=-1)
    assert d.min() >= 15.0 - 1e-6


def test_klt_tracks_pure_translation(rng):
    shift = (6.3, -4.1)
    img1, centers = render_blobs(rng, n=50)
    rng2 = np.random.default_rng(648)
    img2, _ = render_blobs(rng2, n=50, shift=shift)  # same blobs, shifted
    pyr1 = img_ops.build_pyramid(img1, 3)
    pyr2 = img_ops.build_pyramid(img2, 3)
    kp, mask = detect.detect_keypoints(img1, max_keypoints=40, min_distance=12.0)
    kp2, status = klt.track_keypoints(pyr1, pyr2, kp, kp, mask)
    ok = np.asarray(status)
    assert ok.sum() >= 20
    flow = np.asarray(kp2 - kp)[ok]
    err = np.linalg.norm(flow - np.asarray(shift), axis=-1)
    assert np.median(err) < 0.3, (np.median(err), flow[:5])


def test_klt_uses_initial_guess_for_large_motion(rng):
    shift = (25.0, 14.0)
    img1, _ = render_blobs(rng, n=50)
    rng2 = np.random.default_rng(648)
    img2, _ = render_blobs(rng2, n=50, shift=shift)
    pyr1 = img_ops.build_pyramid(img1, 3)
    pyr2 = img_ops.build_pyramid(img2, 3)
    kp, mask = detect.detect_keypoints(img1, max_keypoints=40, min_distance=12.0)
    guess = kp + jnp.asarray([24.0, 15.0])  # gyro-predicted initial flow
    kp2, status = klt.track_keypoints(pyr1, pyr2, kp, guess, mask)
    ok = np.asarray(status)
    assert ok.sum() >= 15
    flow = np.asarray(kp2 - kp)[ok]
    err = np.linalg.norm(flow - np.asarray(shift), axis=-1)
    assert np.median(err) < 0.3


def _two_view(rng, n=64, outliers=0, planar=False):
    if planar:
        xy = rng.uniform(-2, 2, size=(n, 2))
        z = 4.0 + 0.3 * xy[:, 0]
        pts = np.concatenate([xy, z[:, None]], -1)
    else:
        pts = rng.uniform(-2, 2, size=(n, 3))
        pts[:, 2] = rng.uniform(3, 8, size=n)
    w = rng.normal(size=3) * 0.1
    R = np.asarray(lie.expmap_mat(jnp.asarray(w)))
    t = rng.normal(size=3) * 0.4
    p2 = pts @ R.T + t
    x1 = pts[:, :2] / pts[:, 2:]
    x2 = p2[:, :2] / p2[:, 2:]
    if outliers:
        x2[:outliers] += rng.uniform(0.1, 0.3, size=(outliers, 2))
    return jnp.asarray(x1), jnp.asarray(x2), R, t


def test_ransac_essential_with_outliers(rng):
    x1, x2, R, t = _two_view(rng, n=64, outliers=12)
    key = jax.random.PRNGKey(648)
    E, inl, count = ransac.find_essential(key, x1, x2, jnp.ones(64, bool), threshold=0.005)
    assert int(count) >= 45
    inl_np = np.asarray(inl)
    assert inl_np[:12].sum() <= 2  # outliers rejected
    E_true = np.array(lie.hat(jnp.asarray(t)) @ R)
    E_true = E_true / np.linalg.norm(E_true)
    E_np = np.asarray(E) / np.linalg.norm(np.asarray(E))
    err = min(np.linalg.norm(E_np - E_true), np.linalg.norm(E_np + E_true))
    assert err < 0.02, err


def test_ransac_homography_planar(rng):
    x1, x2, R, t = _two_view(rng, n=48, outliers=8, planar=True)
    key = jax.random.PRNGKey(648)
    H, inl, count = ransac.find_homography(key, x1, x2, jnp.ones(48, bool), threshold=0.002)
    assert int(count) >= 35
    assert np.asarray(inl)[:8].sum() <= 1


def test_ransac_fundamental_gate(rng):
    # pixel-coordinate variant used as tracking gate
    x1, x2, R, t = _two_view(rng, n=64, outliers=10)
    K = 400.0
    p1 = x1 * K + 300.0
    p2 = x2 * K + 300.0
    key = jax.random.PRNGKey(648)
    F, inl, count = ransac.find_fundamental(key, p1, p2, jnp.ones(64, bool), threshold=1.0)
    assert int(count) >= 48
    assert np.asarray(inl)[:10].sum() <= 2


def test_ransac_plane(rng):
    n_in, n_out = 60, 30
    pts_in = np.concatenate(
        [rng.uniform(-3, 3, size=(n_in, 2)), np.zeros((n_in, 1))], axis=-1
    )
    nrm = np.array([0.2, -0.1, 0.97])
    nrm /= np.linalg.norm(nrm)
    Rm = np.asarray(lie.quat_to_mat(lie.mat_to_quat(jnp.asarray(
        np.linalg.svd(np.outer(nrm, [0, 0, 1]))[0]))))  # any rotation taking z->n
    # simpler: rotate z-plane points onto plane n.x = 1.5
    basis = np.asarray(lie.s2_tangential_basis(jnp.asarray(nrm)))
    pts_in = pts_in[:, 0:1] * basis[:, 0] + pts_in[:, 1:2] * basis[:, 1] + 1.5 * nrm
    pts_out = rng.uniform(-3, 3, size=(n_out, 3))
    pts = jnp.asarray(np.concatenate([pts_in, pts_out]))
    key = jax.random.PRNGKey(648)
    nrm_e, d_e, inl, count = ransac.find_plane(key, pts, jnp.ones(n_in + n_out, bool))
    assert int(count) >= n_in - 2
    sgn = np.sign(np.dot(np.asarray(nrm_e), nrm))
    assert np.allclose(sgn * np.asarray(nrm_e), nrm, atol=5e-3)
    assert abs(sgn * float(d_e) - 1.5) < 2e-2
    n2, d2, c2 = ransac.refine_plane_pca(pts, inl)
    assert np.allclose(np.abs(np.dot(np.asarray(n2), nrm)), 1.0, atol=1e-4)


def test_preprocess_uint8_matches_float(rng):
    """8-bit grayscale input (the reference Image ABC's native type,
    opencv_image.h) must preprocess identically to its float equivalent —
    uint8 is the production transfer format (4x less host->device
    traffic)."""
    from pvio_tpu.core.kernels import DeviceKernels
    from pvio_tpu import Config

    cfg = Config()
    cfg.image_size = (128, 96)
    cfg.camera_intrinsic = np.array([100.0, 100.0, 64.0, 48.0])
    kern = DeviceKernels(cfg)
    img8 = rng.integers(0, 256, size=(96, 128), dtype=np.uint8)
    imgf = img8.astype(np.float64) / 255.0
    pyr8 = kern.preprocess(jnp.asarray(img8))
    pyrf = kern.preprocess(jnp.asarray(imgf, kern.dtype))
    for a, b in zip(pyr8, pyrf):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5)


def test_detect_greedy_chain_and_overflow():
    """Poisson-disk selection must match sequential greedy even on a long
    priority chain (decaying corner ridge spaced under min_distance), and
    max_keypoints > candidate count must degrade gracefully."""
    H, W = 60, 1400
    img = np.zeros((H, W), np.float32)
    stamp = np.array([[0, 0, 1, 0, 0], [0, 1, 1, 1, 0], [1, 1, 1, 1, 1],
                      [0, 1, 1, 1, 0], [0, 0, 1, 0, 0]], np.float32)
    for i in range(90):
        x, y = 30 + i * 15, 30
        img[y - 2:y + 3, x - 2:x + 3] = (1.0 - i * 0.01) * stamp
    xy, m = detect.detect_keypoints(jnp.asarray(img), max_keypoints=80,
                                    min_distance=18.0, border=5)
    sel = np.asarray(xy)[np.asarray(m)]
    assert int(np.asarray(m).sum()) >= 40
    # spacing invariant: no selected pair closer than min_distance
    d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 18.0 - 1.0  # sub-pixel refinement slack
    # K > candidates: masked rows, no error
    xy2, m2 = detect.detect_keypoints(jnp.asarray(img[:, :140]),
                                      max_keypoints=2000, min_distance=3.0)
    assert xy2.shape == (2000, 2) and not np.asarray(m2)[-1]
