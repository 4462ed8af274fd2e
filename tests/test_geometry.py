"""Triangulation / homography / essential / wahba property tests.

Mirrors the reference's de-facto validation strategy (SURVEY §4): solve →
decompose → round-trip on synthetic scenes with known ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvio_tpu.geometry import camera, essential, homography, lie, triangulation, wahba


def make_two_view(rng, n=32, planar=False):
    """Synthetic two-view scene. Returns (x1, x2, R, t, points)."""
    if planar:
        # points on plane z = 4 + 0.3x + 0.1y
        xy = rng.uniform(-2, 2, size=(n, 2))
        z = 4.0 + 0.3 * xy[:, 0] + 0.1 * xy[:, 1]
        pts = np.concatenate([xy, z[:, None]], axis=-1)
    else:
        pts = rng.uniform(-2, 2, size=(n, 3))
        pts[:, 2] = rng.uniform(3, 8, size=n)
    w = rng.normal(size=3) * 0.1
    R = np.asarray(lie.expmap_mat(jnp.asarray(w)))
    t = rng.normal(size=3) * 0.5
    p_cam2 = pts @ R.T + t
    x1 = pts[:, :2] / pts[:, 2:]
    x2 = p_cam2[:, :2] / p_cam2[:, 2:]
    return (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts))


def test_apply_remove_k(rng):
    K = jnp.array([[458.0, 0, 367.2], [0, 457.3, 248.4], [0, 0, 1.0]])
    p = jnp.asarray(rng.normal(size=(16, 2)))
    assert np.allclose(camera.remove_k(camera.apply_k(p, K), K), p, atol=1e-12)


def test_dproj_dp_matches_autodiff(rng):
    p = jnp.asarray(rng.uniform(1, 5, size=(8, 3)))
    J = camera.dproj_dp(p)
    Jad = jax.vmap(jax.jacfwd(camera.project))(p)
    assert np.allclose(J, Jad, atol=1e-12)


def test_triangulate_two_view_recovers_points(rng):
    x1, x2, R, t, pts = make_two_view(rng)
    p, valid, score = triangulation.triangulate_two_view(R, t, x1, x2)
    assert bool(np.all(valid))
    assert np.allclose(p, pts, atol=1e-6)
    assert np.all(np.asarray(score) < 1e-12)


def test_triangulate_cheirality_rejects_behind(rng):
    x1, x2, R, t, pts = make_two_view(rng, n=8)
    # flip translation: triangulated points land behind one camera
    p, valid, score = triangulation.triangulate_two_view(R, -t + 2.0, x1, x2)
    # with wrong geometry most points should fail the checks
    assert np.asarray(valid).sum() < 8


def test_triangulate_nview_masked(rng):
    x1, x2, R, t, pts = make_two_view(rng, n=10)
    I = jnp.broadcast_to(jnp.eye(3, 4), (10, 3, 4))
    P2 = jnp.broadcast_to(triangulation.pose_matrix(R, t), (10, 3, 4))
    junk = jnp.broadcast_to(triangulation.pose_matrix(R, t + 100.0), (10, 3, 4))
    Ps = jnp.stack([I, P2, junk], axis=1)  # (10, 3 views, 3, 4)
    xs = jnp.stack([x1, x2, x2 * 0.0], axis=1)
    mask = jnp.array([[True, True, False]] * 10)
    p, valid, score = triangulation.triangulate_scored(Ps, xs, mask)
    assert bool(np.all(valid))
    assert np.allclose(p, pts, atol=1e-6)


def test_select_rt_hypothesis(rng):
    x1, x2, R, t, pts = make_two_view(rng, n=24)
    R1, R2, T = essential.decompose_essential(
        jnp.asarray(lie.hat(t) @ R)
    )
    Rs = jnp.stack([R1, R1, R2, R2])
    Ts = jnp.stack([T, -T, T, -T])
    best, p, status, count = triangulation.select_rt_hypothesis(Rs, Ts, x1, x2)
    Rb, Tb = Rs[best], Ts[best]
    assert np.allclose(Rb, R, atol=1e-6)
    # T only up to scale
    Tn = np.asarray(Tb) / np.linalg.norm(Tb)
    assert np.allclose(np.abs(np.dot(Tn, t / np.linalg.norm(t))), 1.0, atol=1e-6)
    assert int(count) == 24


def test_homography_solve_planar(rng):
    x1, x2, R, t, pts = make_two_view(rng, n=16, planar=True)
    H = homography.solve_homography(x1, x2)
    err = homography.homography_geometric_error(H, x1, x2)
    assert np.all(np.asarray(err) < 1e-10)


def test_homography_decompose_recovers_motion(rng):
    x1, x2, R, t, pts = make_two_view(rng, n=32, planar=True)
    H = homography.solve_homography(x1, x2)
    Rs, Ts, ns, pure_rot = homography.decompose_homography(H)
    assert not bool(pure_rot)
    # one of the two (R, T) pairs (or their point-reflections) matches
    errs = []
    for i in range(2):
        errs.append(np.linalg.norm(np.asarray(Rs[i]) - np.asarray(R)))
    assert min(errs) < 1e-4
    i = int(np.argmin(errs))
    Tn = np.asarray(Ts[i]) / max(np.linalg.norm(Ts[i]), 1e-12)
    tn = t / np.linalg.norm(t)
    assert np.allclose(np.abs(np.dot(Tn, tn)), 1.0, atol=1e-4)


def test_homography_pure_rotation(rng):
    pts = rng.uniform(-2, 2, size=(16, 3))
    pts[:, 2] = rng.uniform(3, 8, size=16)
    w = rng.normal(size=3) * 0.2
    R = np.asarray(lie.expmap_mat(jnp.asarray(w)))
    p2 = pts @ R.T
    x1 = jnp.asarray(pts[:, :2] / pts[:, 2:])
    x2 = jnp.asarray(p2[:, :2] / p2[:, 2:])
    H = homography.solve_homography(x1, x2)
    Rs, Ts, ns, pure_rot = homography.decompose_homography(H)
    assert bool(pure_rot)
    assert np.allclose(Rs[0], R, atol=1e-6)
    assert np.allclose(Ts, 0.0)


def test_essential_8pt(rng):
    x1, x2, R, t, pts = make_two_view(rng, n=32)
    E = essential.solve_essential_8pt(x1, x2)
    err = essential.essential_symmetric_error(E, x1, x2)
    assert np.all(np.asarray(err) < 1e-12)


def test_essential_5pt_contains_truth(rng):
    x1, x2, R, t, pts = make_two_view(rng, n=5)
    Es, mask = essential.solve_essential_5pt(x1, x2)
    assert int(np.asarray(mask).sum()) >= 1
    E_true = np.asarray(lie.hat(jnp.asarray(t))) @ np.asarray(R)
    E_true = E_true / np.linalg.norm(E_true)
    best = np.inf
    for i in range(10):
        if not bool(mask[i]):
            continue
        Ei = np.asarray(Es[i])
        err = min(np.linalg.norm(Ei - E_true), np.linalg.norm(Ei + E_true))
        best = min(best, err)
    assert best < 1e-6


def test_essential_5pt_epipolar_consistency(rng):
    """All returned candidates must satisfy the 5 epipolar constraints and
    the essential-manifold property."""
    x1, x2, R, t, pts = make_two_view(rng, n=5)
    Es, mask = essential.solve_essential_5pt(x1, x2)
    for i in range(10):
        if not bool(mask[i]):
            continue
        E = np.asarray(Es[i])
        err = np.asarray(essential.essential_geometric_error(Es[i], x1, x2))
        assert np.all(err < 1e-9), err
        # det E = 0 and 2 E E^T E - tr(E E^T) E = 0
        assert abs(np.linalg.det(E)) < 1e-8
        M = E @ E.T
        C = 2 * M @ E - np.trace(M) * E
        assert np.linalg.norm(C) < 1e-7


def test_decompose_essential_roundtrip(rng):
    x1, x2, R, t, pts = make_two_view(rng)
    E = jnp.asarray(lie.hat(jnp.asarray(t / np.linalg.norm(t))) @ R)
    R1, R2, T = essential.decompose_essential(E)
    ok = False
    for Rc in (R1, R2):
        for Tc in (T, -T):
            if np.allclose(Rc, R, atol=1e-8) and np.allclose(
                Tc, t / np.linalg.norm(t), atol=1e-8
            ):
                ok = True
    assert ok


def test_kabsch_and_srt(rng):
    src = jnp.asarray(rng.normal(size=(32, 3)))
    w = rng.normal(size=3)
    R = lie.expmap_mat(jnp.asarray(w))
    s = 2.7
    t = jnp.asarray(rng.normal(size=3))
    dst = s * (src @ R.T) + t
    s2, R2, t2 = wahba.find_srt(src, dst)
    assert np.allclose(s2, s, atol=1e-9)
    assert np.allclose(R2, R, atol=1e-9)
    assert np.allclose(t2, t, atol=1e-8)
    assert float(wahba.ate_rmse(src, dst)) < 1e-9
