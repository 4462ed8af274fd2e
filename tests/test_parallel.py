"""Distributed / batched solving tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pvio_tpu.estimation import ba
from pvio_tpu.io import synthetic
from pvio_tpu.io.checkpoint import load_window, save_window
from pvio_tpu.parallel import batch as pbatch
from pvio_tpu.parallel import sharded_ba


@pytest.fixture(scope="module")
def setup():
    scene = synthetic.make_scene(duration=2.0, n_points=160)
    w, extr, info = synthetic.solver_window_from_scene(
        scene, [0, 4, 8, 12, 16], F_cap=6, T_cap=64, dtype=jnp.float64,
        kp_noise=0.001,
    )
    cfg = ba.BAConfig(iterations=4, kp_sqrt_inv_cov=283.0, use_planes=False)
    return w, extr, cfg


def _perturb(w, seed, sigma=0.005):
    rng = np.random.default_rng(seed)
    from pvio_tpu.geometry import lie

    dp = jnp.asarray(rng.normal(size=w.p.shape) * sigma).at[0].set(0.0)
    return w._replace(p=w.p + dp)


def test_batched_solver_matches_single(setup):
    w, extr, cfg = setup
    ws = [_perturb(w, s) for s in range(3)]
    solver = pbatch.make_batched_solver(extr, cfg)
    wb, costs = solver(pbatch.stack_windows(ws))
    singles = [ba.solve(wi, extr, cfg)[0] for wi in ws]
    outs = pbatch.unstack_windows(wb, 3)
    for a, b in zip(outs, singles):
        assert np.allclose(a.p, b.p, atol=1e-10)
    assert np.asarray(costs).shape == (3,)


def test_sharded_solver_matches_unsharded(setup):
    """dp x tp sharded BA must reproduce the single-device solve."""
    w, extr, cfg = setup
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "tp"))
    solver = sharded_ba.make_sharded_solver(mesh, extr, cfg)
    ws = [_perturb(w, s) for s in range(4)]
    wb = pbatch.stack_windows(ws)
    with mesh:
        out, costs = solver(wb)
    singles = [ba.solve(wi, extr, cfg)[0] for wi in ws]
    outs = pbatch.unstack_windows(out, 4)
    for a, b in zip(outs, singles):
        p_err = np.abs(np.asarray(a.p - b.p)).max()
        assert p_err < 1e-8, p_err
    assert np.all(np.isfinite(np.asarray(costs)))


def test_checkpoint_roundtrip(setup, tmp_path):
    w, extr, cfg = setup
    path = tmp_path / "window.npz"
    save_window(path, w)
    w2 = load_window(path)
    for a, b in zip(jax.tree.leaves(w), jax.tree.leaves(w2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # loaded window solves identically
    r1, _ = ba.solve(_perturb(w, 1), extr, cfg)
    r2, _ = ba.solve(_perturb(w2, 1), extr, cfg)
    assert np.allclose(r1.p, r2.p)


def test_sharded_solver_with_planes_matches_unsharded():
    """Plane-factor BA sharded over tp must reproduce the single-device
    solve: the per-plane member count (gating the augmented factor,
    bundle_adjustor.cpp:162) is psum'd across track shards."""
    from pvio_tpu.map.window import TF_PLANE, TF_VALID

    scene = synthetic.make_scene(duration=2.0, n_points=40,
                                 n_plane_points=90, plane_z=4.6, seed=648)
    w, extr, info = synthetic.solver_window_from_scene(
        scene, [0, 4, 8, 12, 16], F_cap=6, T_cap=64, dtype=jnp.float64,
        kp_noise=0.001,
    )
    # flag tracks on the synthetic wall as plane members
    chosen = np.asarray(info["chosen"])
    on_plane = scene.plane_of_point[chosen] == 0
    T = w.inv_depth.shape[0]
    onp = np.zeros(T, bool)
    onp[: len(chosen)] = on_plane
    flags = np.where(onp, TF_PLANE | TF_VALID, np.asarray(w.track_flags))
    pid = np.where(onp, 0, -1).astype(np.int32)
    w = w._replace(
        track_flags=jnp.asarray(flags, jnp.int32),
        plane_id=jnp.asarray(pid),
        plane_normal=w.plane_normal.at[0].set(
            jnp.asarray(scene.plane_normals[0])),
        plane_distance=w.plane_distance.at[0].set(
            float(scene.plane_distances[0])),
        plane_mask=w.plane_mask.at[0].set(True),
    )
    assert int(onp.sum()) >= 25  # enough members to trigger the factor

    cfg = ba.BAConfig(iterations=3, kp_sqrt_inv_cov=283.0, use_planes=True,
                      min_plane_tracks=20)
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "tp"))
    solver = sharded_ba.make_sharded_solver(mesh, extr, cfg)
    ws = [_perturb(w, s) for s in range(4)]
    wb = pbatch.stack_windows(ws)
    with mesh:
        out, costs = solver(wb)
    singles = [ba.solve(wi, extr, cfg)[0] for wi in ws]
    outs = pbatch.unstack_windows(out, 4)
    for a, b in zip(outs, singles):
        p_err = np.abs(np.asarray(a.p - b.p)).max()
        assert p_err < 1e-8, p_err
    assert np.all(np.isfinite(np.asarray(costs)))


def test_enlarged_window_sharded_ba():
    """BASELINE config 5 shape: enlarged keyframe window (16 frames, 256
    track slots) partitioned over the mesh - tracks sharded tp=4, dp=2
    sequence batch; the reduced camera system (16*15=240 dims) assembles
    via psum and solves replicated. Checks agreement with single-device."""
    scene = synthetic.make_scene(duration=6.0, fps=20.0, n_points=300,
                                 seed=7)
    kf = list(range(0, 16 * 4, 4))
    w, extr, info = synthetic.solver_window_from_scene(
        scene, kf, F_cap=16, T_cap=256, dtype=jnp.float64, kp_noise=0.001)
    assert info["n_frames"] == 16
    cfg = ba.BAConfig(iterations=2, kp_sqrt_inv_cov=283.0, use_planes=False)
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "tp"))
    solver = sharded_ba.make_sharded_solver(mesh, extr, cfg)
    ws = [_perturb(w, s) for s in range(2)]
    wb = pbatch.stack_windows(ws)
    with mesh:
        out, costs = solver(wb)
    singles = [ba.solve(wi, extr, cfg)[0] for wi in ws]
    outs = pbatch.unstack_windows(out, 2)
    for a, b in zip(outs, singles):
        p_err = np.abs(np.asarray(a.p - b.p)).max()
        assert p_err < 1e-8, p_err
