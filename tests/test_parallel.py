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
