"""Multi-sequence end-to-end batching (BASELINE config 4, SURVEY §2.4 DP
row): N sequences' COUPLED pipelines (frontend + slot-associated VI PnP
+ periodic plane-augmented VI BA/marginalization) batched through one
vmapped device program, and the same batch dp-sharded over the virtual
mesh — per-sequence results must match the unbatched pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvio_tpu.core.kernels import DeviceKernels
from pvio_tpu.io.config import Config
from pvio_tpu.parallel import multi_seq


def small_cfg():
    cfg = Config()
    cfg.camera_intrinsic = np.array([200.0, 200.0, 160.0, 120.0])
    cfg.image_size = (320, 240)
    cfg.window_frame_capacity = 7
    cfg.sliding_window_size = 6
    cfg.track_capacity = 128
    cfg.plane_capacity = 4
    cfg.solver_iteration_limit = 6
    cfg.dtype = "float64"
    cfg.enable_plane_constraint = True
    # XLA CPU 0.9.0 aborts compiling the tree-preintegration's
    # triple-batched dots under vmap (docs/xla_cpu_segfault.md); the
    # sequential scan is bit-compatible
    cfg.preint_assoc = False
    return cfg


GROUPS = 2
KF_EVERY = 4
N_SEQ = 4


@pytest.fixture(scope="module")
def batch_inputs():
    cfg = small_cfg()
    kern = DeviceKernels(cfg)
    ws, arrays = [], []
    for i in range(N_SEQ):
        w, a = multi_seq.build_sequence_inputs(
            cfg, kern, GROUPS * KF_EVERY, seed=648 + 31 * i)
        ws.append(w)
        arrays.append(a)
    return cfg, kern, ws, arrays


@pytest.mark.slow
def test_vmapped_batch_matches_unbatched(batch_inputs):
    cfg, kern, ws, arrays = batch_inputs
    chain = multi_seq.make_chain(kern, cfg, GROUPS, KF_EVERY)
    single = jax.jit(chain)
    # unbatched per-sequence references
    ref = []
    for w, a in zip(ws, arrays):
        a_dev = jax.tree.map(jnp.asarray, a)
        costs, wf = single(w, a_dev, jnp.asarray(0.0, kern.dtype))
        ref.append((np.asarray(costs), np.asarray(wf.p)))
    # the same four sequences through ONE vmapped program
    costs_b, wfs = multi_seq.run_batched(kern, cfg, ws, arrays,
                                         GROUPS, KF_EVERY)
    assert np.isfinite(costs_b).all()
    # distinct scenes must yield distinct solves
    assert len({round(float(c[-1]), 6) for c in costs_b}) == N_SEQ
    for i in range(N_SEQ):
        np.testing.assert_allclose(costs_b[i], ref[i][0], rtol=1e-9)
        np.testing.assert_allclose(np.asarray(wfs[i].p), ref[i][1],
                                   rtol=0, atol=1e-9)


@pytest.mark.slow
def test_dp_sharded_batch_matches_unbatched(batch_inputs):
    from jax.sharding import Mesh

    cfg, kern, ws, arrays = batch_inputs
    devices = np.array(jax.devices()[:N_SEQ])
    mesh = Mesh(devices, ("dp",))
    costs_s, wfs = multi_seq.run_batched(kern, cfg, ws, arrays,
                                         GROUPS, KF_EVERY, mesh=mesh)
    chain = multi_seq.make_chain(kern, cfg, GROUPS, KF_EVERY)
    single = jax.jit(chain)
    for i in range(N_SEQ):
        a_dev = jax.tree.map(jnp.asarray, arrays[i])
        costs, wf = single(ws[i], a_dev, jnp.asarray(0.0, kern.dtype))
        np.testing.assert_allclose(costs_s[i], np.asarray(costs), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(wfs[i].p), np.asarray(wf.p),
                                   rtol=0, atol=1e-9)
