"""End-to-end dataset drill (VERDICT r4 item 4, BASELINE config-1
mechanics): render a synthetic sequence INTO an on-disk ASL/EuRoC
directory (PNG frames + ns CSVs), then run the REAL CLI path —
``python -m pvio_tpu.run euroc://<dir> config/euroc.yaml`` — and assert
the ATE of the trajectory.tum it writes against the ground-truth CSV.

This closes the loop the reference validates with real datasets
(pvio-pc/src/euroc_dataset_reader.cpp:21-104 CSV+image parsing,
output_writer.h:46-51 TUM writing, main.cpp:214-257 the drive loop):
disk -> reader (native C++ loader when buildable) -> undistorter ->
engine -> TUM writer -> ATE. Everything upstream of this test covered
the pieces only in isolation (tests/test_io.py is reader-deep).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pvio_tpu import Config
from pvio_tpu.geometry import wahba
from pvio_tpu.io import synthetic
from pvio_tpu.io.tum_writer import load_tum

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_cli_euroc_dataset_to_trajectory_ate(tmp_path):
    cfg = Config.from_yaml(os.path.join(REPO, "config", "euroc.yaml"))
    assert cfg.initializer_max_scale == 1.0  # production init gate stays on
    # init_ramp keeps the init-window sweep < 1 m (the reference's scale
    # sanity bound, initializer.cpp:216) without shrinking the rest
    scene = synthetic.make_scene(duration=10.0, fps=20.0, imu_rate=200.0,
                                 n_points=8, seed=648, init_ramp=0.3)
    synthetic.write_asl_dataset(
        scene, tmp_path, cfg.K, cfg.image_size,
        q_bc=np.asarray(cfg.q_bc), p_bc=np.asarray(cfg.p_bc),
        distortion=cfg.camera_distortion,
        distortion_model=cfg.camera_distortion_model)
    # sanity: the ASL layout is complete
    assert (tmp_path / "mav0" / "cam0" / "data.csv").exists()
    assert (tmp_path / "mav0" / "imu0" / "data.csv").exists()
    n_png = len(list((tmp_path / "mav0" / "cam0" / "data").glob("*.png")))
    assert n_png == len(scene.frame_t)

    out = tmp_path / "trajectory.tum"
    from pvio_tpu import run as cli

    rc = cli.main([f"euroc://{tmp_path}",
                   os.path.join(REPO, "config", "euroc.yaml"),
                   "--output", str(out), "--dtype", "float64"])
    assert rc == 0
    assert out.exists()

    t_est, _, p_est = load_tum(out)
    t_gt, p_gt, _ = synthetic.load_asl_groundtruth(tmp_path)
    g2i = {round(t, 6): i for i, t in enumerate(t_gt)}
    est, gt = [], []
    for k, t in enumerate(t_est):
        i = g2i.get(round(float(t), 6))
        if i is not None:
            est.append(p_est[k])
            gt.append(p_gt[i])
    assert len(est) >= 150, len(est)
    est = jnp.asarray(np.array(est))
    gt = jnp.asarray(np.array(gt))
    s, _, _ = wahba.find_srt(est, gt)
    ate = float(wahba.ate_rmse(est, gt, with_scale=False))
    # measured on this exact drill: ATE 0.176 m, scale within 5% — the
    # init_ramp-damped start halves early depth observability, like the
    # traj_scale=0.6 run of test_golden_run_second_seed (measured
    # 0.113 m there); this test pins the MECHANICS (disk -> native
    # reader -> undistort -> engine -> TUM writer -> ATE), the accuracy
    # tiers are pinned by the full-sweep goldens
    assert abs(float(s) - 1.0) < 0.08, f"scale {float(s)}"
    assert ate < 0.30, f"ATE {ate} m"
