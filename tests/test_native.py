"""Native C++ sensor runtime vs pure-Python reference implementation."""

import numpy as np
import pytest

from pvio_tpu.io import synthetic
from pvio_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def feed(hub, scene, n_frames=10):
    out = []
    fi = 0
    for k in range(len(scene.imu_t)):
        t = scene.imu_t[k]
        hub.push_gyro(t, *scene.gyro[k])
        hub.push_accel(t, *scene.accel[k])
        while fi < n_frames and scene.frame_t[fi] <= t:
            hub.push_frame(fi, scene.frame_t[fi])
            fi += 1
        while (got := hub.poll_frame()) is not None:
            out.append(got)
    return out


def test_hub_pairing_and_frame_association():
    scene = synthetic.make_scene(duration=1.0, n_points=10)
    hub = native.NativeSensorHub()
    frames = feed(hub, scene, n_frames=10)
    assert len(frames) == 10
    for i, (fid, t, ts, ws, accs) in enumerate(frames):
        assert fid == i
        assert np.isclose(t, scene.frame_t[i])
        assert len(ts) >= 1
        # full-interval coverage: first sample at (or before) the previous
        # frame time, last at (or just before) this frame time
        if i > 0:
            assert ts[0] <= scene.frame_t[i - 1] + 1e-9
        assert ts[-1] <= t + 1e-9
        assert np.all(np.diff(ts) >= 0)
        # gyro values match the stream at matching timestamps
        for j, tj in enumerate(ts):
            k = np.argmin(np.abs(scene.imu_t - tj))
            if np.isclose(scene.imu_t[k], tj):
                assert np.allclose(ws[j], scene.gyro[k], atol=1e-12)


def test_hub_predict_matches_python():
    from pvio_tpu.core.core import _propagate

    scene = synthetic.make_scene(duration=0.5, n_points=10)
    hub = native.NativeSensorHub()
    # no frames: all samples stay pending
    for k in range(len(scene.imu_t)):
        hub.push_gyro(scene.imu_t[k], *scene.gyro[k])
        hub.push_accel(scene.imu_t[k], *scene.accel[k])
    q0 = np.array(scene.q_wb[0])
    p0 = np.array(scene.p_wb[0])
    v0 = np.array(scene.v_wb[0])
    bg = np.zeros(3)
    ba = np.zeros(3)
    t0, t1 = 0.0, 0.4
    state = np.concatenate([q0, p0, v0, bg, ba])
    qn, pn = hub.predict(state, t0, t1)

    sel = (scene.imu_t > t0) & (scene.imu_t <= t1)
    qp, pp, vp, _ = _propagate(q0, p0, v0, bg, ba, t0,
                               scene.imu_t[sel], scene.gyro[sel],
                               scene.accel[sel])
    assert np.allclose(qn, qp, atol=1e-12)
    assert np.allclose(pn, pp, atol=1e-12)
    # and close to ground truth (noise-free IMU)
    gt_i = np.argmin(np.abs(scene.frame_t - t1))
    assert np.linalg.norm(pn - scene.p_wb[gt_i]) < 5e-3


def test_native_tum_writer(tmp_path):
    from pvio_tpu.io.tum_writer import load_tum

    path = tmp_path / "native.tum"
    q = np.array([0.9, 0.1, -0.2, 0.3])
    q = q / np.linalg.norm(q)
    p = np.array([1.0, -2.0, 3.0])
    with native.NativeTumWriter(path) as w:
        w.write_pose(1.5, q, p)
    t, q2, p2 = load_tum(path)
    assert np.isclose(t[0], 1.5)
    assert np.allclose(q2[0], q, atol=1e-8)
    assert np.allclose(p2[0], p, atol=1e-8)


def test_core_native_matches_python_pairing():
    """Drive two Cores (native / python) with identical sensor streams and
    an oracle-free check: the dispatched IMU buffers must match."""
    from pvio_tpu.core.core import Core
    from pvio_tpu.io.config import Config

    captured = {"native": [], "python": []}

    class SpyTracker:
        def __init__(self, key):
            self.key = key
            self.frames = []
            self.initialized = False

        def track_frame(self, fid, t, img, ts, ws, accs):
            captured[self.key].append((fid, t, ts.copy(), ws.copy()))
            from pvio_tpu.core.feature_tracker import RawFrame
            return RawFrame(fid, t, np.zeros((1, 2)), np.zeros(1, bool),
                            -np.ones(1, np.int64), ts, ws, accs)

        def frame_by_id(self, fid):
            return None

    scene = synthetic.make_scene(duration=1.0, n_points=10)
    cfg = Config()
    for key, use_native in (("native", True), ("python", False)):
        core = Core(cfg, use_native=use_native)
        if key == "native":
            assert core.hub is not None
        core.feature_tracker = SpyTracker(key)
        core.frontend.issue_frame = lambda rf: None
        fi = 0
        for k in range(len(scene.imu_t)):
            t = scene.imu_t[k]
            core.track_gyroscope(t, *scene.gyro[k])
            core.track_accelerometer(t, *scene.accel[k])
            while fi < 8 and scene.frame_t[fi] <= t:
                core.track_camera(scene.frame_t[fi], None)
                fi += 1
            if fi >= 8:
                break
        # reset frame counter state for second run
    na, py = captured["native"], captured["python"]
    assert len(na) == len(py) > 0
    for (fa, ta, tsa, wsa), (fp, tp, tsp, wsp) in zip(na, py):
        assert fa == fp and np.isclose(ta, tp)
        assert np.allclose(tsa, tsp, atol=1e-12), (tsa, tsp)
        assert np.allclose(wsa, wsp, atol=1e-12)
