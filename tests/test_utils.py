"""Utility subsystem tests: forensics bus, autodiff helper."""

import time

import jax.numpy as jnp
import numpy as np

from pvio_tpu.utils import forensics as fz
from pvio_tpu.utils.autodiff import value_and_jacfwd


def test_forensics_timer_and_slots():
    bus = fz.Forensics()
    with bus.timer("bundle_adjustor_solve_time"):
        time.sleep(0.01)
    t = bus.get("bundle_adjustor_solve_time")
    assert t is not None and t >= 0.009
    bus.set("sliding_window_landmarks", 42)
    assert bus.summary()["sliding_window_landmarks"] == 42


def test_forensics_rate_measurement():
    bus = fz.Forensics()
    for i in range(10):
        bus.measure_rate("camera_input_rate", i * 0.05)
    assert abs(bus.get("camera_input_rate") - 20.0) < 1e-9


def test_forensics_disabled_is_noop():
    fz.Forensics.enabled = False
    try:
        bus = fz.Forensics()
        with bus.timer("feature_tracker_time"):
            pass
        bus.set("input_output_lag", 1.0)
        bus.measure_rate("camera_input_rate", 0.0)
        assert bus.summary() == {}
    finally:
        fz.Forensics.enabled = True


def test_value_and_jacfwd():
    f = lambda x: jnp.stack([x[0] * x[1], x[0] ** 2])
    x = jnp.array([2.0, 3.0])
    y, J = value_and_jacfwd(f, x)
    assert np.allclose(y, [6.0, 4.0])
    assert np.allclose(J, [[3.0, 2.0], [4.0, 0.0]])


def test_model_presets():
    """Preset registry (pvio-pc/config/*.yaml role): every preset builds a
    complete Config; tum_vi carries the 512 fisheye geometry the reference
    hardcodes in its reader (tum_dataset_reader.cpp:73-81)."""
    from pvio_tpu import models

    for name in models.PRESETS:
        cfg = models.config(name)
        assert cfg.window_frame_capacity > cfg.sliding_window_size
    tv = models.config("tum_vi")
    assert tv.camera_distortion_model == "equidistant"
    assert tv.image_size == (512, 512)
    assert models.config("vio_no_planes").enable_plane_constraint is False
    fast = models.config("fast")
    assert fast.track_capacity <= 128
    step, _ = models.batched_solver()
    assert callable(step)
