"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (no TPU pod needed) with float64
enabled so numeric validation against analytic formulas can be tight. The
library itself is dtype-polymorphic: production TPU runs use float32.

Note: this environment's sitecustomize pre-imports jax and registers the
'axon' TPU plugin, so JAX_PLATFORMS in os.environ is read too early to
help — we must override the platform through jax.config *before* the first
backend initialization, and XLA_FLAGS before any device query.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(648)  # reference's default RANSAC seed (config.cpp:91-93)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Fence for an XLA CPU-compiler segfault under accumulated state.

    A full single-process suite run reproducibly SIGSEGVs inside
    jax backend_compile_and_load (XLA CPU) after ~90 tests' worth of
    compiled executables — not an OOM (125 GB box), and every module
    passes in a fresh process. Dropping the compilation caches between
    modules keeps the compiler's resident state small enough to avoid
    the crash, at the cost of some recompilation. Engine-level caching
    (DeviceKernels) is unaffected: its jitted callables simply recompile
    on first use in the next module.
    """
    yield
    jax.clear_caches()
    import gc

    gc.collect()
