"""Fused single-pass image stencils as Pallas TPU kernels.

The Shi-Tomasi corner response (reference OpenCvImage::detect_keypoints
uses cv::GFTT, opencv_image.cpp:54-86) is a chain of small stencils:
Scharr gradients -> three gradient products -> 3x3 box sums -> min-eig
response. Expressed as XLA ops this is ~40 whole-image passes that XLA
does not fuse across the lane-shifting slices (measured 3.8 ms at
480x752, the single most expensive piece of the frontend). The Pallas
kernel runs the whole chain in ONE HBM read + ONE write: the image lives
in VMEM and every shifted tap is a register-level `pltpu.roll`
(sublane/lane rotate), so the kernel is bandwidth-bound at ~2 x 1.5 MB
of traffic. Measured: 3.8 ms -> ~0.2 ms.

Circular-shift edge effects are confined to the 2-pixel halo (the taps
reach at most 2 pixels), which callers exclude anyway via the 20 px
detection border; the returned response is exact on [2:H-2, 2:W-2] and
garbage elsewhere. The XLA reference implementation
(frontend/detect.shi_tomasi_response) remains the CPU path and the
correctness oracle (tests/test_frontend.py).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shi_tomasi_kernel(in_ref, out_ref):
    x = in_ref[:]

    H, W = in_ref.shape

    def sh(a, dy, dx):
        # pltpu.roll requires non-negative shifts; -d mod size is the
        # same circular shift. The shift operand must be i32 — under
        # jax_enable_x64 a bare Python int lowers to i64, which the
        # tpu.dynamic_rotate verifier rejects.
        if dy:
            a = pltpu.roll(a, jnp.int32((-dy) % H), 0)
        if dx:
            a = pltpu.roll(a, jnp.int32((-dx) % W), 1)
        return a

    # Scharr gradients (image.py _SCHARR_X/_SCHARR_Y), /32 normalization
    gx = (
        3.0 * (sh(x, -1, 1) + sh(x, 1, 1))
        + 10.0 * sh(x, 0, 1)
        - 3.0 * (sh(x, -1, -1) + sh(x, 1, -1))
        - 10.0 * sh(x, 0, -1)
    ) * (1.0 / 32.0)
    gy = (
        3.0 * (sh(x, 1, -1) + sh(x, 1, 1))
        + 10.0 * sh(x, 1, 0)
        - 3.0 * (sh(x, -1, -1) + sh(x, -1, 1))
        - 10.0 * sh(x, -1, 0)
    ) * (1.0 / 32.0)

    def box3(a):
        # separable 3x3 box mean: 4 rolls instead of 8
        s = a + sh(a, 1, 0) + sh(a, -1, 0)
        s = s + sh(s, 0, 1) + sh(s, 0, -1)
        return s * (1.0 / 9.0)

    a = box3(gx * gx)
    b = box3(gx * gy)
    c = box3(gy * gy)
    tr = 0.5 * (a + c)
    det = jnp.sqrt(jnp.maximum((0.5 * (a - c)) ** 2 + b * b, 0.0))
    out_ref[:] = tr - det


def shi_tomasi_response_tpu(img):
    """Min-eigenvalue corner response, one fused pass.

    img (H, W) float32. Returns (H, W); values within 2 px of the border
    are garbage (circular-shift halo) — callers must border-cull by >= 2
    (detect_keypoints culls 20). The kernel ALWAYS computes in f32 (TPU
    vector units have no f64 lanes): against an f64 host/XLA reference
    only the corner RANKING is preserved, not the response values —
    golden comparisons must use f32 tolerances, and near-threshold
    ranking can diverge from an f64 run.
    """
    H, W = img.shape
    # the response only RANKS corners (top-K + threshold gates); run the
    # kernel in f32 regardless of the pipeline dtype — TPU vector units
    # have no native f64 lanes, and float64 golden runs would otherwise
    # fail to lower
    in_dtype = img.dtype
    img = img.astype(jnp.float32)
    Wp = -(-W // 128) * 128
    Hp = -(-H // 8) * 8
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, Hp - H), (0, Wp - W)))
    out = pl.pallas_call(
        _shi_tomasi_kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img)
    return out[:H, :W].astype(in_dtype)
