"""Time the full pyramidal KLT step on the attached accelerator with
in-graph repetition (see PERF_NOTES.md timing methodology)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    from pvio_tpu.frontend import image as img_mod
    from pvio_tpu.frontend import klt

    rng = np.random.default_rng(0)
    H, W, K, levels = 480, 752, 256, 4
    im1 = rng.random((H, W)).astype(np.float32)
    im2 = np.roll(im1, (2, -3), axis=(0, 1))
    pyr1 = img_mod.build_pyramid(jnp.asarray(im1), levels)
    pyr2 = img_mod.build_pyramid(jnp.asarray(im2), levels)
    kp = np.stack([rng.uniform(30, W - 30, K), rng.uniform(30, H - 30, K)], -1)
    kp = jnp.asarray(kp, jnp.float32)
    mask = jnp.ones(K, bool)

    reps = 20

    def make_run(bf16):
        @jax.jit
        def run(kp0):
            def body(k, i):
                kn, st = klt.track_keypoints(pyr1, pyr2, k, k, mask,
                                             bf16_resample=bf16)
                # chain: perturbed restart so no two iterations identical
                return kp0 + 1e-3 * jnp.float32(i), kn[0, 0] + st[0]

            _, outs = jax.lax.scan(body, kp0, jnp.arange(reps))
            return outs
        return run

    for bf16 in (False, True):
        run = make_run(bf16)
        t0 = time.perf_counter()
        o = run(kp)
        jax.block_until_ready(o)
        print(f"bf16={bf16} compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        dts = []
        for k in range(3):
            t0 = time.perf_counter()
            o = run(kp + 1e-2 * (k + 1))
            jax.block_until_ready(o)
            dts.append(time.perf_counter() - t0)
        best = min(dts) / reps
        print(f"KLT full {levels}-level step, K={K}, {W}x{H}, bf16={bf16}: "
              f"{[f'{d:.3f}s' for d in dts]} -> best {best*1e3:.2f} ms/frame")

    # accuracy: bf16 vs f32 flow difference on one tracked frame
    kn32, st32 = jax.jit(lambda: klt.track_keypoints(
        pyr1, pyr2, kp, kp, mask))()
    knbf, stbf = jax.jit(lambda: klt.track_keypoints(
        pyr1, pyr2, kp, kp, mask, bf16_resample=True))()
    import numpy as _np
    both = _np.array(st32) & _np.array(stbf)
    d = _np.abs(_np.array(kn32) - _np.array(knbf))[both]
    print(f"bf16 flow delta on {int(both.sum())} tracked: "
          f"median {_np.median(d):.4f} px  p95 {_np.percentile(d, 95):.4f} px  "
          f"max {d.max():.4f} px; status agree "
          f"{float((_np.array(st32) == _np.array(stbf)).mean()):.3f}")


if __name__ == "__main__":
    main()
