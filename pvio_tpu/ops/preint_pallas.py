"""Pallas fusion of the preintegration factor bank.

The analytic preintegration residual + Jacobians
(factors.preintegration_residual_and_jacobians) are ~600 tiny HLO ops on
(F-1, 3/15)-shaped arrays; at XLA top level each op pays fixed dispatch
overhead, which dominates the whole bundle-adjustment iteration on this
hardware (measured ~8 ms of an ~9 ms linearize). Tracing the SAME jnp
math inside one `pallas_call` collapses the chain into a single Mosaic
kernel: one launch, all intermediates in registers/VMEM.

The kernel loops over the F-1 consecutive-frame factors with a static
Python loop (F is small) and calls the shared factor function on values
loaded from refs — the math is written once in factors.py and reused here
verbatim, so the FD/autodiff validation of the analytic formulas covers
this kernel too (plus an equivalence test in tests/test_ops.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pvio_tpu.imu.preintegration import PreintDelta
from pvio_tpu.map.window import Extrinsics


def _kernel(q_ref, p_ref, v_ref, bg_ref, ba_ref,
            dt_ref, dq_ref, dp_ref, dv_ref, sic_ref,
            dqdbg_ref, dpdbg_ref, dpdba_ref, dvdbg_ref, dvdba_ref,
            bglin_ref, balin_ref, exq_ref, exp_ref,
            r_out, ji_out, jj_out, *, F):
    from pvio_tpu.estimation import factors

    extr = Extrinsics(
        q_bc=exq_ref[0],  # unused by the preint factor
        p_bc=exp_ref[0],
        q_bi=exq_ref[1],
        p_bi=exp_ref[1],
    )
    for k in range(F - 1):
        j = k + 1
        delta = PreintDelta(
            t=dt_ref[j],
            q=dq_ref[j], p=dp_ref[j], v=dv_ref[j],
            cov=jnp.zeros((15, 15), dt_ref.dtype),
            sqrt_inv_cov=sic_ref[j],
            dq_dbg=dqdbg_ref[j], dp_dbg=dpdbg_ref[j], dp_dba=dpdba_ref[j],
            dv_dbg=dvdbg_ref[j], dv_dba=dvdba_ref[j],
        )
        r, Ji, Jj = factors.preintegration_residual_and_jacobians(
            q_ref[k], p_ref[k], v_ref[k], bg_ref[k], ba_ref[k],
            q_ref[j], p_ref[j], v_ref[j], bg_ref[j], ba_ref[j],
            delta, bglin_ref[j], balin_ref[j], extr,
            approx_trig=True,  # Mosaic has no atan2
        )
        r_out[k] = r
        ji_out[k] = Ji
        jj_out[k] = Jj


def preint_factor_bank(q, p, v, bg, ba, delta: PreintDelta, bg_lin, ba_lin,
                       extr: Extrinsics, interpret=False):
    """Residual + Jacobians for all consecutive-frame preintegration
    factors in ONE kernel launch.

    q (F, 4), p/v/bg/ba (F, 3); delta batched over F (slot j spans
    j-1 -> j); returns (r (F-1, 15), Ji (F-1, 15, 15), Jj (F-1, 15, 15)).
    """
    F = q.shape[0]
    dtype = p.dtype
    exq = jnp.stack([extr.q_bc, extr.q_bi])
    exp_ = jnp.stack([extr.p_bc, extr.p_bi])
    kernel = partial(_kernel, F=F)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    r, Ji, Jj = pl.pallas_call(
        kernel,
        in_specs=[vm] * 19,
        out_specs=(vm, vm, vm),
        out_shape=(
            jax.ShapeDtypeStruct((F - 1, 15), dtype),
            jax.ShapeDtypeStruct((F - 1, 15, 15), dtype),
            jax.ShapeDtypeStruct((F - 1, 15, 15), dtype),
        ),
        interpret=interpret,
    )(q, p, v, bg, ba,
      delta.t, delta.q, delta.p, delta.v, delta.sqrt_inv_cov,
      delta.dq_dbg, delta.dp_dbg, delta.dp_dba, delta.dv_dbg, delta.dv_dba,
      bg_lin, ba_lin, exq, exp_)
    return r, Ji, Jj
