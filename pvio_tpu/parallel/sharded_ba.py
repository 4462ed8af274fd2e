"""Distributed bundle adjustment over a TPU mesh.

The reference has no distributed backend (SURVEY §2.4); this module is the
scale-out surface of the rebuild (SURVEY §7 step 10 / BASELINE.json
configs 4-5):

  * **dp** axis: a batch of independent VIO sequences (whole windows)
    sharded across devices — the "batched multi-sequence VIO" config;
  * **tp** axis: the landmark/track dimension of each window sharded
    across devices — each shard linearizes its track block locally, the
    reduced camera system is assembled with `psum` over ICI, the dense
    (F*15)^2 solve is replicated, and depth back-substitution stays local.
    This is the distributed Schur-complement of the north star.

The frame-factor (preintegration/prior) information is computed
redundantly on every tp shard (it is tiny) by linearizing a tracks-masked
copy of the window; only the track-dependent parts are psum-reduced.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pvio_tpu.estimation import ba as ba_mod
from pvio_tpu.map import window as win
from pvio_tpu.map.window import Extrinsics, MargPrior, WindowState


def window_pspecs(dp="dp", tp="tp"):
    """PartitionSpec pytree for a batched WindowState (leading batch dim
    sharded over dp; track dims over tp)."""
    d = P(dp)
    dt = P(dp, tp)
    return WindowState(
        q=d, p=d, v=d, bg=d, ba=d,
        frame_mask=d, fix_mask=d,
        delta=jax.tree.map(lambda _: d, win.empty_delta(1, jnp.float32)),
        delta_valid=d, bg_lin=d, ba_lin=d,
        inv_depth=dt, ref_frame=dt, track_mask=dt, track_flags=dt,
        quality=dt, plane_id=dt,
        kp=P(dp, None, tp, None), obs_mask=P(dp, None, tp),
        plane_normal=d, plane_distance=d, plane_mask=d,
        prior=MargPrior(
            sqrt_info=d, infovec=d, q0=d, p0=d, v0=d, bg0=d, ba0=d, valid=d
        ),
    )


def _lm_step_sharded(w: WindowState, lam, extr, cfg, tp_axis):
    """One LM step on a tp-sharded window (single window; tracks local)."""
    F, T_local = w.kp.shape[0], w.kp.shape[1]
    dtype = w.p.dtype

    def total_cost(wx):
        c_local = ba_mod.evaluate_cost(wx, extr, cfg, tp_axis=tp_axis)
        w0 = wx._replace(track_mask=jnp.zeros_like(wx.track_mask))
        c_frame = ba_mod.evaluate_cost(w0, extr, cfg, tp_axis=tp_axis)
        return c_frame + jax.lax.psum(c_local - c_frame, tp_axis)

    Hpp, Hpd, Hdd, bp, bd, depth_active, cost_local, m = ba_mod.linearize(
        w, extr, cfg, tp_axis=tp_axis)
    w0 = w._replace(track_mask=jnp.zeros_like(w.track_mask))
    Hpp_f, _, _, bp_f, _, _, cost_f, _ = ba_mod.linearize(
        w0, extr, cfg, tp_axis=tp_axis)
    # global frame-state system: frame factors once + track parts reduced
    # (the in-solve plane-tangent block rides this same reduction: the
    # tracks-masked linearize contributes zero there, and `m` — which
    # gates the plane dims on the psum'd member counts — is identical on
    # every shard by construction)
    Hpp_g = Hpp_f + jax.lax.psum(Hpp - Hpp_f, tp_axis)
    bp_g = bp_f + jax.lax.psum(bp - bp_f, tp_axis)
    cost0 = cost_f + jax.lax.psum(cost_local - cost_f, tp_axis)

    D = Hpp.shape[0]
    P = w.plane_mask.shape[0]
    da = depth_active.astype(dtype)
    Hpp_g = Hpp_g * m[:, None] * m[None, :]
    bp_g = bp_g * m
    Hpd = Hpd * m[:, None] * da[None, :]
    bd = bd * da
    Hdd = jnp.where(depth_active, Hdd, 1.0)

    diag = jnp.diag(Hpp_g)
    Hpp_d = Hpp_g + jnp.diag(lam * jnp.maximum(diag, 1e-8) + (1.0 - m))
    Hdd_d = Hdd * (1.0 + lam)
    Hdd_inv = 1.0 / Hdd_d
    # reduced camera system: local depth-elimination blocks psum'd over tp
    Hred = Hpp_d - jax.lax.psum((Hpd * Hdd_inv[None, :]) @ Hpd.T, tp_axis)
    bred = bp_g - jax.lax.psum(Hpd @ (bd * Hdd_inv), tp_axis)
    jitter = 1e-9 * jnp.trace(Hred) / D
    L = jax.scipy.linalg.cho_factor(
        Hred + jitter * jnp.eye(D, dtype=dtype)
    )
    dp_step = jax.scipy.linalg.cho_solve(L, -bred) * m
    dd_step = (-bd - Hpd.T @ dp_step) * Hdd_inv * da

    w_new = win.retract(w, dp_step[: F * 15].reshape(F, 15), dd_step)
    if D > F * 15:
        w_new = win.retract_planes(w_new, dp_step[F * 15 :].reshape(P, 3))
    cost1 = total_cost(w_new)
    return w_new, cost0, cost1


def make_sharded_solver(mesh: Mesh, extr: Extrinsics, cfg: ba_mod.BAConfig,
                        dp="dp", tp="tp"):
    """Build a jitted distributed BA solve over `mesh`.

    Input: a batched WindowState (leading dim B divisible by mesh.shape[dp];
    track capacity divisible by mesh.shape[tp]). Returns (windows, costs).

    Plane factors shard cleanly over tp: each augmented plane residual
    touches only its own track's observation column (plane params are
    replicated); the one cross-track statistic — the per-plane member
    count gating factor selection — is psum'd inside _factor_masks.
    """
    specs = window_pspecs(dp, tp)

    def solve_one(w):
        lam0 = jnp.asarray(cfg.lm_lambda_init, w.p.dtype)

        def body(carry, _):
            w, lam = carry
            w_new, cost0, cost1 = _lm_step_sharded(w, lam, extr, cfg, tp)
            accept = cost1 < cost0
            lam = jnp.where(
                accept,
                jnp.maximum(lam * cfg.lm_lambda_down, cfg.lm_lambda_min),
                jnp.minimum(lam * cfg.lm_lambda_up, cfg.lm_lambda_max),
            )
            w = jax.tree.map(lambda a, b: jnp.where(accept, b, a), w, w_new)
            return (w, lam), cost1

        (w, _), costs = jax.lax.scan(body, (w, lam0), None, length=cfg.iterations)
        return w, costs[-1]

    def solve_local(wb):
        return jax.vmap(solve_one)(wb)

    sharded = jax.shard_map(
        solve_local, mesh=mesh, in_specs=(specs,), out_specs=(specs, P(dp)),
        check_vma=False,
    )
    return jax.jit(sharded)


def replicate_window_batch(w: WindowState, batch: int):
    """Tile a single window into a batch (for benchmarks / dry runs)."""
    return jax.tree.map(lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), w)
