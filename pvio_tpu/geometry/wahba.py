"""Rotation / similarity fitting (reference: pvio/src/pvio/utility/
wahba_problem.h:27-70 — Kabsch and find_srt).

Used for trajectory evaluation: SE(3)/Sim(3) alignment of an estimated
trajectory to ground truth before computing ATE.
"""

import jax.numpy as jnp


def kabsch(src, dst, weights=None):
    """Best rotation R minimizing sum w_i |R src_i - dst_i|^2.

    src, dst: (N, 3). Returns (3, 3) rotation.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    w = weights[:, None]
    H = (w * src).T @ dst
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    return Vt.T @ D @ U.T


def find_srt(src, dst):
    """Similarity transform (s, R, t) minimizing |s R src + t - dst|^2.

    Returns (scale, R (3, 3), t (3,)) — Umeyama closed form.
    """
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    cs = src - mu_s
    cd = dst - mu_d
    R = kabsch(cs, cd)
    var_s = jnp.sum(cs * cs)
    s = jnp.sum(cd * (cs @ R.T)) / jnp.maximum(var_s, 1e-18)
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def ate_rmse(est, gt, with_scale=True):
    """Absolute trajectory error RMSE after Sim(3) (or SE(3)) alignment.

    est, gt: (N, 3) positions. The reference has no in-tree evaluator; this
    plays the role of the external evo-style comparison noted in SURVEY §4.
    """
    if with_scale:
        s, R, t = find_srt(est, gt)
    else:
        mu_s = jnp.mean(est, axis=0)
        mu_d = jnp.mean(gt, axis=0)
        R = kabsch(est - mu_s, gt - mu_d)
        s = jnp.asarray(1.0, est.dtype)
        t = mu_d - R @ mu_s
    aligned = s * (est @ R.T) + t
    return jnp.sqrt(jnp.mean(jnp.sum((aligned - gt) ** 2, axis=-1)))
