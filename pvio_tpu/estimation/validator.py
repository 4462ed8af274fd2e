"""Factor validation harness: autodiff-vs-finite-difference checking +
missing-dependency (uninitialized-entry) detection.

Plays the role of the reference's CostFunctionValidator
(estimation/ceres/cost_function_validator.h:26-328): given any residual
function over a tangent perturbation, compare the solver's forward-mode
Jacobian against central finite differences and report per-entry errors.

The reference additionally pre-fills Jacobian buffers with a tagged NaN
(nan("0xFEEDCAFEC0C0"), cost_function_validator.h:152-159) to detect
entries an analytic Evaluate never wrote. Functional arrays cannot have
unwritten entries, but hand-derived Jacobian FUNCTIONS can silently drop
a dependency (a forgotten chain-rule term). `check_dependencies` is the
functional counterpart: poison one tangent dimension with NaN and verify
it propagates into every analytic-Jacobian entry whose autodiff value is
nonzero — a dependency the hand-written code ignores leaves the entry
finite and is flagged.
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from pvio_tpu.utils.autodiff import value_and_jacfwd


@dataclass
class ValidationReport:
    max_abs_error: float
    max_rel_error: float
    jac_autodiff: np.ndarray
    jac_fd: np.ndarray
    passed: bool

    def __str__(self):
        status = "PASS" if self.passed else "FAIL"
        return (f"[{status}] max_abs_err={self.max_abs_error:.3e} "
                f"max_rel_err={self.max_rel_error:.3e}")


def validate_factor(residual_fn, tangent_dim, eps=1e-7, atol=1e-5, rtol=1e-4,
                    dtype=jnp.float64):
    """Check d residual / d tangent of `residual_fn(delta)` at delta = 0.

    residual_fn: callable taking a (tangent_dim,) array, returning a
    residual array (any shape). Returns a ValidationReport.
    """
    zeros = jnp.zeros(tangent_dim, dtype)
    r0, J = value_and_jacfwd(residual_fn, zeros)
    J = np.asarray(J).reshape(-1, tangent_dim)

    J_fd = np.zeros_like(J)
    for k in range(tangent_dim):
        d = zeros.at[k].set(eps)
        rp = np.asarray(residual_fn(d)).reshape(-1)
        rm = np.asarray(residual_fn(-d)).reshape(-1)
        J_fd[:, k] = (rp - rm) / (2 * eps)

    abs_err = np.abs(J - J_fd)
    scale = np.maximum(np.abs(J_fd), 1.0)
    rel_err = abs_err / scale
    passed = bool(np.all(abs_err < atol + rtol * np.abs(J_fd)))
    return ValidationReport(
        max_abs_error=float(abs_err.max()) if abs_err.size else 0.0,
        max_rel_error=float(rel_err.max()) if rel_err.size else 0.0,
        jac_autodiff=J, jac_fd=J_fd, passed=passed,
    )


def check_dependencies(residual_fn, jac_analytic, tangent_dim,
                       dtype=jnp.float64):
    """Missing-dependency detection for hand-written Jacobians (the
    functional role of the reference's tagged-NaN scheme,
    cost_function_validator.h:152-159).

    The FD-vs-autodiff comparison only validates magnitudes AT the
    linearization point; a chain-rule term that happens to vanish there
    (but not nearby) slips through. NaN propagation exposes the
    residual's true dependency structure independent of magnitudes:
    poison tangent slot k with NaN, and every residual entry that turns
    non-finite depends on slot k — if the analytic Jacobian stores an
    exact 0.0 there, the hand-written code likely dropped that term.

    residual_fn(delta (tangent_dim,)) -> residual array;
    jac_analytic: (R, tangent_dim) matrix (numpy or jax).
    Returns a list of (entry, slot) suspects (empty = pass).

    The probe is a huge finite value rather than a literal NaN: a NaN
    poisons EVERY output of any matmul it reaches (0 * nan = nan), so
    whitening by a sqrt-information matrix would flag the entire factor;
    a 1e30 probe rides only genuine data paths (structural zeros kill
    it) and any true dependency shifts the residual detectably. Treat
    suspects as leads for manual review — exactly how the reference
    uses its tagged-NaN hits.
    """
    J = np.asarray(jac_analytic, float).reshape(-1, tangent_dim)
    probe = 1e30
    r0 = np.asarray(residual_fn(jnp.zeros(tangent_dim, dtype)),
                    float).reshape(-1)
    suspects = []
    for k in range(tangent_dim):
        d = jnp.zeros(tangent_dim, dtype).at[k].set(probe)
        r = np.asarray(residual_fn(d), float).reshape(-1)
        # any change at all means a data path exists: entries with no
        # dependency see bit-identical inputs and reproduce r0 exactly
        # (bounded outputs — e.g. rotation logs — never show a LARGE
        # change no matter how hard the probe hits them)
        depends = ~np.isfinite(r) | (np.abs(r - r0)
                                     > 1e-12 * (1.0 + np.abs(r0)))
        claimed_zero = J[:, k] == 0.0
        for i in np.nonzero(depends & claimed_zero)[0]:
            suspects.append((int(i), k))
    return suspects
