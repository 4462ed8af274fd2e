"""Factor validation harness: autodiff-vs-finite-difference checking.

Plays the role of the reference's CostFunctionValidator
(estimation/ceres/cost_function_validator.h:26-328): given any residual
function over a tangent perturbation, compare the solver's forward-mode
Jacobian against central finite differences and report per-entry errors.
Used in tests and for validating new factors during development.
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
