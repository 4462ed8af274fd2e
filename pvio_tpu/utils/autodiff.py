"""Autodiff helpers."""

import jax
import jax.numpy as jnp


def value_and_jacfwd(f, x):
    """Evaluate f(x) and its Jacobian w.r.t. the 1-D array x in one
    linearization (forward-mode, basis pushforward). Returns
    (y, J) with J.shape == y.shape + x.shape."""
    y, lin = jax.linearize(f, x)
    basis = jnp.eye(x.shape[0], dtype=x.dtype)
    J = jax.vmap(lin)(basis)  # (n, *y.shape)
    return y, jnp.moveaxis(J, 0, -1)
