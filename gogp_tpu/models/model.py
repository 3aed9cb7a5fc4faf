"""Log-density composition and gradient masking.

The reference composes a GP with hyperparameter priors through the ``Model``
wrapper that sums log-densities and gradients (gp/model.go:9-28), and the
tutorials constrain parameters by *gradient surgery* — overriding
``Gradient()`` to zero entries (warpedtime/main.go:44-56 pins first/last
input and all outputs; anynoise/main.go:33-44 pins all inputs).

Here models are plain functions ``logp(v) -> scalar``; composition is
addition, and constraints are expressed as a 0/1 ``free`` mask applied to the
gradient, which reproduces the same constrained optimum (frozen coordinates
never move from their initialization).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array
LogDensity = Callable[[Array], Array]


def add_logps(*logps: LogDensity) -> LogDensity:
    """Sum of log-densities — reference gp/model.go:15-28."""

    def logp(v):
        total = logps[0](v)
        for f in logps[1:]:
            total = total + f(v)
        return total

    return logp


def masked_value_and_grad(logp: LogDensity, free: Array | None = None):
    """``value_and_grad`` with frozen coordinates' gradients zeroed.

    ``free``: 1.0 where the coordinate is optimized, 0.0 where pinned —
    the functional equivalent of the tutorials' Gradient() overrides.
    """
    vg = jax.value_and_grad(logp)
    if free is None:
        return vg
    free = jnp.asarray(free)

    def wrapped(v):
        val, g = vg(v)
        return val, g * free.astype(g.dtype)

    return wrapped


def free_mask_warpedtime(n_theta: int, n: int, ndim: int = 1) -> Array:
    """warpedtime constraint: all thetas and interior inputs free; first and
    last input and all outputs pinned (warpedtime/main.go:44-56)."""
    m = jnp.ones(n_theta + n * ndim + n)
    if n > 0:
        m = m.at[n_theta : n_theta + ndim].set(0.0)  # first input
        m = m.at[n_theta + (n - 1) * ndim :].set(0.0)  # last input + all outputs
    return m


def free_mask_anynoise(n_theta: int, n: int, ndim: int = 1) -> Array:
    """anynoise constraint: thetas and outputs free, all inputs pinned
    (anynoise/main.go:33-44)."""
    m = jnp.ones(n_theta + n * ndim + n)
    if n > 0:
        m = m.at[n_theta : n_theta + n * ndim].set(0.0)
    return m
