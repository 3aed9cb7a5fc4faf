"""Elementary log-densities for priors.

Replaces Infergo's ``dist`` package as used by the tutorials
(tutorial/hyperpriors/model/model.go:23-37 ``Normal.Logp``,
tutorial/anynoise/model/model.go:40-43 ``Expon.Logp``).  All functions
broadcast and are jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453  # log(2*pi)


def normal_logp(mu, sigma, x):
    """log N(x | mu, sigma).  Infergo dist.Normal.Logp(mu, sigma, x)."""
    z = (x - mu) / sigma
    return -0.5 * (z * z + _LOG_2PI) - jnp.log(sigma)


def expon_logp(lam, x):
    """log Expon(x | rate lam).  Infergo dist.Expon.Logp(lambda, x)."""
    return jnp.log(lam) - lam * x


def laplace_logp(mu, b, x):
    """log Laplace(x | mu, scale b).

    The anynoise tutorial expresses Laplace noise as an Exponential on the
    absolute residual, ``Expon.Logp(1/exp(s), |y_obs - y_latent|)``
    (tutorial/anynoise/model/model.go:40-43) — that is laplace_logp + log 2;
    the constant does not affect inference.
    """
    return -jnp.abs(x - mu) / b - jnp.log(2.0 * b)


def lognormal_logp(mu, sigma, x):
    """log LogNormal(x | mu, sigma)."""
    lx = jnp.log(x)
    z = (lx - mu) / sigma
    return -0.5 * (z * z + _LOG_2PI) - jnp.log(sigma) - lx


def halfnormal_logp(sigma, x):
    """log HalfNormal(x | sigma) for x >= 0."""
    z = x / sigma
    return 0.5 * jnp.log(2.0 / jnp.pi) - jnp.log(sigma) - 0.5 * z * z


def gamma_logp(alpha, beta, x):
    """log Gamma(x | shape alpha, rate beta)."""
    from jax.scipy.special import gammaln

    return alpha * jnp.log(beta) + (alpha - 1) * jnp.log(x) - beta * x - gammaln(alpha)
