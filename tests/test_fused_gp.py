"""Fused single-kernel GP LML+gradient vs the autodiff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gogp_tpu import dists
from gogp_tpu.gp.core import GP
from gogp_tpu.kernels import matern52_ref, periodic, rbf, uniform_noise
from gogp_tpu.models.params import gp_observe
from gogp_tpu.ops import fused_gp


def problems():
    rng = np.random.default_rng(0)
    n = 33
    x = np.sort(rng.uniform(0, 10, (n, 1)), axis=0)
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=n)

    gp_simple = GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)

    def simil_pair(theta, xa, xb):
        c1, c2, l1, l2, p = theta[0], theta[1], theta[2], theta[3], theta[4]
        from gogp_tpu.kernels import Kernel  # noqa: F401

        return c1 * matern52_ref.pair(jnp.stack([l1]), xa, xb) + c2 * periodic.pair(
            jnp.stack([l2, 10.0 * p]), xa, xb
        )

    from gogp_tpu.kernels import Kernel

    gp_composite = GP(
        ndim=1, simil=Kernel(5, simil_pair, "hp"), noise=uniform_noise.scaled_by(0.01)
    )

    def priors(v):
        return jnp.sum(dists.normal_logp(0.0, 1.5, v))

    return x, y, gp_simple, gp_composite, priors


@pytest.mark.parametrize("use_priors", [False, True])
def test_value_level_math_matches_autodiff(use_priors):
    x, y, gp, _, priors = problems()
    priors_fn = priors if use_priors else None
    vg_ref = fused_gp.make_reference_value_and_grad(gp, x, y, priors_fn=priors_fn)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def logp(v):
        ll = gp_observe(gp, v, x=xj, y=yj)
        if priors_fn is not None:
            ll = ll + priors_fn(v)
        return ll

    for seed in range(3):
        v = 0.3 * jax.random.normal(jax.random.PRNGKey(seed), (gp.n_theta,))
        val_a, grad_a = jax.value_and_grad(logp)(v)
        val_b, grad_b = vg_ref(v)
        assert np.isclose(float(val_a), float(val_b), atol=1e-8), (val_a, val_b)
        assert np.allclose(np.asarray(grad_a), np.asarray(grad_b), atol=1e-6)


def test_fused_kernel_interpret_matches():
    x, y, _, gp, priors = problems()
    vg_fused = fused_gp.make_fused_value_and_grad(gp, x, y, priors_fn=priors)
    vg_ref = fused_gp.make_reference_value_and_grad(gp, x, y, priors_fn=priors)
    v = 0.2 * jax.random.normal(jax.random.PRNGKey(7), (gp.n_theta,))
    with fused_gp.force_interpret():
        val_f, grad_f = jax.jit(vg_fused)(v)
    val_r, grad_r = vg_ref(v)
    assert np.isclose(float(val_f), float(val_r), atol=1e-8)
    assert np.allclose(np.asarray(grad_f), np.asarray(grad_r), atol=1e-6)


def test_fused_kernel_vmap():
    x, y, gp, _, _ = problems()
    vg_fused = fused_gp.make_fused_value_and_grad(gp, x, y)
    vs = 0.2 * jax.random.normal(jax.random.PRNGKey(8), (4, gp.n_theta))
    with fused_gp.force_interpret():
        vals, grads = jax.jit(jax.vmap(vg_fused))(vs)
    assert vals.shape == (4,)
    assert grads.shape == (4, gp.n_theta)
    vg_ref = fused_gp.make_reference_value_and_grad(gp, x, y)
    for i in range(4):
        val_r, grad_r = vg_ref(vs[i])
        assert np.isclose(float(vals[i]), float(val_r), atol=1e-8)
        assert np.allclose(np.asarray(grads[i]), np.asarray(grad_r), atol=1e-6)


def test_masked_padding_exact():
    x, y, gp, _, _ = problems()
    xp = np.concatenate([x, np.zeros((7, 1))])
    yp = np.concatenate([y, np.zeros(7)])
    mask = np.concatenate([np.ones(len(x)), np.zeros(7)])
    vg_pad = fused_gp.make_reference_value_and_grad(gp, xp, yp, mask=mask)
    vg_ref = fused_gp.make_reference_value_and_grad(gp, x, y)
    v = jnp.zeros(gp.n_theta)
    val_p, grad_p = vg_pad(v)
    val_r, grad_r = vg_ref(v)
    assert np.isclose(float(val_p), float(val_r), atol=1e-9)
    assert np.allclose(np.asarray(grad_p), np.asarray(grad_r), atol=1e-8)
