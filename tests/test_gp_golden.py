"""Golden-value tests ported from the reference gp/gp_test.go.

The numbers are framework-independent math (GPML closed forms), so they must
reproduce to 1e-6 exactly as in the reference.  The reference's
serial-vs-parallel duplication (gp_test.go:123-132) becomes jit-vs-nojit and
padded-vs-unpadded equivalence, which is the corresponding invariant here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gogp_tpu.gp.core import GP, absorb, lml_from_posterior, predict_from_posterior
from gogp_tpu.kernels import constant_noise, normal, uniform_noise
from gogp_tpu.models.params import gp_observe

# -- TestProduce (gp/gp_test.go:14-165) ------------------------------------

PRODUCE_CASES = [
    # (name, noise_std, x, y, z, mu, sigma)
    ("prior", 0.0, [], [], [[0.0]], [0.0], [1.0]),
    ("self", 0.0, [[0.0]], [1.0], [[0.0]], [1.0], [0.0]),
    ("next", 0.0, [[0.0]], [0.0], [[1.0]], [0.0], [0.795060]),
    ("two selves", 0.0, [[0.0], [1.0]], [1.0, -1.0], [[0.0], [1.0]], [1.0, -1.0], [0.0, 0.0]),
    ("inter", 0.0, [[0.0], [1.0]], [1.0, -1.0], [[0.5]], [0.0], [0.174518]),
    (
        "extra",
        0.0,
        [[0.0], [1.0]],
        [1.0, -1.0],
        [[-2.0], [3.0]],
        [0.315720, -0.315720],
        [0.986770, 0.986770],
    ),
    (
        "noise",
        0.1,
        [[0.0], [1.0]],
        [1.0, -1.0],
        [[-2.0], [3.0]],
        [0.307895, -0.307895],
        [0.987037, 0.987037],
    ),
]


@pytest.mark.parametrize("jit", [False, True], ids=["nojit", "jit"])
@pytest.mark.parametrize("case", PRODUCE_CASES, ids=[c[0] for c in PRODUCE_CASES])
def test_produce(case, jit):
    name, noise_std, x, y, z, want_mu, want_sigma = case
    gp = GP(ndim=1, simil=normal, noise=constant_noise(noise_std))
    theta = jnp.ones(1)
    z = jnp.asarray(z)

    if len(x) == 0:
        from gogp_tpu.gp.core import predict_prior

        fn = jax.jit(lambda t, zz: predict_prior(gp, t, zz)) if jit else (
            lambda t, zz: predict_prior(gp, t, zz)
        )
        mu, sigma = fn(theta, z)
    else:
        x = jnp.asarray(x, dtype=jnp.float64)
        y = jnp.asarray(y, dtype=jnp.float64)

        def fit_predict(t, xx, yy, zz):
            post = absorb(gp, t, jnp.zeros(0), xx, yy)
            return predict_from_posterior(gp, post, zz)

        fn = jax.jit(fit_predict) if jit else fit_predict
        mu, sigma = fn(theta, x, y, z)

    np.testing.assert_allclose(np.asarray(mu), want_mu, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma), want_sigma, atol=1e-6)


def test_produce_padded_equivalence():
    """Padding with masked rows must not change predictions — the TPU
    replacement for the reference's serial/parallel invariant."""
    gp = GP(ndim=1, simil=normal, noise=constant_noise(0.1))
    theta = jnp.ones(1)
    x = jnp.asarray([[0.0], [1.0]])
    y = jnp.asarray([1.0, -1.0])
    z = jnp.asarray([[-2.0], [3.0]])

    post = absorb(gp, theta, jnp.zeros(0), x, y)
    mu0, s0 = predict_from_posterior(gp, post, z)

    xp = jnp.concatenate([x, jnp.full((3, 1), 7.7)])
    yp = jnp.concatenate([y, jnp.full((3,), -9.9)])
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
    post_p = absorb(gp, theta, jnp.zeros(0), xp, yp, mask)
    mu1, s1 = predict_from_posterior(gp, post_p, z)

    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-12)
    np.testing.assert_allclose(
        float(lml_from_posterior(post_p)), float(lml_from_posterior(post)), atol=1e-12
    )


# -- TestElementalModel (gp/gp_test.go:173-269) -----------------------------

ELEMENTAL_CASES = [
    # (name, noise_kernel, x_vec, want_ll)
    ("prior", constant_noise(0.0), [0.0], 0.0),
    ("single", constant_noise(0.0), [0.0, 0.0, 1.0], -1.418939),
    ("nonoise", constant_noise(0.0), [0.0, 0.0, 1.0, 1.0, 0.0], -2.399528),
    ("withnoise", constant_noise(0.1), [1.0, -2.0, -1.0, 1.0, 0.0], -4.321055),
    ("uninoise", uniform_noise, [1.0, 1.0, -1.0, -1.0, 1.0, 0.0], -4.018110),
]


@pytest.mark.parametrize("case", ELEMENTAL_CASES, ids=[c[0] for c in ELEMENTAL_CASES])
def test_elemental_model(case):
    name, noise, x_vec, want_ll = case
    gp = GP(ndim=1, simil=normal, noise=noise)
    v = jnp.asarray(x_vec, dtype=jnp.float64)

    ll, grad = jax.value_and_grad(lambda vv: gp_observe(gp, vv))(v)
    assert abs(float(ll) - want_ll) < 1e-6, name
    assert grad.shape == v.shape

    # finite-difference gradient check (gp_test.go:168-171, :242-252)
    dx, eps = 1e-8, 1e-4
    for j in range(v.shape[0]):
        vj = v.at[j].add(dx)
        dldx = (float(gp_observe(gp, vj)) - float(ll)) / dx
        assert abs(float(grad[j]) - dldx) <= eps, f"{name}: d/dx{j}"


@pytest.mark.parametrize("case", ELEMENTAL_CASES, ids=[c[0] for c in ELEMENTAL_CASES])
def test_elemental_model_hyper_only(case):
    """The two Observe calling conventions must agree (gp_test.go:254-267)."""
    name, noise, x_vec, want_ll = case
    gp = GP(ndim=1, simil=normal, noise=noise)
    n_theta = gp.n_theta
    v = jnp.asarray(x_vec, dtype=jnp.float64)
    theta_v = v[:n_theta]
    rest = v[n_theta:]
    if rest.shape[0]:
        n = rest.shape[0] // 2
        x, y = rest[:n].reshape(n, 1), rest[n:]
    else:
        x, y = jnp.zeros((0, 1)), jnp.zeros((0,))

    ll, grad = jax.value_and_grad(lambda t: gp_observe(gp, t, x=x, y=y))(theta_v)
    assert abs(float(ll) - want_ll) < 1e-6, name
    assert grad.shape == (n_theta,)


def test_gradient_wrt_outputs_is_minus_alpha():
    """Reference gp/gp.go:488-493: dLML/dy = -alpha."""
    gp = GP(ndim=1, simil=normal, noise=constant_noise(0.1))
    v = jnp.asarray([0.3, -2.0, -1.0, 0.5, 1.0])  # 1 theta + 2 inputs + 2 outputs
    from gogp_tpu.models.params import gp_posterior

    post = gp_posterior(gp, v)
    grad = jax.grad(lambda vv: gp_observe(gp, vv))(v)
    np.testing.assert_allclose(np.asarray(grad[-2:]), -np.asarray(post.alpha), atol=1e-10)
