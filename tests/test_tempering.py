"""Parallel-tempered NUTS: must mix across modes plain NUTS cannot."""

import jax
import jax.numpy as jnp
import numpy as np

from gogp_tpu import infer
from gogp_tpu.infer import tempering


def bimodal_logp(v):
    """Two well-separated Gaussians at +-4 (std 0.5), symmetric weights."""
    a = -0.5 * jnp.sum((v - 4.0) ** 2) / 0.25
    b = -0.5 * jnp.sum((v + 4.0) ** 2) / 0.25
    return jnp.logaddexp(a, b)


class TestPT:
    def test_mixes_bimodal(self):
        res = tempering.run_pt_nuts(
            bimodal_logp, jnp.full((1,), 4.0), jax.random.PRNGKey(0),
            n_replicas=8, beta_min=0.02,
            num_warmup=400, num_samples=1500, max_tree_depth=6,
        )
        s = np.asarray(res.positions)[:, 0]
        frac_neg = float(np.mean(s < 0))
        # symmetric target: both modes visited substantially
        assert 0.2 < frac_neg < 0.8, frac_neg
        assert float(res.swap_rate) > 0.2

    def test_plain_nuts_stuck_for_contrast(self):
        res = infer.run_nuts(
            bimodal_logp, jnp.full((1,), 4.0), jax.random.PRNGKey(0),
            num_warmup=400, num_samples=1500,
        )
        s = np.asarray(res.positions)[:, 0]
        frac_neg = float(np.mean(s < 0))
        # plain NUTS cannot cross the barrier
        assert frac_neg < 0.05 or frac_neg > 0.95, frac_neg

    def test_moments_on_unimodal(self):
        """PT on an easy target must still be exactly correct."""
        cov = np.array([[2.0, 1.2], [1.2, 1.5]])
        cov_inv = np.linalg.inv(cov)
        mean = np.array([1.0, -2.0])

        def logp(v):
            d = v - jnp.asarray(mean)
            return -0.5 * d @ jnp.asarray(cov_inv) @ d

        res = tempering.run_pt_nuts(
            logp, jnp.zeros(2), jax.random.PRNGKey(1),
            n_replicas=4, num_warmup=400, num_samples=2000,
        )
        s = np.asarray(res.positions)
        assert np.allclose(s.mean(axis=0), mean, atol=0.2)
        assert np.allclose(np.cov(s.T), cov, atol=0.4)

    def test_ladder(self):
        b = np.asarray(tempering.geometric_ladder(5, 0.1))
        assert np.isclose(b[0], 1.0) and np.isclose(b[-1], 0.1)
        assert np.all(np.diff(b) < 0)
        b1 = np.asarray(tempering.geometric_ladder(1))
        assert b1.shape == (1,) and b1[0] == 1.0
