"""Streaming conditioning (gp/streaming.py) vs fresh absorb.

The append update must be *exactly* (to float tolerance) the posterior a
from-scratch absorb produces on the concatenated data — factor, alpha,
LML, and predictions all pinned.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gogp_tpu.gp import core, streaming
from gogp_tpu.kernels import matern32, rbf, uniform_noise


def _gp():
    return core.GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 10.0, size=(n, 1)), axis=0)
    y = np.sin(x[:, 0]) + 0.05 * rng.normal(size=n)
    return jnp.asarray(x), jnp.asarray(y)


def _full_posterior(gp, ts, tn, x, y, capacity):
    n = x.shape[0]
    xp = jnp.concatenate([x, jnp.zeros((capacity - n, 1))])
    yp = jnp.concatenate([y, jnp.zeros(capacity - n)])
    mask = jnp.concatenate([jnp.ones(n), jnp.zeros(capacity - n)])
    return core.absorb(gp, ts, tn, xp, yp, mask)


class TestAppend:
    def test_single_append_matches_absorb(self):
        gp = _gp()
        ts, tn = jnp.array([1.0, 0.8]), jnp.array([0.3])
        x, y = _data(12)
        cap = 16
        post = streaming.streaming_posterior(gp, ts, tn, cap, dtype=x.dtype)
        post = streaming.absorb_append(gp, post, x, y)
        want = _full_posterior(gp, ts, tn, x, y, cap)
        assert np.allclose(np.asarray(post.chol), np.asarray(want.chol), atol=1e-9)
        assert np.allclose(np.asarray(post.alpha), np.asarray(want.alpha), atol=1e-8)
        assert np.allclose(np.asarray(post.mask), np.asarray(want.mask))

    def test_incremental_appends_match_batch(self):
        gp = _gp()
        ts, tn = jnp.array([0.7, 1.2]), jnp.array([0.2])
        x, y = _data(24, seed=1)
        cap = 32
        post = streaming.streaming_posterior(gp, ts, tn, cap, dtype=x.dtype)
        for i in range(0, 24, 4):  # six appends of 4
            post = streaming.absorb_append(gp, post, x[i : i + 4], y[i : i + 4])
        want = _full_posterior(gp, ts, tn, x, y, cap)
        assert np.allclose(np.asarray(post.chol), np.asarray(want.chol), atol=1e-8)
        assert np.allclose(np.asarray(post.alpha), np.asarray(want.alpha), atol=1e-7)
        # LML and predictions agree too
        assert np.isclose(
            float(core.lml_from_posterior(post)),
            float(core.lml_from_posterior(want)),
            rtol=1e-9, atol=1e-9,
        )
        z = jnp.linspace(-1, 11, 13)[:, None]
        mu1, s1 = core.predict_from_posterior(gp, post, z)
        mu2, s2 = core.predict_from_posterior(gp, want, z)
        assert np.allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-8)
        assert np.allclose(np.asarray(s1), np.asarray(s2), atol=1e-8)

    def test_jit_compiles_once_across_appends(self):
        gp = _gp()
        ts, tn = jnp.array([1.0, 1.0]), jnp.array([0.25])
        x, y = _data(16, seed=2)
        cap = 24
        # count actual RETRACES (Python body executions) rather than
        # _cache_size(): the latter proved order-dependent under a full
        # suite run (global cache bookkeeping), while the invariant that
        # matters is that one trace serves every append
        traces = []

        def _step(p, xb, yb):
            traces.append(1)
            return streaming.absorb_append(gp, p, xb, yb)

        step = jax.jit(_step)
        post = streaming.streaming_posterior(gp, ts, tn, cap, dtype=x.dtype)
        for i in range(0, 16, 4):
            post = step(post, x[i : i + 4], y[i : i + 4])
        want = _full_posterior(gp, ts, tn, x, y, cap)
        assert np.allclose(np.asarray(post.chol), np.asarray(want.chol), atol=1e-8)
        # the same jitted step served every append (one shape signature)
        assert len(traces) == 1, f"retraced {len(traces)} times"

    def test_scan_stream_matches(self):
        gp = _gp()
        ts, tn = jnp.array([0.9, 0.9]), jnp.array([0.15])
        x, y = _data(20, seed=3)
        cap = 24
        post0 = streaming.streaming_posterior(gp, ts, tn, cap, dtype=x.dtype)
        xs = x.reshape(5, 4, 1)
        ys = y.reshape(5, 4)
        post = streaming.absorb_stream(gp, post0, xs, ys)
        want = _full_posterior(gp, ts, tn, x, y, cap)
        assert np.allclose(np.asarray(post.chol), np.asarray(want.chol), atol=1e-8)
        assert np.allclose(np.asarray(post.alpha), np.asarray(want.alpha), atol=1e-7)

    def test_different_kernel_and_block_sizes(self):
        gp = core.GP(ndim=1, simil=matern32.scaled(), noise=uniform_noise)
        ts, tn = jnp.array([1.1, 0.6]), jnp.array([0.35])
        x, y = _data(18, seed=4)
        cap = 20
        post = streaming.streaming_posterior(gp, ts, tn, cap, dtype=x.dtype)
        post = streaming.absorb_append(gp, post, x[:10], y[:10])
        post = streaming.absorb_append(gp, post, x[10:17], y[10:17])
        post = streaming.absorb_append(gp, post, x[17:], y[17:])
        want = _full_posterior(gp, ts, tn, x, y, cap)
        assert np.allclose(np.asarray(post.chol), np.asarray(want.chol), atol=1e-8)

    def test_serving_from_streamed_posterior(self):
        from gogp_tpu.gp import serve

        gp = _gp()
        ts, tn = jnp.array([1.0, 0.8]), jnp.array([0.3])
        x, y = _data(12, seed=5)
        post = streaming.streaming_posterior(gp, ts, tn, 16, dtype=x.dtype)
        post = streaming.absorb_append(gp, post, x, y)
        sp = serve.compile_posterior(gp, post)
        z = jnp.linspace(0, 10, 7)[:, None]
        mu1, s1 = serve.serve_predict(gp, sp, z)
        mu2, s2 = core.predict(gp, ts, tn, x, y, z)
        assert np.allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-7)
        assert np.allclose(np.asarray(s1), np.asarray(s2), atol=1e-7)
