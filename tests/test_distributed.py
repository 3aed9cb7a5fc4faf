"""Distributed blocked Cholesky / solves / LML vs the dense XLA oracle
(SURVEY.md §4 test plan: sharded-vs-single-device equivalence on the fake
8-device CPU mesh)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gogp_tpu.ops import distributed, linalg
from gogp_tpu.parallel import DATA_AXIS, make_mesh


def spd_matrix(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    return jnp.asarray(a @ a.T + n * np.eye(n))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_chain=1, n_data=8)


def shmap(fn, mesh, in_specs, out_specs):
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    )


class TestCholeskyRowSharded:
    @pytest.mark.parametrize("n,block", [(64, 8), (128, 16), (256, 32), (128, 4)])
    def test_matches_dense(self, mesh, n, block):
        K = spd_matrix(n)
        f = shmap(
            functools.partial(
                distributed.cholesky_rowsharded, axis=DATA_AXIS, block=block
            ),
            mesh,
            (P(DATA_AXIS, None),),
            P(DATA_AXIS, None),
        )
        L = np.asarray(f(K))
        L_ref = np.asarray(jnp.linalg.cholesky(K))
        assert np.allclose(L, L_ref, atol=1e-8), np.abs(L - L_ref).max()

    def test_block_larger_than_shard_is_clamped(self, mesh):
        # n=64 over 8 devices -> n_local=8; block=256 clamps to 8
        K = spd_matrix(64)
        f = shmap(
            functools.partial(
                distributed.cholesky_rowsharded, axis=DATA_AXIS, block=256
            ),
            mesh,
            (P(DATA_AXIS, None),),
            P(DATA_AXIS, None),
        )
        L = np.asarray(f(K))
        assert np.allclose(L, np.asarray(jnp.linalg.cholesky(K)), atol=1e-8)


class TestSolveLowerRowSharded:
    def test_matches_dense(self, mesh):
        n, block = 128, 16
        K = spd_matrix(n, seed=1)
        L = jnp.linalg.cholesky(K)
        b = jnp.asarray(np.random.default_rng(2).normal(size=n))
        f = shmap(
            functools.partial(
                distributed.solve_lower_rowsharded, axis=DATA_AXIS, block=block
            ),
            mesh,
            (P(DATA_AXIS, None), P(DATA_AXIS)),
            P(DATA_AXIS),
        )
        y = np.asarray(f(L, b))
        y_ref = np.asarray(
            jax.scipy.linalg.solve_triangular(L, b, lower=True)
        )
        assert np.allclose(y, y_ref, atol=1e-8)


class TestLMLRowSharded:
    @pytest.mark.parametrize("n,block", [(64, 8), (256, 32)])
    def test_matches_dense_lml(self, mesh, n, block):
        K = spd_matrix(n, seed=3)
        y = jnp.asarray(np.random.default_rng(4).normal(size=n))
        f = distributed.make_sharded_lml(mesh, DATA_AXIS, block=block)
        got = float(f(K, y))

        L = linalg.cholesky(K)
        alpha = linalg.cho_solve_vec(L, y)
        want = float(
            -0.5 * (n * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(np.asarray(L)))) + float(y @ alpha))
        )
        assert np.isclose(got, want, atol=1e-6), (got, want)
