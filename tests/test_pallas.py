"""Pallas blocked Cholesky/TRSM vs the XLA oracle (interpreter mode on CPU;
the same code paths compile natively on TPU — SURVEY.md §7 PR2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gogp_tpu.ops import cholesky_pallas as cp
from gogp_tpu.ops import linalg


def spd(n, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    return jnp.asarray(a @ a.T + n * np.eye(n), dtype=dtype)


class TestTile:
    @pytest.mark.parametrize("n", [8, 32, 128])
    def test_matches_xla(self, n):
        K = spd(n)
        with cp.force_interpret():
            L = np.asarray(cp.pallas_cholesky_tile(K))
        assert np.allclose(L, np.asarray(jnp.linalg.cholesky(K)), atol=1e-10)


class TestBlocked:
    @pytest.mark.parametrize("n,block", [(64, 16), (128, 32), (256, 64)])
    def test_matches_xla(self, n, block):
        K = spd(n, seed=1)
        with cp.force_interpret():
            L = np.asarray(cp.blocked_cholesky(K, block))
        assert np.allclose(L, np.asarray(jnp.linalg.cholesky(K)), atol=1e-9)

    def test_rejects_bad_block(self):
        with pytest.raises(ValueError):
            cp.blocked_cholesky(spd(100), 64)

    @pytest.mark.parametrize("n,block,sf", [(128, 16, 2), (256, 32, 4)])
    def test_super_panel_matches_stepwise(self, n, block, sf):
        # two-level super-panel schedule (VERDICT r4 #7): same L, same
        # per-block inverse stack as the shipped stepwise driver
        K = spd(n, seed=3)
        with cp.force_interpret():
            L0, inv0 = cp.blocked_cholesky_invs(K, block)
            with cp.super_panels(sf):
                L1, inv1 = cp.blocked_cholesky_invs(K, block)
        assert np.allclose(np.asarray(L0), np.asarray(L1), atol=1e-8)
        assert np.allclose(np.asarray(inv0), np.asarray(inv1), atol=1e-8)
        assert inv1.shape == (n // block, block, block)

    def test_super_panel_indivisible_falls_back(self):
        # n not divisible by sf*block: the stepwise schedule runs instead
        K = spd(96, seed=4)
        with cp.force_interpret(), cp.super_panels(4):
            L = np.asarray(cp.blocked_cholesky(K, 32))
        assert np.allclose(L, np.asarray(jnp.linalg.cholesky(K)), atol=1e-8)


class TestTrsm:
    def test_lower(self):
        n, block = 128, 32
        L = jnp.linalg.cholesky(spd(n, seed=2))
        B = jnp.asarray(np.random.default_rng(3).normal(size=(n, 5)))
        X = np.asarray(cp.blocked_trsm_lower(L, B, block))
        want = np.asarray(jax.scipy.linalg.solve_triangular(L, B, lower=True))
        assert np.allclose(X, want, atol=1e-9)

    def test_lower_t(self):
        n, block = 128, 32
        L = jnp.linalg.cholesky(spd(n, seed=4))
        B = jnp.asarray(np.random.default_rng(5).normal(size=(n, 3)))
        X = np.asarray(cp.blocked_trsm_lower_t(L, B, block))
        want = np.asarray(
            jax.scipy.linalg.solve_triangular(L, B, lower=True, trans=1)
        )
        assert np.allclose(X, want, atol=1e-9)

    def test_vector_rhs(self):
        n, block = 64, 16
        L = jnp.linalg.cholesky(spd(n, seed=6))
        b = jnp.asarray(np.random.default_rng(7).normal(size=n))
        X = np.asarray(cp.blocked_trsm_lower(L, b, block))
        want = np.asarray(jax.scipy.linalg.solve_triangular(L, b, lower=True))
        assert np.allclose(X, want, atol=1e-9)


class TestCustomVJP:
    def test_grad_matches_native(self):
        n, block = 64, 16
        K = spd(n, seed=8)
        with cp.force_interpret():
            g_custom = np.asarray(
                jax.grad(lambda K: jnp.sum(jnp.log(jnp.diagonal(cp.cholesky(K, block)))))(K)
            )
        g_native = np.asarray(
            jax.grad(lambda K: jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(K)))))(K)
        )
        assert np.allclose(g_custom, g_native, atol=1e-8), np.abs(g_custom - g_native).max()

    def test_grad_general_cotangent(self):
        n, block = 64, 16
        K = spd(n, seed=9)
        W = jnp.asarray(np.random.default_rng(10).normal(size=(n, n)))
        with cp.force_interpret():
            g_custom = np.asarray(
                jax.grad(lambda K: jnp.sum(cp.cholesky(K, block) * W))(K)
            )
        g_native = np.asarray(
            jax.grad(lambda K: jnp.sum(jnp.linalg.cholesky(K) * W))(K)
        )
        assert np.allclose(g_custom, g_native, atol=1e-8)


class TestDispatchIntegration:
    def test_lml_through_pallas_path(self):
        """GP LML + grad computed with the Pallas-dispatch path equals the
        plain-XLA path (the bench.py vs_baseline pair)."""
        from gogp_tpu.gp.core import GP
        from gogp_tpu.kernels import rbf, uniform_noise
        from gogp_tpu.models.params import gp_observe

        gp = GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
        n = 64
        rng = np.random.default_rng(11)
        x = jnp.asarray(np.sort(rng.uniform(0, 10, (n, 1)), axis=0))
        y = jnp.asarray(np.sin(np.asarray(x[:, 0])))
        v = jnp.zeros(3)

        def f(v):
            return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)

        with linalg.force_xla():
            val_x, grad_x = f(v)
        with cp.force_interpret():
            val_p, grad_p = f(v)
        assert np.isclose(float(val_x), float(val_p), atol=1e-8)
        assert np.allclose(np.asarray(grad_x), np.asarray(grad_p), atol=1e-7)


class TestStreamingTrsv:
    """Single-program streaming vector solves against scipy oracles."""

    @pytest.mark.parametrize("n,block", [(64, 8), (256, 32), (256, 64)])
    def test_forward_and_transpose(self, n, block):
        import scipy.linalg as sl

        K = spd(n, seed=12)
        y = jnp.asarray(np.random.default_rng(13).normal(size=n))
        with cp.force_interpret():
            L, invs = cp.blocked_cholesky_invs(K, block)
            z = np.asarray(cp.pallas_trsv_lower(L, y, invs, block))
            a = np.asarray(cp.pallas_trsv_lower_t(L, jnp.asarray(z), invs, block))
        Lx = np.linalg.cholesky(np.asarray(K))
        zx = sl.solve_triangular(Lx, np.asarray(y), lower=True)
        ax = sl.solve_triangular(Lx.T, zx, lower=False)
        assert np.allclose(z, zx, atol=1e-9)
        assert np.allclose(a, ax, atol=1e-9)


class TestForiTrsm:
    """fori_loop TRSM paths engage beyond _MAX_UNROLL_STEPS blocks."""

    def test_lower_and_t_fori(self):
        import scipy.linalg as sl

        n, block = 256, 8  # nb=32 > 24 -> fori path
        assert n // block > cp._MAX_UNROLL_STEPS
        L = jnp.linalg.cholesky(spd(n, seed=14))
        B = jnp.asarray(np.random.default_rng(15).normal(size=(n, 5)))
        with cp.force_interpret():
            X = np.asarray(cp.blocked_trsm_lower(L, B, block))
            Xt = np.asarray(cp.blocked_trsm_lower_t(L, B, block))
        Lx = np.asarray(L)
        assert np.allclose(X, sl.solve_triangular(Lx, np.asarray(B), lower=True), atol=1e-9)
        assert np.allclose(Xt, sl.solve_triangular(Lx.T, np.asarray(B), lower=False), atol=1e-9)

    def test_lml_core_grad_fori(self):
        n, block = 256, 8
        K = spd(n, seed=16)
        y = jnp.asarray(np.random.default_rng(17).normal(size=n))

        def oracle(K, y):
            L = jnp.linalg.cholesky(K)
            z = jax.scipy.linalg.solve_triangular(L, y, lower=True)
            return -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * jnp.dot(z, z)

        vo, (gKo, gyo) = jax.value_and_grad(oracle, argnums=(0, 1))(K, y)
        with cp.force_interpret():
            v, (gK, gy) = jax.value_and_grad(
                lambda K, y: cp.lml_core(K, y, block), argnums=(0, 1)
            )(K, y)
        assert np.isclose(float(v), float(vo), atol=1e-9)
        assert np.allclose(np.asarray(gK), np.asarray(gKo), atol=1e-8)
        assert np.allclose(np.asarray(gy), np.asarray(gyo), atol=1e-8)


class TestLmlCoreDispatch:
    def test_matches_xla_lml_core(self):
        K = spd(128, seed=18)
        y = jnp.asarray(np.random.default_rng(19).normal(size=128))
        with linalg.force_xla():
            want = float(linalg.lml_core(K, y))
        with cp.force_interpret():
            got = float(linalg.lml_core(K, y))
        assert np.isclose(got, want, atol=1e-9)


class TestTriangularGridTrsv:
    """2-D (triangular-grid) streaming TRSV — the any-n form that lifts
    the 1-D panel kernel's ~8 MB VMEM gate."""

    @pytest.mark.parametrize("n,block", [(64, 16), (128, 32), (384, 128)])
    def test_forward_and_transpose(self, n, block):
        L = jnp.linalg.cholesky(spd(n, seed=40))
        y = jnp.asarray(np.random.default_rng(41).normal(size=n))
        with cp.force_interpret():
            invs = cp._tile_invs(L, block)
            z = np.asarray(cp.pallas_trsv2d_lower(L, y, invs, block))
            a = np.asarray(cp.pallas_trsv2d_lower_t(L, jnp.asarray(z), invs, block))
        want_z = np.asarray(jax.scipy.linalg.solve_triangular(L, y, lower=True))
        want_a = np.asarray(
            jax.scipy.linalg.solve_triangular(L, jnp.asarray(want_z), lower=True, trans=1)
        )
        assert np.allclose(z, want_z, atol=1e-9)
        assert np.allclose(a, want_a, atol=1e-9)

    def test_tri_kj_exact(self):
        ts = jnp.arange(0, 300)
        k, j = jax.vmap(cp._tri_kj)(ts)
        k, j = np.asarray(k), np.asarray(j)
        want = [(kk, jj) for kk in range(30) for jj in range(kk + 1)][:300]
        got = list(zip(k.tolist(), j.tolist()))
        assert got == want[: len(got)]


class TestBlockedTrilInv:
    @pytest.mark.parametrize("n,block", [(64, 16), (128, 32), (256, 64)])
    def test_matches_solve(self, n, block):
        L = jnp.linalg.cholesky(spd(n, seed=30))
        with cp.force_interpret():
            W = np.asarray(cp.blocked_tril_inv(L, block))
        want = np.asarray(
            jax.scipy.linalg.solve_triangular(L, jnp.eye(n, dtype=L.dtype), lower=True)
        )
        assert np.allclose(W, want, atol=1e-9)
        # strictly upper triangle exactly zero (structure exploited)
        assert np.all(W[np.triu_indices(n, 1)] == 0.0)

    def test_fori_path_matches_unrolled(self):
        n, block = 64, 8  # nb=8; force the fori path by monkeypatched cap
        L = jnp.linalg.cholesky(spd(n, seed=31))
        with cp.force_interpret():
            unrolled = np.asarray(cp.blocked_tril_inv(L, block))
            invs = cp._tile_invs(L, block)
            fori = np.asarray(cp._tril_inv_fori(L, block, invs))
        assert np.allclose(unrolled, fori, atol=1e-10)

    def test_rejects_bad_block(self):
        L = jnp.eye(65)
        with pytest.raises(ValueError):
            cp.blocked_tril_inv(L, 16)


class TestMatmulPrecisionContext:
    """jax.default_matmul_precision is the supported accuracy knob (on TPU
    the DEFAULT f32 dot is one bf16 MXU pass; 'tensorfloat32' buys ~50x
    gradient accuracy for ~1.8x cost, benchmarks/matmul_precision.py).
    These guard that the whole Pallas chain traces under the context —
    Mosaic rejects Precision.HIGH, so kernel dots pin a supported level
    via _kernel_precision."""

    def test_kernel_precision_mapping(self):
        assert cp._kernel_precision() == jax.lax.Precision.DEFAULT
        with jax.default_matmul_precision("bfloat16"):
            assert cp._kernel_precision() == jax.lax.Precision.DEFAULT
        with jax.default_matmul_precision("tensorfloat32"):
            assert cp._kernel_precision() == jax.lax.Precision.HIGHEST
        with jax.default_matmul_precision("float32"):
            assert cp._kernel_precision() == jax.lax.Precision.HIGHEST

    def test_lml_core_grad_under_precision_context(self):
        K = spd(128, seed=20, dtype=jnp.float64)
        y = jnp.asarray(np.random.default_rng(21).normal(size=128))

        def loss(K):
            return linalg.lml_core(K, y)

        with linalg.force_xla():
            want_v, want_g = jax.value_and_grad(loss)(K)
        with cp.force_interpret(), jax.default_matmul_precision("tensorfloat32"):
            got_v, got_g = jax.value_and_grad(loss)(K)
        assert np.isclose(float(got_v), float(want_v), atol=1e-8)
        assert np.allclose(np.asarray(got_g), np.asarray(want_g), atol=1e-8)


class TestPrecisionRescue:
    """NaN -> high-precision re-trace rescue (linalg.py).  On TPU the
    blocked drivers' default-precision (1-pass bf16) matmuls can NaN a
    factorization that XLA's internally-high-precision Cholesky survives
    (measured: 16k RBF with near-duplicate inputs, /tmp lore in STATUS.md);
    linalg.cholesky/lml_core then recompute via the same kernels re-traced
    under jax.default_matmul_precision('float32').  CPU interpret mode
    cannot reproduce the bf16 failure, so these guard the WIRING: values
    and gradients must be unchanged through the lax.cond, and the
    escape hatches / size gate must remove the branch.  The rescue is
    size-gated (n >= _RESCUE_MIN_N; the dormant cond costs ~26% at n=4096
    but <2% at 16k) so the tests engage it via precision_rescue(min_n=0)."""

    def test_lml_core_value_and_grad_through_rescue(self):
        K = spd(128, seed=30)
        y = jnp.asarray(np.random.default_rng(31).normal(size=128))

        def loss(K):
            return linalg.lml_core(K, y)

        with linalg.force_xla():
            want_v, want_g = jax.value_and_grad(loss)(K)
        assert linalg._RESCUE  # default ON (above the size gate)
        with linalg.precision_rescue(min_n=0), cp.force_interpret():
            assert linalg._rescue_engaged(128)
            got_v, got_g = jax.value_and_grad(jax.jit(loss))(K)
        assert np.isclose(float(got_v), float(want_v), atol=1e-9)
        assert np.allclose(np.asarray(got_g), np.asarray(want_g), atol=1e-8)

    def test_cholesky_through_rescue(self):
        K = spd(128, seed=32)
        want = np.asarray(jnp.linalg.cholesky(K))
        with linalg.precision_rescue(min_n=0), cp.force_interpret():
            got = np.asarray(jnp.tril(jax.jit(linalg.cholesky)(K)))
        assert np.allclose(got, want, atol=1e-10)

    def test_no_precision_rescue_escape_hatch(self):
        K = spd(128, seed=33)
        y = jnp.asarray(np.random.default_rng(34).normal(size=128))
        with linalg.no_precision_rescue():
            assert not linalg._RESCUE
            with cp.force_interpret():
                got = float(linalg.lml_core(K, y))
        assert linalg._RESCUE
        with linalg.force_xla():
            want = float(linalg.lml_core(K, y))
        assert np.isclose(got, want, atol=1e-9)

    def test_size_gate_and_ambient_precision(self):
        # default: engaged only at n >= _RESCUE_MIN_N (the dormant cond is
        # too expensive for the n=4096 headline path)
        assert not linalg._rescue_engaged(4096)
        assert linalg._rescue_engaged(linalg._RESCUE_MIN_N)
        with linalg.precision_rescue(min_n=0):
            assert linalg._rescue_engaged(128)
        # with the ambient precision already high there is no headroom to
        # escalate into — the dispatch must not wrap a cond
        with jax.default_matmul_precision("float32"):
            assert not linalg._rescue_engaged(1 << 20)
        assert linalg._rescue_engaged(1 << 20)


class TestExplicitPrecisionArg:
    """Per-call ``precision=`` threads as a STATIC argument through the
    blocked drivers' custom_vjps — the surface for the dense-data/
    optimized-theta regime (STATUS round-2 large-n findings) where the
    default one-pass-bf16 matmuls NaN below the size-gated rescue.  The
    ambient jax.default_matmul_precision context only reaches a custom-VJP
    backward when it encloses the WHOLE trace; set inside a differentiated
    function's body it covers the forward only (verified by jaxpr below).
    The explicit argument covers both."""

    def test_value_and_grad_unchanged(self):
        K = spd(128, seed=40)
        y = jnp.asarray(np.random.default_rng(41).normal(size=128))

        with linalg.force_xla():
            want_v, want_g = jax.value_and_grad(lambda K: linalg.lml_core(K, y))(K)
        with cp.force_interpret():
            got_v, got_g = jax.value_and_grad(
                lambda K: linalg.lml_core(K, y, precision="float32")
            )(K)
        assert np.isclose(float(got_v), float(want_v), atol=1e-8)
        assert np.allclose(np.asarray(got_g), np.asarray(want_g), atol=1e-8)

    def test_cholesky_precision_arg(self):
        K = spd(96, seed=42)
        with cp.force_interpret():
            L = np.asarray(
                jnp.tril(linalg.cholesky(K, precision="tensorfloat32"))
            )
        assert np.allclose(L, np.asarray(jnp.linalg.cholesky(K)), atol=1e-10)

    def test_explicit_precision_reaches_backward_trace(self):
        # structural: grad of lml_core with explicit precision="float32"
        # emits strictly more HIGHEST-precision dots than the same grad
        # with an ambient context set inside the differentiated body —
        # because the latter misses the custom-VJP backward entirely.
        K = spd(64, seed=43, dtype=jnp.float32)
        y = jnp.asarray(
            np.random.default_rng(44).normal(size=64), dtype=jnp.float32
        )

        def explicit(K):
            return cp.lml_core(K, y, 32, "float32")

        def ambient_in_body(K):
            with jax.default_matmul_precision("float32"):
                return cp.lml_core(K, y, 32)

        jx_explicit = str(jax.make_jaxpr(jax.grad(explicit))(K))
        jx_ambient = str(jax.make_jaxpr(jax.grad(ambient_in_body))(K))
        n_exp = jx_explicit.count("HIGHEST")
        n_amb = jx_ambient.count("HIGHEST")
        assert n_amb > 0  # forward trace does see the body context
        assert n_exp > n_amb  # backward additionally honors the argument

    def test_gp_observe_precision_kwarg(self):
        from gogp_tpu.gp.core import GP
        from gogp_tpu.kernels import rbf, uniform_noise
        from gogp_tpu.models.params import gp_observe

        gp = GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
        rng = np.random.default_rng(45)
        x = jnp.asarray(np.sort(rng.uniform(0, 10, (64, 1)), axis=0))
        y = jnp.asarray(np.sin(np.asarray(x[:, 0])))
        v = jnp.zeros(gp.n_theta)

        want_v, want_g = jax.value_and_grad(
            lambda v: gp_observe(gp, v, x=x, y=y)
        )(v)
        with cp.force_interpret():
            got_v, got_g = jax.value_and_grad(
                lambda v: gp_observe(gp, v, x=x, y=y, precision="float32")
            )(v)
        assert np.isclose(float(got_v), float(want_v), atol=1e-8)
        assert np.allclose(np.asarray(got_g), np.asarray(want_g), atol=1e-7)

    def test_rescue_skipped_at_explicit_high_precision(self):
        # an explicit high precision leaves no headroom to escalate into:
        # the dispatch must not wrap a cond
        assert not linalg._rescue_engaged(1 << 20, "float32")
        assert not linalg._rescue_engaged(1 << 20, "tensorfloat32")
        assert linalg._rescue_engaged(1 << 20, "default")


class TestPanelRank:
    """The tile kernels' panel rank is a pure performance knob: any
    multiple of 8 must produce the identical factorization."""

    @pytest.mark.parametrize("rank", [8, 16, 32])
    def test_tile_rank_equivalence(self, rank):
        K = spd(64, seed=11)
        with cp.force_interpret():
            L = np.asarray(cp.pallas_cholesky_tile(K, rank=rank))
        assert np.allclose(L, np.asarray(jnp.linalg.cholesky(K)), atol=1e-9)

    @pytest.mark.parametrize("rank", [8, 16, 32])
    def test_tile_inv_rank_equivalence(self, rank):
        K = spd(64, seed=12)
        with cp.force_interpret():
            L, V = cp.pallas_cholesky_inv_tile(K, rank=rank)
        assert np.allclose(
            np.asarray(V) @ np.asarray(L), np.eye(64), atol=1e-8
        )

    def test_non_divisible_rank_falls_back(self):
        # tile of 8 with _PANEL_RANK 32 must silently use rank 8
        K = spd(8, seed=13)
        prev = cp._PANEL_RANK
        cp._PANEL_RANK = 32
        try:
            with cp.force_interpret():
                L = np.asarray(cp.pallas_cholesky_tile(K))
        finally:
            cp._PANEL_RANK = prev
        assert np.allclose(L, np.asarray(jnp.linalg.cholesky(K)), atol=1e-10)


class TestSyrkLowerT:
    @pytest.mark.parametrize("n,ms", [(64, 16), (96, 32), (256, 64)])
    def test_matches_dense(self, n, ms):
        rng = np.random.default_rng(21)
        W = jnp.asarray(np.tril(rng.normal(size=(n, n))))
        got = np.asarray(cp.syrk_lower_t(W, min_size=ms))
        assert np.allclose(got, np.asarray(W.T @ W), atol=1e-10)

    def test_odd_size_falls_back_dense(self):
        rng = np.random.default_rng(22)
        W = jnp.asarray(np.tril(rng.normal(size=(24, 24))))
        got = np.asarray(cp.syrk_lower_t(W, min_size=8))
        assert np.allclose(got, np.asarray(W.T @ W), atol=1e-12)


class TestFusedWholeMatrix:
    """The single-program left-looking factorization (fused_cholesky_invs)
    must be exactly interchangeable with the stepwise driver."""

    @pytest.mark.parametrize("n,block", [(64, 16), (96, 32), (256, 64)])
    def test_matches_xla(self, n, block):
        K = spd(n, seed=31)
        with cp.force_interpret():
            L, invs = cp.fused_cholesky_invs(K, block, rank=8)
        Lx = np.asarray(jnp.linalg.cholesky(K))
        assert np.allclose(np.asarray(L), Lx, atol=1e-9)
        for k in range(n // block):
            tile = Lx[k * block:(k + 1) * block, k * block:(k + 1) * block]
            assert np.allclose(
                np.asarray(invs[k]) @ tile, np.eye(block), atol=1e-8
            )

    def test_dispatch_routes_and_matches(self):
        # blocked_cholesky_invs routes small-n to the fused kernel...
        K = spd(128, seed=32)
        with cp.force_interpret():
            L1, i1 = cp.blocked_cholesky_invs(K, 32)
            with cp.no_fused_whole():
                L2, i2 = cp.blocked_cholesky_invs(K, 32)
        assert np.allclose(np.asarray(L1), np.asarray(L2), atol=1e-9)
        assert np.allclose(np.asarray(i1), np.asarray(i2), atol=1e-8)

    def test_vmap_reroutes_to_stepwise(self):
        # batched calls take the stepwise driver via custom_vmap; values
        # must match the per-example fused results
        rng = np.random.default_rng(33)
        A = rng.normal(size=(3, 64, 64)) / 8.0
        Ks = jnp.asarray(np.einsum("bij,bkj->bik", A, A) + np.eye(64))
        with cp.force_interpret():
            Ls, _ = jax.vmap(lambda K: cp.blocked_cholesky_invs(K, 16))(Ks)
        Lx = np.asarray(jax.vmap(jnp.linalg.cholesky)(Ks))
        assert np.allclose(np.asarray(Ls), Lx, atol=1e-9)

    def test_gradient_flows_through_dispatch(self):
        K = spd(64, seed=34)
        y = jnp.asarray(np.random.default_rng(35).normal(size=64))
        with cp.force_interpret():
            v1, g1 = jax.value_and_grad(lambda K: cp.lml_core(K, y, 16))(K)
            with cp.no_fused_whole():
                v2, g2 = jax.value_and_grad(lambda K: cp.lml_core(K, y, 16))(K)
        assert np.isclose(float(v1), float(v2), rtol=1e-10)
        assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


class TestTrsmVJP:
    """Analytic custom VJPs of the blocked TRSMs (trsm_lower_ad /
    trsm_lower_t_ad) vs differentiating XLA's solve_triangular — these are
    what lets differentiated callers (the SGPR bound's whitening solve,
    gp/sparse.py:113) use the blocked MXU path."""

    @pytest.mark.parametrize("fwd", [True, False])
    def test_grads_match_xla(self, fwd):
        from jax.scipy.linalg import solve_triangular

        rng = np.random.default_rng(41)
        n, m = 64, 24
        a = rng.normal(size=(n, n))
        L = jnp.linalg.cholesky(jnp.asarray(a @ a.T + n * np.eye(n)))
        B = jnp.asarray(rng.normal(size=(n, m)))

        with cp.force_interpret():
            if fwd:
                ours = lambda L, B: jnp.sum(jnp.sin(cp.trsm_lower_ad(L, B, 16, None)))
                xla = lambda L, B: jnp.sum(
                    jnp.sin(solve_triangular(L, B, lower=True))
                )
            else:
                ours = lambda L, B: jnp.sum(
                    jnp.sin(cp.trsm_lower_t_ad(L, B, 16, None))
                )
                xla = lambda L, B: jnp.sum(
                    jnp.sin(solve_triangular(L, B, lower=True, trans=1))
                )
            g1 = jax.grad(ours, argnums=(0, 1))(L, B)
        g2 = jax.grad(xla, argnums=(0, 1))(L, B)
        assert np.allclose(np.tril(np.asarray(g1[0])), np.tril(np.asarray(g2[0])), atol=1e-9)
        assert np.allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-9)

    def test_cho_solve_mat_grad(self):
        # the composed K^{-1}B path (two chained custom VJPs)
        from jax.scipy.linalg import solve_triangular

        rng = np.random.default_rng(42)
        n, m = 64, 8
        a = rng.normal(size=(n, n))
        L = jnp.linalg.cholesky(jnp.asarray(a @ a.T + n * np.eye(n)))
        B = jnp.asarray(rng.normal(size=(n, m)))

        def ours(L, B):
            Z = cp.trsm_lower_ad(L, B, 16, None)
            return jnp.sum(jnp.cos(cp.trsm_lower_t_ad(L, Z, 16, None)))

        def xla(L, B):
            Z = solve_triangular(L, B, lower=True)
            return jnp.sum(jnp.cos(solve_triangular(L, Z, lower=True, trans=1)))

        with cp.force_interpret():
            g1 = jax.grad(ours, argnums=(0, 1))(L, B)
        g2 = jax.grad(xla, argnums=(0, 1))(L, B)
        assert np.allclose(np.tril(np.asarray(g1[0])), np.tril(np.asarray(g2[0])), atol=1e-9)
        assert np.allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-9)
