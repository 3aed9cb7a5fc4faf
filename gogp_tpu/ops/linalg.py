"""Dense linear algebra for the GP core.

Replaces gonum ``mat.Cholesky`` (Factorize gp/gp.go:228, SolveVecTo :233,
SolveTo :338/:454/:480, LogDet :250).  The default implementations below are
XLA primitives — they serve both as the CPU/correctness oracle and as the
fallback path; ``gogp_tpu.ops.cholesky_pallas`` provides the TPU Pallas
blocked factorization that can be swapped in through the same interface.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

Array = jax.Array

# Default matmul precision for near-cancellation consumers (gp.serve's
# predictive variance = prior - explained, gp.laplace/ep's Newton/site
# updates).  Measured on v5e (STATUS round 3/4): one-pass bf16 ("default")
# puts ~7e-2 absolute error on served sigma and a 4.3e-1 stationarity
# residual on the Laplace mode, while "tensorfloat32" gives 8.3e-4 sigma /
# 3.5e-3 residual at no measured cost where a Cholesky dominates and ~3x
# matmul cost (still ~2x faster than XLA) on the pure-serve path.  Those
# surfaces therefore DEFAULT to this value; throughput-critical callers
# that only consume mu may pass precision="default" explicitly.  The exact
# LML/gradient training path keeps the fast default — its accuracy ladder
# is measured and documented in ops/cholesky_pallas.py.
ACCURATE_PRECISION = "tensorfloat32"

# Trace-time dispatch switch: inside force_xla() every op takes the plain
# XLA-primitive path (the correctness oracle / perf baseline for bench.py).
_FORCE_XLA = False


@contextlib.contextmanager
def force_xla():
    global _FORCE_XLA
    prev, _FORCE_XLA = _FORCE_XLA, True
    try:
        yield
    finally:
        _FORCE_XLA = prev


# Precision-escalation rescue.  On TPU the blocked drivers' structural
# matmuls run at JAX's default f32 dot precision — a single bf16 MXU pass.
# For most GP covariances that is the measured 2-5x speed win at ~1e-3
# gradient accuracy, but a matrix that is f32-Cholesky-able yet has
# structure below bf16 resolution (e.g. near-duplicate inputs whose
# correlations differ from 1 by <1e-3) can push a trailing Schur complement
# negative and the factorization NaNs — while XLA's own Cholesky, which
# pins high-precision matmuls internally, survives.  Rescue: when the fast
# path produces a non-finite result, a lax.cond branch recomputes with the
# SAME blocked kernels re-traced under jax.default_matmul_precision
# ("float32") — the failure dimension is arithmetic precision, not
# positive-definiteness, so this (and not jitter) is the right first
# escalation.
#
# The wrapper is NOT free while dormant: the lax.cond is an HLO program
# break, measured ~0.8 ms on the n=4096 LML+gradient path (3.1 -> 4.3 ms,
# v5e) but <2% at n=16k where the pair compute is ~50 ms.  The bf16
# failure itself is size-coupled — the sub-resolution structure that kills
# a Schur complement comes from input spacings that shrink as n grows (the
# observed failure is 16k near-duplicate inputs; every 4096-point golden
# holds 1e-3 gradients) — so the rescue engages only at n >= _RESCUE_MIN_N
# by default.  precision_rescue(min_n=0) widens it to every blocked
# dispatch; no_precision_rescue() removes it (e.g. to vmap a large-n lml:
# under vmap, cond lowers to select and BOTH branches execute).
_RESCUE = True
_RESCUE_MIN_N = 8192


@contextlib.contextmanager
def precision_rescue(min_n: int = 0):
    """Engage the NaN -> float32-precision rescue for any blocked dispatch
    of size >= ``min_n`` (default: all of them)."""
    global _RESCUE, _RESCUE_MIN_N
    prev = (_RESCUE, _RESCUE_MIN_N)
    _RESCUE, _RESCUE_MIN_N = True, min_n
    try:
        yield
    finally:
        _RESCUE, _RESCUE_MIN_N = prev


@contextlib.contextmanager
def no_precision_rescue():
    global _RESCUE
    prev, _RESCUE = _RESCUE, False
    try:
        yield
    finally:
        _RESCUE = prev


def _rescue_engaged(n: int, precision: str | None = None) -> bool:
    if precision is None:
        precision = jax.config.jax_default_matmul_precision
    return (
        _RESCUE
        and n >= _RESCUE_MIN_N
        and precision in (None, "bfloat16", "default", "fastest")
    )


def cholesky(K: Array, precision: str | None = None) -> Array:
    """Lower Cholesky factor of an SPD matrix.

    Dispatches to the Pallas blocked kernel on TPU for sizes where it wins
    (see gogp_tpu.ops.cholesky_pallas.maybe_pallas_cholesky); XLA otherwise.

    ``precision``: explicit matmul precision for the blocked drivers'
    structural matmuls ("default" | "bfloat16" | "tensorfloat32" |
    "float32" | "highest").  Unlike the ambient
    ``jax.default_matmul_precision`` context — which only reaches the
    BACKWARD of this custom-VJP op when the context encloses the whole
    trace, not when a differentiated caller sets it in its own body — a
    per-call precision is threaded as a static argument through both
    forward and backward.  None = the ambient default.  The XLA fallback
    ignores it (XLA's own Cholesky pins high precision internally).
    """
    if not _FORCE_XLA:
        from gogp_tpu.ops.cholesky_pallas import maybe_pallas_cholesky

        out = maybe_pallas_cholesky(K, precision)
        if out is not None:
            if _rescue_engaged(K.shape[-1], precision):

                def hi(K):
                    # explicit precision so the rescue branch's BACKWARD
                    # dots also run at float32 (an ambient context here
                    # would cover only the forward trace)
                    return maybe_pallas_cholesky(K, "float32")

                ok = jnp.all(jnp.isfinite(jnp.diagonal(out)))
                return jax.lax.cond(ok, lambda K: out, hi, K)
            return out
    return jnp.linalg.cholesky(K)


def cholesky_with_jitter(
    K: Array,
    max_tries: int = 5,
    initial_jitter: float = 1e-8,
    precision: str | None = None,
) -> tuple[Array, Array]:
    """Cholesky with escalating diagonal jitter — the failure-detection path.

    The reference surfaces a failed factorization as a hard error with the
    offending matrix (gp/gp.go:228-230) and dies; under jit we can't raise,
    so instead: try plain Cholesky, and while the factor contains non-finite
    entries re-try with jitter ``initial_jitter * mean(diag) * 10^t`` added
    to the diagonal, up to ``max_tries`` escalations (a bounded while_loop).

    Returns ``(L, jitter_used)``; callers can expose ``jitter_used > 0`` as
    a warning signal.  With ``max_tries`` exhausted the factor still carries
    NaNs, which propagate to the log-density — samplers treat non-finite
    energies as divergences, so a truly unsalvageable matrix degrades into
    a rejected proposal instead of a crashed run.
    """
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    scale = jnp.mean(jnp.diagonal(K)) * initial_jitter

    def ok(L):
        return jnp.all(jnp.isfinite(jnp.diagonal(L)))

    def cond(state):
        t, L, _ = state
        return (t < max_tries) & ~ok(L)

    def body(state):
        t, _, _ = state
        jitter = scale * (10.0 ** t.astype(K.dtype))
        L = cholesky(K + jitter * eye, precision)
        return t + 1, L, jitter

    L0 = cholesky(K, precision)
    _, L, jitter = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), L0, jnp.asarray(0.0, K.dtype))
    )
    return L, jitter


def lml_core(K: Array, y: Array, precision: str | None = None) -> Array:
    """-1/2 (log|K| + y^T K^-1 y) — the data-dependent part of the GP log
    marginal likelihood (GPML eq. 5.8; reference gp/gp.go:244-253 minus the
    2pi constant).

    On TPU f32 at n >= 1024 this dispatches to the fused blocked-Pallas
    implementation whose custom VJP is the analytic pullback
    Kbar = g/2 (aa^T - K^-1) — about 2x faster end-to-end than
    differentiating through the XLA Cholesky.  Elsewhere it is the plain
    XLA computation, differentiated by jax.

    ``precision``: explicit per-call matmul precision for the blocked
    drivers, reaching both forward AND backward traces (see
    :func:`cholesky`).  "tensorfloat32" is the measured sweet spot for
    ill-conditioned covariances (dense inputs at optimized lengthscales)
    below the size-gated NaN rescue: XLA-path accuracy at ~2x default-
    precision cost, still ~2.7x faster than XLA-AD at n=4096.
    """
    if not _FORCE_XLA:
        from gogp_tpu.ops.cholesky_pallas import maybe_lml_core

        out = maybe_lml_core(K, y, precision)
        if out is not None:
            if _rescue_engaged(K.shape[-1], precision):

                def hi(ops):
                    # explicit precision: covers the rescue branch's
                    # backward too (ambient context would not)
                    return maybe_lml_core(*ops, "float32")

                return jax.lax.cond(
                    jnp.isfinite(out), lambda ops: out, hi, (K, y)
                )
            return out
    L = jnp.linalg.cholesky(K)
    z = solve_triangular(L, y, lower=True)
    return -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * jnp.dot(z, z)


def cho_solve_vec(L: Array, y: Array) -> Array:
    """alpha = K^{-1} y given lower factor L (reference gp/gp.go:232-233)."""
    z = solve_triangular(L, y, lower=True)
    return solve_triangular(L, z, lower=True, trans=1)


def _blocked_trsm_block(L: Array) -> int | None:
    """Block size when the blocked-Pallas TRSM should handle solves with
    this factor (mirrors the cholesky dispatch eligibility)."""
    if _FORCE_XLA:
        return None
    from gogp_tpu.ops.cholesky_pallas import _eligible_block

    return _eligible_block(L)


def cho_solve_mat(L: Array, B: Array) -> Array:
    """K^{-1} B given lower factor L (reference SolveTo call sites).

    Large TPU f32 solves route through the blocked MXU TRSMs (measured
    2.4x over XLA's native trsm at n=4096 with an n-column RHS).
    """
    block = _blocked_trsm_block(L)
    if block is not None and B.ndim == 2:
        from gogp_tpu.ops.cholesky_pallas import trsm_lower_ad, trsm_lower_t_ad

        Z = trsm_lower_ad(L, B, block, None)
        return trsm_lower_t_ad(L, Z, block, None)
    Z = solve_triangular(L, B, lower=True)
    return solve_triangular(L, Z, lower=True, trans=1)


def trsm_lower(L: Array, B: Array) -> Array:
    """L^{-1} B — the half-solve used by fused predictive variance."""
    block = _blocked_trsm_block(L)
    if block is not None and B.ndim == 2:
        from gogp_tpu.ops.cholesky_pallas import trsm_lower_ad

        return trsm_lower_ad(L, B, block, None)
    return solve_triangular(L, B, lower=True)


def tril_inv(L: Array, precision: str | None = None) -> Array:
    """W = inv(L) for lower-triangular L — the serving-cache precompute
    (gp/serve.py): spend one O(n^3/3) inversion at fit time so every later
    predictive solve is a single MXU matmul instead of a sequential TRSM.

    Dispatches to the blocked triangular inverse (tile inverses from the
    Pallas substitution kernel, trailing products only over the nonzero
    corner) when the factor is blocked-eligible; XLA solve otherwise.
    """
    block = _blocked_trsm_block(L)
    if block is not None:
        from gogp_tpu.ops.cholesky_pallas import blocked_tril_inv

        return blocked_tril_inv(L, block, precision=precision)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return solve_triangular(L, eye, lower=True)


def logdet_from_chol(L: Array, mask: Array | None = None) -> Array:
    """log|K| = 2 sum log diag(L) (reference gp/gp.go:250 L.LogDet()).

    With ``mask`` (0/1 per point), padded diagonal entries are excluded —
    padding contributes L_ii = 1 under the masked-covariance convention of
    gogp_tpu.gp.core.masked_cov, so this is belt-and-braces exactness.
    """
    d = jnp.log(jnp.diagonal(L))
    if mask is not None:
        d = d * mask
    return 2.0 * jnp.sum(d)
