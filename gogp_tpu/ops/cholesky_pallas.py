"""Blocked Cholesky / TRSM for TPU: Pallas base kernel + MXU panel updates.

Replaces gonum ``mat.Cholesky`` (reference gp/gp.go:228-233) on the hot
path.  Design (SURVEY.md §7 PR2):

- **Base case** (``_chol_kernel``): an unblocked column-oriented Cholesky of
  a single VMEM-resident tile (block x block), one Pallas program.  Each of
  the ``block`` iterations does one masked (n x n)@(n x 1) matvec on the
  VPU plus a rsqrt — sequential by nature, so the tile is kept small and
  everything stays on-chip.

- **Blocked driver** (``blocked_cholesky``): right-looking factorization,
  *statically unrolled* over block columns so every panel slice has a
  static shape (no masked full-width work — the waste that would otherwise
  triple the FLOPs).  Per step: Pallas-factor the diagonal tile, invert it
  with one small XLA triangular solve, form the panel with one MXU matmul
  (``A_panel @ inv(Lkk)^T`` — multiplication instead of a large TRSM), and
  SYRK the trailing square with one MXU matmul.  All O(n^3) work lands on
  the MXU.

- **Gradient** (``cholesky`` custom_vjp): the standard Cholesky pullback
  K_bar = P(L^-T Phi(L^T L_bar) L^-1) computed with two blocked TRSMs, so
  ``jax.grad`` of the GP marginal likelihood never differentiates through
  the factorization loop.

- ``blocked_trsm_lower``: the same inverted-diagonal-block trick for
  L^{-1} B, statically unrolled, used by both the VJP and prediction.

Dispatch: ``maybe_pallas_cholesky`` routes TPU float32 matrices with
n >= _MIN_N (and n % block == 0) here; everything else falls back to
``jnp.linalg.cholesky``.  On CPU the Pallas kernel runs in interpreter mode
when forced (tests), never by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BLOCK = 256
_MIN_N = 1024  # below this XLA's native cholesky wins (dispatch overhead)
_INTERPRET = False  # tests force interpreter mode on CPU

# Dispatch default: measured on one v5e chip (N=4096 f32, device-loop
# timing), the blocked path is at parity with XLA's native cholesky
# (3.69 vs 3.56 ms bare; 4.13 vs 4.02 ms inside LML+grad) — XLA's TPU
# factorization is already near the algorithmic limit here.  The custom
# path therefore stays OPT-IN until the tile base case beats it (an
# MXU-blocked tile kernel is the round-2 candidate); flip with
# enable_pallas() or force_interpret() (tests).
_ENABLED = False


import contextlib


@contextlib.contextmanager
def enable_pallas():
    """Opt in to the blocked-Pallas dispatch for TPU f32 n>=_MIN_N."""
    global _ENABLED
    prev, _ENABLED = _ENABLED, True
    try:
        yield
    finally:
        _ENABLED = prev


@contextlib.contextmanager
def force_interpret():
    """Run the Pallas kernels in interpreter mode and dispatch to them
    regardless of platform/size — the CPU test path."""
    global _INTERPRET
    prev, _INTERPRET = _INTERPRET, True
    try:
        yield
    finally:
        _INTERPRET = prev


def _chol_kernel(a_ref, l_ref, m_ref):
    """Unblocked in-VMEM Cholesky: l_ref <- chol(a_ref), lower.

    Outer-product (right-looking, rank-1) formulation chosen for Mosaic's
    layout rules: dynamic slicing along the lane (last) dimension must be
    128-aligned, so column j is never *sliced* — it is extracted with a
    lane-masked reduction of the symmetric working matrix M, the pivot with
    a second masked reduction, and the trailing update is a broadcasted
    (n,1)x(1,n) outer product.  Every op is a full-tile VPU op; the loop
    carries no dynamic indices at all.
    """
    n = a_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    m_ref[:] = a_ref[:]
    l_ref[:] = jnp.zeros_like(a_ref)

    def body(j, _):
        M = m_ref[:]
        # row j of M == column j of M (M stays symmetric under rank-1 updates)
        row_j = jnp.sum(jnp.where(row_ids == j, M, 0.0), axis=0, keepdims=True)
        col_j = jnp.sum(jnp.where(col_ids == j, M, 0.0), axis=1, keepdims=True)
        d = jnp.sum(jnp.where(col_ids[:1, :] == j, row_j, 0.0))
        inv_sqrt = jax.lax.rsqrt(d)
        l_col = jnp.where(row_ids[:, :1] >= j, col_j * inv_sqrt, 0.0)  # (n,1)
        l_row = jnp.where((col_ids[:1, :] >= j), row_j * inv_sqrt, 0.0)  # (1,n)
        m_ref[:] = M - l_col * l_row  # rank-1 trailing update (broadcast outer)
        l_ref[:] = l_ref[:] + jnp.where(col_ids == j, l_col, 0.0)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def pallas_cholesky_tile(a: Array) -> Array:
    """Cholesky of one VMEM-sized tile via the Pallas kernel."""
    n = a.shape[-1]
    return pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(a.shape, a.dtype)],
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * n, bytes_accessed=2 * n * n * a.dtype.itemsize,
            transcendentals=n,
        ),
    )(a)


def _inv_lower(Lkk: Array) -> Array:
    """inv(Lkk) for a small lower-triangular tile (one XLA trsm vs eye)."""
    eye = jnp.eye(Lkk.shape[-1], dtype=Lkk.dtype)
    return jax.scipy.linalg.solve_triangular(Lkk, eye, lower=True)


def blocked_cholesky(K: Array, block: int = DEFAULT_BLOCK) -> Array:
    """Right-looking blocked Cholesky, statically unrolled block columns.

    Requires n % block == 0 (callers pad; the GP layer always can because
    its shapes are static).
    """
    n = K.shape[-1]
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    nb = n // block
    if nb == 1:
        return pallas_cholesky_tile(K)

    dtype = K.dtype
    L = jnp.zeros_like(K)
    A = K
    for k in range(nb):
        c0, c1 = k * block, (k + 1) * block
        diag = A[c0:c1, c0:c1]
        Lkk = pallas_cholesky_tile(diag)
        L = L.at[c0:c1, c0:c1].set(Lkk)
        if c1 < n:
            inv = _inv_lower(Lkk)
            panel = jax.lax.dot_general(
                A[c1:, c0:c1], inv, (((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
            )  # (n-c1, block) = A_panel @ inv^T
            L = L.at[c1:, c0:c1].set(panel)
            A = A.at[c1:, c1:].add(
                -jax.lax.dot_general(
                    panel, panel, (((1,), (1,)), ((), ())),
                    preferred_element_type=dtype,
                )
            )
    return L


def blocked_trsm_lower(L: Array, B: Array, block: int = DEFAULT_BLOCK) -> Array:
    """X = L^{-1} B with L lower triangular, statically unrolled blocks.

    Per block row: X[k] = inv(Lkk) @ (B[k] - L[k, :k] @ X[:k]) — the
    subtraction and the application of the inverted diagonal tile are MXU
    matmuls; only the tiny tile inversions are triangular solves.
    """
    n = L.shape[-1]
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    nb = n // block
    if B.ndim == 1:
        return blocked_trsm_lower(L, B[:, None], block)[:, 0]
    X = jnp.zeros_like(B)
    for k in range(nb):
        c0, c1 = k * block, (k + 1) * block
        rhs = B[c0:c1]
        if k > 0:
            rhs = rhs - L[c0:c1, :c0] @ X[:c0]
        inv = _inv_lower(L[c0:c1, c0:c1])
        X = X.at[c0:c1].set(inv @ rhs)
    return X


def blocked_trsm_lower_t(L: Array, B: Array, block: int = DEFAULT_BLOCK) -> Array:
    """X = L^{-T} B (transpose solve), statically unrolled, bottom-up."""
    n = L.shape[-1]
    if n % block != 0:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    nb = n // block
    if B.ndim == 1:
        return blocked_trsm_lower_t(L, B[:, None], block)[:, 0]
    X = jnp.zeros_like(B)
    for k in reversed(range(nb)):
        c0, c1 = k * block, (k + 1) * block
        rhs = B[c0:c1]
        if c1 < n:
            rhs = rhs - L[c1:, c0:c1].T @ X[c1:]
        inv = _inv_lower(L[c0:c1, c0:c1])
        X = X.at[c0:c1].set(inv.T @ rhs)
    return X


def _phi(A: Array) -> Array:
    """tril(A) with the diagonal halved — the Cholesky pullback projector.

    Diagonal extracted with a broadcasted-iota equality mask: ``jnp.diag``
    of a vector lowers to a TPU scatter (measured ~40 ms at n=4096,
    DESIGN.md par.3) and this sits on the gradient hot path.
    """
    n = A.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.tril(A) - 0.5 * jnp.where(r == c, A, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def cholesky(K: Array, block: int = DEFAULT_BLOCK) -> Array:
    return blocked_cholesky(K, block)


def _chol_fwd(K, block):
    L = blocked_cholesky(K, block)
    return L, L


def _chol_bwd(block, L, Lbar):
    # Murray (2016): K_bar = 0.5 * L^-T (Phi(L^T Lbar) + Phi(L^T Lbar)^T) L^-1
    P = _phi(L.T @ Lbar)
    # S = L^-T P: transpose-solve; then K_bar = S L^-1 = (L^-T S^T)^T
    S = blocked_trsm_lower_t(L, P, block)
    Kbar = blocked_trsm_lower_t(L, S.T, block).T
    Kbar = 0.5 * (Kbar + Kbar.T)
    return (Kbar,)


cholesky.defvjp(_chol_fwd, _chol_bwd)


def maybe_pallas_cholesky(K: Array):
    """Dispatch: the blocked Pallas path when it's profitable, else None."""
    if _INTERPRET:
        # tests force the custom path regardless of platform/size
        n = K.shape[-1]
        block = DEFAULT_BLOCK if n % DEFAULT_BLOCK == 0 else None
        if block is None:
            for b in (128, 64, 32, 16, 8):
                if n % b == 0:
                    block = b
                    break
        return None if block is None else cholesky(K, block)
    if not _ENABLED:
        return None
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return None
    if platform != "tpu":
        return None
    if K.ndim != 2 or K.dtype not in (jnp.float32,):
        return None
    n = K.shape[-1]
    if n < _MIN_N or n % DEFAULT_BLOCK != 0:
        return None
    return cholesky(K, DEFAULT_BLOCK)
