"""Fused small-GP evaluator: the whole LML + hyperparameter gradient as ONE
Pallas kernel.

Why: MCMC on GP hyperparameters (the hyperpriors NUTS north star) evaluates
the log-joint and its gradient once per leapfrog step.  At tutorial sizes
(n~33) that evaluation lowers to ~50 tiny XLA ops (covariance build,
Cholesky, triangular solves, their transposes in the reverse pass), and on
TPU each tiny op pays a fixed launch/sync cost — measured 0.92 ms for a
64-chain batched evaluation whose arithmetic is microseconds.  Fusing the
entire evaluation into one Pallas program removes that overhead wholesale.

How: everything is computed *inside one kernel* with loop-free AD —

- the covariance K(v) is built by the study's own pure-jnp kernel functions
  (traced into the Pallas body; composability is preserved);
- dK/dv_k comes from ``jax.jvp`` of the builder (forward mode never touches
  a loop);
- the factorization/inversion use value-level masked-reduction loops (the
  same Mosaic-safe rank-1 formulation as ops/cholesky_pallas): chol(K),
  L^-1, K^-1 = L^-T L^-1;
- the gradient is the analytic GPML eq. 5.9:  dLML/dv_k =
  1/2 <alpha alpha^T - K^-1, dK_k>  (the reference's own identity,
  gp/gp.go:418-499 — here it finally pays off, because it keeps reverse AD
  out of the kernel);
- priors (loop-free jnp) are differentiated with ``jax.value_and_grad``
  inside the kernel.

The kernel handles one problem; ``jax.vmap`` batches it across chains
(Pallas supplies the batching rule), so samplers can use it untouched via
their ``vg`` hook.  Restricted to theta-only models (fixed x, y) — the
latent-input studies keep the autodiff path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LOG_2PI = 1.8378770664093453

_INTERPRET = False

import contextlib


@contextlib.contextmanager
def force_interpret():
    global _INTERPRET
    prev, _INTERPRET = _INTERPRET, True
    try:
        yield
    finally:
        _INTERPRET = prev


def chol_value(K: Array) -> Array:
    """Value-level masked-reduction Cholesky (Mosaic-safe: no dynamic lane
    indexing; n fori_loop steps of full-matrix VPU ops).

    Batch-aware: K may be (..., n, n); every op is a broadcasted reduction
    over the trailing two axes, so a whole chain population factorizes in
    one pass (the in-kernel replacement for vmap, which would otherwise
    serialize Pallas programs over a grid).
    """
    n = K.shape[-1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def body(j, carry):
        M, L = carry
        row_j = jnp.sum(jnp.where(row_ids == j, M, 0.0), axis=-2, keepdims=True)
        col_j = jnp.sum(jnp.where(col_ids == j, M, 0.0), axis=-1, keepdims=True)
        d = jnp.sum(
            jnp.where(col_ids[:1, :] == j, row_j, 0.0), axis=-1, keepdims=True
        )  # (..., 1, 1)
        inv_sqrt = jax.lax.rsqrt(d)
        l_col = jnp.where(row_ids[:, :1] >= j, col_j * inv_sqrt, 0.0)
        l_row = jnp.where(col_ids[:1, :] >= j, row_j * inv_sqrt, 0.0)
        M = M - l_col * l_row
        L = L + jnp.where(col_ids == j, l_col, 0.0)
        return M, L

    _, L = jax.lax.fori_loop(0, n, body, (K, jnp.zeros_like(K)))
    return L


def lower_inv_value(L: Array) -> Array:
    """X = L^-1 by Gauss-Jordan elimination on [L | I].

    Deliberately uses ONLY the op shapes the Mosaic compiler handles well
    inside fori_loop bodies — masked reductions and broadcasted rank-1
    outer products (the same vocabulary as chol_value).  An earlier
    forward-substitution variant with an in-loop (1,n)@(n,n) matvec sent
    Mosaic's compile time to infinity.
    """
    n = L.shape[-1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * n), 1)
    # A = [L | I], batch-aware over leading axes
    eye_part = (col_ids - n == row_ids).astype(L.dtype)
    pad_widths = [(0, 0)] * (L.ndim - 1) + [(0, n)]
    A0 = jnp.where(col_ids < n, jnp.pad(L, pad_widths), eye_part)

    def body(j, A):
        row_j = jnp.sum(jnp.where(row_ids == j, A, 0.0), axis=-2, keepdims=True)
        col_j = jnp.sum(
            jnp.where(col_ids == j, A, 0.0), axis=-1, keepdims=True
        )  # j-th column of the L part
        d = jnp.sum(
            jnp.where(col_ids[:1, :] == j, row_j, 0.0), axis=-1, keepdims=True
        )
        factor = jnp.where(row_ids[:, :1] > j, col_j / d, 0.0)  # rows below j
        A = A - factor * row_j
        A = jnp.where(row_ids == j, A / d, A)  # normalize pivot row
        return A

    A = jax.lax.fori_loop(0, n, body, A0)
    return A[..., :, n:]


def linv_value(K: Array) -> Array:
    """L^-1 for K = L L^T — the fully serial two-loop core, batch-aware."""
    return lower_inv_value(chol_value(K))


def _lml_and_w_from_linv(Linv, yv, n_eff):
    """(lml, W) from L^-1 — embarrassingly batched XLA ops (one matmul, two
    reduce-contractions, elementwise), kept OUTSIDE the Pallas kernel where
    XLA batches them across chains natively.

    diag(L) = 1/diag(L^-1);  quad = ||L^-1 y||^2;  K^-1 = L^-T L^-1.
    """
    diag_linv = jnp.diagonal(Linv, axis1=-2, axis2=-1)  # (..., n)
    logdet = -2.0 * jnp.sum(jnp.log(jnp.abs(diag_linv) + 1e-30), axis=-1)
    z = jnp.einsum("...ij,...j->...i", Linv, yv)
    quad = jnp.sum(z * z, axis=-1)
    alpha = jnp.einsum("...ki,...k->...i", Linv, z)
    Kinv = jnp.einsum("...ki,...kj->...ij", Linv, Linv)
    lml = -0.5 * (n_eff * _LOG_2PI + logdet + quad)
    W = alpha[..., :, None] * alpha[..., None, :] - Kinv
    return lml, W


def _lml_and_w_math(K, yv, n_eff):
    """Value-level (lml, W): the oracle path and the CPU fallback."""
    Linv = linv_value(K)
    yb = jnp.broadcast_to(yv, K.shape[:-2] + yv.shape)
    return _lml_and_w_from_linv(Linv, yb, n_eff)


def _lml_and_grad_math(cov_from_v, priors_fn, v, yv, n_eff, core=_lml_and_w_math):
    """Full evaluation: covariance + core(K) + analytic gradient via
    dLML/dv_k = 1/2 <W, dK_k> (GPML eq. 5.9) + priors.  ``core`` is either
    the value-level math (oracle) or the Pallas-fused kernel."""
    p = v.shape[0]
    K = cov_from_v(v)
    lml, W = core(K, yv, n_eff)

    # dK for all p tangents in one jacfwd — a single batched XLA op chain
    dK = jax.jacfwd(cov_from_v)(v)  # (n, n, p)
    grad = 0.5 * jnp.einsum("ij,ijk->k", W, dK)

    if priors_fn is not None:
        pv, pg = jax.value_and_grad(priors_fn)(v)
        lml = lml + pv
        grad = grad + pg
    return lml, grad


def make_fused_value_and_grad(gp, x, y, mask=None, priors_fn=None):
    """Build ``vg(v) -> (logp, grad)`` fused into one Pallas kernel.

    ``gp``: gogp_tpu GP spec (theta-only use: x, y fixed at build time);
    ``priors_fn``: optional loop-free ``priors(v) -> scalar`` on log-thetas.
    vmap over a batch of ``v`` for multi-chain samplers.
    """
    from gogp_tpu.gp.core import masked_cov

    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    y = jnp.asarray(y)
    n = x.shape[0]
    if mask is None:
        mask = jnp.ones((n,), x.dtype)
    mask = jnp.asarray(mask, x.dtype)

    # Pad to a 64-aligned size: Mosaic's compile time explodes on unaligned
    # kernels (n=33 never finishes; n=64 compiles in ~2 s) and padding is
    # exact under the mask convention (padded rows are identity rows of K,
    # zero y, and theta-independent, so LML and gradients are unchanged —
    # tests/test_fused_gp.py::test_masked_padding_exact).
    n_pad = max(64, -(-n // 64) * 64)
    if n_pad != n:
        x = jnp.concatenate([x, jnp.zeros((n_pad - n, x.shape[1]), x.dtype)])
        y = jnp.concatenate([y, jnp.zeros((n_pad - n,), y.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((n_pad - n,), mask.dtype)])
        n = n_pad

    nts = gp.n_theta_simil
    dtype = x.dtype
    yv = y * mask
    n_eff = jnp.sum(mask)

    def cov_from_v(v):
        theta = jnp.exp(v)
        return masked_cov(gp, theta[:nts], theta[nts:], x, mask)

    def kernel(K_ref, linv_ref):
        linv_ref[:] = linv_value(K_ref[:])

    def pallas_linv(Kb):
        """One Pallas call for any leading batch shape (collapsed to one
        batch axis inside the kernel — the loops are batch-aware).

        Large batches stream through a grid in VMEM-sized chunks: the
        whole batch resident at once overflows the ~16 MB scoped VMEM
        (observed at 256 chains x 64^2 tiles); with a chunked grid the
        same kernel body handles any chain count.
        """
        lead = Kb.shape[:-2]
        if not lead:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(Kb.shape, dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=_INTERPRET,
                cost_estimate=pl.CostEstimate(
                    flops=3 * n * n * n,
                    bytes_accessed=2 * Kb.size * dtype.itemsize,
                    transcendentals=n,
                ),
            )(Kb)
            return out
        K3 = Kb.reshape((-1, n, n))
        b = K3.shape[0]
        # ~1 MB of K per grid step: the kernel's working copies multiply
        # the footprint several-fold and ~16 MB of scoped VMEM is the
        # ceiling (a 128-batch block of 64^2 tiles measured 31.85 MB)
        chunk = max(1, min(b, (1024 * 1024) // (n * n * dtype.itemsize)))
        grid = -(-b // chunk)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((chunk, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (chunk, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(K3.shape, dtype),
            interpret=_INTERPRET,
            cost_estimate=pl.CostEstimate(
                flops=b * 3 * n * n * n,
                bytes_accessed=2 * K3.size * dtype.itemsize,
                transcendentals=n,
            ),
        )(K3)
        return out.reshape(Kb.shape)

    # vmap must route to the SAME kernel with a bigger batch — the default
    # pallas batching rule would serialize programs over a grid instead.
    @jax.custom_batching.custom_vmap
    def linv_op(K):
        return pallas_linv(K)

    @linv_op.def_vmap
    def _linv_vmap(axis_size, in_batched, K):
        del axis_size, in_batched
        return pallas_linv(K), True

    def pallas_core(K, yv_in, n_eff_in):
        Linv = linv_op(K)
        return _lml_and_w_from_linv(Linv, yv_in, n_eff_in)

    def vg(v):
        v = jnp.asarray(v, dtype)
        return _lml_and_grad_math(
            cov_from_v, priors_fn, v, yv, n_eff, core=pallas_core
        )

    return vg


def make_reference_value_and_grad(gp, x, y, mask=None, priors_fn=None):
    """Same math on plain XLA ops — the correctness oracle for the fused
    kernel, and the fallback on non-TPU backends."""
    from gogp_tpu.gp.core import masked_cov

    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    y = jnp.asarray(y)
    n = x.shape[0]
    if mask is None:
        mask = jnp.ones((n,), x.dtype)
    mask = jnp.asarray(mask, x.dtype)
    yv = y * mask
    n_eff = jnp.sum(mask)
    nts = gp.n_theta_simil

    def cov_from_v(v):
        theta = jnp.exp(v)
        return masked_cov(gp, theta[:nts], theta[nts:], x, mask)

    def vg(v):
        return _lml_and_grad_math(cov_from_v, priors_fn, jnp.asarray(v), yv, n_eff)

    return vg
