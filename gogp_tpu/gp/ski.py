"""GP layer over the SKI operator: LML + Produce for irregular 1-D series.

``lml_toeplitz`` (gp/core.py) is the O(n log n) path when the inputs sit on
a regular grid — the reference's actual regime.  Real telemetry is rarely
regular; :func:`lml_ski` keeps the asymptotics on ARBITRARY 1-D designs by
interpolating onto an inducing grid (ops/ski.py, Wilson & Nickisch 2015's
KISS-GP), and — unlike the Toeplitz path — supports heteroscedastic noise
kernels and runs fully under jit (the grid placement is traced min/max
arithmetic; no host-side spacing checks).

Same estimator contract as gp.core.lml_iterative: SLQ/Hutchinson value and
gradient noise ~1/sqrt(probes), gradients via frozen-solution quadratic
forms (no differentiation through CG), plus the SKI interpolation bias
O(h^4) in the grid spacing — pick grid_size a few x the data count for
effectively exact results at O((n + g log g)) per matvec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gogp_tpu.gp.core import GP, _LOG_2PI, _as_xy
from gogp_tpu.ops import ski

Array = jax.Array


def _grid_col(gp: GP, ts, x_flat, grid_size: int):
    """Traced grid placement + the grid kernel's Toeplitz first column.

    3 cells of margin each side keep every data point's 4 cubic taps
    interior (ops.ski.cubic_interp clamps as a safety net only)."""
    xmin, xmax = jnp.min(x_flat), jnp.max(x_flat)
    h = (xmax - xmin) / (grid_size - 7)
    grid0 = xmin - 3.0 * h
    grid = grid0 + h * jnp.arange(grid_size, dtype=x_flat.dtype)
    col = gp.simil.matrix(ts, grid[:, None], grid[:1, None])[:, 0]  # (g,)
    return grid0, h, col


def lml_ski(
    gp: GP,
    theta_simil,
    theta_noise,
    x,
    y,
    key,
    grid_size: int = 2048,
    num_probes: int = 16,
    cg_iters: int = 100,
    lanczos_iters: int = 32,
    method: str = "matmul",
) -> Array:
    """Log marginal likelihood through the SKI operator (irregular 1-D).

    No padding mask (at O(n log n) there is no reason to pad) — the same
    contract as :func:`gogp_tpu.gp.core.lml_toeplitz`.

    ``method``: the W^T apply ("matmul" default — MXU one-hot form whose
    one-pass-bf16 error sits below the SLQ estimator noise; "scatter"/
    "sorted" are the exact forms, ops.ski.ski_matvec_fn docstring).
    """
    x, y = _as_xy(gp, x, y)
    n = x.shape[0]
    if x.shape[1] != 1:
        raise ValueError("lml_ski is 1-D only (Kronecker grids not implemented)")
    ts0 = jnp.asarray(theta_simil, dtype=x.dtype).reshape(gp.n_theta_simil)
    tn0 = jnp.asarray(theta_noise, dtype=x.dtype).reshape(gp.n_theta_noise)
    # sort along the grid axis (LML is permutation-invariant): the W^T
    # apply then runs scatter-free (ops.ski.interp_t_sorted — measured
    # 3.4x faster matvecs on TPU); y's sort is a differentiable gather,
    # so the -alpha cotangent lands back in caller order automatically
    order = jnp.argsort(x[:, 0])
    x = x[order]
    y = y[order]
    xf = x[:, 0]
    # grid geometry is data-driven, never differentiated
    gmin, h0, _ = _grid_col(gp, jax.lax.stop_gradient(ts0), jax.lax.stop_gradient(xf), grid_size)
    idx, w = ski.cubic_interp(jax.lax.stop_gradient(xf), gmin, h0, grid_size)

    def c_of(ts):
        _, _, col = _grid_col(gp, ts, jax.lax.stop_gradient(xf), grid_size)
        return col

    def noise_of(tn):
        return gp.noise.vector(tn, x)

    @jax.custom_vjp
    def core(ts, tn, yv):
        value, _ = ski.lml_ski_core(
            lambda: c_of(ts), lambda: noise_of(tn), idx, w, yv, key,
            num_probes, cg_iters, lanczos_iters, method,
        )
        return value

    def fwd(ts, tn, yv):
        value, aux = ski.lml_ski_core(
            lambda: c_of(ts), lambda: noise_of(tn), idx, w, yv, key,
            num_probes, cg_iters, lanczos_iters, method,
        )
        return value, (ts, tn, aux)

    def bwd(res, g):
        ts, tn, (alpha, Z, S) = res

        def hfun(ts_, tn_):
            return ski.ski_quadratic_forms(
                lambda: c_of(ts_), lambda: noise_of(tn_), idx, w, alpha, Z, S,
                method,
            )

        gts, gtn = jax.grad(hfun, argnums=(0, 1))(ts, tn)
        return (0.5 * g) * gts, (0.5 * g) * gtn, -g * alpha

    core.defvjp(fwd, bwd)
    return -0.5 * n * _LOG_2PI + core(ts0, tn0, y)


def predict_ski(
    gp: GP,
    theta_simil,
    theta_noise,
    x,
    y,
    z,
    grid_size: int = 2048,
    cg_iters: int = 200,
    tol: float = 1e-6,
) -> tuple[Array, Array]:
    """``Produce`` with every K-solve through the SKI matvec — the exact
    predict semantics (noise-free latent bands, reference gp/gp.go:258-360)
    against the interpolated operator; cross-covariances to the test points
    are exact kernel evaluations (only the training solve is approximated).
    Deterministic (no probes)."""
    from gogp_tpu.ops.iterative import cg_solve

    x, y = _as_xy(gp, x, y)
    z = jnp.atleast_2d(jnp.asarray(z))
    if x.shape[1] != 1:
        raise ValueError("predict_ski is 1-D only")
    ts = jnp.asarray(theta_simil, dtype=x.dtype).reshape(gp.n_theta_simil)
    tn = jnp.asarray(theta_noise, dtype=x.dtype).reshape(gp.n_theta_noise)
    order = jnp.argsort(x[:, 0])
    x = x[order]
    y = y[order]
    xf = x[:, 0]
    gmin, h0, col = _grid_col(gp, ts, xf, grid_size)
    idx, w = ski.cubic_interp(xf, gmin, h0, grid_size)
    mv = ski.ski_matvec_fn(col, idx, w, gp.noise.vector(tn, x), method="sorted")
    kstar = gp.simil.matrix(ts, x, z)  # (n, m) exact
    X, _ = cg_solve(mv, jnp.concatenate([y[:, None], kstar], axis=1), cg_iters, tol)
    alpha, W = X[:, 0], X[:, 1:]
    mu = kstar.T @ alpha
    prior_var = gp.simil.diag_matrix(ts, z)
    var = prior_var - jnp.sum(kstar * W, axis=0)
    return mu, jnp.sqrt(jnp.maximum(var, 0.0))


__all__ = ["lml_ski", "predict_ski"]
