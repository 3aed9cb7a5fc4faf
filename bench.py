"""Headline benchmark: GP log-marginal-likelihood + gradient at N=4096.

This is BASELINE.json's "Cholesky+LL walltime at N=4096" north-star: one
covariance assembly (RBF + noise), Cholesky factorization, LML, and the full
hyperparameter gradient (reverse pass through the Cholesky), jitted as one
XLA program.  The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is the speedup of the framework's dispatch path (Pallas
kernels where profitable) over the plain XLA-primitive path on the same
hardware — 1.0 means "no custom-kernel advantage yet".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
REPS = 10


def build_problem(n: int, dtype):
    from gogp_tpu.gp.core import GP
    from gogp_tpu.kernels import rbf, uniform_noise

    gp = GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 100, (n, 1)), axis=0), dtype=dtype)
    y = jnp.asarray(np.sin(np.asarray(x[:, 0]) / 3.0) + 0.1 * rng.normal(size=n), dtype=dtype)
    v = jnp.zeros(gp.n_theta, dtype=dtype)
    return gp, x, y, v


def time_fn(fn, *args) -> float:
    """Median walltime in ms over REPS runs (after compile + warmup)."""
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def main():
    platform = jax.devices()[0].platform
    dtype = jnp.float32
    gp, x, y, v = build_problem(N, dtype)

    from gogp_tpu.models.params import gp_observe
    from gogp_tpu.ops import linalg

    def lml_grad(v):
        return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)

    fast_ms = time_fn(jax.jit(lml_grad), v)

    # Plain-XLA reference path: force the fallback (no Pallas dispatch).
    with linalg.force_xla():
        xla_ms = time_fn(jax.jit(lml_grad), v)

    result = {
        "metric": f"lml_grad_n{N}_walltime",
        "value": round(fast_ms, 3),
        "unit": "ms",
        "vs_baseline": round(xla_ms / fast_ms, 3),
        "platform": platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
