"""Sparse-GP production benchmark on the real chip.

Three numbers that define the serving regime (gp/sparse.py):

1. SGPR collapsed ELBO + full gradient (thetas AND inducing locations) at
   large n — the train-step unit, O(n m^2) MXU matmuls.
2. SVGP minibatch ELBO + gradient — the streaming train-step unit,
   O(B m^2 + m^3).
3. SGPR predict latency for a batch of test points from the O(m^2) cache —
   the serve unit.

Methodology: device-loop timing with floor subtraction (CLAUDE.md).

Usage: python benchmarks/sparse_tpu.py [n] [m] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REPS = 20
HOST_REPS = 5


def device_loop_time(f, *args, reps: int = REPS) -> float:
    @jax.jit
    def looped(*args):
        def body(c, _):
            out = f(*jax.tree.map(lambda a: a + jnp.asarray(1e-30, a.dtype) * c, args))
            s = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(out))
            return s, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    float(looped(*args))
    times = []
    for _ in range(HOST_REPS):
        t0 = time.perf_counter()
        float(looped(*args))
        times.append((time.perf_counter() - t0) * 1e3 / reps)
    return float(np.median(times))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    from gogp_tpu.gp import core as gpcore
    from gogp_tpu.gp import sparse
    from gogp_tpu.kernels import rbf, uniform_noise

    gp = gpcore.GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.sort(rng.uniform(0, 1000.0, (n, 1)), axis=0), jnp.float32
    )
    y = jnp.asarray(
        np.sin(np.asarray(x[:, 0]) / 3.0) + 0.1 * rng.normal(size=n), jnp.float32
    )
    z = x[:: n // m][:m]
    lt = jnp.zeros((gp.n_theta,), jnp.float32)

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    print(f"floor {floor:.3f} ms", flush=True)

    # 1. SGPR ELBO + grad w.r.t. [log theta | Z]
    v0 = sparse.join_sparse_params(gp, lt, z)
    logp = sparse.make_sgpr_logp(gp, x, y, m)
    t_sgpr = device_loop_time(jax.value_and_grad(logp), v0) - floor
    val = float(logp(v0))
    print(
        f"sgpr elbo+grad   n={n} m={m}: {t_sgpr:8.3f} ms   (elbo {val:.1f})",
        flush=True,
    )

    # 2. SVGP minibatch ELBO + grad w.r.t. all variational params
    state = sparse.svgp_init(gp, z)
    params = sparse.SVGPParams(lt, state)
    xb, yb = x[:batch], y[:batch]

    def svgp_obj(p):
        theta = jnp.exp(p.log_theta)
        return sparse.svgp_elbo(
            gp, theta[: gp.n_theta_simil], theta[gp.n_theta_simil :],
            p.state, xb, yb, n_total=n,
        )

    t_svgp = device_loop_time(jax.value_and_grad(svgp_obj), params) - floor
    print(f"svgp elbo+grad   B={batch} m={m}: {t_svgp:8.3f} ms", flush=True)

    # 3. serve latency: predict a batch of test points from the cache
    post = sparse.sgpr_fit(gp, jnp.ones(2), jnp.ones(1), x, y, z)
    jax.tree.map(lambda a: np.asarray(a), post)  # materialize
    t_test = jnp.linspace(0.0, 1000.0, 4096)[:, None]
    t_serve = device_loop_time(
        lambda t: sparse.sgpr_predict(gp, post, t), t_test
    ) - floor
    print(
        f"sgpr predict     4096 pts m={m}: {t_serve:8.3f} ms "
        f"({t_serve / 4096 * 1e3:.2f} us/pt)",
        flush=True,
    )

    # context: what the exact path would pay for ONE n-point factorization
    if n <= 16384:
        from gogp_tpu.models.params import gp_observe

        t_exact = device_loop_time(
            jax.value_and_grad(
                lambda v: gp_observe(gp, v, x=x, y=y)
            ),
            lt,
        ) - floor
        print(f"exact lml+grad   n={n}: {t_exact:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
