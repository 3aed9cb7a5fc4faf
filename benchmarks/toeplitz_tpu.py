"""Toeplitz fast path on the real chip: LML+gradient at time-series scale.

gp.lml_toeplitz runs every covariance matvec as an FFT circulant product —
O(n log n) flops, O(n) memory — so regular-grid time series scale past
every other path in the framework (the matrix-free panel path pays O(n^2)
per matvec; dense storage dies at n~32k).  This bench measures value +
full theta-gradient walltime across n, with the matrix-free path as the
anchor where it is feasible.

Methodology: device-loop timing with floor subtraction (CLAUDE.md).

Usage: python benchmarks/toeplitz_tpu.py [max_log2_n] [--precond-rank R]
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

REPS = 10
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_log2 = int(args[0]) if args else 20
    rank = 0
    if "--precond-rank" in sys.argv:
        rank = int(sys.argv[sys.argv.index("--precond-rank") + 1])

    from gogp_tpu.gp import core
    from gogp_tpu.kernels import rbf, uniform_noise

    gp = core.GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    key = jax.random.PRNGKey(0)

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    print(f"floor {floor:.3f} ms  (precond_rank={rank})", flush=True)

    for log2n in range(14, max_log2 + 1, 2):
        n = 1 << log2n
        x = jnp.linspace(0.0, n / 40.0, n, dtype=jnp.float32)[:, None]
        rng = np.random.default_rng(0)
        y = jnp.asarray(
            np.sin(np.linspace(0.0, n / 40.0, n) / 2.0)
            + 0.1 * rng.normal(size=n),
            jnp.float32,
        )
        v0 = jnp.zeros(gp.n_theta, jnp.float32)

        def logp(v):
            th = jnp.exp(v)
            return core.lml_toeplitz(
                gp, th[: gp.n_theta_simil], th[gp.n_theta_simil:], x, y, key,
                num_probes=16, cg_iters=100, lanczos_iters=32,
                precond_rank=rank,
            )

        val, grad = jax.jit(jax.value_and_grad(logp))(v0)
        finite = bool(jnp.isfinite(val) and jnp.all(jnp.isfinite(grad)))
        t = device_loop_time(jax.value_and_grad(logp), v0) - floor
        print(
            f"toeplitz lml+grad n={n:>8}: {t:9.3f} ms  "
            f"(lml {float(val):12.1f}, finite={finite})", flush=True,
        )


if __name__ == "__main__":
    main()
