"""Exact-GP serving benchmark on the real chip.

Compares three implementations of the same prediction (mu, sigma at m test
points from an n-point fitted posterior):

1. serve:   gp.serve.serve_predict — precompiled inv(L), pure matmuls.
2. trsm:    gp.core.predict_from_posterior — blocked-Pallas TRSM per call.
3. xla:     the same under linalg.force_xla() — XLA's native triangular solve.

Plus the one-time compile cost (tril_inv) and the S-draw Bayesian mixture
serve.  Methodology: device-loop timing with floor subtraction (CLAUDE.md).

Usage: python benchmarks/serve_tpu.py [n] [m] [S]
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

REPS = 40
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from gogp_tpu.gp import core, serve
    from gogp_tpu.kernels import rbf, uniform_noise
    from gogp_tpu.ops import linalg

    gp = core.GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 100.0, (n, 1)), axis=0), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x[:, 0]) / 3.0) + 0.1 * rng.normal(size=n), jnp.float32)
    ts, tn = jnp.array([1.0, 0.7], jnp.float32), jnp.array([0.3], jnp.float32)
    z = jnp.linspace(0.0, 100.0, m, dtype=jnp.float32)[:, None]

    post = core.absorb(gp, ts, tn, x, y)
    jax.tree.map(np.asarray, post)

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    print(f"floor {floor:.3f} ms", flush=True)

    # one-time compile cost
    t_compile = device_loop_time(
        lambda p: serve.compile_posterior(gp, p), post, reps=10
    ) - floor
    print(f"compile_posterior n={n}: {t_compile:8.3f} ms (one-time)", flush=True)

    sp = serve.compile_posterior(gp, post)
    jax.tree.map(np.asarray, sp)

    t_serve = device_loop_time(lambda s: serve.serve_predict(gp, s, z), sp) - floor
    t_trsm = device_loop_time(
        lambda p: core.predict_from_posterior(gp, p, z), post
    ) - floor

    def xla_predict(p):
        with linalg.force_xla():
            return core.predict_from_posterior(gp, p, z)

    t_xla = device_loop_time(xla_predict, post) - floor

    print(f"serve_predict    n={n} m={m}: {t_serve:8.3f} ms ({t_serve/m*1e3:.3f} us/pt)", flush=True)
    print(f"trsm predict     n={n} m={m}: {t_trsm:8.3f} ms ({t_trsm/t_serve:.2f}x serve)", flush=True)
    print(f"xla predict      n={n} m={m}: {t_xla:8.3f} ms ({t_xla/t_serve:.2f}x serve)", flush=True)

    # small-batch latency point (the "one request" regime)
    z16 = z[:16]
    t_s16 = device_loop_time(lambda s: serve.serve_predict(gp, s, z16), sp) - floor
    t_t16 = device_loop_time(
        lambda p: core.predict_from_posterior(gp, p, z16), post
    ) - floor
    print(f"serve 16 pts: {t_s16:8.3f} ms | trsm 16 pts: {t_t16:8.3f} ms", flush=True)

    # agreement
    mu1, s1 = jax.jit(lambda s: serve.serve_predict(gp, s, z))(sp)
    mu2, s2 = jax.jit(lambda p: core.predict_from_posterior(gp, p, z))(post)
    print(
        f"agree: dmu {float(jnp.max(jnp.abs(mu1 - mu2))):.2e} "
        f"dsigma {float(jnp.max(jnp.abs(s1 - s2))):.2e}", flush=True,
    )

    # Bayesian mixture serve: S draws
    vs = jnp.asarray(0.1 * rng.normal(size=(S, gp.n_theta)), jnp.float32)
    smix = serve.compile_mixture(gp, vs, x, y)
    jax.tree.map(np.asarray, smix)
    t_mix = device_loop_time(
        lambda sm: serve.serve_predict_mixture(gp, sm, z), smix
    ) - floor
    print(
        f"mixture serve    S={S} n={n} m={m}: {t_mix:8.3f} ms "
        f"({t_mix/S:.3f} ms/draw)", flush=True,
    )


if __name__ == "__main__":
    main()
