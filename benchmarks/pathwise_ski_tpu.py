"""TPU benchmark: pathwise posterior sampling + SKI large-n inference.

Two round-3 additions measured on the real chip:

1. Pathwise (decoupled) sampling vs exact joint draws.  Drawing S coherent
   posterior trajectories at m points costs O(m^3) for serve_sample (an
   m x m Cholesky) but O(S m (F + n)) for eval_paths — pure MXU matmuls.
   Also reports the one-time sample_paths compile (feature draw + one
   batched K-solve) and Thompson scores over a large candidate grid.

2. SKI LML+gradient at n far beyond the exact path's reach on irregular
   inputs, vs the matrix-free panel path (the only other option there —
   lml_toeplitz needs a regular grid).

Methodology: device-loop timing with floor subtraction (CLAUDE.md).

Usage: python benchmarks/pathwise_ski_tpu.py [path|ski|all]
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
        def body(c, i):
            # every leaf must depend on the carry/step or XLA hoists the
            # body out of the scan: floats get a 1e-30 epsilon, integer
            # leaves (PRNG keys) get the step index added (still valid
            # uint32 key data, different stream per iteration)
            def bump(a):
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return a + jnp.asarray(1e-30, a.dtype) * c
                return a + i.astype(a.dtype)

            out = f(*jax.tree.map(bump, args))
            s = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(out))
            return s, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return c

    float(looped(*args))
    times = []
    for _ in range(HOST_REPS):
        t0 = time.perf_counter()
        float(looped(*args))
        times.append((time.perf_counter() - t0) * 1e3 / reps)
    return float(np.median(times))


def bench_pathwise(n=4096, m=4096, S=16, F=2048):
    from gogp_tpu.gp import core, pathwise, serve
    from gogp_tpu.kernels import rbf, uniform_noise

    gp = core.GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 100, (n, 1)), axis=0), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0] / 3.0) + 0.1 * rng.normal(size=n), jnp.float32)
    ts, tn = jnp.asarray([1.0, 2.0], jnp.float32), jnp.asarray([0.1], jnp.float32)
    post = jax.jit(lambda: core.absorb(gp, ts, tn, x, y))()
    jax.block_until_ready(post.chol)
    z = jnp.asarray(np.linspace(0, 100, m)[:, None], jnp.float32)

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    print(f"floor {floor:.3f} ms", flush=True)

    # one-time path compilation (feature draw + batched Matheron solve)
    t_state = device_loop_time(
        lambda k: pathwise.sample_paths(gp, post, k, S, F), jax.random.PRNGKey(0)
    ) - floor
    ps = jax.jit(lambda k: pathwise.sample_paths(gp, post, k, S, F))(jax.random.PRNGKey(0))
    jax.block_until_ready(ps.v)

    # S coherent trajectories at m points
    t_paths = device_loop_time(lambda p: pathwise.eval_paths(gp, p, z), ps) - floor

    # exact joint draws: m x m covariance + Cholesky
    sp = jax.jit(lambda: serve.compile_posterior(gp, post))()
    jax.block_until_ready(sp.w)
    t_exact = device_loop_time(
        lambda k: serve.serve_sample(gp, sp, z, k, num_samples=S), jax.random.PRNGKey(1)
    ) - floor

    # Thompson scores over the full grid (S=1 path, state build + eval)
    from gogp_tpu.bo import BOState

    st = BOState(post, jnp.zeros((1,), jnp.float32), jnp.asarray(0.0, jnp.float32))
    from gogp_tpu.bo import thompson_path_scores

    t_thom = device_loop_time(
        lambda k: thompson_path_scores(gp, st, z, k, num_features=F),
        jax.random.PRNGKey(2),
    ) - floor

    print(f"pathwise n={n} m={m} S={S} F={F}:")
    print(f"  sample_paths (one-time)   {t_state:8.3f} ms")
    print(f"  eval {S} paths at {m} pts   {t_paths:8.3f} ms ({1e3*t_paths/(S*m):.3f} us/pt-path)")
    print(f"  exact serve_sample        {t_exact:8.3f} ms  -> {t_exact/max(t_paths,1e-9):.1f}x slower")
    print(f"  thompson-path full grid   {t_thom:8.3f} ms", flush=True)
    return dict(state=t_state, paths=t_paths, exact=t_exact, thompson=t_thom)


def bench_ski(n=65536, g=4096, probes=8, cg=60, lanczos=24, panel=2048):
    from gogp_tpu.gp import core, ski as gski
    from gogp_tpu.kernels import rbf, uniform_noise

    gp = core.GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 1000, (n, 1)), axis=0), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0] / 20.0) + 0.1 * rng.normal(size=n), jnp.float32)
    ts, tn = jnp.asarray([1.0, 8.0], jnp.float32), jnp.asarray([0.1], jnp.float32)
    key = jax.random.PRNGKey(0)

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    print(f"floor {floor:.3f} ms", flush=True)

    def ski_vg(ts_, tn_):
        return jax.value_and_grad(
            lambda a, b: gski.lml_ski(gp, a, b, x, y, key, grid_size=g,
                                      num_probes=probes, cg_iters=cg,
                                      lanczos_iters=lanczos),
            argnums=(0, 1),
        )(ts_, tn_)

    t_ski = device_loop_time(ski_vg, ts, tn, reps=5) - floor
    print(f"SKI lml+grad n={n} g={g}: {t_ski:.2f} ms", flush=True)

    def mf_vg(ts_, tn_):
        return jax.value_and_grad(
            lambda a, b: core.lml_iterative_matfree(
                gp, a, b, x, y, key, panel=panel, num_probes=probes,
                cg_iters=cg, lanczos_iters=lanczos),
            argnums=(0, 1),
        )(ts_, tn_)

    t_mf = device_loop_time(mf_vg, ts, tn, reps=5) - floor
    print(f"matfree lml+grad n={n} panel={panel}: {t_mf:.2f} ms -> SKI {t_mf/max(t_ski,1e-9):.1f}x faster", flush=True)
    return dict(ski=t_ski, matfree=t_mf)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("path", "all"):
        bench_pathwise()
    if which in ("ski", "all"):
        bench_ski()
    if which == "bigpath":
        bench_bigpath()
    if which == "ski2d":
        bench_ski2d()


def bench_bigpath(n=131072, m=4096, S=16, F=2048, g=8192):
    """SKI-conditioned pathwise sampling at dense-factor-impossible n."""
    from gogp_tpu.gp import core, pathwise
    from gogp_tpu.kernels import rbf, uniform_noise

    gp = core.GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 1000, (n, 1)), axis=0), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0] / 20.0) + 0.1 * rng.normal(size=n), jnp.float32)
    ts, tn = jnp.asarray([1.0, 8.0], jnp.float32), jnp.asarray([0.1], jnp.float32)
    z = jnp.asarray(np.linspace(0, 1000, m)[:, None], jnp.float32)

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    t_build = device_loop_time(
        lambda k: pathwise.sample_paths_ski(
            gp, ts, tn, x, y, k, S, num_features=F, grid_size=g,
            cg_iters=100, method="sorted"),
        jax.random.PRNGKey(0), reps=3,
    ) - floor
    ps = jax.jit(lambda k: pathwise.sample_paths_ski(
        gp, ts, tn, x, y, k, S, num_features=F, grid_size=g,
        cg_iters=100, method="sorted"))(jax.random.PRNGKey(0))
    jax.block_until_ready(ps.v)
    t_eval = device_loop_time(lambda p: pathwise.eval_paths(gp, p, z), ps) - floor
    print(f"SKI pathwise n={n}: build {S} sample-functions {t_build:.1f} ms, "
          f"eval at {m} pts {t_eval:.3f} ms "
          f"(dense factor would need {8*n*n/2**30:.0f} GiB)", flush=True)


def bench_ski2d(n=262144, g=512, probes=8, cg=60, lanczos=24):
    """2-D spatial SKI LML+gradient at quarter-million points."""
    from gogp_tpu.gp import core, ski as gski
    from gogp_tpu.kernels import matern32, uniform_noise

    gp = core.GP(ndim=2, simil=matern32.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 100, (n, 2)), jnp.float32)
    y = jnp.asarray(
        np.sin(np.asarray(x)[:, 0] / 10) * np.cos(np.asarray(x)[:, 1] / 8)
        + 0.1 * rng.normal(size=n), jnp.float32)
    ts, tn = jnp.asarray([1.0, 5.0], jnp.float32), jnp.asarray([0.1], jnp.float32)
    key = jax.random.PRNGKey(0)

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))

    def vg(ts_, tn_):
        return jax.value_and_grad(
            lambda a, b: gski.lml_ski(gp, a, b, x, y, key, grid_size=(g, g),
                                      num_probes=probes, cg_iters=cg,
                                      lanczos_iters=lanczos, method="scatter"),
            argnums=(0, 1),
        )(ts_, tn_)

    t = device_loop_time(vg, ts, tn, reps=3) - floor
    print(f"2-D SKI lml+grad n={n} grid {g}x{g}: {t:.1f} ms "
          f"(K would be {4*n*n/2**40:.1f} TiB)", flush=True)
