"""Component timings for the Cholesky/TRSM stack on the real chip.

Where do the milliseconds of the N=4096 LML+gradient go?  Times each piece
with device-loop timing (see CLAUDE.md): R serialized iterations inside one
program, full output reduced into the carry so nothing is DCE'd.

Usage: python benchmarks/chol_components.py [n] [--pallas-only]
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
    """Median ms/iter; the FULL output is summed into the carry (a single
    element carry lets XLA dead-code the rest of the kernel)."""

    @jax.jit
    def looped(*args):
        def body(c, _):
            out = f(*jax.tree.map(lambda a: a + jnp.asarray(1e-30, a.dtype) * c, args))
            s = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(out))
            return s, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    # NB: sync via float(out) — a device->host value transfer.  Through the
    # axon tunnel jax.block_until_ready returns without waiting for the
    # remote execution, which silently times nothing.
    float(looped(*args))
    times = []
    for _ in range(HOST_REPS):
        t0 = time.perf_counter()
        float(looped(*args))
        times.append((time.perf_counter() - t0) * 1e3 / reps)
    return float(np.median(times))


def spd(n: int, dtype=jnp.float32) -> jax.Array:
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)).astype(np.float32) / np.sqrt(n)
    K = A @ A.T + 1.0 * np.eye(n)
    return jnp.asarray(K, dtype=dtype)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4096
    K = spd(n)
    y = jnp.asarray(np.random.default_rng(1).normal(size=n), jnp.float32)
    B = jnp.asarray(np.random.default_rng(2).normal(size=(n, n)), jnp.float32)
    L = jnp.linalg.cholesky(K)
    jax.block_until_ready(L)

    from gogp_tpu.ops import cholesky_pallas as cp

    results = {}

    def bench(name, f, *args):
        t = device_loop_time(f, *args)
        results[name] = t
        print(f"{name:42s} {t:8.3f} ms", flush=True)

    bench("xla_cholesky", jnp.linalg.cholesky, K)
    for blk in (256, 512):
        if n % blk == 0:
            bench(f"blocked_cholesky_b{blk}", lambda K, b=blk: cp.blocked_cholesky(K, b), K)
            bench(f"pallas_tile_b{blk}", cp.pallas_cholesky_tile, K[:blk, :blk])
    bench("xla_trsm_vec", lambda L, y: jax.scipy.linalg.solve_triangular(L, y, lower=True), L, y)
    bench("xla_trsm_mat", lambda L, B: jax.scipy.linalg.solve_triangular(L, B, lower=True), L, B)
    for blk in (256, 512):
        if n % blk == 0:
            bench(f"blocked_trsm_vec_b{blk}", lambda L, y, b=blk: cp.blocked_trsm_lower(L, y, b), L, y)
            bench(f"blocked_trsm_mat_b{blk}", lambda L, B, b=blk: cp.blocked_trsm_lower(L, B, b), L, B)
    # the full custom-VJP pipeline vs XLA inside value_and_grad of a
    # synthetic lml-like scalar
    def lml_like_xla(K, y):
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.solve_triangular(L, y, lower=True)
        a = jax.scipy.linalg.solve_triangular(L, a, lower=True, trans=1)
        return -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * jnp.dot(y, a)

    def lml_like_blocked(K, y):
        Lc = cp.cholesky(K, 256)
        a = cp.blocked_trsm_lower(Lc, y, 256)
        a = cp.blocked_trsm_lower_t(Lc, a, 256)
        return -jnp.sum(jnp.log(jnp.diagonal(Lc))) - 0.5 * jnp.dot(y, a)

    bench("lml_grad_xla", lambda K, y: jax.grad(lml_like_xla)(K, y), K, y)
    if n % 256 == 0:
        bench("lml_grad_blocked", lambda K, y: jax.grad(lml_like_blocked)(K, y), K, y)

    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
