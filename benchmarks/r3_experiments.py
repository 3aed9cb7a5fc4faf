"""Round-3 perf experiments on the real chip: tile panel rank + SYRK shape.

Times the candidate changes to the N=4096 LML+gradient pipeline in
isolation (device-loop timing, CLAUDE.md methodology):

1. tile Cholesky at panel rank 8/16/32 (bare tile and full blocked driver)
2. dense W^T W vs recursive triangular syrk_lower_t at several min_sizes
3. the backward pieces: blocked_tril_inv, and full value_and_grad(lml_core)

Usage: python benchmarks/r3_experiments.py [n]
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


def spd(n: int, dtype=jnp.float32) -> jax.Array:
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)).astype(np.float32) / np.sqrt(n)
    K = A @ A.T + 1.0 * np.eye(n)
    return jnp.asarray(K, dtype=dtype)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from gogp_tpu.ops import cholesky_pallas as cp

    K = spd(n)
    y = jnp.asarray(np.random.default_rng(1).normal(size=n), jnp.float32)
    L = jnp.linalg.cholesky(K)
    float(jnp.sum(L))
    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    print(f"floor {floor:.3f} ms", flush=True)

    def bench(name, f, *args):
        t = device_loop_time(f, *args) - floor
        print(f"{name:46s} {t:8.3f} ms", flush=True)
        return t

    # --- 1. tile rank sweep: correctness then time -----------------------
    for blk in (256, 512):
        Kt = spd(blk)
        ref = np.asarray(cp.pallas_cholesky_tile(Kt, rank=8))
        for r in (8, 16, 32):
            got = np.asarray(cp.pallas_cholesky_tile(Kt, rank=r))
            err = np.max(np.abs(got - ref))
            assert err < 1e-3, (blk, r, err)
            bench(f"tile_chol b{blk} rank{r}", lambda a, r=r: cp.pallas_cholesky_tile(a, rank=r), Kt)
            Lg, Vg = cp.pallas_cholesky_inv_tile(Kt, rank=r)
            verr = np.max(np.abs(np.asarray(Vg) @ np.asarray(Lg) - np.eye(blk)))
            assert verr < 1e-2, (blk, r, verr)
            bench(f"tile_cholinv b{blk} rank{r}", lambda a, r=r: cp.pallas_cholesky_inv_tile(a, rank=r), Kt)

    # --- 2. full blocked factorization at each rank ----------------------
    for r in (8, 16, 32):
        cp._PANEL_RANK = r
        bench(f"blocked_chol b256 rank{r}", lambda K: cp.blocked_cholesky(K, 256), K)
    cp._PANEL_RANK = 8

    # --- 3. syrk shapes ---------------------------------------------------
    Wt = jnp.tril(L)
    bench("dense WtW dot_general", lambda W: jax.lax.dot_general(
        W, W, (((0,), (0,)), ((), ()))), Wt)
    for ms in (512, 1024, 2048):
        bench(f"syrk_lower_t min{ms}", lambda W, ms=ms: cp.syrk_lower_t(W, min_size=ms), Wt)

    # --- 4. backward pieces ------------------------------------------------
    bench("blocked_tril_inv b256", lambda L: cp.blocked_tril_inv(L, 256), L)
    bench("lml_core fwd b256", lambda K, y: cp.lml_core(K, y, 256), K, y)
    bench("lml_core valgrad b256", lambda K, y: jax.value_and_grad(
        lambda K: cp.lml_core(K, y, 256))(K), K, y)


if __name__ == "__main__":
    main()
