"""A/B the triangular-grid streaming TRSV (pallas_trsv2d_*) on the real chip.

At n >= ~8k x block 512 the 1-D panel TRSV overflows scoped VMEM and the
round-2 code fell back to the blocked XLA-op substitution.  The 2-D
(triangular-grid) kernels hold one (block, block) tile per step, DMA only
the lower triangle, and serve any n.  This measures, at n=16384/block=512:

- correctness of both vector solves vs XLA solve_triangular on-chip;
- ms for the 2-D streaming pair vs the blocked-substitution pair;
- end-to-end fused lml forward (factorize + solves + logdet) before/after.

Usage: python benchmarks/trsv_tpu.py [n] [block]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from benchmarks.chol_components import device_loop_time


def main():
    import gogp_tpu.ops.cholesky_pallas as cp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    rng = np.random.default_rng(0)
    xs = np.sort(rng.uniform(0, 400, n)).astype(np.float32)
    d = np.abs(xs[:, None] - xs[None, :])
    # lengthscale 2 / unit noise keeps the default-precision (1-pass bf16)
    # factorization finite so the correctness check is meaningful; the
    # near-singular lengthscale-8/0.05-noise variant of this matrix is the
    # rescue test case (it NaNs the raw fast path) — see nan_tpu.py lore in
    # STATUS.md "precision rescue".
    K = jnp.asarray(np.exp(-0.5 * (d / 2.0) ** 2) + 1.0 * np.eye(n, dtype=np.float32))
    y = jnp.asarray(rng.normal(size=n).astype(np.float32))

    L, invs = jax.jit(lambda K: cp.blocked_cholesky_invs(K, block))(K)
    L = jnp.tril(L)
    assert bool(jnp.all(jnp.isfinite(jnp.diagonal(L)))), "factorization NaN'd"

    def pair_2d(L, y, invs):
        z = cp.pallas_trsv2d_lower(L, y, invs, block)
        return cp.pallas_trsv2d_lower_t(L, z, invs, block)

    def pair_blocked(L, y):
        z = cp.blocked_trsm_lower(L, y, block)
        return cp.blocked_trsm_lower_t(L, z, block)

    def pair_xla(L, y):
        z = jax.scipy.linalg.solve_triangular(L, y, lower=True)
        return jax.scipy.linalg.solve_triangular(L, z, lower=True, trans=1)

    a2 = jax.jit(pair_2d)(L, y, invs)
    ab = jax.jit(pair_blocked)(L, y)
    ax = jax.jit(pair_xla)(L, y)
    scale = float(jnp.max(jnp.abs(ax)))
    err2 = float(jnp.max(jnp.abs(a2 - ax))) / scale
    errb = float(jnp.max(jnp.abs(ab - ax))) / scale

    fl = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)), reps=20)
    t2 = device_loop_time(pair_2d, L, y, invs, reps=20) - fl
    tb = device_loop_time(pair_blocked, L, y, reps=20) - fl
    tx = device_loop_time(pair_xla, L, y, reps=20) - fl

    print(json.dumps({
        "metric": f"trsv_pair_n{n}_b{block}",
        "trsv2d_ms": round(t2, 2), "blocked_ms": round(tb, 2),
        "xla_ms": round(tx, 2),
        "rel_err_2d": err2, "rel_err_blocked": errb,
        "speedup_vs_blocked": round(tb / t2, 2),
    }), flush=True)

    # end-to-end fused lml forward through the dispatcher (now routed to 2-D)
    def fwd(K, y):
        return cp.lml_core(K, y, block)

    t_new = device_loop_time(fwd, K, y, reps=10) - fl
    print(json.dumps({
        "metric": f"lml_core_fwd_n{n}_b{block}", "value": round(t_new, 2),
        "unit": "ms",
    }), flush=True)


if __name__ == "__main__":
    main()
