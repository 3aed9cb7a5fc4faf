"""A/B: two-level super-panel Cholesky schedule vs the shipped stepwise
driver on the n=4096 LML+grad headline (VERDICT r4 #7).

The r4 xprof profile (docs/DESIGN.md 9b) attributes 47% of the headline
step to the HBM/dependency-bound factorization chain; the super-panel
schedule halves the number of sequential trailing SYRKs and doubles their
contraction depth using only the existing 256-wide tile kernels (the
512-wide Mosaic tile blowup never enters).  This measures the same
floor-corrected device-loop walltime as bench.py for: factorization only,
and the full lml+grad, under both schedules.

Usage: python benchmarks/super_panel_ab.py [--n 4096] [--sf 2]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_problem, device_loop_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--sf", type=int, default=2)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--reps", type=int, default=40)
    args = ap.parse_args()

    import numpy as np

    from gogp_tpu.models.params import gp_observe
    from gogp_tpu.ops import cholesky_pallas as cp

    gp, x, y, v = build_problem(args.n, jnp.float32)

    def lml_grad(v):
        return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)

    def lml_grad_super(v):
        with cp.super_panels(args.sf):
            return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)

    rng = np.random.default_rng(0)
    a = rng.normal(size=(args.n, args.n)).astype(np.float32)
    K = jnp.asarray(a @ a.T + args.n * np.eye(args.n, dtype=np.float32))

    def chol_base(K):
        return cp.blocked_cholesky_invs(K, args.block)

    def chol_super(K):
        with cp.super_panels(args.sf):
            return cp.blocked_cholesky_invs(K, args.block)

    # agreement first (same chip, same precision)
    L0, _ = jax.jit(chol_base)(K)
    L1, _ = jax.jit(chol_super)(K)
    dmax = float(jnp.max(jnp.abs(L0 - L1)))

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)),
                             reps=args.reps)
    t_chol_base = device_loop_time(chol_base, K, reps=args.reps) - floor
    t_chol_super = device_loop_time(chol_super, K, reps=args.reps) - floor
    t_lml_base = device_loop_time(lml_grad, v, reps=args.reps) - floor
    t_lml_super = device_loop_time(lml_grad_super, v, reps=args.reps) - floor

    print(json.dumps({
        "metric": f"super_panel_ab_n{args.n}",
        "sf": args.sf, "block": args.block,
        "floor_ms": round(floor, 3),
        "chol_ms": {"base": round(t_chol_base, 3),
                    "super": round(t_chol_super, 3),
                    "speedup": round(t_chol_base / t_chol_super, 3)},
        "lml_grad_ms": {"base": round(t_lml_base, 3),
                        "super": round(t_lml_super, 3),
                        "speedup": round(t_lml_base / t_lml_super, 3)},
        "L_max_abs_diff": dmax,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
