"""Round-2 TPU measurements beyond bench.py: one JSON line each.

- fused small-GP kernel (ops/fused_gp) vs the autodiff path at sampler
  batch sizes (round 1 compared them with floor-corrupted timing);
- N=16384 LML + gradient through gp.lml's dispatch (fori TRSM backward)
  vs the forced-XLA path.

Run pieces selectively:  python benchmarks/tpu_round2.py [fused] [n16k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from benchmarks.chol_components import device_loop_time


def floor_ms(reps=40):
    return device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)), reps=reps)


def bench_fused():
    from gogp_tpu.ops.fused_gp import make_fused_value_and_grad, make_reference_value_and_grad
    from gogp_tpu.tutorial import io as tio
    from gogp_tpu.tutorial.hyperpriors import make_priors, make_study, selfcheck_data

    study = make_study()
    gp = study.gp
    x, y = tio.load_csv(selfcheck_data())
    y_norm, _, _ = tio.normalize(y)
    priors = make_priors(x, y_norm)
    mask = jnp.ones(x.shape[0], dtype=jnp.float32)

    def pfn(v):
        return priors(v, mask)

    fused = make_fused_value_and_grad(gp, x, y_norm, priors_fn=pfn)
    auto = make_reference_value_and_grad(gp, x, y_norm, priors_fn=pfn)

    fl = floor_ms()
    for chains in (16, 64, 256):
        vs = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (chains, gp.n_theta), jnp.float32)
        t_f = device_loop_time(jax.vmap(fused), vs) - fl
        t_a = device_loop_time(jax.vmap(auto), vs) - fl
        vf, gf = jax.jit(jax.vmap(fused))(vs)
        va, ga = jax.jit(jax.vmap(auto))(vs)
        agree = bool(
            jnp.allclose(vf, va, rtol=1e-3, atol=1e-3)
            and jnp.allclose(gf, ga, rtol=1e-2, atol=1e-2)
        )
        print(json.dumps({
            "metric": f"fused_gp_vg_chains{chains}",
            "fused_ms": round(t_f, 3), "autodiff_ms": round(t_a, 3),
            "speedup": round(t_a / t_f, 2), "agree": agree,
        }), flush=True)


def bench_16k():
    from gogp_tpu.gp.core import GP
    from gogp_tpu.kernels import rbf, uniform_noise
    from gogp_tpu.models.params import gp_observe
    from gogp_tpu.ops import linalg

    N = 16384
    gp = GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 400, (N, 1)), axis=0), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x[:, 0]) / 3.0) + 0.1 * rng.normal(size=N), jnp.float32)
    v = jnp.zeros(gp.n_theta, jnp.float32)

    def lg(v):
        return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)

    def lg_xla(v):
        with linalg.force_xla():
            return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)

    t0 = time.time()
    v1, g1 = jax.jit(lg)(v)
    r1 = float(v1)
    print(f"# fused 16k compile+run {time.time()-t0:.0f}s lml={r1:.1f}", flush=True)
    fl = floor_ms(reps=10)
    t_f = device_loop_time(lg, v, reps=10) - fl
    t0 = time.time()
    v2, g2 = jax.jit(lg_xla)(v)
    r2 = float(v2)
    print(f"# xla 16k compile+run {time.time()-t0:.0f}s lml={r2:.1f}", flush=True)
    t_x = device_loop_time(lg_xla, v, reps=10) - fl
    agree = bool(
        jnp.isclose(v1, v2, rtol=1e-4)
        and jnp.allclose(g1, g2, rtol=1e-2, atol=1e-2)
    )
    print(json.dumps({
        "metric": "lml_grad_n16384_walltime",
        "value": round(t_f, 1), "unit": "ms",
        "xla_ms": round(t_x, 1), "vs_xla": round(t_x / t_f, 2),
        "agree": agree,
    }), flush=True)


def main():
    which = set(sys.argv[1:]) or {"fused", "n16k"}
    if "fused" in which:
        bench_fused()
    if "n16k" in which:
        bench_16k()


if __name__ == "__main__":
    main()
