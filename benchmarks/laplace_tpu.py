"""Laplace / EP (classification) benchmark on the real chip.

Measures, at TPU dtype (f32 data, house default matmul precision):

1. laplace_fit      — full Newton mode search (while_loop + line search)
2. lml value+grad   — one hyperparameter-training step (implicit gradients)
3. OvR batched fit  — C one-vs-rest classifiers as one vmapped program
4. served p(y=1|z)  — classification serving from the compiled cache

Methodology: device-loop timing with trivial-op floor subtraction
(CLAUDE.md).  Usage: python benchmarks/laplace_tpu.py [n] [m] [C]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from gogp_tpu.gp import core, laplace, likelihoods
    from gogp_tpu.gp.serve import serve_predict
    from gogp_tpu.kernels import rbf

    lik = likelihoods.bernoulli_logit
    gp = core.GP(ndim=1, simil=rbf.scaled())
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-50, 50, (n, 1)), axis=0), jnp.float32)
    logit = np.sin(np.asarray(x[:, 0]) / 5.0) * 3.0
    y = jnp.asarray(
        (rng.uniform(size=n) < 1 / (1 + np.exp(-logit))).astype(np.float32)
    )
    ts = jnp.array([2.0, 3.0], jnp.float32)
    tl = jnp.zeros((0,), jnp.float32)
    z = jnp.linspace(-50.0, 50.0, m, dtype=jnp.float32)[:, None]
    tol = 1e-5  # f32-appropriate objective tolerance

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    print(f"floor {floor:.3f} ms", flush=True)

    fit = lambda t: laplace.laplace_fit(gp, lik, t, tl, x, y, tol=tol)
    t_fit = device_loop_time(fit, ts) - floor
    post = jax.jit(fit)(ts)
    jax.tree.map(np.asarray, post)
    print(f"laplace_fit          n={n}: {t_fit:8.3f} ms", flush=True)

    vg = jax.value_and_grad(
        lambda v: laplace.laplace_lml(gp, lik, jnp.exp(v), tl, x, y, tol=tol)
    )
    t_vg = device_loop_time(vg, jnp.log(ts)) - floor
    print(f"lml value+grad       n={n}: {t_vg:8.3f} ms", flush=True)

    # OvR: C classes from quantile bins of the logit
    labels = jnp.asarray(
        np.digitize(logit, np.quantile(logit, np.linspace(0, 1, C + 1)[1:-1])),
        jnp.int32,
    )
    ovr = lambda t: laplace.laplace_fit_ovr(gp, lik, t, tl, x, labels, C, tol=tol)
    t_ovr = device_loop_time(ovr, ts, reps=5) - floor
    print(
        f"OvR batched fit  C={C} n={n}: {t_ovr:8.3f} ms ({t_ovr/C:.3f} ms/class)",
        flush=True,
    )

    sp = jax.jit(lambda p: laplace.compile_laplace_serving(gp, p))(post)
    jax.tree.map(np.asarray, sp)
    t_serve = device_loop_time(lambda s: serve_predict(gp, s, z), sp) - floor
    t_prob = device_loop_time(
        lambda s: laplace.serve_predict_prob(gp, lik, s, tl, z), sp
    ) - floor
    print(
        f"served latent        m={m}: {t_serve:8.3f} ms | p(y=1) GH-32: {t_prob:8.3f} ms",
        flush=True,
    )

    # EP: damped parallel sweeps (one Cholesky + TRSM per sweep)
    from gogp_tpu.gp import ep as ep_mod
    epfit = lambda t: ep_mod.ep_fit(gp, lik, t, tl, x, y, tol=1e-4, max_sweeps=40)
    t_ep = device_loop_time(epfit, ts, reps=5) - floor
    ep_post = jax.jit(epfit)(ts)
    acc_ep = float(jnp.mean(((ep_post.x[:, 0] * 0 + jnp.matmul(
        core.masked_cov(gp, ep_post.theta_simil, ep_post.theta_noise, ep_post.x, ep_post.mask),
        ep_post.alpha) ) > 0) == (y > 0.5)))
    print(f"ep_fit               n={n}: {t_ep:8.3f} ms | train acc {acc_ep:.3f}", flush=True)

    # precision ladder: mode quality + cost (host-f64 stationarity check;
    # the default-precision Newton has a bf16 error floor, _newton_step doc)
    def resid_of(p):
        f = np.asarray(p.f_hat, dtype=np.float64)
        xs = np.asarray(x, dtype=np.float64)[:, 0]
        d = (xs[:, None] - xs[None, :]) / float(ts[1])
        K = float(ts[0]) * np.exp(-d * d / 2)
        K[np.arange(n), np.arange(n)] += 1e-10
        gll = np.asarray(y, dtype=np.float64) - 1 / (1 + np.exp(-f))
        return float(np.max(np.abs(K @ gll - f)))

    acc = float(jnp.mean((post.f_hat > 0) == (y > 0.5)))
    print(f"default   : resid {resid_of(post):.2e} | acc {acc:.3f} | {t_fit:7.3f} ms", flush=True)
    for prec in ("tensorfloat32", "float32"):
        fit_p = lambda t: laplace.laplace_fit(gp, lik, t, tl, x, y, tol=tol, precision=prec)
        t_p = device_loop_time(fit_p, ts) - floor
        post_p = jax.jit(fit_p)(ts)
        print(f"{prec:10s}: resid {resid_of(post_p):.2e} | acc "
              f"{float(jnp.mean((post_p.f_hat > 0) == (y > 0.5))):.3f} | {t_p:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
