"""Large-n Bayesian GP: full-posterior inference where every leapfrog step
pays an O(n^3) factorization.

The hyperpriors ESS/s north star (benchmarks/ess_nuts.py) samples a tiny
n=33 study — the chip idles and the number measures sampler mixing.  This
benchmark measures the other regime the framework is built for: ChEES-HMC
over the hyperparameters of an n=1024+ GP, where each transition's leapfrog
steps each evaluate a batched LML+gradient through the fused Pallas
Cholesky/LML path (ops/cholesky_pallas.lml_core — the bench.py headline
kernel).  This is the production shape of Bayesian GP regression: the
reference ecosystem has no counterpart (its MLE refit at n=44 is the
largest problem it ships; gonum's dense Cholesky is single-threaded
CPU-bound at these sizes).

The --force-xla leg reruns sampling with the custom kernels disabled
(linalg.force_xla), so the JSON line reports the end-to-end sampler-level
speedup the fused path delivers — measured 8 chains x n=1024 LML+grad:
2.93 ms fused vs 4.85 ms XLA per batched gradient (1.66x), which carries
straight through to draws/s because leapfrog is nothing but gradients.

Usage: python benchmarks/large_n_bayes.py [--n 1024] [--chains 8]
       [--warmup 256] [--samples 256] [--compare-xla]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHUNK = 32


def build_problem(n: int):
    """Scaled-RBF + uniform-noise GP on a noisy sine (bench.py's problem),
    N(0,1) hyperpriors on the log-thetas."""
    from gogp_tpu import dists
    from gogp_tpu.gp.core import GP
    from gogp_tpu.kernels import rbf, uniform_noise
    from gogp_tpu.models.params import gp_observe

    gp = GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 100, (n, 1)), axis=0), jnp.float32)
    y = jnp.asarray(
        np.sin(np.asarray(x[:, 0]) / 3.0) + 0.1 * rng.normal(size=n), jnp.float32
    )

    def logp(v):
        return gp_observe(gp, v, x=x, y=y) + jnp.sum(dists.normal_logp(0.0, 1.0, v))

    return logp, gp.n_theta


def build_problem_ski(n: int, grid: int, num_probes: int, cg_iters: int,
                      lanczos_iters: int):
    """The same noisy-sine problem through the SKI O(n + N log N) LML
    (gp.ski.lml_ski) — the n=65536 regime where the dense K (16 GB) cannot
    exist on one chip.  Probes are FIXED (one key for the whole run): the
    sampler targets a smooth deterministic surrogate whose bias is the
    estimator error (parallel.large_n.run_chees_large_n method='ski'
    contract)."""
    from gogp_tpu import dists
    from gogp_tpu.gp.core import GP
    from gogp_tpu.gp.ski import lml_ski
    from gogp_tpu.kernels import rbf, uniform_noise

    gp = GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 100, (n, 1)), axis=0), jnp.float32)
    y = jnp.asarray(
        np.sin(np.asarray(x[:, 0]) / 3.0) + 0.1 * rng.normal(size=n), jnp.float32
    )
    key_probes = jax.random.PRNGKey(777)

    def logp(v):
        theta = jnp.exp(v)
        core = lml_ski(
            gp, theta[: gp.n_theta_simil], theta[gp.n_theta_simil :], x, y,
            key_probes, grid, num_probes, cg_iters, lanczos_iters,
        )
        return core + jnp.sum(dists.normal_logp(0.0, 1.0, v))

    return logp, gp.n_theta


def build_problem_iterative(n: int, num_probes: int, cg_iters: int,
                            lanczos_iters: int, precond_rank: int):
    """The same noisy-sine problem through the matrix-free CG/SLQ LML with
    the pivoted-Cholesky PCG preconditioner (gp.core.lml_iterative) —
    the O(n^2)-per-solve fallback the production recommendation names for
    when the exact O(n^3) path ages out.  Probes FIXED (one key): smooth
    deterministic surrogate, same contract as the SKI leg."""
    from gogp_tpu import dists
    from gogp_tpu.gp.core import GP, lml_iterative
    from gogp_tpu.kernels import rbf, uniform_noise

    gp = GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 100, (n, 1)), axis=0), jnp.float32)
    y = jnp.asarray(
        np.sin(np.asarray(x[:, 0]) / 3.0) + 0.1 * rng.normal(size=n), jnp.float32
    )
    from gogp_tpu.models.params import split_params

    probe_key = jax.random.PRNGKey(999)

    def logp(v):
        gpv = split_params(gp, v)
        ts = jnp.exp(gpv.theta_simil)
        tn = jnp.exp(gpv.theta_noise)
        return lml_iterative(
            gp, ts, tn, x, y, probe_key,
            num_probes=num_probes, cg_iters=cg_iters,
            lanczos_iters=lanczos_iters, precond_rank=precond_rank,
        ) + jnp.sum(dists.normal_logp(0.0, 1.0, v))

    return logp, gp.n_theta


def run(n: int = 1024, chains: int = 8, num_warmup: int = 256,
        num_samples: int = 256, seed: int = 0, max_steps: int = 64,
        force_xla: bool = False, precision: str = "tensorfloat32",
        ski: bool = False, grid: int = 4096, num_probes: int = 16,
        cg_iters: int = 100, lanczos_iters: int = 32, chunk: int = CHUNK,
        init_spread: float = 0.05, init_step: float = 0.01,
        init_traj: float = 0.1, iterative: bool = False,
        precond_rank: int = 32):
    from gogp_tpu.infer import adapt, diagnostics
    from gogp_tpu.infer.chees import (
        chees_init,
        chees_sample_chunk,
        chees_warm_chunk,
        finalize_chees_warmup,
    )
    from gogp_tpu.ops import linalg

    import contextlib

    # Matmul precision is load-bearing at this problem shape, not a tuning
    # detail (measured, v5e, batched 8x1024 LML+grad at the MLE point of
    # this posterior): one-pass-bf16 default NaNs (adjacent-input RBF
    # correlations sit within ~1e-4 of 1.0, below bf16 resolution), and
    # XLA's native Cholesky path NaNs on jittered points too — the fused
    # blocked kernels under jax.default_matmul_precision("tensorfloat32")
    # are the configuration that samples this posterior at all, at 4.18 ms
    # per batched gradient (float32 6-pass: 4.70 ms, also finite).
    def dispatch():
        ctx = contextlib.ExitStack()
        if force_xla:
            ctx.enter_context(linalg.force_xla())
        if precision != "default":
            ctx.enter_context(jax.default_matmul_precision(precision))
        return ctx

    if ski and iterative:
        raise ValueError("--ski and --iterative are mutually exclusive")
    if ski:
        logp, dim = build_problem_ski(n, grid, num_probes, cg_iters, lanczos_iters)
    elif iterative:
        logp, dim = build_problem_iterative(
            n, num_probes, cg_iters, lanczos_iters, precond_rank
        )
    else:
        logp, dim = build_problem(n)
    # MLE warm start — the production workflow (and at n >= 1024 the
    # posterior over 3 hyperparameters is so sharp that a cold 0.1-scale
    # init sits in a |grad| ~ 1e4 wall: dual averaging then collapses the
    # step size to ~1e-6 and the chains freeze for the whole budget;
    # measured before this guard: min-ESS 4.0, step_size 5e-6).
    from gogp_tpu.infer import mle

    # The MLE leg runs under the XLA oracle regardless of dispatch: Adam
    # explores transient near-singular K (lengthscale overshoot), which is
    # exactly the 1-pass-bf16 NaN regime the size-gated precision rescue
    # does not cover below n=8192 (ops/linalg.py) — and unlike the sampler,
    # whose Metropolis step rejects non-finite proposals, an optimizer NaN
    # is permanent.  MLE time is not part of the measured sampling walltime.
    # The SKI surrogate has no dense oracle at its n — its own (CG-robust)
    # gradient does the warm start.
    if ski or iterative:
        # chunked host loop: at n=65536 a 200-iteration single dispatch is
        # multi-minute and crashes the tunnel worker (observed round 4)
        step = jax.jit(
            lambda v: mle.adam(jax.value_and_grad(logp), v, iters=20, rate=0.05)
        )
        v_cur = jnp.zeros(dim, jnp.float32)
        for _ in range(10):
            opt = step(v_cur)
            v_cur = opt.x
            np.asarray(v_cur)  # sync per chunk
    elif n >= 8192:
        # exact path at large n: chunk the oracle-precision Adam too — a
        # single 300-iteration dispatch at n=16384 is multi-minute, the
        # same tunnel-crash regime as the SKI note above
        with linalg.force_xla():
            step = jax.jit(
                lambda v: mle.adam(jax.value_and_grad(logp), v, iters=20, rate=0.05)
            )
        v_cur = jnp.zeros(dim, jnp.float32)
        for _ in range(15):
            opt = step(v_cur)
            v_cur = opt.x
            np.asarray(v_cur)  # sync per chunk
    else:
        with linalg.force_xla():
            opt = jax.jit(
                lambda v: mle.adam(jax.value_and_grad(logp), v, iters=300, rate=0.05)
            )(jnp.zeros(dim, jnp.float32))
    mle_x = opt.x
    np.asarray(mle_x)  # sync
    # init spread / step / trajectory must scale with the posterior width,
    # which sharpens as ~1/sqrt(n): at n=65536 the default 0.05 spread is
    # ~10x the posterior sigma and dual averaging collapses (measured:
    # min-ESS 2.0, step_size < 1e-5 — the same wall as the cold-start
    # note above, one scale further in).
    x0 = mle_x[None, :] + init_spread * jax.random.normal(
        jax.random.PRNGKey(seed + 1), (chains, dim), dtype=jnp.float32
    )
    sched = adapt.build_schedule(num_warmup)
    with dispatch():
        state = jax.jit(
            lambda p, k: chees_init(logp, p, k, init_step, init_traj)
        )(x0, jax.random.PRNGKey(seed))
    jax.block_until_ready(state)

    @jax.jit
    def warm_chunk(state, um, we):
        with dispatch():
            return chees_warm_chunk(logp, state, um, we, max_steps)

    t0 = time.perf_counter()
    warm_c = warm_chunk.lower(
        state, sched.update_mass[:chunk], sched.window_end[:chunk]
    ).compile()
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(0, num_warmup, chunk):
        um = sched.update_mass[i : i + chunk]
        we = sched.window_end[i : i + chunk]
        state = warm_c(state, um, we) if um.shape[0] == chunk else warm_chunk(state, um, we)
        np.asarray(state.logps)  # sync per chunk: long dispatches trip the tunnel
    warm_time = time.perf_counter() - t0
    state = jax.jit(finalize_chees_warmup)(state)

    @jax.jit
    def sample_chunk(state):
        with dispatch():
            state, (pos, lps, acc) = chees_sample_chunk(logp, state, chunk, max_steps)
        return state, jnp.swapaxes(pos, 0, 1), lps, acc

    state_c, pos_c, _, _ = sample_chunk(state)
    np.asarray(pos_c)  # synced compile warmup

    chunks, accs, lp_chunks = [], [], []
    t0 = time.perf_counter()
    for _ in range(0, num_samples, chunk):
        state, pos, lps, acc = sample_chunk(state)
        chunks.append(np.asarray(pos))  # device sync per chunk
        accs.append(np.asarray(acc))
        lp_chunks.append(np.asarray(lps))
    walltime = time.perf_counter() - t0

    pos = np.concatenate(chunks, axis=1)  # (chains, S, dim)
    ess_per_param = np.asarray(diagnostics.ess(jnp.asarray(pos)))
    min_ess, max_rhat, converged = diagnostics.gated_min_ess(jnp.asarray(pos))
    out_extra = {}
    if ski:
        out_extra = {"grid": grid, "num_probes": num_probes,
                     "cg_iters": cg_iters, "lanczos_iters": lanczos_iters}
    elif iterative:
        out_extra = {"num_probes": num_probes, "cg_iters": cg_iters,
                     "lanczos_iters": lanczos_iters,
                     "precond_rank": precond_rank}
    variant = "_ski" if ski else ("_pcg" if iterative else "")
    return {
        "metric": f"large_n_bayes_chees{variant}_n{n}",
        **out_extra,
        # R-hat gate (VERDICT r4 #4): a mixing-collapsed run reports null
        # (rank-normalized split form, diagnostics.gated_min_ess)
        "value": round(min_ess / walltime, 2) if converged else None,
        **({} if converged else
           {"value_reason": f"max bulk split-R-hat {max_rhat:.4f} > 1.01"}),
        "max_rhat": round(max_rhat, 4),
        "converged": converged,
        "unit": "ESS/s",
        "n": n,
        "min_ess": round(min_ess, 1),
        "walltime_s": round(walltime, 3),
        "warmup_s": round(warm_time, 3),
        "warm_compile_s": round(compile_s, 3),
        "chains": chains,
        "samples_per_chain": num_samples,
        "samples_per_sec": round(chains * num_samples / walltime, 1),
        "grad_evals_per_sec": None,  # filled below from step counts
        "ess_per_param": [round(float(e), 1) for e in ess_per_param],
        "accept_rate": round(float(np.mean(accs)), 3),
        "step_size": round(float(state.step_size), 5),
        "traj_length": round(float(np.exp(state.log_traj)), 4),
        "mean_logp": round(float(np.mean(lp_chunks[-1])), 2),
        "mle_logp": round(float(opt.value), 2),
        # health: fraction of final-chunk log-densities that are finite —
        # a stuck/NaN'd leg reports walltime but no valid chain
        "finite_frac": round(float(np.mean(np.isfinite(lp_chunks[-1]))), 3),
        "precision": precision,
        "dispatch": "ski" if ski else (
            "pcg" if iterative else ("xla" if force_xla else "pallas")
        ),
        "sampler": "chees-hmc",
        "platform": jax.devices()[0].platform,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=256)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-steps", type=int, default=64)
    ap.add_argument("--force-xla", action="store_true",
                    help="disable the Pallas dispatch (baseline leg)")
    ap.add_argument("--compare-xla", action="store_true",
                    help="run both dispatches and report the speedup")
    ap.add_argument("--precision", default="tensorfloat32",
                    choices=["default", "tensorfloat32", "float32"],
                    help="matmul precision for the sampling phase (see the "
                    "in-code note: default 1-pass bf16 NaNs this posterior)")
    ap.add_argument("--ski", action="store_true",
                    help="sample the SKI O(n + N log N) surrogate LML "
                    "(fixed probes) — the n=65536 regime")
    ap.add_argument("--grid", type=int, default=4096,
                    help="with --ski: inducing grid size")
    ap.add_argument("--probes", type=int, default=16)
    ap.add_argument("--cg-iters", type=int, default=100)
    ap.add_argument("--lanczos", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=CHUNK,
                    help="transitions per dispatch (lower for slow-per-step "
                    "ski runs: tunnel limits)")
    ap.add_argument("--init-spread", type=float, default=0.05,
                    help="chain init sigma around the MLE (scale ~1/sqrt(n))")
    ap.add_argument("--init-step", type=float, default=0.01)
    ap.add_argument("--init-traj", type=float, default=0.1)
    ap.add_argument("--iterative", action="store_true",
                    help="sample the matrix-free CG/SLQ + pivoted-PCG LML "
                    "(fixed probes) — the exact path's O(n^2) fallback")
    ap.add_argument("--precond-rank", type=int, default=32,
                    help="with --iterative: pivoted-Cholesky PCG rank")
    args = ap.parse_args()
    out = run(args.n, args.chains, args.warmup, args.samples, args.seed,
              args.max_steps, args.force_xla, args.precision,
              ski=args.ski, grid=args.grid, num_probes=args.probes,
              cg_iters=args.cg_iters, lanczos_iters=args.lanczos,
              chunk=args.chunk, init_spread=args.init_spread,
              init_step=args.init_step, init_traj=args.init_traj,
              iterative=args.iterative, precond_rank=args.precond_rank)
    # leapfrog steps/draw ~= traj_length / step_size on average halved by
    # the halton jitter; report realized gradient-evaluation throughput
    steps_per_draw = 0.5 * out["traj_length"] / max(out["step_size"], 1e-12)
    out["grad_evals_per_sec"] = round(out["samples_per_sec"] * steps_per_draw, 1)
    if args.compare_xla:
        base = run(args.n, args.chains, args.warmup, args.samples, args.seed,
                   args.max_steps, force_xla=True, precision=args.precision)
        out["xla_walltime_s"] = base["walltime_s"]
        out["xla_samples_per_sec"] = base["samples_per_sec"]
        out["xla_finite_frac"] = base["finite_frac"]
        out["vs_xla"] = round(base["walltime_s"] / out["walltime_s"], 3)
        out["agree_mean_logp"] = bool(
            abs(base["mean_logp"] - out["mean_logp"])
            <= 0.05 * abs(out["mean_logp"]) + 3.0
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
