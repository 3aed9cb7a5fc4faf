"""North-star benchmark: ESS/s per chip on hyperpriors NUTS (BASELINE.json).

Runs vmapped NUTS chains over the hyperpriors GP posterior (the flagship
model: 6 thetas, Matern52 trend + periodic seasonality + Normal hyperpriors
on the reference's trend_season dataset) and reports effective samples per
second of sampling walltime (min ESS across parameters, summed over chains).

Usage: python benchmarks/ess_nuts.py [--chains 16] [--samples 512] [--json]
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

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_logp():
    from gogp_tpu.models.params import gp_observe
    from gogp_tpu.tutorial import io as tio
    from gogp_tpu.tutorial.hyperpriors import make_priors, make_study, selfcheck_data

    study = make_study()
    gp = study.gp
    x, y = tio.load_csv(selfcheck_data())
    y_norm, _, _ = tio.normalize(y)
    priors = make_priors(x, y_norm)
    xj = jnp.asarray(x, dtype=jnp.float32)
    yj = jnp.asarray(y_norm, dtype=jnp.float32)
    mask = jnp.ones(x.shape[0], dtype=jnp.float32)

    def logp(v):
        return gp_observe(gp, v, x=xj, y=yj, mask=mask) + priors(v, mask)

    return logp, gp.n_theta


def run(chains: int = 16, num_warmup: int = 512, num_samples: int = 512, seed: int = 0):
    from gogp_tpu import infer
    from gogp_tpu.infer import diagnostics

    logp, dim = build_logp()
    keys = jax.random.split(jax.random.PRNGKey(seed), chains)
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(seed + 1), (chains, dim), dtype=jnp.float32)

    warm = jax.jit(
        jax.vmap(
            lambda q, k: infer.run_nuts(
                logp, q, k, num_warmup=num_warmup, num_samples=0
            ).state
        )
    )

    # warmup (compile + adapt), then time the sampling phase alone with the
    # adapted step size / mass carried in explicitly
    states = warm(x0, keys)
    jax.block_until_ready(states)

    def sample_adapted(positions, rngs, step_sizes, inv_masses):
        from gogp_tpu.infer.hmc import init_state
        from gogp_tpu.infer.nuts import nuts_transition

        def one(q, key, step, im):
            s = init_state(logp, q, key, 0.1)
            s = s._replace(step_size=step, inv_mass=im)

            def sstep(s, _):
                s = nuts_transition(logp, s)
                return s, s.position

            _, pos = jax.lax.scan(sstep, s, None, length=num_samples)
            return pos

        return jax.vmap(one)(positions, rngs, step_sizes, inv_masses)

    fn = jax.jit(sample_adapted)
    args = (states.position, states.rng, states.step_size, states.inv_mass)
    pos = fn(*args)
    jax.block_until_ready(pos)
    t0 = time.perf_counter()
    pos = fn(*args)
    jax.block_until_ready(pos)
    walltime = time.perf_counter() - t0

    pos = np.asarray(pos)  # (chains, samples, dim)
    ess_per_param = np.asarray(diagnostics.ess(jnp.asarray(pos)))  # (dim,)
    min_ess = float(ess_per_param.min())
    return {
        "metric": "ess_per_sec_nuts_hyperpriors",
        "value": round(min_ess / walltime, 2),
        "unit": "ESS/s",
        "min_ess": round(min_ess, 1),
        "walltime_s": round(walltime, 3),
        "chains": chains,
        "samples_per_chain": num_samples,
        "platform": jax.devices()[0].platform,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=512)
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = run(args.chains, args.warmup, args.samples, args.seed)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
