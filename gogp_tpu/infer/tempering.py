"""Parallel tempering: replica ladder + non-reversible (DEO) swaps.

The hyperpriors posterior is multimodal in its period/noise hyperparameters,
which caps plain NUTS's cross-chain ESS regardless of chain count (chains
stuck in different modes inflate between-chain variance forever).  Parallel
tempering runs a ladder of replicas targeting ``beta_k * logp`` and lets
states flow between temperatures, so the hot replicas carry mode-hopping
moves down to beta = 1.

Design:

- geometric ladder ``betas[0] = 1 > ... > betas[K-1] = beta_min``;
- each replica is an independent NUTS/HMC chain with its OWN step-size /
  mass adaptation (vmapped — one batched transition per sweep);
- swaps use the deterministic even-odd (DEO) scheme of Okabe et al. /
  Syed et al. (2019): even sweeps propose pairs (0,1)(2,3)..., odd sweeps
  (1,2)(3,4)... — the non-reversible schedule with provably better round
  trips than random pairing;
- a swap exchanges *positions* between adjacent temperatures; the cached
  log-density and gradient are TEMPERED values, so they transfer with a
  linear rescale (beta_i/beta_j) — no re-evaluation;
- acceptance: log A = (beta_i - beta_j) (raw_j - raw_i) with
  raw = tempered_logp / beta.

Everything jits; the replica axis is also the natural shard_map axis for
multi-chip ladders (swap statistics are O(K) scalars).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gogp_tpu.infer import adapt
from gogp_tpu.infer.hmc import (
    HMCState,
    finalize_warmup,
    init_state,
    warmup_step,
)
from gogp_tpu.infer.nuts import nuts_transition

Array = jax.Array
LogDensity = Callable[[Array], Array]


def geometric_ladder(n_replicas: int, beta_min: float = 0.1, dtype=jnp.float32) -> Array:
    """betas[0]=1 down to betas[-1]=beta_min, geometric spacing."""
    if n_replicas == 1:
        return jnp.ones((1,), dtype)
    return jnp.asarray(
        beta_min ** (jnp.arange(n_replicas, dtype=dtype) / (n_replicas - 1)), dtype
    )


def _swap_sweep(states: HMCState, betas: Array, raw_logp: Array, key: Array, parity: Array):
    """One DEO swap sweep over adjacent pairs of the ladder.

    ``states``: replica-stacked HMCState; ``raw_logp``: (K,) untempered
    log-density of each replica's position.  Returns swapped states/raws and
    the per-pair acceptance indicator (for ladder diagnostics).
    """
    K = betas.shape[0]
    idx = jnp.arange(K)
    # partner of replica k under this sweep's parity (identity at the ends)
    is_left = (idx % 2) == parity % 2
    partner = jnp.where(is_left, idx + 1, idx - 1)
    partner = jnp.clip(partner, 0, K - 1)
    valid = partner != idx

    delta = (betas - betas[partner]) * (raw_logp[partner] - raw_logp)
    u = jax.random.uniform(key, (K,), dtype=raw_logp.dtype)
    # one uniform per PAIR: both members must use the left member's draw
    left_idx = jnp.minimum(idx, partner)
    accept = valid & (jnp.log(u[left_idx]) < delta)

    src = jnp.where(accept, partner, idx)

    # positions, raw values and gradients travel; tempered caches rescale
    new_pos = states.position[src]
    new_raw = raw_logp[src]
    raw_grad = states.grad / betas[:, None]  # grad of raw logp
    new_grad = raw_grad[src] * betas[:, None]
    new_logp = new_raw * betas
    new_states = states._replace(position=new_pos, logp=new_logp, grad=new_grad)
    swap_frac = jnp.sum(accept.astype(raw_logp.dtype)) / jnp.maximum(
        jnp.sum(valid.astype(raw_logp.dtype)), 1.0
    )
    return new_states, new_raw, swap_frac


class PTResult(NamedTuple):
    positions: Array  # (num_samples, dim) — the beta=1 replica
    logps: Array  # (num_samples,) raw log-density at beta=1
    swap_rate: Array  # () mean DEO acceptance over sampling
    state: HMCState  # final replica-stacked state
    betas: Array


def pt_init(
    logp: LogDensity,
    position0: Array,
    rng: Array,
    betas: Array,
    init_step_size: float = 0.1,
    free: Array | None = None,
):
    """Replica-stacked initial state + loop key for chunked driving."""
    position0 = jnp.asarray(position0)
    n_replicas = betas.shape[0]
    if position0.ndim == 1:
        position0 = jnp.broadcast_to(position0, (n_replicas,) + position0.shape)
    key, key_init = jax.random.split(jnp.asarray(rng))
    init_keys = jax.random.split(key_init, n_replicas)

    def init_one(q, k, beta):
        return init_state(lambda v: beta * logp(v), q, k, init_step_size, free)

    return jax.vmap(init_one)(position0, init_keys, betas), key


def _make_steps(logp, betas, max_tree_depth, target_accept, free):
    def transition(state, beta):
        return nuts_transition(lambda v: beta * logp(v), state, max_tree_depth, free)

    def warm_step(carry, inp):
        states, key = carry
        key, k_swap = jax.random.split(key)
        states = jax.vmap(transition)(states, betas)
        states = jax.vmap(
            lambda s: warmup_step(s, inp["um"], inp["we"], target_accept)
        )(states)
        raw = states.logp / betas
        states, raw, _ = _swap_sweep(states, betas, raw, k_swap, inp["t"] % 2)
        return (states, key), None

    def sample_step(carry, inp):
        states, key = carry
        key, k_swap = jax.random.split(key)
        states = jax.vmap(transition)(states, betas)
        raw = states.logp / betas
        states, raw, swap_frac = _swap_sweep(states, betas, raw, k_swap, inp["t"] % 2)
        return (states, key), (states.position[0], raw[0], swap_frac)

    return warm_step, sample_step


def pt_warm_chunk(
    logp, states, key, betas, um, we, t0,
    max_tree_depth: int = 6, target_accept: float = 0.8, free=None,
):
    """Run len(um) warmup sweeps (transition + adapt + swap).  Chunk-callable:
    the remote-TPU tunnel drops very long single dispatches, so benchmarks
    drive warmup as a sequence of fixed-size chunks (same pattern as
    benchmarks/ess_nuts.py for plain NUTS)."""
    warm_step, _ = _make_steps(logp, betas, max_tree_depth, target_accept, free)
    ts = t0 + jnp.arange(um.shape[0])
    (states, key), _ = jax.lax.scan(
        warm_step, (states, key), {"um": um, "we": we, "t": ts}
    )
    return states, key


def pt_sample_chunk(
    logp, states, key, betas, num: int, t0,
    max_tree_depth: int = 6, free=None,
):
    """Run ``num`` sampling sweeps; returns cold-chain draws of the chunk."""
    _, sample_step = _make_steps(logp, betas, max_tree_depth, 0.8, free)
    ts = t0 + jnp.arange(num)
    (states, key), (positions, raws, swap_fracs) = jax.lax.scan(
        sample_step, (states, key), {"t": ts}
    )
    return states, key, positions, raws, swap_fracs


def run_pt_nuts(
    logp: LogDensity,
    position0: Array,
    rng: Array,
    n_replicas: int = 8,
    beta_min: float = 0.1,
    betas: Array | None = None,
    num_warmup: int = 500,
    num_samples: int = 500,
    max_tree_depth: int = 6,
    init_step_size: float = 0.1,
    target_accept: float = 0.8,
    free: Array | None = None,
) -> PTResult:
    """Parallel-tempered NUTS; returns the cold-chain (beta=1) draws.

    ``position0``: (dim,) shared init, or (n_replicas, dim) per replica.
    """
    position0 = jnp.asarray(position0)
    dtype = position0.dtype
    if betas is None:
        betas = geometric_ladder(n_replicas, beta_min, dtype)
    else:
        betas = jnp.asarray(betas, dtype)
        n_replicas = betas.shape[0]

    states, key = pt_init(logp, position0, rng, betas, init_step_size, free)
    sched = adapt.build_schedule(num_warmup)

    if num_warmup > 0:
        states, key = pt_warm_chunk(
            logp, states, key, betas, sched.update_mass, sched.window_end,
            jnp.asarray(0), max_tree_depth, target_accept, free,
        )
        states = jax.vmap(finalize_warmup)(states)

    states, key, positions, raws, swap_fracs = pt_sample_chunk(
        logp, states, key, betas, num_samples, jnp.asarray(num_warmup),
        max_tree_depth, free,
    )
    return PTResult(positions, raws, jnp.mean(swap_fracs), states, betas)
