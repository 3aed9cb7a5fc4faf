"""Headline benchmark: GP log-marginal-likelihood + gradient at N=4096.

This is BASELINE.json's "Cholesky+LL walltime at N=4096" north-star: one
covariance assembly (RBF + noise), Cholesky factorization, LML, and the full
hyperparameter gradient (reverse pass through the Cholesky), jitted as one
XLA program.  The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is the speedup of the framework's dispatch path (Pallas
kernels where profitable) over the plain XLA-primitive path on the same
hardware — 1.0 means "no custom-kernel advantage yet".

Timing methodology: the op is repeated R times *inside one compiled
program* (serialized through a scan carry) and the whole dispatch is timed.
This amortizes host->device dispatch latency, which through the remote-TPU
tunnel is tens of ms and otherwise swamps sub-10ms kernels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeat benchmark runs skip the multi-minute
# compiles of the nested sampler loops
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

N = 4096
DEVICE_REPS = 40
HOST_REPS = 5


def build_problem(n: int, dtype):
    from gogp_tpu.gp.core import GP
    from gogp_tpu.kernels import rbf, uniform_noise

    gp = GP(ndim=1, simil=rbf.scaled(), noise=uniform_noise)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 100, (n, 1)), axis=0), dtype=dtype)
    y = jnp.asarray(np.sin(np.asarray(x[:, 0]) / 3.0) + 0.1 * rng.normal(size=n), dtype=dtype)
    v = jnp.zeros(gp.n_theta, dtype=dtype)
    return gp, x, y, v


def device_loop_time(f, *args, reps: int = DEVICE_REPS) -> float:
    """Median ms per iteration, R serialized iterations per dispatch."""

    @jax.jit
    def looped(*args):
        def body(c, _):
            out = f(*jax.tree.map(lambda a: a + jnp.asarray(1e-30, a.dtype) * c, args))
            # EVERY output leaf must feed the carry: a first-element-only
            # carry lets XLA dead-code-eliminate whole outputs (e.g. the
            # entire backward pass of a value_and_grad).
            s = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(out))
            return s, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    # Sync via float(out) — a device->host value transfer.  Through the
    # axon tunnel jax.block_until_ready can return before the remote
    # execution finishes, which silently times nothing.
    float(looped(*args))
    times = []
    for _ in range(HOST_REPS):
        t0 = time.perf_counter()
        float(looped(*args))
        times.append((time.perf_counter() - t0) * 1e3 / reps)
    return float(np.median(times))


def reference_algorithm_lml_grad(gp, x, y):
    """The REFERENCE's computational strategy on the same hardware: the
    per-theta trace-identity gradient loop of gp/gp.go:418-499 (SURVEY.md
    §3.2 hot loop #3) — dK built per hyperparameter, then for each theta
    r0 = (alpha alpha^T) dK_i, r1 = K^-1 dK_i, grad_i = 0.5 tr(r0 - r1) —
    i.e. p extra O(n^3) matmuls/solves per gradient, versus this
    framework's single reverse pass through the Cholesky."""
    import jax.numpy as jnp

    from gogp_tpu.gp.core import masked_cov
    from gogp_tpu.models.params import split_params
    from gogp_tpu.ops import linalg

    n = x.shape[0]
    mask = jnp.ones((n,), dtype=x.dtype)
    _LOG_2PI = 1.8378770664093453

    def fn(v):
        p = split_params(gp, v)

        def cov_of(theta_flat):
            nts = gp.n_theta_simil
            return masked_cov(gp, theta_flat[:nts], theta_flat[nts:], x, mask)

        theta_flat = jnp.concatenate([p.theta_simil, p.theta_noise])
        K = cov_of(theta_flat)
        # dK per theta: forward-mode per hyperparameter — the vectorized
        # equivalent of the reference's per-pair AD tapes (gp/gp.go:109-156)
        dK = jax.jacfwd(cov_of)(theta_flat)  # (n, n, p)
        # log-scale chain rule, as the reference applies by hand (:114-116)
        dK = dK * theta_flat[None, None, :]

        L = linalg.cholesky(K)
        alpha = linalg.cho_solve_vec(L, y)
        lml = -0.5 * (
            n * _LOG_2PI
            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            + jnp.dot(y, alpha)
        )
        a = jnp.outer(alpha, alpha)

        def grad_i(dKi):
            r0 = a @ dKi
            r1 = linalg.cho_solve_mat(L, dKi)
            return 0.5 * jnp.trace(r0 - r1)

        grads = jax.vmap(grad_i, in_axes=2)(dK)
        return lml, grads

    return fn


def _relay_preflight() -> str | None:
    """Fail fast instead of hanging when the loopback TPU relay is dead.

    Under the axon loopback relay (JAX_PLATFORMS=axon +
    PALLAS_AXON_POOL_IPS=127.0.0.1), ``jax.devices()`` blocks FOREVER if
    the relay process has died (observed round 5: the relay dropped
    mid-round and every backend init hung).  If the env says loopback
    relay and none of the relay ports accept a connection, return an
    error string; the caller prints the JSON artifact with the error
    rather than stalling the driver pipeline.
    """
    if os.environ.get("JAX_PLATFORMS") != "axon":
        return None
    if os.environ.get("PALLAS_AXON_POOL_IPS") != "127.0.0.1":
        return None
    import socket

    ports = [8082, 8083, 8087, 8092, 8093, 8097,
             8102, 8103, 8107, 8112, 8113, 8117]
    for p in ports:
        try:
            with socket.create_connection(("127.0.0.1", p), timeout=2.0):
                return None
        except OSError:
            continue
    return ("TPU loopback relay is down: no relay port accepts "
            "connections; jax.devices() would hang indefinitely")


def main():
    err = _relay_preflight()
    if err is not None:
        print(json.dumps({
            "metric": f"lml_grad_n{N}_walltime", "value": None,
            "unit": "ms", "vs_baseline": None, "error": err,
            "ess_per_sec": None,
        }))
        return 0

    platform = jax.devices()[0].platform
    dtype = jnp.float32
    gp, x, y, v = build_problem(N, dtype)

    from gogp_tpu.models.params import gp_observe
    from gogp_tpu.ops import linalg

    def lml_grad(v):
        return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)

    def lml_grad_xla(v):
        # identical algorithm, custom kernels disabled: grad through the
        # XLA-native Cholesky/solves — the "dense XLA" baseline
        with linalg.force_xla():
            return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)

    # Per-dispatch overhead floor (through the remote-TPU tunnel this is
    # ~25-30 ms per call): measured with a trivial kernel and subtracted.
    floor_ms = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    fast_ms = device_loop_time(lml_grad, v) - floor_ms
    xla_ms = device_loop_time(lml_grad_xla, v) - floor_ms

    # Baseline 2: the reference's own gradient algorithm on this hardware
    # (per-theta trace identities), XLA primitives.
    ref_fn = reference_algorithm_lml_grad(gp, x, y)

    def ref_fn_xla(v):
        with linalg.force_xla():
            return ref_fn(v)

    ref_ms = device_loop_time(ref_fn_xla, v) - floor_ms

    # sanity: all strategies agree (f32 conditioning at n=4096 puts ~1e-3
    # relative noise on the large gradient components)
    v1, g1 = jax.jit(lml_grad)(v)
    v2, g2 = jax.jit(ref_fn_xla)(v)
    v3, g3 = jax.jit(lml_grad_xla)(v)
    agree = bool(
        jnp.isclose(v1, v2, rtol=1e-4)
        and jnp.allclose(g1, g2, rtol=5e-3, atol=1e-3)
        and jnp.isclose(v1, v3, rtol=1e-4)
        and jnp.allclose(g1, g3, rtol=5e-3, atol=1e-3)
    )

    result = {
        "metric": f"lml_grad_n{N}_walltime",
        "value": round(fast_ms, 3),
        "unit": "ms",
        "vs_baseline": round(ref_ms / fast_ms, 3),
        "baseline": "reference per-theta trace-identity gradient (gp/gp.go:418-499) on same chip, XLA primitives",
        "baseline_ms": round(ref_ms, 3),
        "vs_xla": round(xla_ms / fast_ms, 3),
        "xla_ms": round(xla_ms, 3),
        "floor_ms": round(floor_ms, 3),
        "agree": agree,
        "platform": platform,
    }

    # ESS/s north star (BASELINE.json metric #1), round-5 protocol: the
    # SEED-MEDIAN over 5 fixed seeds at one pinned config, each seed's ESS
    # estimated from 2048 retained draws with split-chain ESS and gated on
    # max split-R-hat <= 1.01 (a non-converged seed scores 0).  The r4
    # number (82.7) was the best single draw of a 2x4 sweep — ~4-8x its
    # own seed-median — so r5+ rounds compare medians, not lucky draws
    # (VERDICT r4 #1).  The engine config (ChEES + post-warmup K=4
    # trajectory race) is the median-best row of the round-5 engine table
    # (STATUS.md): racing replaces the noisy adaptation draw with an
    # argmax over probed candidates, which is nearly free on this
    # mixing-limited chip.  ess_per_sec == the sampling-walltime median;
    # the e2e variant includes warmup + race walltime in the denominator.
    try:
        from benchmarks.ess_nuts import (
            PROTOCOL_SEEDS,
            qualify_engine,
            run_protocol,
        )

        # Stage 1 — qualifier: one gated seed-0 run per engine family
        # (ChEES+race / GHMC / PT-ChEES); the winner is chosen by
        # measurement inside this very artifact (VERDICT r4 #3), ranked
        # converged-first then gated ESS/s then closeness to mixing.
        qual = qualify_engine(quiet=True)
        winner = dict(qual["winner"])
        engine = winner.pop("engine")
        if not qual["winner_converged"]:
            # no engine passed the gate at the qualifier budget: give the
            # protocol runs double the draws so the gate has a chance
            for k in ("num_samples", "ghmc_samples"):
                if k in winner:
                    winner[k] = 2 * winner[k]
        proto = run_protocol(engine, seeds=PROTOCOL_SEEDS, quiet=True,
                             **winner)
        result["ess_per_sec"] = proto["ess_per_sec_median"]
        result["ess_per_sec_e2e"] = proto["ess_per_sec_e2e_median"]
        result["ess_per_seed"] = proto["per_seed"]
        result["ess_config"] = {
            "engine": engine, "model": "hyperpriors",
            "protocol": "median over seeds, rank-normalized split-chain "
                        f"ESS, bulk R-hat gate {proto['rhat_gate']}",
            "seeds": list(PROTOCOL_SEEDS),
            "n_converged": proto["n_converged"],
            "engine_config": winner,
            "qualifier": qual["rows"],
            "ess_per_sec_min": proto["ess_per_sec_min"],
            "ess_per_sec_max": proto["ess_per_sec_max"],
        }
    except Exception as e:  # noqa: BLE001 — the headline must still print
        result["ess_per_sec"] = None
        result["ess_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
