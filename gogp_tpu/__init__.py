"""gogp_tpu — a TPU-native Gaussian-process probabilistic-programming engine.

A from-scratch JAX/XLA/Pallas framework with the full model surface of the
infergo-ml/gogp reference (composable differentiable kernels, GP marginal
log-likelihood, GP-as-elemental-model composition with hyperparameter priors,
latent inputs and non-Gaussian noise), plus the inference engines the
reference delegates to external libraries: MLE (Adam/LBFGS), HMC/NUTS, ADVI
and SMC, all jit/vmap/shard_map-native.

Layer map (mirrors reference layers, SURVEY.md §1, but functional):

- ``gogp_tpu.kernels``   — pure-function kernels (reference: kernel/*.go and
  the generated kernel/ad/*; here ``jax.grad`` replaces the codegen AD).
- ``gogp_tpu.gp``        — GP core: covariance assembly, LML, prediction
  (reference: gp/gp.go).
- ``gogp_tpu.models``    — log-density composition + parameter packing/masks
  (reference: gp/model.go + per-tutorial Gradient overrides).
- ``gogp_tpu.infer``     — optimizers and samplers (reference delegates to
  gonum optimize / infergo infer).
- ``gogp_tpu.ops``       — dense linear algebra: Pallas blocked Cholesky /
  TRSM with XLA fallbacks (reference delegates to gonum mat.Cholesky).
- ``gogp_tpu.parallel``  — mesh / sharding / collectives (no counterpart in
  the single-process reference).
- ``gogp_tpu.tutorial``  — the five case studies + Evaluate driver
  (reference: tutorial/).
- ``gogp_tpu.bo``        — Bayesian optimization on the serving/streaming
  stack (no counterpart; the canonical production consumer of a GP).
- ``gogp_tpu.search``    — greedy compositional kernel-structure discovery
  scored by BIC/AIC/exact-LOO (the reference picks kernels by hand).
"""

__version__ = "0.1.0"

from gogp_tpu.gp.core import GP  # noqa: F401
from gogp_tpu.kernels import (  # noqa: F401
    constant_noise,
    matern32,
    matern52,
    matern52_ref,
    normal,
    periodic,
    uniform_noise,
)
