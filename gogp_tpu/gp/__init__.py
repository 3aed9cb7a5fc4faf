from gogp_tpu.gp.core import (  # noqa: F401
    GP,
    Posterior,
    absorb,
    lml,
    lml_from_posterior,
    lml_iterative,
    lml_iterative_matfree,
    predict,
    predict_iterative,
    predict_from_posterior,
    predict_mixture,
    predict_prior,
)
