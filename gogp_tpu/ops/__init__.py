from gogp_tpu.ops import distributed, iterative, linalg  # noqa: F401
